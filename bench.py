"""Benchmark: stereo depth throughput per chip across the BASELINE configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
The headline metric is the BASELINE.json north-star pipeline — 1080p,
128 disparities, 4-path SGM with left-right consistency + WLS-style
post-filtering — against the driver-defined 30 fps target (the reference
publishes no numbers; BASELINE.md). The "configs" field records the other
reference workloads: fast mode (median-only tail), 8-path 'hh', the full
4-stage postprocess (in-matcher speckle + outlier + fill + median), the
Middlebury flagship geometry (2964x1988 at 0.5 downscale, 144 disp,
example_stereo.py:6-27), and 1080p at 256 disparities.

Robustness rules (learned from round 2, where one config's compile failure
destroyed every number): every config is measured under its own try/except,
partial results are streamed to stderr as they land, and the final JSON is
printed no matter how many configs failed.

Timing fence: jax.block_until_ready and jax.effects_barrier both return
early on this TPU stack, so the fence is a full-map device-side reduction
whose scalar is copied to host (np.asarray) — it data-depends on every
output pixel, so it provably waits for the whole pipeline, without timing
the debug tunnel this chip sits behind (measured ~40 MB/s D2H, i.e. a
~185 ms tax on a full 1080p map pull that says nothing about the TPU).
The one-off cost of a full-map host readback is reported separately per
config as readback_ms.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

# Persistent XLA compilation cache (round 3 lesson: a cold process spent
# ~28 min compiling the 7 configs and blew the driver's time budget —
# BENCH_r03 recorded rc=124 with no JSON). The cache lives under the repo
# so a bench run warmed in one process is near-free in the next.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
import jax  # noqa: E402  (after cache dir exists)

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_FPS = 30.0

# Global wall-clock deadline: configs still pending when it expires are
# recorded as skipped and the final JSON prints regardless (round-3 fix:
# the JSON must land even if late configs never run).
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
_T_START = time.perf_counter()


def _remaining():
    return DEADLINE_S - (time.perf_counter() - _T_START)


# The deadline alone is not enough: a single config's XLA compile can
# block the main thread past the whole budget (round-4 lesson: one 256d
# compile ran >40 min and the JSON never printed). A daemon watchdog
# emits the partial JSON and hard-exits when the deadline passes.
_CONFIGS = {}
_HEADLINE = [0.0]
_DONE = [False]


def _emit_json():
    value = round(_HEADLINE[0], 2)
    print(
        json.dumps(
            {
                "metric": "stereo_fps_1080p_128disp_per_chip",
                "value": value,
                "unit": "frames/s",
                "vs_baseline": round(value / BASELINE_FPS, 3),
                "configs": _CONFIGS,
                "headline_note": HEADLINE_NOTE,
            }
        ),
        flush=True,
    )


def _watchdog():
    while not _DONE[0]:
        if _remaining() <= 0:
            _CONFIGS["watchdog"] = (
                "deadline expired while a config was still running; "
                "partial results emitted"
            )
            print("[bench] WATCHDOG: deadline hit mid-config, emitting "
                  "partial JSON", file=sys.stderr, flush=True)
            _emit_json()
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)
        time.sleep(5.0)

# The headline intentionally deviates from the reference compute() default
# in one place: in-matcher speckle filtering is OFF (the reference default
# is speckle_window_size=50, stereo_core.py:22-23). The reference-default
# path is measured separately as full_postprocess_1080p_128d.
HEADLINE_NOTE = (
    "sgbm_3way (the reference's DEFAULT matcher mode, stereo_core.py:25) "
    "+ in-matcher LR + WLS, fast-mode tail; hh4/hh path sets are benched "
    "as hh4_1080p_128d / hh_8path configs; speckle_window_size=0 "
    "(reference default 50 is benched in full_postprocess_1080p_128d); "
    "fence = full-map on-device reduction synced as a scalar (this chip "
    "sits behind a ~40 MB/s debug tunnel; per-config readback_ms reports "
    "the tunnel cost of one full-map host pull separately)"
)


def make_pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + 32)).astype(np.float32)
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3.0
    return base[:, :w], base[:, 16 : w + 16]


def measure(cfg, h, w, fast_mode, n=10):
    """Median-of-n wall time for one jitted end-to-end step.

    The step returns the disparity map plus a full-map scalar checksum;
    np.asarray on the checksum is the fence (see module docstring). One
    full-map host pull is timed separately as readback_ms."""
    import jax
    import jax.numpy as jnp

    from depthestimation_tpu.pipeline import stereo_depth_fn

    left_np, right_np = make_pair(h, w)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)

    @jax.jit
    def step(l, r):
        disp, _ = stereo_depth_fn(l, r, cfg, 1.0, fast_mode)
        return disp, jnp.sum(disp.astype(jnp.float32))

    t0 = time.perf_counter()
    disp, chk = step(left, right)  # compile + first run
    np.asarray(chk)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(disp)
    readback_ms = (time.perf_counter() - t0) * 1e3
    # Throughput: enqueue n async dispatches, fence once. The device runs
    # them back-to-back; the ~26 ms tunnel round trip (measured with an
    # x+1 step) amortizes over n instead of taxing every frame — which is
    # also how the streaming facade drives the chip (api.py async loop).
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(left, right)
    np.asarray(out[1])
    dt = (time.perf_counter() - t0) / n
    return 1.0 / dt, compile_s, readback_ms


def _deadline_skip(name, results):
    """True (and records the skip) when the global deadline has expired."""
    if _remaining() <= 0:
        results[name] = {"skipped": f"deadline {DEADLINE_S:.0f}s expired"}
        print(f"[bench] {name}: SKIPPED (deadline)", file=sys.stderr,
              flush=True)
        return True
    return False


def run_config(name, results, cfg_kwargs, h, w, fast_mode, n=10):
    """Measure one config; record fps or the error string. Never raises."""
    from depthestimation_tpu.config import SGMConfig

    if _deadline_skip(name, results):
        return None
    try:
        fps, compile_s, readback_ms = measure(
            SGMConfig(**cfg_kwargs), h, w, fast_mode, n)
        results[name] = round(fps, 2)
        results[name + "_readback_ms"] = round(readback_ms, 1)
        print(
            f"[bench] {name}: {fps:.2f} fps (compile {compile_s:.0f}s, "
            f"readback {readback_ms:.0f}ms)",
            file=sys.stderr, flush=True,
        )
        return fps
    except Exception as e:  # noqa: BLE001 — one config must never kill the run
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr, flush=True)
        traceback.print_exc(file=sys.stderr)
        return None


def run_batch2_config(name, results, n=10):
    """Two 1080p frames per dispatch on ONE chip (lax.map, sequential on
    device): amortizes the per-dispatch host cost — the honest per-chip
    throughput number for any pipelined/streaming deployment (VERDICT r4
    #1c). Never raises."""
    if _deadline_skip(name, results):
        return
    try:
        import jax
        import jax.numpy as jnp

        from depthestimation_tpu.config import SGMConfig
        from depthestimation_tpu.pipeline import stereo_depth_fn

        cfg = SGMConfig(num_disp=128, sgbm_mode="sgbm_3way",
                        speckle_window_size=0, wls_filter=True)
        l, r = make_pair(1080, 1920)
        left, right = jnp.asarray(l), jnp.asarray(r)

        @jax.jit
        def step(l, r):
            lb = jnp.stack([l, l + 1.0])
            rb = jnp.stack([r, r + 1.0])
            d, _ = jax.lax.map(
                lambda ab: stereo_depth_fn(ab[0], ab[1], cfg, 1.0, True),
                (lb, rb))
            return jnp.sum(d.astype(jnp.float32))

        t0 = time.perf_counter()
        np.asarray(step(left, right))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(left, right)
        np.asarray(out)
        fps = 2 * n / (time.perf_counter() - t0)
        results[name] = round(fps, 2)
        print(f"[bench] {name}: {fps:.2f} fps (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc(file=sys.stderr)


def run_disp_sharded_demo(name, results):
    """Disparity-range sharding at D=256 on an 8-virtual-device CPU mesh
    (subprocess; the real chip is a single device so the disp axis cannot
    shard there). Records seconds/frame on CPU — the point is the
    recorded, working escape hatch at the geometry it was designed for
    (VERDICT r4 #8), not CPU speed; bit-exactness vs the unsharded
    matcher is asserted inside."""
    if _deadline_skip(name, results):
        return
    try:
        import subprocess

        child = r"""
import os, sys, time
sys.path.insert(0, %r)
import numpy as np
import jax
import jax.numpy as jnp
from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.parallel import shard as pshard
from depthestimation_tpu.parallel.mesh import make_mesh
from depthestimation_tpu.ops import costs, sgm, wta

h, w, D = 120, 512, 256
cfg = SGMConfig(num_disp=D, sgbm_mode="sgbm_3way", speckle_window_size=0)
rng = np.random.default_rng(0)
base = rng.integers(0, 255, (h, w + 32)).astype(np.float32)
left, right = jnp.asarray(base[:, :w]), jnp.asarray(base[:, 16:w+16])
mesh = make_mesh((1, 1, 8))
fn = jax.jit(pshard.disp_sharded_sgm(mesh, cfg))
t0 = time.time(); d8 = np.asarray(fn(left, right)); compile_s = time.time() - t0
t0 = time.time()
for _ in range(3):
    d8 = np.asarray(fn(left, right))
dt = (time.time() - t0) / 3
c = costs.cost_volume(left, right, cfg)
d1 = np.asarray(wta.wta_disparity(
    sgm.aggregate(c, cfg.p1, cfg.p2, cfg.num_paths),
    cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff))
assert np.array_equal(d8, d1), "disp-sharded != single-device"
print(f"OK {dt:.3f} {compile_s:.1f}", flush=True)
""" % (os.path.dirname(os.path.abspath(__file__)),)
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        # The axon TPU plugin would override JAX_PLATFORMS (round-4
        # lesson); drop its discovery variable in the child.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run(
            [sys.executable, "-c", child], env=env, capture_output=True,
            text=True, timeout=max(_remaining(), 60))
        line = [l for l in out.stdout.splitlines() if l.startswith("OK")]
        if out.returncode != 0 or not line:
            raise RuntimeError(out.stderr[-400:])
        dt, compile_s = float(line[0].split()[1]), float(line[0].split()[2])
        results[name] = {
            "s_per_frame_cpu8": round(dt, 3),
            "bit_exact_vs_single_device": True,
            "note": "256 disparities sharded 8-way over the disp axis "
                    "(lane-coupled SGM terms via collectives) on a CPU "
                    "mesh; single-chip hardware here cannot shard",
        }
        print(f"[bench] {name}: {dt:.3f} s/frame on cpu8, bit-exact "
              f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc(file=sys.stderr)


def run_sharded_config(name, results, n=5):
    """Frames-per-second of the Pallas matcher running inside shard_map
    (parallel.shard.batch_pipeline, 1-chip mesh, batch=2). Never raises."""
    if _deadline_skip(name, results):
        return
    try:
        import jax
        import jax.numpy as jnp

        from depthestimation_tpu.config import SGMConfig
        from depthestimation_tpu.parallel import shard as pshard
        from depthestimation_tpu.parallel.mesh import make_mesh

        h, w, batch = 720, 1280, 2
        cfg = SGMConfig(num_disp=128, sgbm_mode="hh4", speckle_window_size=0)
        mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
        run = pshard.batch_pipeline(mesh, cfg, fast_mode=True,
                                    tile_axis=None)
        l, r = make_pair(h, w)
        lb = jnp.stack([jnp.asarray(l)] * batch)
        rb = jnp.stack([jnp.asarray(r)] * batch)

        @jax.jit
        def step(lb, rb):
            disp, _ = run(lb, rb)
            return jnp.sum(disp.astype(jnp.float32))

        t0 = time.perf_counter()
        np.asarray(step(lb, rb))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(lb, rb)
        np.asarray(out)
        fps = batch * n / (time.perf_counter() - t0)
        results[name] = round(fps, 2)
        print(f"[bench] {name}: {fps:.2f} fps (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc(file=sys.stderr)


def run_rectified_config(name, results, n=5):
    """Full-calibration route at 1080p (VERDICT r3 #4): grayscale + banded
    remap + matcher fused into one dispatch (rectify.py:185-186 analogue,
    realistic mild rig: 0.25 deg relative yaw + light distortion)."""
    if _deadline_skip(name, results):
        return
    try:
        import jax.numpy as jnp

        from depthestimation_tpu.config import CalibConfig, SGMConfig
        from depthestimation_tpu.pipeline import StereoPipeline

        h, w = 1080, 1920
        fx = 1000.0
        K = (fx, 0.0, w / 2, 0.0, fx, h / 2, 0.0, 0.0, 1.0)
        th = np.deg2rad(0.25)
        rot = (float(np.cos(th)), float(-np.sin(th)), 0.0,
               float(np.sin(th)), float(np.cos(th)), 0.0, 0.0, 0.0, 1.0)
        dist = (-0.01, 0.002, 0.0, 0.0, 0.0)
        calib = CalibConfig(cam_matrix_l=K, cam_matrix_r=K,
                            image_width=w, image_height=h,
                            dist_coeff_l=dist, dist_coeff_r=dist,
                            rotation=rot)
        cfg = SGMConfig(num_disp=128, sgbm_mode="hh4",
                        speckle_window_size=0, wls_filter=True,
                        calib=calib, focal_length=fx, baseline=0.12)
        pipe = StereoPipeline(cfg, fast_mode=True)
        l, r = make_pair(h, w)
        # Device-resident inputs, like every other matcher config: this
        # chip sits behind a ~10-40 MB/s debug tunnel, and re-uploading
        # 47 MB of RGB per call would measure the tunnel, not the
        # rectified pipeline (first run recorded 0.43 "fps" that way).
        l3 = jnp.asarray(np.repeat(l[..., None], 3, -1))
        r3 = jnp.asarray(np.repeat(r[..., None], 3, -1))

        t0 = time.perf_counter()
        disp, _ = pipe.estimate_depth_async(l3, r3)
        np.asarray(jnp.sum(disp))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            disp, _ = pipe.estimate_depth_async(l3, r3)
        np.asarray(jnp.sum(disp))
        fps = n / (time.perf_counter() - t0)
        results[name] = round(fps, 2)
        print(f"[bench] {name}: {fps:.2f} fps (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc(file=sys.stderr)


def run_mono_config(name, results, n=10):
    """MonoDepthNet-small forward at 518x518 on the chip (VERDICT r3 #6;
    MonocularDepthEstimator.py:55-76 capability). Random weights — fps
    does not depend on weight values."""
    if _deadline_skip(name, results):
        return
    try:
        import jax.numpy as jnp

        from depthestimation_tpu.models.mono import MonoDepthModel

        model = MonoDepthModel.create("small", image_size=518)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 518, 518, 3), np.float32))
        fn = model._apply_fn(x.shape)

        t0 = time.perf_counter()
        np.asarray(jnp.sum(fn(model.params, x)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(model.params, x)
        np.asarray(jnp.sum(out))
        fps = n / (time.perf_counter() - t0)
        results[name] = round(fps, 2)
        print(f"[bench] {name}: {fps:.2f} fps (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc(file=sys.stderr)


def run_streaming_config(name, results, frames=40):
    """Sustained fps + mean latency of StereoDepthEstimatorVideo over
    in-memory synthetic 1080p frames (VERDICT r3 #8): validates the
    capture -> H2D -> compute -> D2H overlap of the streaming facade."""
    if _deadline_skip(name, results):
        return
    try:
        from depthestimation_tpu import StereoDepthEstimatorVideo

        h, w = 1080, 1920
        l, r = make_pair(h, w)
        # Host-link-honest streaming (VERDICT r4 #3): camera-realistic
        # uint8 frames in (2 MB/side vs 8 MB float32), float16 depth out
        # (3.9 MB vs 7.7), metrics as a 16-byte device-side stats vector
        # (vs an 8 MB disparity pull). ~8 MB/frame total on the link.
        lf = [np.clip(l + i, 0, 255).astype(np.uint8) for i in range(frames)]
        rf = [np.clip(r + i, 0, 255).astype(np.uint8) for i in range(frames)]
        est = StereoDepthEstimatorVideo(
            left_source=lf, right_source=rf, fast_mode=True,
            use_threading=True, target_fps=0, visualize_live=False,
            depth_dtype="float16")
        est.configure_sgbm(num_disp=128, sgbm_mode="hh4",
                           speckle_window_size=0, wls_filter=True,
                           focal_length=1000.0, baseline=0.12)
        n_out = 0
        for _ in est.estimate_depth():
            n_out += 1
        summary = est.metrics.summary()
        results[name] = summary["throughput_fps"]
        results[name + "_mean_latency_ms"] = summary["steady_mean_latency_ms"]
        results[name + "_frames"] = n_out
        results[name + "_bytes_per_frame"] = (
            summary.get("bytes_per_frame_in", 0)
            + summary.get("bytes_per_frame_out", 0))
        results[name + "_note"] = (
            "end-to-end: uint8 frames in, float16 depth maps out, "
            "device-side stats (bytes_per_frame recorded); this dev "
            "chip sits behind a ~10-40 MB/s debug tunnel, so sustained "
            "fps here is still link-bound, not compute-bound"
        )
        print(f"[bench] {name}: {summary['throughput_fps']:.2f} fps "
              f"sustained, {summary['steady_mean_latency_ms']:.0f} ms steady "
              f"latency ({n_out} frames, "
              f"{results[name + '_bytes_per_frame'] / 2**20:.1f} MB/frame)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"[bench] {name}: FAILED {msg[:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc(file=sys.stderr)


def main():
    import threading

    H, W, D = 1080, 1920, 128
    configs = _CONFIGS
    threading.Thread(target=_watchdog, daemon=True).start()

    # North star: the reference's default matcher mode (sgbm_3way,
    # stereo_core.py:25) + in-matcher LR + WLS-style post-filtering.
    headline = run_config(
        "northstar_1080p_128d", configs,
        dict(num_disp=D, sgbm_mode="sgbm_3way", speckle_window_size=0,
             wls_filter=True),
        H, W, fast_mode=True)
    _HEADLINE[0] = headline or 0.0

    # Two frames per dispatch on one chip: the pipelined per-chip
    # throughput number (VERDICT r4 #1c).
    run_batch2_config("northstar_1080p_batch2", configs)
    # Census cost (robustness lever, SURVEY section 7 hard-part 4) inside
    # the Pallas matcher — new in round 5; previously raised at TPU scale.
    run_config(
        "census_1080p_128d", configs,
        dict(num_disp=D, sgbm_mode="sgbm_3way", cost="census",
             speckle_window_size=0, wls_filter=True),
        H, W, fast_mode=True)
    # 4-path quality mode with the same LR + WLS stack (the round-2/3
    # headline, kept for cross-round comparability).
    run_config(
        "hh4_1080p_128d", configs,
        dict(num_disp=D, sgbm_mode="hh4", speckle_window_size=0,
             wls_filter=True),
        H, W, fast_mode=True)
    # 8-path quality mode.
    run_config(
        "hh_8path_1080p_128d", configs,
        dict(num_disp=D, sgbm_mode="hh", speckle_window_size=0,
             wls_filter=True),
        H, W, fast_mode=True)
    # Reference-default pipeline: in-matcher speckle + full 4-stage
    # postprocess (BASELINE config #3 "with post-filtering"). Matcher mode
    # is the reference's DEFAULT sgbm_3way (stereo_core.py:25,61) — every
    # other SGMConfig field at its default, exactly what
    # StereoDepthEstimator users get out of the box.
    run_config(
        "full_postprocess_1080p_128d", configs,
        dict(num_disp=D, hole_filling=True),
        H, W, fast_mode=False, n=5)
    # Middlebury flagship geometry (example_stereo.py at downscale 0.5).
    run_config(
        "middlebury_1482x994_144d", configs,
        dict(num_disp=144, sgbm_mode="hh4", speckle_window_size=0,
             wls_filter=True),
        994, 1482, fast_mode=True, n=5)
    # BASELINE config #4: 1080p at 256 disparities, 8-path.
    run_config(
        "hh_8path_1080p_256d", configs,
        dict(num_disp=256, sgbm_mode="hh", speckle_window_size=0),
        H, W, fast_mode=True, n=5)
    # The designed D-escape hatch at its geometry: 256d sharded 8-way over
    # the disparity axis, bit-exact (CPU mesh; VERDICT r4 #8).
    run_disp_sharded_demo("disp_sharded_sgm_256d_cpu8", configs)
    # Pallas matcher inside shard_map (frame-DP batch_pipeline on a
    # (1,1,1) mesh, batch=2): proves the sharded path end-to-end on the
    # real chip (VERDICT r2 item 4).
    run_sharded_config("shardmap_dp_batch2_720p_128d", configs, n=5)
    # Full-calibration rectified route (VERDICT r3 #4).
    run_rectified_config("rectified_1080p_128d", configs)
    # Monocular net on the chip (VERDICT r3 #6).
    run_mono_config("mono_small_518", configs)
    # Streaming facade sustained throughput (VERDICT r3 #8).
    run_streaming_config("streaming_sustained_fps", configs)

    _DONE[0] = True
    _emit_json()


if __name__ == "__main__":
    main()
