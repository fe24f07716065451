"""Multi-host smoke: 2-process jax.distributed over CPU (VERDICT r3 #10).

Exercises parallel.mesh.initialize_distributed + batch_pipeline across
process boundaries: each process owns 2 virtual CPU devices, the global
mesh is (data=4, tile=1, model=1), and each process's local shard of the
frame-DP output must match the single-process pipeline bit-for-bit.

The reference has no distributed runtime at all (SURVEY.md section 2c);
this is the DCN/coordinator bring-up path of the TPU build.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); coord = sys.argv[2]
import jax
from depthestimation_tpu.parallel.mesh import initialize_distributed, make_mesh
initialize_distributed(coord, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.parallel import shard as pshard
from depthestimation_tpu.pipeline import stereo_depth_fn

cfg = SGMConfig(num_disp=16, sgbm_mode="hh4", speckle_window_size=0)
rng = np.random.default_rng(0)
base = rng.integers(0, 255, (4, 60, 96)).astype("float32")
lb = base
rb = base * 0.0
rb[:, :, :-4] = base[:, :, 4:]

mesh = make_mesh((4, 1, 1))
run = pshard.batch_pipeline(mesh, cfg, fast_mode=True, tile_axis=None)
sh = NamedSharding(mesh, P("data", None, None))
gl = jax.make_array_from_process_local_data(sh, lb[pid * 2:(pid + 1) * 2])
gr = jax.make_array_from_process_local_data(sh, rb[pid * 2:(pid + 1) * 2])
out = run(gl, gr)
disp = out[0] if isinstance(out, tuple) else out
shards = sorted(disp.addressable_shards, key=lambda s: s.index[0].start)
local = np.concatenate([np.asarray(s.data) for s in shards])

ref = np.stack([
    np.asarray(stereo_depth_fn(jnp.asarray(lb[i]), jnp.asarray(rb[i]),
                               cfg, 1.0, True)[0])
    for i in range(pid * 2, (pid + 1) * 2)
])
assert local.shape == ref.shape, (local.shape, ref.shape)
err = np.abs(local - ref).max()
assert err == 0.0, f"proc {pid}: max err {err}"
print(f"proc {pid} OK", flush=True)
"""

import numpy as np  # noqa: E402,F811  (used inside the child template too)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_frame_dp_matches_single_process(tmp_path):
    script = tmp_path / "child.py"
    script.write_text("import numpy as np\n" + _CHILD)
    coord = f"localhost:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    # The container's sitecustomize registers the TPU plugin at interpreter
    # startup, which initializes the XLA backend before the child can call
    # jax.distributed.initialize(); disable it for the CPU children.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
