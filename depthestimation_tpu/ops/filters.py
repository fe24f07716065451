"""Disparity post-processing filters (pure JAX / XLA).

TPU-native replacements for the reference's postprocess.py stages:

- median3x3:   cv2.medianBlur(..., 3) (stereo_core.py:173, postprocess.py:169)
  via a 9-element partial sorting network on shifted planes.
- box_mean:    cv2.boxFilter k x k mean (postprocess.py:59-63).
- detect_outliers: |d - mu| > k*sigma on valid (>0) pixels
  (postprocess.py:37-70).
- filter_speckles: cv2.filterSpeckles connected-component speckle removal
  (postprocess.py:6-35) re-designed as iterative min-label propagation
  (union-find is inherently serial; label propagation is a data-parallel
  fixed-point that XLA vectorizes) followed by a gather/scatter-free
  BFS-tree convergecast for component sizes (see filter_speckles).
- fill_holes:  cv2.inpaint INPAINT_TELEA / distance-transform 'nearest'
  fill (postprocess.py:72-118) replaced by iterated masked nearest-valid
  dilation and masked Jacobi diffusion (equivalence by bad-pixel metric,
  not bitwise — see SURVEY.md section 7).
- postprocess_disparity: the 4-step driver in reference order
  (postprocess.py:143-169).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Propagation steps fused into each fori_loop body: larger values mean
# fewer loop iterations (less HBM round-tripping of the carried state)
# at the cost of a bigger fused body.
_SPECKLE_UNROLL = 4

__all__ = [
    "median3x3",
    "box_mean",
    "detect_outliers",
    "filter_speckles",
    "fill_holes",
    "postprocess_disparity",
]


def _shifted_planes_3x3(x: jax.Array):
    p = jnp.pad(x, 1, mode="edge")
    h, w = x.shape
    return [p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]


def median3x3(x: jax.Array) -> jax.Array:
    """3x3 median via min/max exchange network (9 taps, border-replicated,
    matching cv2.medianBlur BORDER_REPLICATE)."""
    v = _shifted_planes_3x3(x.astype(jnp.float32))

    def cas(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    # Optimal 9-element median network (19 exchanges, Paeth).
    for i, j in [
        (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
        (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
        (4, 2), (6, 4), (4, 2),
    ]:
        cas(i, j)
    return v[4]


def box_mean(x: jax.Array, k: int) -> jax.Array:
    """k x k box mean with reflected borders (cv2.boxFilter default
    BORDER_REFLECT_101, normalize=True).

    Separable: two 1-D reduce_windows (2k taps/pixel) instead of one 2-D
    window (k^2 taps) — at the WLS radius (k=17) that is ~8x less work."""
    r = k // 2
    p = jnp.pad(x.astype(jnp.float32), r, mode="reflect")
    s = jax.lax.reduce_window(
        p, jnp.float32(0), jax.lax.add,
        window_dimensions=(k, 1), window_strides=(1, 1), padding="VALID",
    )
    s = jax.lax.reduce_window(
        s, jnp.float32(0), jax.lax.add,
        window_dimensions=(1, k), window_strides=(1, 1), padding="VALID",
    )
    return s / (k * k)


def detect_outliers(disparity: jax.Array, threshold: float = 3.0, kernel_size: int = 5):
    """Local-statistics outlier mask (True = outlier), postprocess.py:37-70."""
    d = disparity.astype(jnp.float32)
    valid = d > 0
    mean = box_mean(d, kernel_size)
    mean_sq = box_mean(d * d, kernel_size)
    std = jnp.sqrt(jnp.maximum(mean_sq - mean * mean, 0.0))
    return (jnp.abs(d - mean) > threshold * std) & valid


def _neighbor_min_labels(labels: jax.Array, same: jax.Array, big: float):
    """One 4-connected min-label propagation step.

    `same[k]` gives per-pixel connectivity to neighbor k in N,S,W,E order.
    """
    h, w = labels.shape
    pad = functools.partial(jnp.pad, constant_values=big)
    north = pad(labels, ((1, 0), (0, 0)))[:-1, :]
    south = pad(labels, ((0, 1), (0, 0)))[1:, :]
    west = pad(labels, ((0, 0), (1, 0)))[:, :-1]
    east = pad(labels, ((0, 0), (0, 1)))[:, 1:]
    out = labels
    for nb, s in zip((north, south, west, east), same):
        out = jnp.minimum(out, jnp.where(s, nb, big))
    return out


def filter_speckles(
    disparity: jax.Array,
    new_val: float = 0.0,
    max_speckle_size: int = 100,
    max_diff: float = 1.0,
    num_iters: int | None = None,
) -> jax.Array:
    """Remove small connected components from the disparity map.

    Semantics of cv2.filterSpeckles (postprocess.py:30): 4-connected
    components where neighboring disparities differ by <= max_diff; every
    component with <= max_speckle_size pixels is overwritten with new_val.
    The reference round-trips through x16 int16 fixed point
    (postprocess.py:27-33); inputs here are already on the 1/16 grid so the
    comparison is exact.

    Implementation: each valid pixel starts with its linear index as label;
    min-label flood fill by local 4-neighbor propagation. Component sizes
    and removability are then derived WITHOUT any gather or scatter (XLA
    lowers 2M-element gathers/scatter-adds catastrophically on TPU —
    the earlier histogram version cost ~190 ms/frame): a BFS distance
    field from each component root (the pixel whose index equals the
    converged label), parent pointers as directions, and a truncated
    subtree-count convergecast toward the root — all shifted-plane ops.

    Exactness does NOT require global convergence. Only components of size
    <= max_speckle_size =: S may be removed, and any such component has
    diameter < S, so S local propagation steps fully converge every
    removable component, its BFS tree has depth < S, and S convergecast
    steps deliver the exact size to its root. For larger components the
    truncated count is still a proof: a tree deeper than S levels has at
    least S+1 nodes within S levels, so (truncated count <= S) holds iff
    the true size is <= S. Under-converged large components (several
    label fragments) are protected by label PURITY, encoded as count
    POISON: a connectivity edge joining two different labels exists only
    inside an under-converged (hence > S pixel) component, and both its
    endpoints seed the convergecast with S+2 instead of 1. A fragment
    root with truncated count <= S has its ENTIRE fragment inside the
    truncated tree (any pixel deeper than S forces count > S), and every
    fragment of a multi-label component borders a disagreeing edge — so
    its poisoned seed is counted and the root never removes (cv2 keeps
    all big components). No separate impurity flood is needed.
    """
    d = disparity.astype(jnp.float32)
    h, w = d.shape
    n = h * w
    big = jnp.float32(n)

    valid = d != new_val  # cv2 skips pixels already equal to newVal

    # Connectivity: |d(p) - d(q)| <= max_diff and both pixels valid.
    def nb(arr, dy, dx, fill):
        return jnp.pad(arr, 1, constant_values=fill)[
            1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w
        ]

    dirs = ((-1, 0), (1, 0), (0, -1), (0, 1))
    same = []
    for dy, dx in dirs:
        nd = nb(d, dy, dx, jnp.inf)
        nv = nb(valid.astype(jnp.float32), dy, dx, 0.0) > 0.5
        same.append(valid & nv & (jnp.abs(d - nd) <= max_diff))

    labels0 = jnp.where(
        valid, jnp.arange(n, dtype=jnp.float32).reshape(h, w), big
    )

    local_steps = _SPECKLE_UNROLL
    if num_iters is None:
        # Worst-case removable component: a path of max_speckle_size pixels
        # whose labels move one step per local iteration.
        num_iters = max_speckle_size // local_steps + 2

    def round_body(_, labels):
        for _ in range(local_steps):
            labels = _neighbor_min_labels(labels, same, big)
        return labels

    labels = jax.lax.fori_loop(0, num_iters, round_body, labels0)

    # ---- size & removability, gather/scatter-free (see docstring) ----
    s_max = int(max_speckle_size)
    idx_map = jnp.arange(n, dtype=jnp.float32).reshape(h, w)

    # Same-label connectivity: component edges whose endpoints agree on the
    # converged label; a disagreeing edge poisons both endpoints' seeds.
    conn = []
    poison = jnp.zeros((h, w), dtype=jnp.bool_)
    for (dy, dx), s in zip(dirs, same):
        agree = nb(labels, dy, dx, big) == labels
        conn.append(s & agree)
        poison = poison | (s & ~agree)

    rounds = s_max // local_steps + 2
    inf = jnp.float32(n + 8)
    dist0 = jnp.where(valid & (labels == idx_map), 0.0, inf)

    def relax_body(_, dist):
        for _ in range(local_steps):
            best = inf
            for k, (dy, dx) in enumerate(dirs):
                best = jnp.minimum(
                    best, jnp.where(conn[k], nb(dist, dy, dx, inf), inf)
                )
            dist = jnp.minimum(dist, best + 1.0)
        return dist

    dist = jax.lax.fori_loop(0, rounds, relax_body, dist0)

    # Parent pointers: first direction whose same-label neighbor sits one
    # BFS level closer to the root (fixed N,S,W,E tie-break). Children =
    # neighbors whose parent points back at this pixel.
    parent = jnp.full((h, w), -1.0, jnp.float32)
    for k in range(3, -1, -1):
        dy, dx = dirs[k]
        ok = conn[k] & (nb(dist, dy, dx, inf) == dist - 1.0)
        parent = jnp.where(ok, jnp.float32(k), parent)
    opp = (1.0, 0.0, 3.0, 2.0)
    child = [
        conn[k] & (nb(parent, dy, dx, -1.0) == opp[k])
        for k, (dy, dx) in enumerate(dirs)
    ]

    seed = jnp.where(poison, jnp.float32(s_max + 2), 1.0)

    def cc_body(_, c):
        for _ in range(local_steps):
            total = seed
            for k, (dy, dx) in enumerate(dirs):
                total = total + jnp.where(child[k], nb(c, dy, dx, 0.0), 0.0)
            c = total
        return c

    count = jax.lax.fori_loop(0, rounds, cc_body, seed)

    # Removability is decided at the root, then spread back through the
    # component along same-label edges.
    rem = (dist == 0.0) & (count <= s_max)

    def spread_body(_, r):
        for _ in range(local_steps):
            for k, (dy, dx) in enumerate(dirs):
                r = r | (conn[k] & nb(r, dy, dx, False))
        return r

    rem = jax.lax.fori_loop(0, rounds, spread_body, rem)
    return jnp.where(rem, jnp.float32(new_val), d)


def _masked_nearest_fill(x: jax.Array, hole: jax.Array, iters: int) -> jax.Array:
    """Iteratively pull values from the nearest valid pixels into holes
    using a 3x3 max-magnitude-valid propagation (reference 'nearest' fill:
    distance transform + repeated dilate, postprocess.py:106-116)."""
    filled = jnp.where(hole, 0.0, x)
    known = ~hole

    def body(_, state):
        f, k = state
        planes_f = _shifted_planes_3x3(f)
        planes_k = _shifted_planes_3x3(k.astype(jnp.float32))
        acc = jnp.zeros_like(f)
        cnt = jnp.zeros_like(f)
        for pf, pk in zip(planes_f, planes_k):
            acc = acc + pf * pk
            cnt = cnt + pk
        avg = acc / jnp.maximum(cnt, 1.0)
        newly = (~k) & (cnt > 0)
        return jnp.where(newly, avg, f), k | newly

    filled, _ = jax.lax.fori_loop(0, iters, body, (filled, known))
    return jnp.where(hole, filled, x)


def _push_pull_fill(x: jax.Array, hole: jax.Array) -> jax.Array:
    """Pyramid push-pull fill: O(log HW) passes instead of the O(H+W)
    sequential dilation a naive nearest fill needs — every hole, however
    large, is seeded from its surrounding valid pixels via a masked
    mean pyramid (classic pull-push scattered-data interpolation).

    TPU formulation: downsampling uses reduce_window 2x2 pooling and
    upsampling a broadcast+reshape — the earlier strided slices
    (v[0::2, 0::2]) and jnp.repeat lower to lane relayouts that cost
    ~3 ms per level at 1080p (~70 ms per frame)."""
    v = jnp.where(hole, 0.0, x).astype(jnp.float32)
    m = (~hole).astype(jnp.float32)

    def pool2(a):
        return jax.lax.reduce_window(
            a, jnp.float32(0), jax.lax.add,
            window_dimensions=(2, 2), window_strides=(2, 2),
            padding="VALID",
        )

    def down(v, m):
        h, w = v.shape
        if h % 2 or w % 2:
            v = jnp.pad(v, ((0, h % 2), (0, w % 2)))
            m = jnp.pad(m, ((0, h % 2), (0, w % 2)))
        vs, ms = pool2(v), pool2(m)
        return vs / jnp.maximum(ms, 1.0), jnp.minimum(ms, 1.0)

    # Push: masked-mean pyramid (static level count from static shapes).
    pyramid = [(v, m)]
    while max(pyramid[-1][0].shape) > 1:
        pyramid.append(down(*pyramid[-1]))

    # Pull: fill each level's holes from the coarser level (nearest up).
    vc, _ = pyramid[-1]
    for v_l, m_l in reversed(pyramid[:-1]):
        h, w = v_l.shape
        h2, w2 = vc.shape
        up = jnp.broadcast_to(
            vc[:, None, :, None], (h2, 2, w2, 2)
        ).reshape(2 * h2, 2 * w2)[:h, :w]
        vc = jnp.where(m_l > 0, v_l, up)
    return jnp.where(hole, vc, x)


def fill_holes(
    disparity: jax.Array,
    mask: jax.Array | None = None,
    method: str = "inpaint",
    kernel_size: int = 5,
    diffusion_iters: int = 25,
) -> jax.Array:
    """Fill invalid regions of the disparity map (postprocess.py:72-118).

    'inpaint' (Telea fast-marching in the reference) is replaced by
    pyramid push-pull seeding followed by masked Jacobi diffusion — smooth
    fills equivalent under the bad-pixel metric, in O(log HW) passes.
    'nearest' mirrors the reference's bounded dilate loop (kernel_size
    iterations).
    """
    d = disparity.astype(jnp.float32)
    if mask is None:
        mask = d <= 0

    if method == "nearest":
        # Reference runs kernel_size dilation rounds with a k x k ellipse;
        # each of our 3x3 rounds reaches 1 px, so scale iterations by the
        # ellipse radius to match the fill distance.
        iters = kernel_size * max(kernel_size // 2, 1)
        return _masked_nearest_fill(d, mask, iters)

    # 'inpaint': seed with the pyramid fill, then smooth the hole interior
    # with masked Jacobi iterations of the 4-neighbor Laplacian (5 steps
    # fused per loop body so the state round-trips HBM 5x less).
    seeded = _push_pull_fill(d, mask)
    inner = 5
    rounds = max(diffusion_iters // inner, 1)

    def jacobi(_, f):
        for _ in range(inner):
            p = jnp.pad(f, 1, mode="edge")
            avg = 0.25 * (p[:-2, 1:-1] + p[2:, 1:-1]
                          + p[1:-1, :-2] + p[1:-1, 2:])
            f = jnp.where(mask, avg, f)
        return f

    return jax.lax.fori_loop(0, rounds, jacobi, seeded)


def postprocess_disparity(
    disparity: jax.Array,
    max_speckle_size: int = 50,
    max_diff: float = 1.0,
    outlier_threshold: float = 3.0,
    outlier_kernel: int = 5,
    fill_method: str = "inpaint",
    fill_kernel: int = 3,
    apply_outlier_removal: bool = True,
    apply_hole_filling: bool = True,
) -> jax.Array:
    """4-step refinement in reference order (postprocess.py:143-169):
    speckle filter -> outlier mask -> optional hole fill -> 3x3 median."""
    result = filter_speckles(
        disparity, 0.0, max_speckle_size=max_speckle_size, max_diff=max_diff
    )
    if apply_outlier_removal:
        outliers = detect_outliers(result, outlier_threshold, outlier_kernel)
        result = jnp.where(outliers, 0.0, result)
    if apply_hole_filling:
        result = fill_holes(result, method=fill_method, kernel_size=fill_kernel)
    return median3x3(result)
