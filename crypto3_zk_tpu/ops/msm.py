"""Pippenger multi-scalar multiplication on device.

TPU-native replacement for `algebra::multiexp<multiexp_method_BDLO12>`
(SURVEY.md §2.0; `prover.hpp (gg):108-139`, `generator.hpp (gg):163-229`,
`kzg.hpp:143-148`). Design (SURVEY.md §7 hard part #3 — no data-dependent
control flow):

- scalars are split into c-bit windows on host (index bookkeeping);
- per window, points are argsorted by digit and bucket sums are produced by
  a KEYED SEGMENTED associative scan (log-depth, ~2N branch-free Jacobian
  adds) — the sort+scan replaces the scalar bucket scatter of Pippenger;
- bucket sums land in a dense 2^c array by one masked scatter, the weighted
  sum  sum_k k*B_k  is a reversed associative scan plus a log-depth tree
  reduction;
- the (tiny) cross-window Horner combine runs on host scalars.

Works for G1 (FqOps) and G2 (Fq2Ops) alike.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import FieldSpec
from . import curve as CRV


def _digits_host(scalars: list[int], c: int, windows: int) -> np.ndarray:
    out = np.zeros((windows, len(scalars)), dtype=np.uint32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        for w in range(windows):
            out[w, i] = (s >> (c * w)) & mask
    return out


def _point_roll(P, d):
    """Roll each coordinate plane along the batch (last) axis by d."""
    def r(x):
        if isinstance(x, tuple):
            return tuple(r(xx) for xx in x)
        return jnp.roll(x, d, axis=-1)
    return tuple(r(c) for c in P)


def _segmented_prefix_points(ops, points, heads, log_n: int):
    """Inclusive segmented prefix sums (Hillis-Steele) of a point array
    along the LAST axis (leading axes are independent batches).

    heads: (..., N) bool, True at each segment start. The doubling loop
    runs as a `lax.fori_loop` with a DYNAMIC roll distance, so the
    compiled graph holds exactly ONE batched Jacobian add — the unrolled
    associative-scan network's graph was two orders of magnitude larger
    and dominated XLA compile time."""
    n = heads.shape[-1]
    idx = jnp.arange(n)

    def body(i, carry):
        val, flag = carry
        d = jnp.left_shift(1, i)
        valid = idx >= d
        pval = _point_roll(val, d)
        pflag = jnp.roll(flag, d, axis=-1)
        comb = CRV.jac_add(ops, val, pval)
        use = valid & (~flag)
        new_val = CRV.point_select(ops, use, comb, val)
        new_flag = flag | jnp.where(valid, pflag, True)
        return new_val, new_flag

    val, _ = jax.lax.fori_loop(0, log_n, body, (points, heads))
    return val


# In-group scan length: the segmented scan does O(N log K) point adds, so
# smaller K means less work — but the cross-group merge costs
# O(G * n_buckets * log G), which grows as K shrinks. 2^12 balances both
# for the 2^20..2^24 sizes the baseline targets.
_MSM_GROUP = 1 << 12


def _segmented_bucket_sums(ops, points, keys, n_buckets: int):
    """points: (X, Y, Z) with batch N (globally sorted by key); keys: (N,)
    int32. Returns bucket points with batch n_buckets+1 (last = dump).

    Grouped formulation (SURVEY.md §2.7 bucket-parallel MSM): the sorted
    array splits into G groups of K; each group runs an independent
    segmented scan (log K levels instead of log N), per-(group, bucket)
    partials scatter into a dense (n_buckets+1, G) grid (each bucket's run
    is contiguous, so it has exactly one end per group), and the tiny
    cross-group merge is a log G halving over the grid."""
    n = keys.shape[0]
    K = min(n, _MSM_GROUP)
    # cap the group count so the (n_buckets+1, G) merge grid stays within
    # a few hundred MB of HBM (large c windows would otherwise OOM)
    while K < n and (n // K) * (n_buckets + 1) > (1 << 22):
        K *= 2
    G = n // K
    kg = keys.reshape(G, K)

    def rg(x):
        if isinstance(x, tuple):
            return tuple(rg(xx) for xx in x)
        return x.reshape(x.shape[:-1] + (G, K))

    pts_g = tuple(rg(c) for c in points)

    first = jnp.ones((G, 1), dtype=bool)
    heads = jnp.concatenate([first, kg[:, 1:] != kg[:, :-1]], axis=-1)
    summed = _segmented_prefix_points(ops, pts_g, heads,
                                      max((K - 1).bit_length(), 1))

    # per-group segment ends: last in-group occurrence of each key
    last = jnp.ones((G, 1), dtype=bool)
    is_end = jnp.concatenate([kg[:, :-1] != kg[:, 1:], last], axis=-1)
    # flat target in the (n_buckets+1, G) grid; non-ends go to the dump row
    tgt = jnp.where(is_end, kg, n_buckets) * G \
        + jnp.arange(G, dtype=kg.dtype)[:, None]
    tgt = tgt.reshape(-1)

    grid = CRV.inf_point(ops, ((n_buckets + 1) * G,))

    def scatter(dst, src):
        if isinstance(dst, tuple):
            return tuple(scatter(d, s) for d, s in zip(dst, src))
        return dst.at[:, tgt].set(src.reshape(src.shape[:-2] + (G * K,)))

    grid = tuple(scatter(d, s) for d, s in zip(grid, summed))

    if G == 1:
        return grid

    def rg2(x):
        if isinstance(x, tuple):
            return tuple(rg2(xx) for xx in x)
        return x.reshape(x.shape[:-1] + (n_buckets + 1, G))

    grid = tuple(rg2(c) for c in grid)

    def body(i, x):
        half = jnp.int32(G) >> (i + 1)
        return CRV.jac_add(ops, x, _point_roll(x, -half))

    merged = jax.lax.fori_loop(0, G.bit_length() - 1, body, grid)

    def take0(x):
        if isinstance(x, tuple):
            return tuple(take0(xx) for xx in x)
        return x[..., 0]

    return tuple(take0(c) for c in merged)


def _weighted_bucket_reduce(ops, buckets, n_buckets: int):
    """sum_{k=1}^{K-1} k * B_k via suffix scan + tree reduce."""
    def slice_pt(P, lo, hi):
        def s(x):
            if isinstance(x, tuple):
                return tuple(s(xx) for xx in x)
            return x[..., lo:hi]
        return tuple(s(cmp) for cmp in P)

    B = slice_pt(buckets, 1, n_buckets)  # drop bucket 0 and dump slot

    # suffix sums S_k = sum_{j >= k} B_j: flip, single-segment prefix loop,
    # flip back (same one-add-in-a-loop graph as the bucket scan)
    def flip(P):
        def f(x):
            if isinstance(x, tuple):
                return tuple(f(xx) for xx in x)
            return jnp.flip(x, axis=-1)
        return tuple(f(c) for c in P)

    m0 = n_buckets - 1
    heads = jnp.zeros((m0,), dtype=bool).at[0].set(True)
    log_m = max((m0 - 1).bit_length(), 1)
    S = flip(_segmented_prefix_points(ops, flip(B), heads, log_m))

    # tree-reduce S over the bucket axis (pad to a power of two with
    # infinity so halving never wraps garbage into live lanes); the
    # halving runs as a fori_loop with a DYNAMIC roll distance — one
    # Jacobian add in the graph instead of log2(m) unrolled ones
    m = n_buckets - 1
    m2 = 1 << (m - 1).bit_length() if m > 1 else 1
    if m2 != m:
        # match any leading batch dims (e.g. the window axis of the
        # grouped affine MSM): coords are (NL, *batch, m)
        def lead_shape(x):
            while isinstance(x, tuple):
                x = x[0]
            return x.shape[1:-1]

        inf = CRV.inf_point(ops, lead_shape(S[0]) + (m2 - m,))

        def cat(a, b):
            if isinstance(a, tuple):
                return tuple(cat(x, y) for x, y in zip(a, b))
            return jnp.concatenate([a, b], axis=-1)

        S = tuple(cat(cs, ci) for cs, ci in zip(S, inf))

    def body(i, x):
        half = jnp.int32(m2) >> (i + 1)
        # after step i, lanes [0, m2 / 2^(i+1)) hold the reduction
        return CRV.jac_add(ops, x, _point_roll(x, -half))

    P = jax.lax.fori_loop(0, m2.bit_length() - 1, body, S)
    return slice_pt(P, 0, 1)


def _msm_window_body(ops, pts, order, keys, c: int):
    """One c-bit window over HOST-PRESORTED digits: `order` permutes the
    points into key order, `keys` are the sorted digits (device sorts are
    the slowest primitive on TPU — numpy's argsort of the host-resident
    digit matrix is orders of magnitude cheaper)."""
    X, Y, Z = pts

    def g(xx):
        if isinstance(xx, tuple):
            return tuple(g(x) for x in xx)
        return xx[:, order]

    buckets = _segmented_bucket_sums(ops, (g(X), g(Y), Z), keys, 1 << c)
    return _weighted_bucket_reduce(ops, buckets, 1 << c)


# One window as ONE compiled program (kept for utils/checkpoint.py's
# per-window resumable MSM).
_msm_window_sorted = functools.partial(jax.jit, static_argnums=(0, 4))(
    _msm_window_body)


def _msm_window_dev(ops, pts, dw, c: int):
    dw = np.asarray(dw)
    order = np.argsort(dw, kind="stable").astype(np.int32)
    return _msm_window_sorted(ops, pts, jnp.asarray(order),
                              jnp.asarray(dw[order].astype(np.int32)), c)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_all_windows(ops, pts, orders_keys, c: int):
    """ALL windows of one MSM as a single program: `lax.scan` over the
    host-presorted (windows, N) order/key matrices reuses the one window
    body, so there is one XLA compile per (ops, N, c) shape, one device
    dispatch per MSM, and one device->host transfer for every window
    total (eager per-op dispatch through the device tunnel dominates
    wall-clock otherwise)."""
    def step(carry, ok):
        order, keys = ok
        return carry, _msm_window_body(ops, pts, order, keys, c)

    _, totals = jax.lax.scan(step, 0, orders_keys)
    return totals    # point coords with leading (windows, ...) batch


def msm(curve, points_affine, scalars: list[int], c: int = 16,
        group: str = "g1", device=None):
    """points_affine: list of host affine points (no infinities) or
    pre-encoded device coords; scalars: host ints. Returns host affine.
    `device` commits the arrays to a specific device (computation follows
    data placement — used by `parallel/msm.py`)."""
    from ..fields import curves as CV

    fr = curve.fr
    if group == "g1":
        ops = CRV.FqOps(curve.fq)
        host_add = lambda a, b: CV.g1_add(curve, a, b)
        host_mul = lambda a, k: CV.g1_mul(curve, a, k)
    else:
        ops = CRV.Fq2Ops(curve.fq)
        host_add = lambda a, b: CV.g2_add(curve, a, b)
        host_mul = lambda a, k: CV.g2_mul(curve, a, k)

    n = len(scalars)
    assert n == len(points_affine) and n > 0
    windows = -(-fr.bits // c)

    # pad N to the next power of two so every MSM size reuses one of a few
    # compiled programs (pad scalars are 0: every digit lands in bucket 0,
    # which the weighted reduce excludes)
    n2 = 1 << (n - 1).bit_length() if n > 1 else 1
    points_affine = list(points_affine) + [points_affine[0]] * (n2 - n)
    scalars = list(scalars) + [0] * (n2 - n)
    digits = _digits_host(scalars, c, windows)

    X = ops.encode([pt[0] for pt in points_affine])
    Y = ops.encode([pt[1] for pt in points_affine])
    Z = ops.ones((n2,))

    orders = np.argsort(digits, axis=1, kind="stable").astype(np.int32)
    keys = np.take_along_axis(digits, orders, axis=1).astype(np.int32)
    ok = (jnp.asarray(orders), jnp.asarray(keys))
    if device is not None:
        X, Y, Z = jax.device_put((X, Y, Z), device)
        ok = jax.device_put(ok, device)
    totals = _msm_all_windows(ops, (X, Y, Z), ok, c)

    def unstack(x):
        # (windows, NL, 1) -> (NL, windows)
        if isinstance(x, tuple):
            return tuple(unstack(xx) for xx in x)
        return jnp.transpose(x, (1, 0, 2)).reshape(x.shape[1], windows)

    window_results = CRV.to_affine_host(ops, tuple(unstack(t)
                                                   for t in totals))

    # host Horner combine across windows
    acc = None
    for w in reversed(range(windows)):
        if acc is not None:
            acc = host_mul(acc, 1 << c)
        acc = host_add(acc, window_results[w])
    return acc


def fixed_base_exp_batch(curve, base, scalars: list[int], c: int = 8,
                         group: str = "g1") -> list:
    """Windowed fixed-base batch exponentiation: [s_i * base for s_i].

    Role of `algebra::get_window_table` + `batch_exp`
    (`generator.hpp (gg):163-229`): the per-window tables are built host-side
    once (windows * 2^c small group ops), then each output point is the sum
    of `windows` table entries — gathered by digit and combined with
    branch-free batched Jacobian adds on device."""
    from ..fields import curves as CV
    import jax.numpy as jnp

    fr = curve.fr
    n = len(scalars)
    if n == 0:
        return []
    windows = -(-fr.bits // c)
    digits = _digits_host(scalars, c, windows)

    if group == "g1":
        ops = CRV.FqOps(curve.fq)
        hadd, hmul = CV.g1_add, CV.g1_mul
    else:
        ops = CRV.Fq2Ops(curve.fq)
        hadd, hmul = CV.g2_add, CV.g2_mul

    # host window tables: T[w][d] = d * 2^(cw) * base
    tables = []
    base_w = base
    for w in range(windows):
        row = [None]
        cur = None
        for _ in range((1 << c) - 1):
            cur = hadd(curve, cur, base_w)
            row.append(cur)
        tables.append(row)
        for _ in range(c):
            base_w = hadd(curve, base_w, base_w)

    # encode tables as device coord arrays with Z=0 marking infinity
    def enc_table(row):
        if group == "g1":
            xs = ops.encode([pt[0] if pt else 0 for pt in row])
            ys = ops.encode([pt[1] if pt else 0 for pt in row])
        else:
            xs = ops.encode([pt[0] if pt else (0, 0) for pt in row])
            ys = ops.encode([pt[1] if pt else (0, 0) for pt in row])
        zmask = np.array([0 if pt is None else 1 for pt in row],
                         dtype=np.uint32)
        return xs, ys, zmask

    enc = [enc_table(row) for row in tables]

    def stack(parts):
        if isinstance(parts[0], tuple):
            return tuple(stack([p[i] for p in parts])
                         for i in range(len(parts[0])))
        return jnp.stack([jnp.asarray(p) for p in parts])

    xs = stack([e[0] for e in enc])          # (windows, NL, 2^c) [tuples]
    ys = stack([e[1] for e in enc])
    zm = jnp.stack([jnp.asarray(e[2]) for e in enc])
    dg = jnp.asarray(digits.astype(np.int32))
    # XLA:CPU compiles Jacobian-add programs slowly (~minutes); for small
    # batches on the CPU test platform the eager per-op path is cheaper
    # than one fused compile. On accelerators always fuse: per-op dispatch
    # through the device tunnel dominates wall-clock.
    if jax.default_backend() == "cpu" and n < 256:
        scan_fn = functools.partial(_fixed_base_scan_eager, ops)
    else:
        scan_fn = functools.partial(_fixed_base_scan, ops)
    acc = scan_fn(xs, ys, zm, dg)
    return CRV.to_affine_host(ops, acc)


def _fixed_base_scan_eager(ops, xs, ys, zmask, digits):
    n = digits.shape[1]
    acc = CRV.inf_point(ops, (n,))
    one = ops.ones((n,))
    zero = ops.zeros((n,))
    for w in range(digits.shape[0]):
        dw = digits[w]

        def g(coord):
            if isinstance(coord, tuple):
                return tuple(g(c2) for c2 in coord)
            return coord[:, dw]

        def pick(coord):
            if isinstance(coord, tuple):
                return tuple(pick(c2) for c2 in coord)
            return coord[w]

        pz = ops.select(zmask[w][dw] > 0, one, zero)
        acc = CRV.jac_add(ops, acc, (g(pick(xs)), g(pick(ys)), pz))
    return acc


@functools.partial(jax.jit, static_argnums=0)
def _fixed_base_scan(ops, xs, ys, zmask, digits):
    """All windows of the fixed-base batch exponentiation as ONE program
    (`lax.scan` over window tables + digit rows; one batched Jacobian add
    per step) — eager per-window dispatch through the device tunnel
    dominated keygen wall-clock otherwise."""
    n = digits.shape[1]
    acc = CRV.inf_point(ops, (n,))
    one = ops.ones((n,))
    zero = ops.zeros((n,))

    def step(acc, wargs):
        x_t, y_t, zm, dw = wargs

        def g(coord):
            if isinstance(coord, tuple):
                return tuple(g(c2) for c2 in coord)
            return coord[:, dw]

        pz = ops.select(zm[dw] > 0, one, zero)
        return CRV.jac_add(ops, acc, (g(x_t), g(y_t), pz)), None

    acc, _ = jax.lax.scan(step, acc, (xs, ys, zmask, digits))
    return acc


def msm_host(curve, points_affine, scalars, group: str = "g1"):
    """Host oracle (double-and-add), for tests."""
    from ..fields import curves as CV
    add = CV.g1_add if group == "g1" else CV.g2_add
    mul = CV.g1_mul if group == "g1" else CV.g2_mul
    acc = None
    for pt, s in zip(points_affine, scalars):
        acc = add(curve, acc, mul(curve, pt, s))
    return acc
