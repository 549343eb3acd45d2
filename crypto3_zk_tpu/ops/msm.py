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


def _segmented_bucket_sums(ops, points, keys, n_buckets: int):
    """points: (X, Y, Z) with batch N (sorted by key); keys: (N,) int32.
    Returns bucket points (X, Y, Z) with batch n_buckets+1 (last = dump)."""
    n = keys.shape[0]
    keys2 = keys[None, :]  # (1, N) so every leaf scans along axis -1

    def combine(a, b):
        same = (a["key"] == b["key"])[0]
        psum = CRV.jac_add(ops, a["pt"], b["pt"])
        pt = CRV.point_select(ops, same, psum, b["pt"])
        return {"pt": pt, "key": b["key"]}

    scanned = jax.lax.associative_scan(
        combine, {"pt": points, "key": keys2}, axis=-1)

    # segment ends: last occurrence of each key
    is_end = jnp.concatenate([keys[:-1] != keys[1:],
                              jnp.ones((1,), dtype=bool)])
    idx = jnp.where(is_end, keys, n_buckets)  # dump slot for non-ends

    bx, by, bz = CRV.inf_point(ops, (n_buckets + 1,))
    sx, sy, sz = scanned["pt"]

    def scatter(dst, src):
        if isinstance(dst, tuple):
            return tuple(scatter(d, s) for d, s in zip(dst, src))
        return dst.at[:, idx].set(src)

    return (scatter(bx, sx), scatter(by, sy), scatter(bz, sz))


def _weighted_bucket_reduce(ops, buckets, n_buckets: int):
    """sum_{k=1}^{K-1} k * B_k via suffix scan + tree reduce."""
    def slice_pt(P, lo, hi):
        def s(x):
            if isinstance(x, tuple):
                return tuple(s(xx) for xx in x)
            return x[..., lo:hi]
        return tuple(s(cmp) for cmp in P)

    B = slice_pt(buckets, 1, n_buckets)  # drop bucket 0 and dump slot

    def combine(a, b):
        return CRV.jac_add(ops, a, b)

    ndim = (B[0][0] if isinstance(B[0], tuple) else B[0]).ndim
    S = jax.lax.associative_scan(combine, B, axis=ndim - 1, reverse=True)

    # tree-reduce S over the bucket axis (pad to a power of two with
    # infinity so halving never broadcasts a ragged tail)
    m = n_buckets - 1
    m2 = 1 << (m - 1).bit_length() if m > 1 else 1
    if m2 != m:
        inf = CRV.inf_point(ops, (m2 - m,))

        def cat(a, b):
            if isinstance(a, tuple):
                return tuple(cat(x, y) for x, y in zip(a, b))
            return jnp.concatenate([a, b], axis=-1)

        S = tuple(cat(cs, ci) for cs, ci in zip(S, inf))
        m = m2
    P = S
    while m > 1:
        half = m // 2
        lo = slice_pt(P, 0, half)
        hi = slice_pt(P, half, m)
        P = CRV.jac_add(ops, lo, hi)
        m = half
    return P


def msm(curve, points_affine, scalars: list[int], c: int = 16,
        group: str = "g1"):
    """points_affine: list of host affine points (no infinities) or
    pre-encoded device coords; scalars: host ints. Returns host affine."""
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
    digits = _digits_host(scalars, c, windows)

    X = ops.encode([pt[0] for pt in points_affine])
    Y = ops.encode([pt[1] for pt in points_affine])
    Z = ops.ones((n,))

    window_results = []
    for w in range(windows):
        dw = jnp.asarray(digits[w].astype(np.int32))
        order = jnp.argsort(dw)
        keys = dw[order]

        def g(xx):
            if isinstance(xx, tuple):
                return tuple(g(x) for x in xx)
            return xx[:, order]

        pts = (g(X), g(Y), Z)
        buckets = _segmented_bucket_sums(ops, pts, keys, 1 << c)
        total = _weighted_bucket_reduce(ops, buckets, 1 << c)
        window_results.append(CRV.to_affine_host(ops, total)[0])

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

    acc = CRV.inf_point(ops, (n,))
    one = ops.ones((n,))
    zero = ops.zeros((n,))
    for w in range(windows):
        xs, ys, zmask = enc_table(tables[w])
        dw = jnp.asarray(digits[w].astype(np.int32))

        def g(coord):
            if isinstance(coord, tuple):
                return tuple(g(x) for x in coord)
            return coord[:, dw]

        zsel = jnp.asarray(zmask)[dw] > 0
        pz = ops.select(zsel, one, zero)
        acc = CRV.jac_add(ops, acc, (g(xs), g(ys), pz))
    return CRV.to_affine_host(ops, acc)


def msm_host(curve, points_affine, scalars, group: str = "g1"):
    """Host oracle (double-and-add), for tests."""
    from ..fields import curves as CV
    add = CV.g1_add if group == "g1" else CV.g2_add
    mul = CV.g1_mul if group == "g1" else CV.g2_mul
    acc = None
    for pt, s in zip(points_affine, scalars):
        acc = add(curve, acc, mul(curve, pt, s))
    return acc
