"""Batched-affine Pippenger MSM — the round-2 performance core.

TPU-native replacement for `algebra::multiexp<multiexp_method_BDLO12>`
(SURVEY.md §2.0; reference driver `prover.hpp (gg):108-139`). The round-1
segmented-scan MSM (`ops/msm.py`) spends O(N log K) *Jacobian* adds
(~34 field muls each) per window; this module restructures bucket
accumulation so a window costs ~2N *affine* adds at ~10 field muls each
(incl. a shared work-efficient batch inversion), a ~30x reduction in
multiplication work:

- scalars are recoded into SIGNED 16-bit digits (one digit per 16-bit
  scalar limb, negative digits negate the point), halving the bucket count;
- per window, points are grouped by bucket with an ON-DEVICE 1-bit LSD
  radix sort (16 passes of int32 cumsum + scatter — no host sort, no
  per-window index shipping through the device tunnel);
- bucket sums form by log2(N) HALVING PASSES: in sorted order, the element
  with even in-bucket rank pairs with its right neighbour; all pairs add
  with the shared-inversion affine formula; survivors compact with a
  cumsum scatter. Pass sizes shrink on a static schedule (correct for any
  digit skew, including all-equal scalars);
- the weighted bucket merge sum_j j*B_j is split j = 256*hi + lo so the
  big grid reduces with cheap affine tree-reductions and only two tiny
  (129/256-lane) Jacobian weighted scans remain.

Everything per MSM is ONE jitted program (lax.scan over windows; fori
loops with dynamic roll distances inside — the eager tunnel dispatch and
unrolled-scan graph blowups are the two classic failure modes here).

Works for G1 (FqOps) and G2 (Fq2Ops) on a=0 curves (bls12-381,
alt_bn128). MNT (a != 0) stays on the host path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import FieldSpec
from . import curve as CRV
from . import limbs as L

I32 = jnp.int32
_DEAD = 0xFFFF          # sorts after every live bucket (16-bit radix)
_GRID_LO = 256          # j = 256*hi + lo bucket-merge split
_GRID_HI = 129          # buckets 0..2^15 -> hi in 0..128
_GRID = _GRID_LO * _GRID_HI
_INV_CHUNK = 64         # sequential-chunk width of the batched inversion


# ---------------------------------------------------------------------------
# small tree helpers (coords are arrays for Fq, tuples of arrays for Fq2)
# ---------------------------------------------------------------------------

def _tmap(f, *xs):
    if isinstance(xs[0], tuple):
        return tuple(_tmap(f, *parts) for parts in zip(*xs))
    return f(*xs)


def _roll(x, d, axis=-1):
    return _tmap(lambda a: jnp.roll(a, d, axis=axis), x)


def _take(x, idx, axis=-1):
    return _tmap(lambda a: jnp.take(a, idx, axis=axis), x)


def _slice_last(x, n):
    return _tmap(lambda a: a[..., :n], x)


def _scatter_last(dst, idx, src):
    return _tmap(lambda d, s: d.at[..., idx].set(s), dst, src)


# ---------------------------------------------------------------------------
# field-ops veneer additions (single-element inverse, generic over Fq/Fq2)
# ---------------------------------------------------------------------------

def _inv_one(ops, x):
    """Fermat inverse of a small batch (used once per pass on the total
    product of the batch-inversion). Fq2 inverts via the norm map."""
    if isinstance(ops, CRV.Fq2Ops):
        a, b = x
        fs = ops.fs
        norm = L.add(fs, L.mont_mul(fs, a, a), L.mont_mul(fs, b, b))
        ninv = L.inv(fs, norm)
        return (L.mont_mul(fs, a, ninv),
                L.mont_mul(fs, L.neg(fs, b), ninv))
    return L.inv(ops.fs, x)


def _prefix_ex_roll(ops, t, length, reverse=False):
    """EXCLUSIVE prefix (or suffix) products along the last axis via
    Hillis-Steele doubling with a DYNAMIC roll distance (one mul in the
    compiled graph). `length` is static."""
    idx = jnp.arange(length)

    def body(k, acc):
        d = jnp.left_shift(jnp.int32(1), k)
        if reverse:
            shifted = _roll(acc, -d)
            m = idx < (length - d)
        else:
            shifted = _roll(acc, d)
            m = idx >= d
        comb = ops.mul(acc, shifted)
        return ops.select(m, comb, acc)

    nlog = max((length - 1).bit_length(), 1)
    incl = jax.lax.fori_loop(0, nlog, body, t)
    one = ops.ones(_shape_of(ops, t))
    if reverse:
        ex = _roll(incl, -1)
        return ops.select(idx == length - 1, one, ex)
    ex = _roll(incl, 1)
    return ops.select(idx == 0, one, ex)


def _shape_of(ops, t):
    if isinstance(t, tuple):
        return _shape_of(ops, t[0])
    return t.shape[1:]


def _batch_inverse_chunked(ops, x, size: int):
    """Work-efficient batched inversion along the last axis: sequential
    chunk cumprods (lax.scan, O(S) muls) + a small Hillis-Steele over chunk
    totals + ONE Fermat inversion. ~4 muls/element versus the ~2 log S of a
    plain doubling scan. Assumes every element is nonzero (callers select 1
    into unused lanes). `size` must be a multiple of the chunk width."""
    K = _INV_CHUNK
    while size % K:
        K //= 2
    C = size // K

    def resh(a):
        return a.reshape(a.shape[:-1] + (C, K))

    xr = _tmap(resh, x)
    # move chunk-position axis first for lax.scan: (K, NL, C) views
    def tofront(a):
        return jnp.moveaxis(a, -1, 0)

    xs = _tmap(tofront, xr)

    def fwd(carry, xt):
        return ops.mul(carry, xt), carry          # emit EXCLUSIVE prefix

    def bwd(carry, xt):
        return ops.mul(carry, xt), carry          # run reversed for suffix

    one_c = ops.ones((C,))
    tot_f, f_ex = jax.lax.scan(fwd, one_c, xs)          # tot_f: chunk products
    _, g_ex_rev = jax.lax.scan(bwd, one_c, xs, reverse=True)
    f_ex = _tmap(lambda a: jnp.moveaxis(a, 0, -1), f_ex)       # (NL, C, K)
    g_ex = _tmap(lambda a: jnp.moveaxis(a, 0, -1), g_ex_rev)

    # chunk-level exclusive prefix/suffix + global inverse
    tpre_ex = _prefix_ex_roll(ops, tot_f, C)
    tsuf_ex = _prefix_ex_roll(ops, tot_f, C, reverse=True)
    # full product = (exclusive prefix * own) at the last chunk
    tot_all = ops.mul(_take(tpre_ex, jnp.array([C - 1])),
                      _take(tot_f, jnp.array([C - 1])))
    tot_inv = _inv_one(ops, tot_all)
    chunk_term = ops.mul(ops.mul(tpre_ex, tsuf_ex), tot_inv)   # (.., C)

    def bcast(a):
        return a[..., None]

    inv = ops.mul(ops.mul(f_ex, g_ex), _tmap(bcast, chunk_term))
    return _tmap(lambda a: a.reshape(a.shape[:-2] + (size,)), inv)


# ---------------------------------------------------------------------------
# affine pair combine (shared-inversion add, branch-free edge handling)
# ---------------------------------------------------------------------------

def _pair_denominator(ops, A, B):
    """Denominator of the affine chord/tangent slope for A+B, with 1
    selected into lanes whose inverse is unused (infinity operands,
    P + (-P) cancellations). Returns (den, aux) for `_pair_combine`."""
    ax, ay, ainf = A
    bx, by, binf = B
    dx = ops.sub(bx, ax)
    dy = ops.sub(by, ay)
    x_eq = ops.is_zero(dx)
    y_eq = ops.is_zero(dy)
    dbl = x_eq & y_eq
    vanish = x_eq & ~y_eq
    den = ops.select(dbl, ops.dbl(ay), dx)
    unused = ainf | binf | vanish
    den = ops.select(unused, ops.ones(_shape_of(ops, ax)), den)
    return den, (dy, dbl, vanish)


def _pair_combine(ops, A, B, inv_den, aux):
    """A + B given the batched inverse of the slope denominator.
    4 muls/lane (a = 0 curves: tangent numerator 3x^2)."""
    ax, ay, ainf = A
    bx, by, binf = B
    dy, dbl, vanish = aux
    x2 = ops.sqr(ax)
    num = ops.select(dbl, ops.add(ops.dbl(x2), x2), dy)
    lam = ops.mul(num, inv_den)
    x3 = ops.sub(ops.sub(ops.sqr(lam), ax), bx)
    y3 = ops.sub(ops.mul(lam, ops.sub(ax, x3)), ay)
    both = ainf & binf
    live_pair = ~ainf & ~binf
    rx = ops.select(ainf, bx, ops.select(binf | vanish, ax, x3))
    ry = ops.select(ainf, by, ops.select(binf | vanish, ay, y3))
    rinf = both | (vanish & live_pair)
    return (rx, ry, rinf)


# ---------------------------------------------------------------------------
# device radix sort (1-bit LSD, 16 passes) + rank computation
# ---------------------------------------------------------------------------

def _bitonic_sort(keys):
    """Ascending sort of (N,) int32 keys, N a power of two; returns
    (sorted_keys, perm). Bitonic network where every compare-exchange
    partner is fetched with two dynamic `jnp.roll`s + a select — TPU
    scatters run ~1 element/cycle, so the classic LSD-radix scatter sort
    costs ~75 ns/element/pass; rolls are contiguous copies and the whole
    log²(N)/2-stage network runs as ONE fori_loop body (~10 ops)."""
    n = keys.shape[0]
    perm0 = jnp.arange(n, dtype=I32)
    i = jnp.arange(n, dtype=I32)
    ds, bs = [], []
    for k in range(max(n.bit_length() - 1, 1)):
        for j in range(k, -1, -1):
            ds.append(1 << j)
            bs.append(1 << (k + 1))
    dtab = jnp.asarray(ds, I32)
    btab = jnp.asarray(bs, I32)

    def stage(s, carry):
        key, ix = carry
        d = dtab[s]
        blk = btab[s]
        lo = (i & d) == 0
        pk = jnp.where(lo, jnp.roll(key, -d), jnp.roll(key, d))
        px = jnp.where(lo, jnp.roll(ix, -d), jnp.roll(ix, d))
        asc = (i & blk) == 0
        take = jnp.where(asc == lo, pk < key, pk > key)
        return (jnp.where(take, pk, key), jnp.where(take, px, ix))

    return jax.lax.fori_loop(0, len(ds), stage, (keys, perm0))


def _ranks(sorted_keys):
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=I32)
    heads = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    starts = jax.lax.cummax(jnp.where(heads, idx, 0))
    return idx - starts


# ---------------------------------------------------------------------------
# halving passes
# ---------------------------------------------------------------------------

def _one_pass(ops, state, size: int):
    """One halving pass at static `size`: pair even-rank elements with
    their right neighbour (same bucket), batched-affine add, compact
    survivors with a cumsum scatter. DEAD lanes carry bucket _DEAD."""
    x, y, inf, bucket, rank = state
    idx = jnp.arange(size, dtype=I32)
    nb = jnp.roll(bucket, -1)
    nxt = (_roll(x, -1), _roll(y, -1), jnp.roll(inf, -1))
    same = (bucket == nb) & (bucket != _DEAD) & (idx < size - 1)
    leader = same & (rank % 2 == 0)

    A = (x, y, inf)
    den, aux = _pair_denominator(ops, A, nxt)
    den = ops.select(leader, den, ops.ones((size,)))
    inv_den = _batch_inverse_chunked(ops, den, size)
    rx, ry, rinf = _pair_combine(ops, A, nxt, inv_den, aux)

    new_x = ops.select(leader, rx, x)
    new_y = ops.select(leader, ry, y)
    new_inf = jnp.where(leader, rinf, inf)

    survivor = (bucket != _DEAD) & (rank % 2 == 0)
    pos_incl = jnp.cumsum(survivor.astype(I32))
    pos = jnp.where(survivor, pos_incl - 1, size)    # size = dummy slot

    def dead_like(a):
        return jnp.zeros(a.shape[:-1] + (size + 1,), a.dtype)

    out_x = _scatter_last(_tmap(dead_like, new_x), pos, new_x)
    out_y = _scatter_last(_tmap(dead_like, new_y), pos, new_y)
    out_inf = jnp.ones((size + 1,), bool).at[pos].set(new_inf)
    out_bucket = jnp.full((size + 1,), _DEAD, I32).at[pos].set(bucket)
    out_rank = jnp.zeros((size + 1,), I32).at[pos].set(rank >> 1)
    return (_slice_last(out_x, size), _slice_last(out_y, size),
            out_inf[:size], out_bucket[:size], out_rank[:size])


def _pass_schedule(n: int):
    """Static (size, n_passes) groups. Live count after k passes is at most
    n/2^k + (#nonempty buckets) <= n/2^k + 2^15+1, so pass-array sizes
    shrink on that bound — but only when the bound has at least halved the
    current size, which caps the number of distinct compiled pass shapes at
    ~4. ceil(log2 n) passes collapse every bucket even for fully skewed
    digits (all scalars equal)."""
    total = max((n - 1).bit_length(), 1)
    floor = _GRID + 256
    groups = []
    size = n
    for k in range(total):
        bound = min(n, (n >> (k + 1)) + floor)
        bound = -(-bound // 256) * 256
        if bound <= size // 2:
            size_next = bound
        else:
            size_next = size
        if groups and groups[-1][0] == size:
            groups[-1] = (size, groups[-1][1] + 1)
        else:
            groups.append((size, 1))
        size = size_next
    return tuple(groups)


# ---------------------------------------------------------------------------
# bucket-grid merge: sum_j j*B_j with j = 256*hi + lo
# ---------------------------------------------------------------------------

def _tree_reduce_axis(ops, G, axis_len: int, axis: int):
    """In-place binary tree reduction along `axis` (static length) of the
    (hi, lo) affine grid; lane 0 of the axis ends up holding the total.
    fori with dynamic roll distance: one combine in the graph."""
    x, y, inf = G
    nlog = max((axis_len - 1).bit_length(), 1)
    idx_shape = [1, 1]
    idx_shape[axis] = axis_len
    idx = jnp.arange(axis_len).reshape(idx_shape)

    def body(k, st):
        cx, cy, cinf = st
        d = jnp.left_shift(jnp.int32(1), k)
        px = _roll(cx, -d, axis=axis - 2)   # coord arrays are (NL, hi, lo)
        py = _roll(cy, -d, axis=axis - 2)
        pinf = jnp.roll(cinf, -d, axis=axis)
        active = ((idx % jnp.left_shift(jnp.int32(2), k)) == 0) \
            & (idx + d < axis_len)
        active = jnp.broadcast_to(active, cinf.shape)
        A = (cx, cy, cinf)
        B = (px, py, pinf | ~active)        # inactive partner = infinity
        den, aux = _pair_denominator(ops, A, B)
        size = cinf.shape[0] * cinf.shape[1]

        def flat(a):
            return a.reshape(a.shape[:-2] + (size,))

        inv_den = _batch_inverse_chunked(ops, _tmap(flat, den), size)
        inv_den = _tmap(lambda a: a.reshape(a.shape[:-1] + cinf.shape), inv_den)
        rx, ry, rinf = _pair_combine(ops, A, B, inv_den, aux)
        keep = jnp.broadcast_to((idx % jnp.left_shift(jnp.int32(2), k)) == 0,
                                cinf.shape)
        return (ops.select(keep, rx, cx), ops.select(keep, ry, cy),
                jnp.where(keep, rinf, cinf))

    return jax.lax.fori_loop(0, nlog, body, (x, y, inf))


def _jacobianize(ops, x, y, inf):
    z = ops.select(inf, ops.zeros(_shape_of(ops, x)),
                   ops.ones(_shape_of(ops, x)))
    return (x, y, z)


def _weighted_small(ops, pts_jac, m: int):
    """sum_{k=0}^{m-1} k * P_k over a small (m <= 256) Jacobian batch via
    the existing suffix-scan weighted reduce (ops/msm.py)."""
    from .msm import _weighted_bucket_reduce

    def pad(a):
        padw = [(0, 0)] * (a.ndim - 1) + [(0, 1)]
        return jnp.pad(a, padw)

    padded = tuple(_tmap(pad, c) for c in pts_jac)   # + dump slot
    return _weighted_bucket_reduce(ops, padded, m)


# ---------------------------------------------------------------------------
# digit recode
# ---------------------------------------------------------------------------

def _signed_digits(nl: int, limbs):
    """(NL, N) uint32 16-bit scalar limbs -> (NL, N) int32 signed digits in
    [-2^15, 2^15] with carry rippling upward; the top window keeps its
    (small) unsigned value so no carry escapes."""
    n = limbs.shape[1]
    digs = []
    carry = jnp.zeros((n,), I32)
    for w in range(nl):
        v = limbs[w].astype(I32) + carry
        if w == nl - 1:
            digs.append(v)
            break
        hot = v >= (1 << 15)
        digs.append(jnp.where(hot, v - (1 << 16), v))
        carry = hot.astype(I32)
    return jnp.stack(digs)


# ---------------------------------------------------------------------------
# the single-program MSM
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_affine_program(ops, coords, scalar_limbs, schedule):
    """coords: (X, Y, Yneg) affine Montgomery limb planes, batch N.
    scalar_limbs: (W, N) uint32 16-bit plain limbs. Returns per-window
    Jacobian points with leading (W,) batch."""
    X, Y, Yneg = coords
    n = scalar_limbs.shape[1]
    sdig = _signed_digits(scalar_limbs.shape[0], scalar_limbs)

    YY = _tmap(lambda a, b: jnp.concatenate([a, b], axis=-1), Y, Yneg)

    def window(carry, sw):
        bucket0 = jnp.abs(sw)
        bucket0 = jnp.where(bucket0 == 0, _DEAD, bucket0)
        keys, perm = _bitonic_sort(bucket0)
        rank = _ranks(keys)
        sign = (sw < 0).astype(I32)
        xs = _take(X, perm)
        ys = _take(YY, perm + n * sign[perm])
        inf = keys == _DEAD
        state = (xs, ys, inf, keys, rank)
        for (size, n_passes) in schedule:
            state = (_slice_last(state[0], size), _slice_last(state[1], size),
                     state[2][:size], state[3][:size], state[4][:size])
            if n_passes == 1:
                state = _one_pass(ops, state, size)
            else:
                state = jax.lax.fori_loop(
                    0, n_passes, lambda _, st: _one_pass(ops, st, size),
                    state)
        x, y, inf, bucket, rank = state

        # dense (hi, lo) grid scatter: bucket j -> (j >> 8, j & 255)
        tgt = jnp.where(bucket == _DEAD, _GRID, bucket)

        def grid_like(a):
            return jnp.zeros(a.shape[:-1] + (_GRID + 1,), a.dtype)

        gx = _scatter_last(_tmap(grid_like, x), tgt, x)
        gy = _scatter_last(_tmap(grid_like, y), tgt, y)
        ginf = jnp.ones((_GRID + 1,), bool).at[tgt].set(inf)
        gx = _tmap(lambda a: a[..., :_GRID].reshape(
            a.shape[:-1] + (_GRID_HI, _GRID_LO)), gx)
        gy = _tmap(lambda a: a[..., :_GRID].reshape(
            a.shape[:-1] + (_GRID_HI, _GRID_LO)), gy)
        ginf = ginf[:_GRID].reshape(_GRID_HI, _GRID_LO)

        # C_hi = sum_lo B[hi, lo]  (reduce lo axis)
        cx, cy, cinf = _tree_reduce_axis(ops, (gx, gy, ginf), _GRID_LO, 1)
        C_hi = _jacobianize(ops, _tmap(lambda a: a[..., 0], cx),
                            _tmap(lambda a: a[..., 0], cy), cinf[..., 0])
        # D_lo = sum_hi B[hi, lo]  (reduce hi axis)
        dx, dy, dinf = _tree_reduce_axis(ops, (gx, gy, ginf), _GRID_HI, 0)
        D_lo = _jacobianize(
            ops,
            _tmap(lambda a: jnp.take(a, 0, axis=-2), dx),
            _tmap(lambda a: jnp.take(a, 0, axis=-2), dy), dinf[0])

        W_hi = _weighted_small(ops, C_hi, _GRID_HI)     # sum hi * C_hi
        W_lo = _weighted_small(ops, D_lo, _GRID_LO)     # sum lo * D_lo

        # total = 256 * W_hi + W_lo
        def dbl_body(_, P):
            return CRV.jac_double(ops, P)

        W_hi = jax.lax.fori_loop(0, 8, dbl_body, W_hi)
        total = CRV.jac_add(ops, W_hi, W_lo)
        return carry, total

    _, totals = jax.lax.scan(window, 0, sdig)
    return totals


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

class MSMBases:
    """Device-resident encoded bases, reusable across MSMs (Groth16 proving
    keys issue many MSMs over the same query vectors; re-encoding and
    re-uploading 10^6 points per proof would dominate wall-clock)."""

    def __init__(self, curve, points_affine, group: str = "g1"):
        self.curve = curve
        self.group = group
        self.n = len(points_affine)
        fsq = curve.fq
        self.ops = CRV.FqOps(fsq) if group == "g1" else CRV.Fq2Ops(fsq)
        n2 = max(512, 1 << (self.n - 1).bit_length() if self.n > 1 else 1)
        # infinity bases (e.g. [0]G entries of a Groth16 A_query) carry no
        # contribution: stand in any finite point and force their scalars
        # to zero at run() time — zero scalars land in the DEAD bucket.
        self._inf_pos = {i for i, pt in enumerate(points_affine)
                         if pt is None}
        filler = next((pt for pt in points_affine if pt is not None), None)
        if filler is None:
            filler = (curve.g1 if group == "g1" else curve.g2)
        pts = [pt if pt is not None else filler for pt in points_affine]
        pts = pts + [filler] * (n2 - self.n)
        X = self.ops.encode([pt[0] for pt in pts])
        Y = self.ops.encode([pt[1] for pt in pts])
        self.X = _tmap(jnp.asarray, X)
        self.Y = _tmap(jnp.asarray, Y)
        self.Yneg = self.ops.neg(self.Y)
        self.n2 = n2

    def run(self, scalars: list[int]):
        curve = self.curve
        fr = curve.fr
        scalars = [s % fr.p for s in scalars]
        assert len(scalars) <= self.n
        if self._inf_pos:
            scalars = [0 if i in self._inf_pos else s
                       for i, s in enumerate(scalars)]
        scalars = scalars + [0] * (self.n2 - len(scalars))
        limbs = jnp.asarray(L.pack_ints(fr, scalars))
        schedule = _pass_schedule(self.n2)
        totals = _msm_affine_program(self.ops, (self.X, self.Y, self.Yneg),
                                     limbs, schedule)
        return _combine_windows(curve, self.ops, totals, self.group)


def _combine_windows(curve, ops, totals, group):
    from ..fields import curves as CV
    windows = curve.fr.nl

    # totals coords have shape (W, NL, 1); flatten to (NL, W)
    def flat(x):
        if isinstance(x, tuple):
            return tuple(flat(xx) for xx in x)
        return jnp.transpose(x, (1, 0, 2)).reshape(x.shape[1], windows)

    pts = CRV.to_affine_host(ops, tuple(flat(t) for t in totals))
    host_add = (lambda a, b: CV.g1_add(curve, a, b)) if group == "g1" \
        else (lambda a, b: CV.g2_add(curve, a, b))
    host_mul = (lambda a, k: CV.g1_mul(curve, a, k)) if group == "g1" \
        else (lambda a, k: CV.g2_mul(curve, a, k))
    acc = None
    for w in reversed(range(windows)):
        if acc is not None:
            acc = host_mul(acc, 1 << 16)
        acc = host_add(acc, pts[w])
    return acc


def msm_affine(curve, points_affine, scalars: list[int],
               group: str = "g1"):
    """One-shot MSM over host affine points (no infinities). For repeated
    MSMs over the same bases build an `MSMBases` once and call `.run`."""
    bases = MSMBases(curve, points_affine, group)
    return bases.run(scalars)
