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
- all windows of a group flatten into one lane array keyed
  (window << 16) | bucket and sort with an on-device BITONIC network
  (rolls + selects; TPU scatter-based sorts are serial) — no host sort,
  no per-window index shipping through the device tunnel;
- bucket sums form by IN-PLACE HALVING PASSES: lanes never move after the
  sort; pass j pairs each lane whose in-bucket rank is a multiple of
  2^(j+1) with the lane 2^j positions to its right (ranks are contiguous
  per bucket, so the partner offset is position-uniform) and adds with the
  shared-inversion infinity-aware affine formula; cancelled pairs and
  consumed partners raise a dead (infinity) flag. One same-shape pass body
  runs under a dynamic `fori_loop` trip count (the true per-group bound
  k* from the host digit histogram). The round-2/3 design compacted
  survivors between passes — profiled on v5e at 2^22 lanes, the
  iota-scatter + padded coordinate gathers + per-pass rank/cumsum were
  ~400 ms of each 745 ms pass, which the in-place scheme removes (3
  contiguous rolls instead). Correct for any digit skew, including
  all-equal scalars;
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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import FieldSpec
from . import curve as CRV
from . import limbs as L

I32 = jnp.int32
_DEAD = 0x7FFFFFFF      # sorts after every live (window, bucket) key
_GRID_LO = 256          # bucket-1 = 256*hi + lo dense-grid split
_GRID_HI = 128          # buckets 1..2^15 -> (bkt-1)>>8 in 0..127
_WGRID = _GRID_LO * _GRID_HI        # 2^15 slots per window, slot = bkt-1
_INV_CHUNK = 64         # sequential-chunk width of the batched inversion


def _lanes_cap() -> int:
    """Max flattened (windows x points) lanes per group: bounds peak HBM
    (~6 coord-sized temporaries) while amortizing per-pass fixed latency
    over 8+ windows. Read lazily so ZK_TPU_MSM_LANES_CAP set after import
    (test monkeypatch, late-configuring driver) still takes effect. The
    2^23-lane program CRASHES the XLA:TPU memory-space-assignment pass
    ("Check failed: memory_space == existing_required_assignment->
    memory_space", reproduced 2026-08-19 on v5e at 2^20 points), so the
    default stays one notch below; raising the cap is a per-run opt-in."""
    return int(os.environ.get("ZK_TPU_MSM_LANES_CAP", str(1 << 22)))


def _pallas_inv_enabled() -> bool:
    """VMEM-resident batched-inversion chunk scans (ZK_TPU_PALLAS_INV=1).
    Off by default: in interpret mode the in-kernel fori_loops execute per
    python step, far too slow for the CPU oracle tests (the kernels have
    their own direct interpret unit test)."""
    return os.environ.get("ZK_TPU_PALLAS_INV", "") not in ("", "0")


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

    if (_pallas_inv_enabled() and not isinstance(x, tuple)
            and C % min(C, 128) == 0):
        # VMEM-resident chunk scans: the XLA lax.scans below round-trip
        # the carry through HBM on every one of the 2K steps
        from . import pallas_msm as PM
        interp = jax.default_backend() == "cpu"
        one_m = L.ones_mont(ops.fs, (1,))
        f_ex, g_ex, tot_f = PM.inv_scans_pallas(ops.fs, xr, one_m,
                                                interpret=interp)
        tpre_ex = _prefix_ex_roll(ops, tot_f, C)
        tsuf_ex = _prefix_ex_roll(ops, tot_f, C, reverse=True)
        tot_all = ops.mul(_take(tpre_ex, jnp.array([C - 1])),
                          _take(tot_f, jnp.array([C - 1])))
        tot_inv = _inv_one(ops, tot_all)
        chunk_term = ops.mul(ops.mul(tpre_ex, tsuf_ex), tot_inv)
        inv = PM.mul3_bcast_pallas(ops.fs, f_ex, g_ex, chunk_term,
                                   interpret=interp)
        return inv.reshape(x.shape)
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

def _inplace_pass(ops, x, y, dead, bucket, rank, j, size: int):
    """Pass j of the IN-PLACE halving schedule: every lane keeps its sorted
    position forever; pass j pairs each lane whose in-bucket rank is a
    multiple of 2^(j+1) with the lane 2^j positions to its right (same
    position offset for every bucket, because ranks are contiguous in the
    sorted order). Survivors stay where they are; consumed partners and
    cancelled pairs raise a `dead` (infinity) flag that the infinity-aware
    affine combine absorbs on later passes.

    Replaces the round-2/3 gather-compaction pass: the int32 iota-scatter +
    padded coordinate gathers + per-pass rank/cumsum bookkeeping cost
    ~400 ms of a 745 ms pass at 2^22 lanes (profiled on v5e 2026-08-20);
    the in-place pass is 3 contiguous rolls + the same batched-inverse +
    combine. `bucket`/`rank` are loop-invariant; `j` is traced (one pass
    body compiles for any trip count)."""
    d = jnp.left_shift(jnp.int32(1), j)
    idx = jnp.arange(size, dtype=I32)
    px = _roll(x, -d)
    py = _roll(y, -d)
    pdead = jnp.roll(dead, -d)
    pbucket = jnp.roll(bucket, -d)
    same = (bucket == pbucket) & (bucket != _DEAD) & (idx + d < size)
    leader = same & ((rank & (2 * d - 1)) == 0)

    A = (x, y, dead)
    B = (px, py, pdead | ~leader)      # non-leader lanes add infinity
    den, aux = _pair_denominator(ops, A, B)
    inv_den = _batch_inverse_chunked(ops, den, size)
    rx, ry, rinf = _pair_combine(ops, A, B, inv_den, aux)

    new_x = ops.select(leader, rx, x)
    new_y = ops.select(leader, ry, y)
    consumed = jnp.roll(leader, d) & (idx >= d)     # partner eaten by left
    new_dead = jnp.where(consumed, True, jnp.where(leader, rinf, dead))
    return new_x, new_y, new_dead


def _compact(x, y, dead, keys, out_size: int):
    """Compact live lanes to `out_size` lanes (static), preserving sorted
    bucket order; returns fresh (x, y, dead, keys, rank). Dead lanes drop,
    pad lanes are _DEAD. Runs BETWEEN pass segments: after j in-place
    passes a bucket of multiplicity m holds <= ceil(m/2^j) live lanes, so
    the total live count is provably <= ceil(size/2^j) + #occupied-buckets
    and the remaining passes can run at that fraction of the width (the
    in-place pass pays full-width field muls for dead lanes otherwise).
    Costs one int32 iota-scatter + coordinate gathers — worth it once the
    width drops 2x, not every pass (the round-2/3 every-pass compaction
    was ~400 ms of each 745 ms pass)."""
    in_size = keys.shape[0]
    idx = jnp.arange(in_size, dtype=I32)
    alive = ~dead
    pos_incl = jnp.cumsum(alive.astype(I32))
    pos = jnp.where(alive, pos_incl - 1, out_size)
    sel = jnp.full((out_size + 1,), in_size, I32).at[pos].set(idx)
    sel = sel[:out_size]

    def pad1(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])

    nx = _take(_tmap(pad1, x), sel)
    ny = _take(_tmap(pad1, y), sel)
    nkeys = jnp.pad(keys, (0, 1), constant_values=_DEAD)[sel]
    return nx, ny, nkeys == _DEAD, nkeys, _ranks(nkeys)


def _seg_width(size0: int, b_bound: int, j: int) -> int:
    """Provable live-lane bound after min(k*, j) in-place passes, rounded
    up to a multiple of 256: if k* >= j, live <= ceil(size0/2^j) + B; if
    k* < j every bucket is already fully reduced, live <= B <= this."""
    t = -(-size0 >> j) + b_bound
    return min(size0, -(-t // 256) * 256)


def _signed_digits_np(nl: int, limbs):
    """Host mirror of `_signed_digits` (numpy): (NL, N) uint32 16-bit limbs
    -> (NL, N) int32 signed digits. Used to compute the TRUE per-group pass
    count (`_pass_counts`) before dispatch."""
    out = limbs.astype(np.int32)             # one conversion, mutate below
    for w in range(nl - 1):
        v = out[w]
        hot = v >= (1 << 15)
        np.subtract(v, 1 << 16, out=v, where=hot)
        out[w + 1] += hot                    # carry ripples upward
    return out


def _pass_counts(sdig, g_cnt: int, wg: int) -> np.ndarray:
    """Per-group halving-pass counts: k* = ceil(log2(max bucket
    multiplicity)) over the group's (window, |digit|) keys. After k* passes
    every bucket holds <= 1 live lane, so the grid scatter is safe. The
    round-3 design ran a STATIC worst-case schedule (ceil(log2(n/wg))
    passes with compaction steps) — 16+ full-width passes even when
    buckets hold ~2 points (the n=2^16, c=16 regime), and 4-6 distinct
    pass shapes for XLA to compile. The host knows the scalars, so it
    computes the true bound (uniform scalars: 4-6 passes) and the program
    runs ONE same-shape pass body under a dynamic `fori_loop` trip count;
    adversarial all-equal scalars degrade to the old pass count, never
    correctness."""
    w_all, n = sdig.shape
    bucket = np.abs(sdig.astype(np.int64)).reshape(g_cnt, wg, n)
    key = (np.arange(g_cnt * wg, dtype=np.int64)
           .reshape(g_cnt, wg, 1) << 16) | bucket
    live = key[bucket != 0]                  # one pass over all groups
    counts = np.zeros(g_cnt, np.int32)
    if live.size:
        bc = np.bincount(live.ravel())
        span = wg << 16
        for g in range(g_cnt):
            m = int(bc[g * span:(g + 1) * span].max(initial=0))
            counts[g] = (m - 1).bit_length() if m > 1 else 0
    return counts


# ---------------------------------------------------------------------------
# bucket-grid merge: sum_b b*B_b with b-1 = 256*hi + lo
# ---------------------------------------------------------------------------

def _jac_reduce_axis(ops, P, axis_len: int, axis: int):
    """In-place binary tree reduction along NEGATIVE `axis` (static length)
    of a Jacobian point array (z = 0 marks infinity; leading dims are batch
    — e.g. the window axis); lane 0 of the axis ends up holding the total.
    fori with dynamic roll distance: ONE `jac_add` in the compiled graph —
    no batched inversion, so no sequential chunk-scan latency per level
    (the round-4 affine `_tree_reduce_axis` paid a 64-step lax.scan inverse
    at every level: ~57 ms/level, 915 ms per merged group on v5e)."""
    assert axis < 0
    x, y, z = P
    nlog = max((axis_len - 1).bit_length(), 1)
    idx_shape = [1] * (-axis)
    idx_shape[axis] = axis_len
    idx = jnp.arange(axis_len).reshape(idx_shape)

    def body(k, st):
        cx, cy, cz = st
        d = jnp.left_shift(jnp.int32(1), k)
        px = _roll(cx, -d, axis=axis)       # trailing dims align right, so
        py = _roll(cy, -d, axis=axis)       # the same negative axis works
        pz = _roll(cz, -d, axis=axis)       # for (NL, ...) coords too
        leader = ((idx % jnp.left_shift(jnp.int32(2), k)) == 0) \
            & (idx + d < axis_len)
        lead_b = jnp.broadcast_to(leader, _shape_of(ops, cx))
        pz = ops.select(lead_b, pz, ops.zeros(_shape_of(ops, cx)))
        rx, ry, rz = CRV.jac_add(ops, (cx, cy, cz), (px, py, pz))
        # non-leader lanes must KEEP their value: they are partners read by
        # later levels
        return (ops.select(lead_b, rx, cx), ops.select(lead_b, ry, cy),
                ops.select(lead_b, rz, cz))

    return jax.lax.fori_loop(0, nlog, body, (x, y, z))


def _take0(P, axis: int):
    def t(a):
        sl = [slice(None)] * a.ndim
        sl[axis + (a.ndim if axis < 0 else 0)] = 0
        return a[tuple(sl)]
    return _tmap(t, P[0]), _tmap(t, P[1]), _tmap(t, P[2])


def _jac_weighted_sum(ops, P, weights, nbits: int):
    """Σ_i w_i·P_i along the LAST axis (static int `weights`): per-lane
    double-and-add ladder (nbits steps, one jac_double + jac_add body)
    followed by one `_jac_reduce_axis`. Replaces the round-3/4 sequential
    Jacobian weighted scans — the merge's measured latency sink."""
    x, y, z = P
    n = len(weights)
    wb = jnp.asarray(np.asarray(weights, np.int32))
    shape = _shape_of(ops, x)
    acc = CRV.inf_point(ops, shape)

    def body(b, acc):
        acc2 = CRV.jac_double(ops, acc)
        bit = ((wb >> (nbits - 1 - b)) & 1) == 1
        bit = jnp.broadcast_to(bit, shape)
        pz = ops.select(bit, z, ops.zeros(shape))
        return CRV.jac_add(ops, acc2, (x, y, pz))

    acc = jax.lax.fori_loop(0, nbits, body, acc)
    return _take0(_jac_reduce_axis(ops, acc, n, -1), -1)


def _grid_merge(ops, G):
    """(…, wg, GRID_HI, GRID_LO) affine grid + inf flags -> per-window
    Jacobian total Σ_b b·B_b, where slot (hi, lo) holds bucket
    b = 256·hi + lo + 1. Decomposition:

        Σ_b b·B_b = 256·Σ_hi hi·C_hi + Σ_lo (lo+1)·D_lo

    with C_hi = Σ_lo B[hi,·] and D_lo = Σ_hi B[·,lo] the grid marginals.
    The marginals are plain log-depth Jacobian tree reductions over the
    full grid (8 + 7 levels); the weighted sums then run on the TINY
    129/256-lane marginals via `_jac_weighted_sum` ladders. Everything is
    jac_add-based — no batched inversions, so each level is one fused
    elementwise kernel instead of a 64-step scan, and the whole merge is
    3 small fori_loop bodies to compile (the round-4 stack2/expand/Horner
    pipeline was the program's dominant compile term)."""
    gx, gy, ginf = G
    shape = _shape_of(ops, gx)
    z = ops.select(ginf, ops.zeros(shape), ops.ones(shape))
    P = (gx, gy, z)

    C = _take0(_jac_reduce_axis(ops, P, _GRID_LO, -1), -1)   # (..., wg, HI)
    D = _take0(_jac_reduce_axis(ops, P, _GRID_HI, -2), -2)   # (..., wg, LO)
    SC = _jac_weighted_sum(ops, C, np.arange(_GRID_HI), 7)   # Σ hi·C_hi
    SD = _jac_weighted_sum(ops, D, np.arange(1, _GRID_LO + 1), 9)

    def dbl8(_, q):
        return CRV.jac_double(ops, q)

    SC = jax.lax.fori_loop(0, 8, dbl8, SC)                   # ×256
    return CRV.jac_add(ops, SC, SD)                # (NL, ..., wg) Jacobian


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

def _window_grouping(w: int, n: int) -> tuple[int, int]:
    """(n_groups, windows_per_group): flatten as many windows as fit the
    lane cap; wg always divides w (w = 16 scalar limbs -> wg a power of
    two)."""
    wg = max(1, min(w, _lanes_cap() // max(n, 1)))
    while w % wg:
        wg -= 1
    return w // wg, wg


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_affine_program(ops, coords, scalar_limbs, k_stars):
    """coords: (X, Y, Yneg) affine Montgomery limb planes, batch N.
    scalar_limbs: (W, N) uint32 16-bit plain limbs. k_stars: (g_cnt,)
    int32 per-group pass counts from `_pass_counts` (a TRACED argument:
    different scalar distributions reuse the compiled program). Returns
    per-window Jacobian coords of shape (NL, W).

    ALL windows of a group are flattened into one (wg*N,)-lane array keyed
    by (window << 16) | bucket and processed by ONE sort + ONE same-shape
    halving-pass fori_loop (dynamic trip count): per-pass fixed latencies
    (inverse scan steps, sort stages) amortize over wg windows instead of
    paying per window — the per-window formulation was latency-bound, not
    multiply-bound, at 2^16-2^20. The group scan emits the scattered
    bucket GRIDS and ONE `_grid_merge` batched over the group axis
    finishes all of them: the merge's tree levels are latency-bound
    (profiled 915 ms for a wg=4 grid on v5e — ~57 ms per 25 MB level),
    so G merges of width X cost ~G times more than one merge of width
    G*X."""
    X, Y, Yneg = coords
    w, n = scalar_limbs.shape
    sdig = _signed_digits(w, scalar_limbs)              # (W, N) int32
    g_cnt, wg = _window_grouping(w, n)
    size0 = wg * n

    YY = _tmap(lambda a, b: jnp.concatenate([a, b], axis=-1), Y, Yneg)
    wloc = jnp.arange(wg, dtype=I32)[:, None]

    def group(carry, sw_k):                             # sw: (wg, N)
        sw, k_star = sw_k
        bucket = jnp.abs(sw)
        key = jnp.where(bucket == 0, _DEAD,
                        (wloc << 16) | bucket).reshape(size0)
        sign = (sw < 0).astype(I32).reshape(size0)
        keys, perm = _bitonic_sort(key)
        pid = perm % n                                  # point index
        xs = _take(X, pid)
        ys = _take(YY, pid + n * sign[perm])
        rank = _ranks(keys)                             # computed ONCE
        dead0 = keys == _DEAD

        def run_passes(st, ks, rk, n_passes, width):
            return jax.lax.fori_loop(
                0, n_passes,
                lambda j, s: _inplace_pass(ops, s[0], s[1], s[2],
                                           ks, rk, j, width), st)

        # segmented schedule: 2 full-width passes, compact to the provable
        # live bound, 2 more, compact again, rest — uniform scalars pay
        # ~2.9 size0-widths of pass work instead of k* (7-9) of them
        b_bound = min(wg << 15, size0)
        t1 = _seg_width(size0, b_bound, 2)
        t2 = _seg_width(size0, b_bound, 4)
        st = (xs, ys, dead0)
        if t1 > size0 // 2:                             # compaction not worth it
            x, y, dead = run_passes(st, keys, rank, k_star, size0)
            fkeys, frank = keys, rank
        else:
            st = run_passes(st, keys, rank, jnp.minimum(k_star, 2), size0)
            st = _compact(st[0], st[1], st[2], keys, t1)
            x, y, dead, fkeys, frank = st
            if t2 <= t1 // 2:
                st = run_passes((x, y, dead), fkeys, frank,
                                jnp.clip(k_star - 2, 0, 2), t1)
                st = _compact(st[0], st[1], st[2], fkeys, t2)
                x, y, dead, fkeys, frank = st
                x, y, dead = run_passes((x, y, dead), fkeys, frank,
                                        jnp.maximum(k_star - 4, 0), t2)
            else:
                x, y, dead = run_passes((x, y, dead), fkeys, frank,
                                        jnp.maximum(k_star - 2, 0), t1)

        # dense (window, hi, lo) grid scatter: after k* passes each bucket's
        # total sits at its rank-0 lane; bucket b in 1..2^15 -> slot
        # w*2^15 + (b-1), i.e. hi = (b-1)>>8, lo = (b-1)&0xFF
        live = (frank == 0) & ~dead
        bkt = fkeys & 0xFFFF
        tgt = jnp.where(live, (fkeys >> 16) * _WGRID + (bkt - 1),
                        wg * _WGRID)

        def grid_like(a):
            return jnp.zeros(a.shape[:-1] + (wg * _WGRID + 1,), a.dtype)

        def grid_shape(a):
            return a[..., :wg * _WGRID].reshape(
                a.shape[:-1] + (wg, _GRID_HI, _GRID_LO))

        gx = _tmap(grid_shape, _scatter_last(_tmap(grid_like, x), tgt, x))
        gy = _tmap(grid_shape, _scatter_last(_tmap(grid_like, y), tgt, y))
        # a grid cell is infinity unless a live lane lands on it
        ginf = grid_shape(jnp.ones((wg * _WGRID + 1,), bool)
                          .at[tgt].set(~live))
        return carry, (gx, gy, ginf)

    if g_cnt == 1:
        _, (gx, gy, ginf) = group(0, (sdig.reshape(wg, n), k_stars[0]))
        return _grid_merge(ops, (gx, gy, ginf))         # (NL, W)
    _, (gx, gy, ginf) = jax.lax.scan(
        group, 0, (sdig.reshape(g_cnt, wg, n), k_stars))
    # grids: (G, ..., wg, HI, LO) with the coord limb axis inside — move
    # the scan axis next to wg so the merge batches over (G, wg)
    gx = _tmap(lambda a: jnp.moveaxis(a, 0, 1), gx)     # (NL, G, wg, HI, LO)
    gy = _tmap(lambda a: jnp.moveaxis(a, 0, 1), gy)
    tot = _grid_merge(ops, (gx, gy, ginf))              # (NL, G, wg)
    return _tmap(lambda a: a.reshape(a.shape[0], w), tot)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

class MSMBases:
    """Device-resident encoded bases, reusable across MSMs (Groth16 proving
    keys issue many MSMs over the same query vectors; re-encoding and
    re-uploading 10^6 points per proof would dominate wall-clock)."""

    def __init__(self, curve, points_affine, group: str = "g1",
                 pad_to: int = 0):
        """`pad_to`: raise the padded lane count so DIFFERENT query vectors
        share ONE compiled program shape (a Groth16 prove issues G1 MSMs of
        2-3 distinct lengths; padding all of them to the longest one costs
        dead zero-scalar lanes but saves a multi-minute XLA compile per
        extra shape)."""
        self.curve = curve
        self.group = group
        self.n = len(points_affine)
        fsq = curve.fq
        self.ops = CRV.FqOps(fsq) if group == "g1" else CRV.Fq2Ops(fsq)
        n_eff = max(self.n, pad_to)
        n2 = max(512, 1 << (n_eff - 1).bit_length() if n_eff > 1 else 1)
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
        limbs_np = L.pack_ints(fr, scalars)
        g_cnt, wg = _window_grouping(fr.nl, self.n2)
        k_stars = _pass_counts(_signed_digits_np(fr.nl, limbs_np),
                               g_cnt, wg)
        totals = _msm_affine_program(self.ops, (self.X, self.Y, self.Yneg),
                                     jnp.asarray(limbs_np),
                                     jnp.asarray(k_stars))
        return _combine_windows(curve, self.ops, totals, self.group)


def _combine_windows(curve, ops, totals, group):
    """totals: per-window Jacobian coords of shape (NL, W)."""
    from ..fields import curves as CV
    windows = curve.fr.nl

    pts = CRV.to_affine_host(ops, totals)
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
