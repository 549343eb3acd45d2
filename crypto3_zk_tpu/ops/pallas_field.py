"""Pallas TPU kernels for the hot field ops.

SURVEY.md §7 hard part #1: keep the Montgomery limb math resident in VMEM
instead of letting XLA materialize every intermediate to HBM. The kernels
reuse the same tensorized lazy-carry CIOS math as `ops/limbs.py` (the jnp
ops inside a Pallas body lower through Mosaic), with the batch axis mapped
onto lanes.

Exposed:
- mont_mul_pallas(fs, a, b): elementwise modular multiply over (NL, N).
- ntt_pallas(fs, x, inverse): full NTT via the single-chip four-step
  decomposition with a Pallas row-transform kernel — each size-C sub-NTT
  runs entirely in VMEM (log C stages per HBM round trip instead of one).

Falls back to the jnp path off-TPU; tests exercise the kernels with
interpret=True on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import MASK, W, FieldSpec
from . import limbs as L
from . import ntt as NTT

U32 = jnp.uint32


def _mont_mul_value(fs: FieldSpec, a, b):
    """Same math as limbs.mont_mul but on VALUES (usable inside kernels).
    a, b: (NL, *batch) uint32."""
    nl = fs.nl
    bshape = a.shape[1:]
    pad_batch = [(0, 0)] * len(bshape)
    width = 2 * nl + 1
    t = jnp.zeros((width,) + bshape, dtype=U32)
    for i in range(nl):
        prod = a[i][None] * b
        lo = prod & MASK
        hi = prod >> W
        t = t + jnp.pad(lo, [(i, width - i - nl)] + pad_batch) \
              + jnp.pad(hi, [(i + 1, width - i - 1 - nl)] + pad_batch)
    ninv = U32(fs.ninv16)
    plv = [U32(int(v)) for v in fs.p_limbs]  # scalar consts (Pallas-safe)
    for _ in range(nl):
        m = (t[0] * ninv) & MASK
        mp_rows = [m * plv[j] for j in range(nl)]
        lo = jnp.stack([r & MASK for r in mp_rows], axis=0)
        hi = jnp.stack([r >> W for r in mp_rows], axis=0)
        carry0 = (t[0] + lo[0]) >> W
        rest = t[1:]
        rest = rest + jnp.pad(lo[1:], [(0, nl + 1)] + pad_batch) \
                    + jnp.pad(hi, [(0, nl)] + pad_batch)
        rest = jnp.concatenate([(rest[0] + carry0)[None], rest[1:]], axis=0)
        t = jnp.pad(rest, [(0, 1)] + pad_batch)
    digits = []
    c = jnp.uint32(0)
    for j in range(nl):
        v = t[j] + c
        digits.append(v & MASK)
        c = v >> W
    top = t[nl] + c
    return _cond_sub_p_value(fs, digits, top)


def _cond_sub_p_value(fs: FieldSpec, s: list, carry):
    pl_ = fs.p_limbs
    d, br = [], jnp.uint32(0)
    for j in range(fs.nl):
        tt = s[j] + U32(MASK + 1) - U32(int(pl_[j])) - br
        d.append(tt & MASK)
        br = jnp.uint32(1) - (tt >> W)
    use_d = (carry > 0) | (br == 0)
    return jnp.stack([jnp.where(use_d, d[j], s[j]) for j in range(fs.nl)],
                     axis=0)


def _add_value(fs: FieldSpec, a, b):
    s, c = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = a[j] + b[j] + c
        s.append(t & MASK)
        c = t >> W
    return _cond_sub_p_value(fs, s, c)


def _sub_value(fs: FieldSpec, a, b):
    pl_ = fs.p_limbs
    d, br = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = a[j] + U32(MASK + 1) - b[j] - br
        d.append(t & MASK)
        br = jnp.uint32(1) - (t >> W)
    e, c = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = d[j] + U32(int(pl_[j])) + c
        e.append(t & MASK)
        c = t >> W
    need = br > 0
    return jnp.stack([jnp.where(need, e[j], d[j]) for j in range(fs.nl)],
                     axis=0)


# ---------------------------------------------------------------------------
# mont_mul kernel
# ---------------------------------------------------------------------------

def _mont_mul_kernel(fs, a_ref, b_ref, o_ref):
    o_ref[...] = _mont_mul_value(fs, a_ref[...], b_ref[...])


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(fs: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """a, b: (NL, N) with N a multiple of the block width."""
    n = a.shape[-1]
    block = min(n, 1 << 12)
    assert n % block == 0
    grid = (n // block,)
    return pl.pallas_call(
        functools.partial(_mont_mul_kernel, fs),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((fs.nl, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fs.nl, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fs.nl, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)


# ---------------------------------------------------------------------------
# NTT row-transform kernel: batched size-B transforms fully in VMEM
# ---------------------------------------------------------------------------

def _ntt_rows_kernel(fs, log_b, rows, a_ref, tw_ref, o_ref):
    """a_ref: (NL, rows, B) bit-REVERSED rows; tw_ref: (log_b, NL, B//2)
    per-stage twiddles PRE-TILED to B/2 (Mosaic rejects strided gathers, so
    the tile pattern is baked host-side); runs all log_b stages in VMEM."""
    b = 1 << log_b
    x = a_ref[...]
    lead = (fs.nl, rows)
    half_shape = lead + (b // 2,)
    for s in range(1, log_b + 1):
        m = 1 << s
        xr = x.reshape(lead + (b // m, m))
        even = xr[..., : m // 2].reshape(half_shape)
        odd = xr[..., m // 2:].reshape(half_shape)
        stw = tw_ref[s - 1]  # (NL, B//2), already tiled per stage
        stw = jnp.broadcast_to(stw[:, None, :], half_shape)
        t = _mont_mul_value(fs, odd, stw)
        lo = _add_value(fs, even, t)
        hi = _sub_value(fs, even, t)
        x = jnp.concatenate(
            [lo.reshape(lead + (b // m, m // 2)),
             hi.reshape(lead + (b // m, m // 2))], axis=-1
        ).reshape(lead + (b,))
    o_ref[...] = x


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _ntt_rows_pallas(fs: FieldSpec, x: jnp.ndarray, inverse: bool,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched transforms along the last axis: x (NL, M, B)."""
    nl, m_rows, b = x.shape
    log_b = b.bit_length() - 1
    tw = _stage_twiddles_np(fs, log_b, inverse)  # (log_b, NL, B/2)
    # bit-reverse rows (XLA gather outside the kernel)
    x = x[..., jnp.asarray(NTT._bitrev_perm(log_b))]
    rows_per_block = max(1, min(m_rows, (1 << 14) // b))
    while m_rows % rows_per_block:
        rows_per_block -= 1
    grid = (m_rows // rows_per_block,)
    return pl.pallas_call(
        functools.partial(_ntt_rows_kernel, fs, log_b, rows_per_block),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nl, rows_per_block, b), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((log_b, nl, b // 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nl, rows_per_block, b), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(tw))


@functools.lru_cache(maxsize=None)
def _stage_twiddles_np(fs: FieldSpec, log_b: int, inverse: bool):
    """(log_b, NL, B/2): row s-1 holds w_{2^s}^j tiled to B/2."""
    plan = NTT.get_plan(fs, log_b)
    tw = plan.tw_inv if inverse else plan.tw_fwd  # np (NL, B/2)
    b = 1 << log_b
    out = np.zeros((log_b, fs.nl, b // 2), dtype=np.uint32)
    for s in range(1, log_b + 1):
        m = 1 << s
        stage = tw[:, :: b // m][:, : m // 2]       # (NL, m/2)
        out[s - 1] = np.tile(stage, (1, b // m))
    return out


def ntt_pallas(fs: FieldSpec, x: jnp.ndarray, inverse: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """Full-size NTT via the single-chip four-step decomposition:
    X[k1*R + k2] = NTT_C over c { w_N^(c*k2) * NTT_R over r { x[r*C+c] } }.
    Both sub-transform batches run in the VMEM row kernel; the twiddle
    matrix w_N^(c*k2) is precomputed host-side once per size."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n <= (1 << 10):
        return _ntt_rows_pallas(fs, x[:, None, :], inverse,
                                interpret)[:, 0, :]
    log_c = (log_n + 1) // 2
    c = 1 << log_c
    r = n >> log_c

    a = x.reshape(fs.nl, r, c)
    a = jnp.swapaxes(a, 1, 2)                    # (NL, C, R): rows over r
    a = _ntt_rows_pallas(fs, a, inverse, interpret)   # NTT_R -> (NL, C, k2)
    tw = _four_step_twiddles(fs, n, r, c, inverse)    # (NL, C, R) w^(c*k2)
    a = L.mont_mul(fs, a, tw)
    a = jnp.swapaxes(a, 1, 2)                    # (NL, k2, C)
    a = _ntt_rows_pallas(fs, a, inverse, interpret)   # NTT_C -> (NL, k2, k1)
    a = jnp.swapaxes(a, 1, 2)                    # (NL, k1, k2)
    out = a.reshape(fs.nl, n)
    if inverse:
        out = L.mont_mul(fs, out, L.const_mont(fs, pow(n, -1, fs.p), (1,)))
    return out


@functools.lru_cache(maxsize=None)
def _four_step_twiddles_np(fs: FieldSpec, n: int, r: int, c: int,
                           inverse: bool):
    p = fs.p
    omega = fs.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    vals = []
    for cc in range(c):
        base = pow(omega, cc, p)
        acc = 1
        for _ in range(r):
            vals.append(acc * fs.R % p)
            acc = acc * base % p
    return L.pack_ints(fs, vals).reshape(fs.nl, c, r)


def _four_step_twiddles(fs, n, r, c, inverse):
    return jnp.asarray(_four_step_twiddles_np(fs, n, r, c, inverse))
