"""Pallas TPU kernels for the batched-affine MSM pass body.

The halving passes of `ops/msm_affine.py` are mul-bound under XLA: the
lazy-carry CIOS chains materialize their 2NL+1-column intermediates to HBM
(measured 89 ms per 2^23-lane mont_mul vs a ~2 ms traffic floor). These
kernels keep the whole pair-add arithmetic VMEM-resident:

- `pair_den_pallas`: chord/tangent slope denominators + dbl/vanish flags
  (one coordinate read per operand, no muls);
- `pair_combine_pallas`: the 4-mul affine combine given the batched
  inverse of the denominators.

The cross-lane batched inversion stays in XLA (`_batch_inverse_chunked`)
— its sequential chunk scan fuses acceptably there.

Enabled by ZK_TPU_PALLAS_MSM=1 (off by default until the kernels are
validated on-chip; Mosaic compiles cost ~28 min each through the tunnel).
Off-TPU the callers use the jnp path; tests exercise these bodies with
interpret=True.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FieldSpec
from .pallas_field import _add_value, _mont_mul_value, _sub_value

U32 = jnp.uint32
I32 = jnp.int32
_BLOCK = 1 << 12


def _is_zero_value(v):
    return jnp.all(v == 0, axis=0)


def _where_limb(mask, a, b):
    return jnp.where(mask[None, :], a, b)


def _dbl_value(fs, a):
    return _add_value(fs, a, a)


def _pair_den_kernel(fs, ax_ref, ay_ref, bx_ref, by_ref, lead_ref, one_ref,
                     den_ref, dbl_ref, van_ref):
    ax, ay = ax_ref[...], ay_ref[...]
    bx, by = bx_ref[...], by_ref[...]
    leader = lead_ref[0, :] != 0
    dx = _sub_value(fs, bx, ax)
    dy = _sub_value(fs, by, ay)
    x_eq = _is_zero_value(dx)
    y_eq = _is_zero_value(dy)
    dbl = x_eq & y_eq
    vanish = x_eq & ~y_eq
    one = jnp.broadcast_to(one_ref[:, :1], ax.shape)
    den = _where_limb(dbl, _dbl_value(fs, ay), dx)
    den = _where_limb(~leader | vanish, one, den)
    den_ref[...] = den
    dbl_ref[...] = dbl[None, :].astype(I32)
    van_ref[...] = vanish[None, :].astype(I32)


def _pair_combine_kernel(fs, ax_ref, ay_ref, bx_ref, by_ref, inv_ref,
                         lead_ref, dbl_ref, nx_ref, ny_ref):
    ax, ay = ax_ref[...], ay_ref[...]
    bx, by = bx_ref[...], by_ref[...]
    inv_den = inv_ref[...]
    leader = lead_ref[0, :] != 0
    dbl = dbl_ref[0, :] != 0
    dy = _sub_value(fs, by, ay)
    x2 = _mont_mul_value(fs, ax, ax)
    num = _where_limb(dbl, _add_value(fs, _dbl_value(fs, x2), x2), dy)
    lam = _mont_mul_value(fs, num, inv_den)
    x3 = _sub_value(fs, _sub_value(fs, _mont_mul_value(fs, lam, lam), ax),
                    bx)
    y3 = _sub_value(fs, _mont_mul_value(fs, lam, _sub_value(fs, ax, x3)),
                    ay)
    nx_ref[...] = _where_limb(leader, x3, ax)
    ny_ref[...] = _where_limb(leader, y3, ay)


def _block(n: int) -> int:
    b = min(n, _BLOCK)
    assert n % b == 0, n
    return b


def _specs(fs, n, kinds):
    """BlockSpec list: 'c' = (NL, BLOCK) coord planes, 'm' = (1, BLOCK)
    int mask rows, '1' = (NL, 1) broadcast constant."""
    blk = _block(n)
    out = []
    for k in kinds:
        if k == "c":
            out.append(pl.BlockSpec((fs.nl, blk), lambda i: (0, i),
                                    memory_space=pltpu.VMEM))
        elif k == "m":
            out.append(pl.BlockSpec((1, blk), lambda i: (0, i),
                                    memory_space=pltpu.VMEM))
        else:
            out.append(pl.BlockSpec((fs.nl, 1), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
    return out


@functools.partial(jax.jit, static_argnums=(0, 7))
def pair_den_pallas(fs: FieldSpec, ax, ay, bx, by, leader, one_mont,
                    interpret: bool = False):
    """leader: (B,) bool; one_mont: (NL, 1) Montgomery 1. Returns
    (den (NL,B), dbl (B,) bool, vanish (B,) bool)."""
    n = ax.shape[-1]
    lead = leader[None, :].astype(I32)
    den, dbl, van = pl.pallas_call(
        functools.partial(_pair_den_kernel, fs),
        out_shape=(jax.ShapeDtypeStruct(ax.shape, U32),
                   jax.ShapeDtypeStruct((1, n), I32),
                   jax.ShapeDtypeStruct((1, n), I32)),
        grid=(n // _block(n),),
        in_specs=_specs(fs, n, "ccccm1"),
        out_specs=_specs(fs, n, "cmm"),
        interpret=interpret,
    )(ax, ay, bx, by, lead, one_mont)
    return den, dbl[0] != 0, van[0] != 0


@functools.partial(jax.jit, static_argnums=(0, 8))
def pair_combine_pallas(fs: FieldSpec, ax, ay, bx, by, inv_den, leader,
                        dbl, interpret: bool = False):
    """Returns (new_x, new_y) with non-leader lanes passed through."""
    n = ax.shape[-1]
    lead = leader[None, :].astype(I32)
    dblm = dbl[None, :].astype(I32)
    nx, ny = pl.pallas_call(
        functools.partial(_pair_combine_kernel, fs),
        out_shape=(jax.ShapeDtypeStruct(ax.shape, U32),
                   jax.ShapeDtypeStruct(ax.shape, U32)),
        grid=(n // _block(n),),
        in_specs=_specs(fs, n, "cccccmm"),
        out_specs=_specs(fs, n, "cc"),
        interpret=interpret,
    )(ax, ay, bx, by, inv_den, lead, dblm)
    return nx, ny


# ---------------------------------------------------------------------------
# batched-inversion chunk scans in VMEM
# ---------------------------------------------------------------------------

_INV_K = 64       # chunk width (matches msm_affine._INV_CHUNK)
_INV_CBLK = 64    # chunks per block: 3 x (NL, 64, 64) u32 ~ 3 MB VMEM


def _inv_scan_kernel(fs, x_ref, one_ref, f_ref, g_ref, tot_ref):
    """x: (NL, Cblk, K). Emits exclusive prefix products f, exclusive
    suffix products g (both (NL, Cblk, K)) and chunk totals (NL, Cblk, 1)
    — the VMEM-resident version of `_batch_inverse_chunked`'s two
    lax.scans (the XLA scans round-trip the carry through HBM every
    step). The K steps run as in-kernel fori_loops with dynamic stores so
    the traced body stays one mont_mul, not K unrolled ones."""
    k = x_ref.shape[-1]
    one2 = one_ref[...]                       # (NL, 1)
    acc0 = jnp.broadcast_to(one2, x_ref.shape[:-1])
    full = (slice(None), slice(None))

    def fwd(i, acc):
        f_ref[full + (pl.dslice(i, 1),)] = acc[..., None]
        x_i = x_ref[full + (pl.dslice(i, 1),)][..., 0]
        return _mont_mul_value(fs, acc, x_i)

    tot = jax.lax.fori_loop(0, k, fwd, acc0)
    tot_ref[...] = tot[..., None]

    def bwd(j, acc):
        i = k - 1 - j
        g_ref[full + (pl.dslice(i, 1),)] = acc[..., None]
        x_i = x_ref[full + (pl.dslice(i, 1),)][..., 0]
        return _mont_mul_value(fs, acc, x_i)

    jax.lax.fori_loop(0, k, bwd, acc0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def inv_scans_pallas(fs: FieldSpec, x, one_mont, interpret: bool = False):
    """x: (NL, C, K) nonzero Montgomery values; one_mont: (NL, 1).
    Returns (f_ex, g_ex, chunk_tot)."""
    nl, c, k = x.shape
    cblk = min(c, _INV_CBLK)
    assert c % cblk == 0, (c, cblk)
    spec3 = pl.BlockSpec((nl, cblk, k), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    f, g, tot = pl.pallas_call(
        functools.partial(_inv_scan_kernel, fs),
        out_shape=(jax.ShapeDtypeStruct((nl, c, k), U32),
                   jax.ShapeDtypeStruct((nl, c, k), U32),
                   jax.ShapeDtypeStruct((nl, c, 1), U32)),
        grid=(c // cblk,),
        in_specs=[spec3,
                  pl.BlockSpec((nl, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec3, spec3,
                   pl.BlockSpec((nl, cblk, 1), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, one_mont)
    return f, g, tot[..., 0]


def _mul3_kernel(fs, a_ref, b_ref, c_ref, o_ref):
    ab = _mont_mul_value(fs, a_ref[...], b_ref[...])
    c = jnp.broadcast_to(c_ref[...], ab.shape[:-1] + (1,))
    o_ref[...] = _mont_mul_value(fs, ab,
                                 jnp.broadcast_to(c, ab.shape))


@functools.partial(jax.jit, static_argnums=(0, 4))
def mul3_bcast_pallas(fs: FieldSpec, a, b, c_bcast,
                      interpret: bool = False):
    """a*b*c with c broadcast over the last axis: applies the per-chunk
    inverse term to the prefix/suffix products. a, b: (NL, C, K);
    c_bcast: (NL, C)."""
    nl, cc, k = a.shape
    cblk = min(cc, _INV_CBLK)
    assert cc % cblk == 0
    spec3 = pl.BlockSpec((nl, cblk, k), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mul3_kernel, fs),
        out_shape=jax.ShapeDtypeStruct((nl, cc, k), U32),
        grid=(cc // cblk,),
        in_specs=[spec3, spec3,
                  pl.BlockSpec((nl, cblk, 1), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec3,
        interpret=interpret,
    )(a, b, c_bcast[..., None])
