"""Pallas TPU kernels for the batched-affine MSM inversion scans.

The halving passes of `ops/msm_affine.py` spend most of their time in the
shared batched inversion: the XLA `lax.scan` chunk cumprods round-trip the
carry through HBM on every step and the final f*g*chunk_term recombination
is two full-width HBM-bound mont_muls. These kernels keep the chunk scans
and the 3-way recombination VMEM-resident.

Layout: the chunk-position (scan) axis is the LEADING array dimension —
Mosaic requires dynamic indices on the two minor (tiled) dimensions to be
tile-aligned ("cannot statically prove that index ... is a multiple of
128", hit on v5e 2026-08-20 with the scan axis minor), while leading
dimensions index freely.

(The round-2 pair-add kernels were removed 2026-08-20: profiled on v5e at
2^22 lanes they won only ~5% of a halving pass — the pass is dominated by
the inversion and, before the in-place-pass rewrite, by compaction
gathers — so the XLA pair math stays.)

Enabled by ZK_TPU_PALLAS_INV=1 (off by default until the kernels are
compile-cached on the target). Off-TPU the callers use the jnp path;
tests exercise these bodies with interpret=True.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FieldSpec
from .pallas_field import _mont_mul_value

U32 = jnp.uint32
I32 = jnp.int32

_INV_K = 64       # chunk width (matches msm_affine._INV_CHUNK)
_INV_CBLK = 128   # chunks per block: 4 x (K, NL, 128) u32 ~ 2 MB VMEM


def _inv_scan_kernel(fs, x_ref, one_ref, f_ref, g_ref, tot_ref):
    """x/f/g: (K, NL, Cblk) — scan axis LEADING; tot: (NL, Cblk);
    one: (NL, 1). Emits exclusive prefix products f, exclusive suffix
    products g and chunk totals — the VMEM-resident version of
    `_batch_inverse_chunked`'s two lax.scans (the XLA scans round-trip
    the carry through HBM every step). The K steps run as in-kernel
    fori_loops with dynamic leading-dim stores so the traced body stays
    one mont_mul, not K unrolled ones."""
    k = x_ref.shape[0]
    acc0 = jnp.broadcast_to(one_ref[...], x_ref.shape[1:])

    def fwd(i, acc):
        f_ref[pl.dslice(i, 1)] = acc[None]
        return _mont_mul_value(fs, acc, x_ref[pl.dslice(i, 1)][0])

    tot = jax.lax.fori_loop(0, k, fwd, acc0)
    tot_ref[...] = tot

    def bwd(j, acc):
        i = k - 1 - j
        g_ref[pl.dslice(i, 1)] = acc[None]
        return _mont_mul_value(fs, acc, x_ref[pl.dslice(i, 1)][0])

    jax.lax.fori_loop(0, k, bwd, acc0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def inv_scans_pallas(fs: FieldSpec, x, one_mont, interpret: bool = False):
    """x: (NL, C, K) nonzero Montgomery values; one_mont: (NL, 1).
    Returns (f_ex, g_ex, chunk_tot) with f_ex/g_ex in the kernel's
    (K, NL, C) layout (see `mul3_bcast_pallas`) and chunk_tot (NL, C)."""
    nl, c, k = x.shape
    cblk = min(c, _INV_CBLK)
    assert c % cblk == 0, (c, cblk)
    xt = jnp.transpose(x, (2, 0, 1))          # (K, NL, C)
    spec3 = pl.BlockSpec((k, nl, cblk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    f, g, tot = pl.pallas_call(
        functools.partial(_inv_scan_kernel, fs),
        out_shape=(jax.ShapeDtypeStruct((k, nl, c), U32),
                   jax.ShapeDtypeStruct((k, nl, c), U32),
                   jax.ShapeDtypeStruct((nl, c), U32)),
        grid=(c // cblk,),
        in_specs=[spec3,
                  pl.BlockSpec((nl, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec3, spec3,
                   pl.BlockSpec((nl, cblk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xt, one_mont)
    return f, g, tot


def _mul3_kernel(fs, a_ref, b_ref, c_ref, o_ref):
    """a/b/o: (K, NL, Cblk); c: (NL, Cblk) broadcast over the scan axis."""
    k = a_ref.shape[0]
    cv = c_ref[...]

    def body(i, carry):
        ab = _mont_mul_value(fs, a_ref[pl.dslice(i, 1)][0],
                             b_ref[pl.dslice(i, 1)][0])
        o_ref[pl.dslice(i, 1)] = _mont_mul_value(fs, ab, cv)[None]
        return carry

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnums=(0, 4))
def mul3_bcast_pallas(fs: FieldSpec, a, b, c_bcast,
                      interpret: bool = False):
    """a*b*c with c broadcast over the scan axis: applies the per-chunk
    inverse term to the prefix/suffix products. a, b: (K, NL, C) (from
    `inv_scans_pallas`); c_bcast: (NL, C). Returns (NL, C, K)."""
    k, nl, cc = a.shape
    cblk = min(cc, _INV_CBLK)
    assert cc % cblk == 0
    spec3 = pl.BlockSpec((k, nl, cblk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((nl, cblk), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mul3_kernel, fs),
        out_shape=jax.ShapeDtypeStruct((k, nl, cc), U32),
        grid=(cc // cblk,),
        in_specs=[spec3, spec3, spec2],
        out_specs=spec3,
        interpret=interpret,
    )(a, b, c_bcast)
    return jnp.transpose(out, (1, 2, 0))      # (NL, C, K)
