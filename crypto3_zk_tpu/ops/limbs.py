"""Vectorized multiprecision modular arithmetic on 16-bit limb planes.

This is the TPU-native replacement for crypto3-multiprecision's scalar
bigint ops (SURVEY.md §2.0: every `FieldType::value_type` op, e.g.
`permutation_argument.hpp:123-133`). Design:

- A batch of field elements is a `jnp.uint32` array of shape ``(NL, *batch)``
  — limb axis FIRST, so each per-limb slice ``x[j]`` is a contiguous vector
  that the VPU consumes at full 8x128-lane width, and full-array elementwise
  ops tile perfectly along the (large) batch axis.
- Limbs are 16-bit digits held in uint32 lanes: a 16x16-bit product plus two
  16-bit carries fits *exactly* in uint32, so CIOS Montgomery multiplication
  needs no 64-bit hardware multiply (TPUs have none).
- All loops below are over the (static) limb count and unroll at trace time
  into straight-line vector code; XLA fuses the whole multiply into a few
  HBM-bound kernels. A Pallas variant for the hottest shapes lives in
  `ops/pallas_field.py`.

Everything is in Montgomery form (R = 2^(16*NL)) unless noted.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import MASK, W, FieldSpec, limbs_to_int

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# host <-> device packing
# ---------------------------------------------------------------------------

def pack_ints(fs: FieldSpec, xs: Sequence[int]) -> np.ndarray:
    """Python ints -> (NL, n) uint32 limb array (NOT Montgomery-encoded)."""
    xs = list(xs)
    out = np.zeros((fs.nl, len(xs)), dtype=np.uint32)
    for i, x in enumerate(xs):
        x = x % fs.p
        for j in range(fs.nl):
            out[j, i] = (x >> (W * j)) & MASK
    return out


def unpack_ints(fs: FieldSpec, arr) -> list[int]:
    """(NL, *batch) uint32 -> flat list of python ints (row-major batch)."""
    a = np.asarray(arr, dtype=np.uint64).reshape(fs.nl, -1)
    shifts = (np.arange(fs.nl, dtype=np.uint64) * W)
    out = []
    for i in range(a.shape[1]):
        x = 0
        for j in range(fs.nl):
            x |= int(a[j, i]) << (W * j)
        out.append(x)
    return out


def encode(fs: FieldSpec, xs: Sequence[int]) -> jnp.ndarray:
    """Python ints -> device limb array in Montgomery form."""
    return jnp.asarray(pack_ints(fs, [x % fs.p * fs.R % fs.p for x in xs]))


def decode(fs: FieldSpec, arr) -> list[int]:
    """Device Montgomery limb array -> python ints."""
    return [x * fs.Rinv % fs.p for x in unpack_ints(fs, arr)]


def zeros(fs: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros((fs.nl,) + tuple(shape), dtype=U32)


def ones_mont(fs: FieldSpec, shape=()) -> jnp.ndarray:
    base = jnp.asarray(fs.one_mont_limbs, dtype=U32)
    return jnp.broadcast_to(base.reshape((fs.nl,) + (1,) * len(shape)),
                            (fs.nl,) + tuple(shape))


def const_mont(fs: FieldSpec, x: int, shape=()) -> jnp.ndarray:
    """Broadcast constant x (plain int) as a Montgomery-form limb array."""
    base = jnp.asarray(fs.to_limbs(x * fs.R % fs.p), dtype=U32)
    return jnp.broadcast_to(base.reshape((fs.nl,) + (1,) * len(shape)),
                            (fs.nl,) + tuple(shape))


# ---------------------------------------------------------------------------
# helpers on split limb lists
# ---------------------------------------------------------------------------

def _split(x: jnp.ndarray) -> list:
    return [x[j] for j in range(x.shape[0])]


def _join(limbs: list) -> jnp.ndarray:
    return jnp.stack([jnp.asarray(l, dtype=U32) for l in limbs], axis=0)


def _cond_sub_p(fs: FieldSpec, s: list, carry) -> list:
    """Given s (NL digits) + carry bit beyond, return s mod-adjusted: if
    s >= p (or carry set) subtract p once. Branch-free select."""
    pl = fs.p_limbs
    d, br = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = s[j] + U32(MASK + 1) - U32(int(pl[j])) - br
        d.append(t & MASK)
        br = jnp.uint32(1) - (t >> W)
    use_d = (carry > 0) | (br == 0)
    return [jnp.where(use_d, d[j], s[j]) for j in range(fs.nl)]


# ---------------------------------------------------------------------------
# modular add / sub / neg
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(fs: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    al, bl = _split(a), _split(b)
    s, c = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = al[j] + bl[j] + c
        s.append(t & MASK)
        c = t >> W
    return _join(_cond_sub_p(fs, s, c))


@functools.partial(jax.jit, static_argnums=0)
def sub(fs: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    al, bl = _split(a), _split(b)
    d, br = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = al[j] + U32(MASK + 1) - bl[j] - br
        d.append(t & MASK)
        br = jnp.uint32(1) - (t >> W)
    # if borrow, add p back
    pl = fs.p_limbs
    e, c = [], jnp.uint32(0)
    for j in range(fs.nl):
        t = d[j] + U32(int(pl[j])) + c
        e.append(t & MASK)
        c = t >> W
    need = br > 0
    return _join([jnp.where(need, e[j], d[j]) for j in range(fs.nl)])


def neg(fs: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(fs, zeros(fs, a.shape[1:]), a)


def double(fs: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(fs, a, a)


def is_zero(fs: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over batch dims: element == 0 (works in either form)."""
    acc = a[0]
    for j in range(1, fs.nl):
        acc = acc | a[j]
    return acc == 0


def eq(fs: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    acc = a[0] == b[0]
    for j in range(1, fs.nl):
        acc = acc & (a[j] == b[j])
    return acc


def select(mask, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b) with mask over batch dims (no limb axis)."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS, 16-bit digits)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def mont_mul(fs: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(aR)(bR)R^{-1} = abR mod p. Shapes broadcast over batch dims."""
    nl = fs.nl
    pl = [U32(int(x)) for x in fs.p_limbs]
    ninv = U32(fs.ninv16)
    al, bl = _split(a), _split(b)

    zero = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), dtype=U32)
    t = [zero] * nl
    t_n = zero
    t_n1 = zero
    for i in range(nl):
        bi = bl[i]
        c = jnp.uint32(0)
        for j in range(nl):
            u = t[j] + al[j] * bi + c
            t[j] = u & MASK
            c = u >> W
        u = t_n + c
        t_n = u & MASK
        t_n1 = t_n1 + (u >> W)
        # reduction step
        m = (t[0] * ninv) & MASK
        u = t[0] + m * pl[0]
        c = u >> W
        for j in range(1, nl):
            u = t[j] + m * pl[j] + c
            t[j - 1] = u & MASK
            c = u >> W
        u = t_n + c
        t[nl - 1] = u & MASK
        c = u >> W
        t_n = t_n1 + c
        t_n1 = jnp.zeros_like(t_n1)
    return _join(_cond_sub_p(fs, t, t_n))


def mont_sqr(fs: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(fs, a, a)


def to_mont(fs: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    r2 = jnp.asarray(fs.r2_limbs, dtype=U32).reshape((fs.nl,) + (1,) * (a.ndim - 1))
    return mont_mul(fs, a, r2)


def from_mont(fs: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one = pack_ints(fs, [1])[:, 0].reshape((fs.nl,) + (1,) * (a.ndim - 1))
    return mont_mul(fs, a, jnp.asarray(one, dtype=U32))


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------

def mont_pow_const(fs: FieldSpec, x: jnp.ndarray, e: int) -> jnp.ndarray:
    """x^e with host-known exponent. Small exponents unroll square-and-
    multiply; large ones run a lax.scan over the exponent bits (2 muls/bit,
    traced once — keeps the XLA graph small for e ~ p)."""
    if e == 0:
        return ones_mont(fs, x.shape[1:])
    nbits = e.bit_length()
    if nbits <= 32:
        acc = None
        for bit in bin(e)[2:]:
            if acc is not None:
                acc = mont_mul(fs, acc, acc)
            if bit == "1":
                acc = x if acc is None else mont_mul(fs, acc, x)
        return acc
    return _pow_scan(fs, x, e, nbits)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _pow_scan(fs: FieldSpec, x: jnp.ndarray, e: int, nbits: int) -> jnp.ndarray:
    bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                       dtype=jnp.uint32)
    acc0 = ones_mont(fs, x.shape[1:])

    def body(acc, bit):
        acc = mont_mul(fs, acc, acc)
        acc = select(jnp.broadcast_to(bit > 0, acc.shape[1:]),
                     mont_mul(fs, acc, x), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


def inv(fs: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse: x^(p-2). 0 maps to 0."""
    return mont_pow_const(fs, x, fs.p - 2)


def batch_inverse(fs: FieldSpec, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Montgomery-trick batched inversion along a batch axis.

    Replaces per-element `inversed()` loops of the reference (e.g. the grand
    product at `permutation_argument.hpp:132`) with two prefix-product scans
    and ONE Fermat inversion. Zeros invert to zero.
    """
    if axis < 0:
        axis = x.ndim + axis
    assert axis >= 1, "axis 0 is the limb axis"
    zmask = is_zero(fs, x)
    x = select(zmask, ones_mont(fs, x.shape[1:]), x)

    pre = _prefix_products(fs, x, axis, reverse=False)   # inclusive prefix
    suf = _prefix_products(fs, x, axis, reverse=True)    # inclusive suffix
    n = x.shape[axis]
    total = jnp.take(pre, jnp.array([n - 1]), axis=axis)
    total_inv = inv(fs, total)
    # exclusive prefix / suffix
    one = ones_mont(fs, x.shape[1:])
    pre_ex = jnp.concatenate(
        [jnp.take(one, jnp.array([0]), axis=axis),
         _slice_axis(pre, axis, 0, n - 1)], axis=axis)
    suf_ex = jnp.concatenate(
        [_slice_axis(suf, axis, 1, n),
         jnp.take(one, jnp.array([0]), axis=axis)], axis=axis)
    out = mont_mul(fs, mont_mul(fs, pre_ex, suf_ex), total_inv)
    return select(zmask, zeros(fs, x.shape[1:]), out)


def _slice_axis(x, axis, lo, hi):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(lo, hi)
    return x[tuple(idx)]


def _prefix_products(fs: FieldSpec, x: jnp.ndarray, axis: int,
                     reverse: bool) -> jnp.ndarray:
    """Inclusive prefix (or suffix) products via Hillis–Steele doubling:
    log2(n) mont_muls of full batch size."""
    n = x.shape[axis]
    acc = x
    shift = 1
    while shift < n:
        if reverse:
            shifted = jnp.concatenate(
                [_slice_axis(acc, axis, shift, n),
                 ones_mont(fs, acc.shape[1:])[
                     tuple([slice(None)] * axis + [slice(0, shift)])]],
                axis=axis)
        else:
            shifted = jnp.concatenate(
                [ones_mont(fs, acc.shape[1:])[
                    tuple([slice(None)] * axis + [slice(0, shift)])],
                 _slice_axis(acc, axis, 0, n - shift)],
                axis=axis)
        acc = mont_mul(fs, acc, shifted)
        shift *= 2
    return acc


def powers(fs: FieldSpec, base_int: int, n: int) -> jnp.ndarray:
    """Device array [1, w, w^2, ..., w^(n-1)] in Montgomery form, built by
    doubling (log n mont_muls, total n multiplies)."""
    cur = ones_mont(fs, (1,))
    w = base_int % fs.p
    while cur.shape[1] < n:
        k = cur.shape[1]
        wk = const_mont(fs, pow(w, k, fs.p), (1,))
        cur = jnp.concatenate([cur, mont_mul(fs, cur, wk)], axis=1)
    return cur[:, :n]
