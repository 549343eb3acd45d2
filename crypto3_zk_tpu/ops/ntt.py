"""Radix-2 NTT / iNTT over prime-field evaluation domains.

TPU-native replacement for crypto3-math's `evaluation_domain::fft/inverse_fft`
(driven from `r1cs_to_qap.hpp:229-310` and `polynomial_dfs::resize` throughout
the Placeholder prover — SURVEY.md §2.0). Decimation-in-time with a host-side
stage loop: each stage is ONE batched Montgomery multiply of N/2 lanes plus a
modular add/sub — straight-line vector code XLA fuses per stage. Twiddle
tables are built on device by repeated squaring (`limbs.powers`).

The distributed (multi-chip) variant lives in `parallel/ntt.py`; this module
is the single-chip core it calls per shard.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import FieldSpec
from . import limbs as L


@functools.lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class NTTPlan:
    """Cached per-(field, size) twiddle tables + compiled transform."""

    def __init__(self, fs: FieldSpec, log_n: int):
        self.fs = fs
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = fs.root_of_unity(self.n)
        self.omega_inv = pow(self.omega, -1, fs.p)
        self.n_inv = pow(self.n, -1, fs.p)
        self.bitrev = _bitrev_perm(log_n)
        # full twiddle tables w^j, j < n/2 (Montgomery form), fwd and inv.
        # Kept as HOST numpy arrays: they embed as jaxpr constants, so the
        # kernels stay valid when traced inside shard_map on sub-meshes
        # (device-resident closures carry foreign shardings there).
        half = max(self.n // 2, 1)
        with jax.ensure_compile_time_eval():  # plans may be built lazily
            self.tw_fwd = np.asarray(L.powers(fs, self.omega, half))
            self.tw_inv = np.asarray(L.powers(fs, self.omega_inv, half))

    def __hash__(self):
        return hash((self.fs, self.log_n))

    def __eq__(self, o):
        return isinstance(o, NTTPlan) and (self.fs, self.log_n) == (o.fs, o.log_n)


@functools.lru_cache(maxsize=None)
def get_plan(fs: FieldSpec, log_n: int) -> NTTPlan:
    return NTTPlan(fs, log_n)


@functools.partial(jax.jit, static_argnums=0)
def _ntt_stage(fs: FieldSpec, even: jnp.ndarray, odd: jnp.ndarray,
               stw: jnp.ndarray):
    """One radix-2 DIT butterfly layer on flattened (NL, ..., N/2) halves.
    Compiled ONCE per (field, total size) and reused by every stage of every
    transform of that size."""
    t = L.mont_mul(fs, odd, stw)
    return L.add(fs, even, t), L.sub(fs, even, t)


def _ntt_loop(fs: FieldSpec, x: jnp.ndarray, tw: jnp.ndarray,
              log_n: int, stage) -> jnp.ndarray:
    """Shared DIT stage loop; `stage(even, odd, stw)` does the butterfly."""
    n = 1 << log_n
    lead = x.shape[:-1]          # (NL, *batch)
    half_shape = lead + (n // 2,)
    x = x[..., jnp.asarray(_bitrev_perm(log_n))]
    for s in range(1, log_n + 1):
        m = 1 << s
        xr = x.reshape(lead + (n // m, m))
        even = xr[..., : m // 2].reshape(half_shape)
        odd = xr[..., m // 2:].reshape(half_shape)
        # stage twiddles: w_m^j = w_n^(j * n/m) -> strided view, broadcast
        stw = tw[..., :: n // m]  # (NL, m//2)
        stw = jnp.broadcast_to(
            stw.reshape((stw.shape[0],) + (1,) * (len(lead) - 1) + (1, m // 2)),
            lead + (n // m, m // 2)).reshape(half_shape)
        lo, hi = stage(even, odd, stw)
        x = jnp.concatenate(
            [lo.reshape(lead + (n // m, m // 2)),
             hi.reshape(lead + (n // m, m // 2))], axis=-1).reshape(lead + (n,))
    return x


def _ntt_core(fs: FieldSpec, x: jnp.ndarray, tw: jnp.ndarray,
              log_n: int) -> jnp.ndarray:
    """Eager stage loop: the heavy butterfly math is one shared jitted
    kernel of constant shape (NL, ..., N/2), compiled ONCE per (field, size)
    and reused by every stage of every transform shape — O(1) compiles for
    the whole test matrix of small sizes."""
    return _ntt_loop(fs, x, tw, log_n,
                     lambda e, o, s: _ntt_stage(fs, e, o, s))


@functools.partial(jax.jit, static_argnums=(0, 3))
def _ntt_fused(fs: FieldSpec, x: jnp.ndarray, tw: jnp.ndarray,
               log_n: int) -> jnp.ndarray:
    """ALL stages in one XLA program: a single device dispatch per
    transform. For large N the eager loop's log2(N) dispatches dominate
    wall-clock (each is a host->device round trip); fusing removes them and
    lets XLA overlap stages' loads/stores. Compile cost is O(log N) fused
    elementwise blocks — paid once per (field, shape)."""
    def butterfly(even, odd, stw):
        t = L.mont_mul(fs, odd, stw)
        return L.add(fs, even, t), L.sub(fs, even, t)

    return _ntt_loop(fs, x, tw, log_n, butterfly)


# Above this size the transform runs as one fused program; below it the
# shared-stage path avoids per-shape full-graph compiles.
_FUSED_MIN_LOG = 14


def _transform(fs: FieldSpec, x: jnp.ndarray, tw, log_n: int) -> jnp.ndarray:
    if log_n >= _FUSED_MIN_LOG:
        return _ntt_fused(fs, x, jnp.asarray(tw), log_n)
    return _ntt_core(fs, x, tw, log_n)


def ntt(fs: FieldSpec, x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Forward: coefficients -> evaluations on the radix-2 domain (natural
    order: index i holds f(w^i)). Inverse: evaluations -> coefficients.
    Transform along the last axis; leading axis is limbs."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return x
    plan = get_plan(fs, log_n)
    if not inverse:
        return _transform(fs, x, plan.tw_fwd, log_n)
    y = _transform(fs, x, plan.tw_inv, log_n)
    return L.mont_mul(fs, y, L.const_mont(fs, plan.n_inv,
                                          (1,) * (y.ndim - 1)))


def ntt_raw(fs: FieldSpec, x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Unscaled transform along the last axis (no 1/N factor on inverse) —
    building block for the multi-step distributed NTT (`parallel/ntt.py`)."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    plan = get_plan(fs, log_n)
    return _transform(fs, x, plan.tw_inv if inverse else plan.tw_fwd, log_n)


def coset_scale(fs: FieldSpec, coeffs: jnp.ndarray, g: int,
                inverse: bool = False) -> jnp.ndarray:
    """Multiply coefficient i by g^i (or g^-i): maps evals on D to evals on
    g*D. Reference: `math::multiply_by_coset` (used `r1cs_to_qap.hpp:266-315`)."""
    n = coeffs.shape[-1]
    gg = pow(g, -1, fs.p) if inverse else (g % fs.p)
    pw = L.powers(fs, gg, n)
    pw = pw.reshape(pw.shape[:1] + (1,) * (coeffs.ndim - 2) + (n,))
    return L.mont_mul(fs, coeffs, pw)


def coset_ntt(fs: FieldSpec, coeffs: jnp.ndarray, g: int) -> jnp.ndarray:
    """Evaluate on the coset g*D (for quotient computation where Z(g w^i) is
    a nonzero constant — replaces `divide_by_z_on_coset`'s domain trick)."""
    return ntt(fs, coset_scale(fs, coeffs, g), inverse=False)


def coset_intt(fs: FieldSpec, evals: jnp.ndarray, g: int) -> jnp.ndarray:
    return coset_scale(fs, ntt(fs, evals, inverse=True), g, inverse=True)


def divide_by_vanishing(fs: FieldSpec, coeffs: jnp.ndarray,
                        n_rows: int) -> jnp.ndarray:
    """T = F / (x^n - 1) for F known divisible by the vanishing polynomial.

    TPU-friendly replacement for the reference's coefficient-form long
    division (`prover.hpp:275-283` F_consolidated / Z): evaluate F on the
    coset g*D_m (where Z never vanishes), divide pointwise with one batched
    inverse, and transform back. coeffs: (NL, m) with m > n_rows a power of
    two; returns (NL, m) coefficients of T (top n_rows coeffs zero)."""
    m = coeffs.shape[-1]
    assert m > n_rows and m & (m - 1) == 0
    g = fs.generator
    ev = coset_ntt(fs, coeffs, g)
    plan = get_plan(fs, m.bit_length() - 1)
    # Z(g w^i) = g^n w^(i n) - 1
    wn = pow(plan.omega, n_rows, fs.p)
    zv = L.mont_mul(fs, L.powers(fs, wn, m),
                    L.const_mont(fs, pow(g, n_rows, fs.p), (1,)))
    zv = L.sub(fs, zv, L.ones_mont(fs, (m,)))
    t_ev = L.mont_mul(fs, ev, L.batch_inverse(fs, zv, axis=1))
    return coset_intt(fs, t_ev, g)


def sum_reduce(fs: FieldSpec, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Modular sum along an axis via log-depth halving."""
    if axis < 0:
        axis = x.ndim + axis
    n = x.shape[axis]
    # pad to power of two with zeros
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, m - n)
        x = jnp.pad(x, pad)
    while m > 1:
        half = m // 2
        idx_lo = [slice(None)] * x.ndim
        idx_hi = [slice(None)] * x.ndim
        idx_lo[axis] = slice(0, half)
        idx_hi[axis] = slice(half, m)
        x = L.add(fs, x[tuple(idx_lo)], x[tuple(idx_hi)])
        m = half
    return jnp.squeeze(x, axis=axis)
