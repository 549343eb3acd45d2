"""Poseidon permutation: vectorized TPU kernel + host scalar oracle.

The reference consumes Poseidon from crypto3-hash (nil/Mina flavors,
`fiat_shamir.hpp:33-39`, SURVEY.md §2.0). The sibling repo's constants are
not vendored here, so this module generates parameters with the ORIGINAL
Poseidon reference method (Grain LFSR round constants + Cauchy MDS matrix,
as in the Poseidon paper's reference sage implementation) — deterministic,
reproducible, and parameterized per field. Width t=3 (rate 2, capacity 1),
R_F=8 full rounds, R_P=57 partial (256-bit security margin for ~255-bit p).

The device kernel runs the permutation over a BATCH of states: shape
(t, NL, n) — one batched x^alpha S-box (2 squarings + 1 mul) and a 3x3
constant MDS mix per round, all fused elementwise limb math on the VPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.params import FieldSpec
from . import limbs as L


# ---------------------------------------------------------------------------
# parameter generation (Grain LFSR, per the Poseidon reference implementation)
# ---------------------------------------------------------------------------

class _GrainLFSR:
    """80-bit Grain LFSR as one python int (bit 0 = s_0, oldest)."""

    def __init__(self, field_bits: int, t: int, r_f: int, r_p: int):
        bits = []
        bits += _int_bits(1, 2)          # field: GF(p)
        bits += _int_bits(0, 4)          # sbox: x^alpha
        bits += _int_bits(field_bits, 12)
        bits += _int_bits(t, 12)
        bits += _int_bits(r_f, 10)
        bits += _int_bits(r_p, 10)
        bits += [1] * 30
        assert len(bits) == 80
        v = 0
        for i, b in enumerate(bits):
            v |= b << i
        self.state = v
        for _ in range(160):
            self._next_bit()

    def _next_bit(self) -> int:
        s = self.state
        nb = ((s >> 62) ^ (s >> 51) ^ (s >> 38) ^ (s >> 23) ^ (s >> 13) ^ s) & 1
        self.state = (s >> 1) | (nb << 79)
        return nb

    def next_filtered_bit(self) -> int:
        while True:
            b1 = self._next_bit()
            b2 = self._next_bit()
            if b1:
                return b2

    def field_element(self, p: int, field_bits: int) -> int:
        while True:
            v = 0
            for _ in range(field_bits):
                v = (v << 1) | self.next_filtered_bit()
            if v < p:
                return v


def _int_bits(v: int, n: int) -> list[int]:
    return [(v >> (n - 1 - i)) & 1 for i in range(n)]


class PoseidonParams:
    def __init__(self, fs: FieldSpec, t: int = 3, r_f: int = 8, r_p: int = 57):
        self.fs = fs
        self.t = t
        self.r_f = r_f
        self.r_p = r_p
        # smallest alpha with gcd(alpha, p-1) == 1
        for alpha in (5, 7, 11, 13, 17):
            if _gcd(alpha, fs.p - 1) == 1:
                self.alpha = alpha
                break
        else:
            raise ValueError("no suitable alpha")
        lfsr = _GrainLFSR(fs.bits, t, r_f, r_p)
        n_rounds = r_f + r_p
        self.round_constants = [
            [lfsr.field_element(fs.p, fs.bits) for _ in range(t)]
            for _ in range(n_rounds)
        ]
        # Cauchy MDS: M[i][j] = 1 / (x_i + y_j), x_i = i, y_j = t + j
        self.mds = [
            [pow((i + t + j) % fs.p, -1, fs.p) for j in range(t)]
            for i in range(t)
        ]

    # --- device-side constant tensors (lazy; kept as NUMPY so that lazy
    # construction inside a jit trace cannot leak tracers) ---
    @functools.cached_property
    def rc_dev(self):
        # (rounds, NL, t, 1): scan xs over rounds; state layout is limb-first
        import numpy as np
        flat = [c * self.fs.R % self.fs.p
                for rc in self.round_constants for c in rc]
        arr = L.pack_ints(self.fs, flat)  # np (NL, rounds*t)
        r = arr.reshape(self.fs.nl, len(self.round_constants), self.t, 1)
        return np.ascontiguousarray(np.transpose(r, (1, 0, 2, 3)))

    @functools.cached_property
    def mds_dev(self):
        # (NL, t, t, 1)
        flat = [c * self.fs.R % self.fs.p for row in self.mds for c in row]
        arr = L.pack_ints(self.fs, flat)
        return arr.reshape(self.fs.nl, self.t, self.t, 1)


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a


@functools.lru_cache(maxsize=None)
def get_params(fs: FieldSpec, t: int = 3) -> PoseidonParams:
    return PoseidonParams(fs, t=t)


# ---------------------------------------------------------------------------
# host scalar permutation (oracle / transcript side)
# ---------------------------------------------------------------------------

def permute_host(pp: PoseidonParams, state: list[int]) -> list[int]:
    p, t = pp.fs.p, pp.t
    s = [x % p for x in state]
    half = pp.r_f // 2
    for r in range(pp.r_f + pp.r_p):
        s = [(x + c) % p for x, c in zip(s, pp.round_constants[r])]
        if half <= r < half + pp.r_p:
            s[0] = pow(s[0], pp.alpha, p)  # partial round
        else:
            s = [pow(x, pp.alpha, p) for x in s]
        s = [sum(pp.mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]
    return s


def hash2_host(pp: PoseidonParams, a: int, b: int) -> int:
    """2-to-1 compression: state=[a,b,0] -> permute -> state[0]."""
    return permute_host(pp, [a, b, 0])[0]


# ---------------------------------------------------------------------------
# batched device permutation
# ---------------------------------------------------------------------------

def _sbox(fs: FieldSpec, x, alpha: int):
    if alpha == 5:
        x2 = L.mont_mul(fs, x, x)
        x4 = L.mont_mul(fs, x2, x2)
        return L.mont_mul(fs, x4, x)
    if alpha == 7:
        x2 = L.mont_mul(fs, x, x)
        x4 = L.mont_mul(fs, x2, x2)
        return L.mont_mul(fs, L.mont_mul(fs, x4, x2), x)
    return L.mont_pow_const(fs, x, alpha)


def _mds_mix(pp: PoseidonParams, s: jnp.ndarray) -> jnp.ndarray:
    """s: (NL, t, n) -> M @ s, constant 3x3 field matrix."""
    fs, t = pp.fs, pp.t
    mds = pp.mds_dev  # (NL, t, t, 1)
    rows = []
    for i in range(t):
        acc = L.mont_mul(fs, mds[:, i, 0], s[:, 0])
        for j in range(1, t):
            acc = L.add(fs, acc, L.mont_mul(fs, mds[:, i, j], s[:, j]))
        rows.append(acc)
    return jnp.stack(rows, axis=1)


@functools.partial(jax.jit, static_argnums=0)
def permute_batch(pp: PoseidonParams, state: jnp.ndarray) -> jnp.ndarray:
    """state: (NL, t, n) Montgomery form -> permuted state. Three lax.scans
    (first full rounds, partial rounds, last full rounds) keep the XLA graph
    at O(1) round bodies instead of O(R_F + R_P)."""
    fs = pp.fs
    rc = pp.rc_dev    # (rounds, NL, t, 1)
    half = pp.r_f // 2

    def full_round(s, rc_r):
        s = L.add(fs, s, rc_r)
        s = _sbox(fs, s, pp.alpha)
        return _mds_mix(pp, s), None

    def partial_round(s, rc_r):
        s = L.add(fs, s, rc_r)
        s0 = _sbox(fs, s[:, 0:1], pp.alpha)
        s = jnp.concatenate([s0, s[:, 1:]], axis=1)
        return _mds_mix(pp, s), None

    state, _ = jax.lax.scan(full_round, state, rc[:half])
    state, _ = jax.lax.scan(partial_round, state, rc[half:half + pp.r_p])
    state, _ = jax.lax.scan(full_round, state, rc[half + pp.r_p:])
    return state


@functools.partial(jax.jit, static_argnums=0)
def hash2_batch(pp: PoseidonParams, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 2-to-1 compression. a, b: (NL, n) -> (NL, n)."""
    n = a.shape[-1]
    state = jnp.stack([a, b, L.zeros(pp.fs, (n,))], axis=1)
    return permute_batch(pp, state)[:, 0]


# make PoseidonParams hashable/static for jit
PoseidonParams.__hash__ = lambda self: hash((self.fs, self.t, self.r_f, self.r_p))
PoseidonParams.__eq__ = lambda self, o: (
    isinstance(o, PoseidonParams)
    and (self.fs, self.t, self.r_f, self.r_p) == (o.fs, o.t, o.r_f, o.r_p))
