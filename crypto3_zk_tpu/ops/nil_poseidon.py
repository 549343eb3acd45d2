"""NilFoundation-flavor Poseidon permutation (Pallas base field).

The reference's Poseidon transcript and zkLLVM circuits use crypto3-hash's
`mina_poseidon_policy` (`fiat_shamir.hpp:241-242`): width 3, 55 FULL rounds,
x^7 S-box, round = `state <- MDS @ sbox(state) + rc` — a kimchi-style
schedule, different from the original-Poseidon order (`ops/poseidon.py`:
rc-add first, partial rounds). The constant tables live in the unvendored
crypto3-hash sibling; they are recovered here from the reference's OWN
artifact — the poseidon gate constraints of the real zkLLVM circuit dump
(see `nil_poseidon_constants.py` provenance note) — so the permutation is
pinned by data the reference ships, not trusted constants.

Host scalar permutation (transcript/Merkle oracle side) + batched device
kernel with ONE `lax.scan` round body (55 iterations, compile-light).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.params import FieldSpec
from . import limbs as L
from . import nil_poseidon_constants as NC

T = 3
N_ROUNDS = 55
ALPHA = 7


class NilPoseidonParams:
    """Duck-types the `PoseidonParams` surface the Merkle layer uses
    (fs, t, permute via the module functions). Hashable for jit-static."""

    def __init__(self, fs: FieldSpec):
        assert fs.p == NC.P, "nil poseidon constants are Pallas-Fq only"
        self.fs = fs
        self.t = T
        self.mds = NC.MDS
        self.round_constants = NC.ROUND_CONSTANTS
        self.alpha = ALPHA

    def __hash__(self):
        return hash(("nil_poseidon", self.fs))

    def __eq__(self, o):
        return isinstance(o, NilPoseidonParams) and o.fs == self.fs

    @functools.cached_property
    def rc_dev(self):
        # (rounds, NL, t, 1) Montgomery-form numpy (see PoseidonParams)
        import numpy as np
        flat = [c * self.fs.R % self.fs.p
                for rc in self.round_constants for c in rc]
        arr = L.pack_ints(self.fs, flat)
        r = arr.reshape(self.fs.nl, N_ROUNDS, T, 1)
        return np.ascontiguousarray(np.transpose(r, (1, 0, 2, 3)))

    @functools.cached_property
    def mds_dev(self):
        flat = [c * self.fs.R % self.fs.p for row in self.mds for c in row]
        return L.pack_ints(self.fs, flat).reshape(self.fs.nl, T, T, 1)


@functools.lru_cache(maxsize=None)
def get_params(fs: FieldSpec) -> NilPoseidonParams:
    return NilPoseidonParams(fs)


def permute_host(pp: NilPoseidonParams, state: list[int]) -> list[int]:
    p = pp.fs.p
    s = [x % p for x in state]
    for rc in pp.round_constants:
        sb = [pow(x, ALPHA, p) for x in s]
        s = [(sum(pp.mds[i][j] * sb[j] for j in range(T)) + rc[i]) % p
             for i in range(T)]
    return s


def hash2_host(pp: NilPoseidonParams, a: int, b: int) -> int:
    return permute_host(pp, [a, b, 0])[0]


@functools.partial(jax.jit, static_argnums=0)
def permute_batch(pp: NilPoseidonParams, state: jnp.ndarray) -> jnp.ndarray:
    """state: (NL, t, n) Montgomery form -> permuted. One scan body for all
    55 full rounds."""
    fs = pp.fs
    mds = pp.mds_dev

    def sbox7(x):
        x2 = L.mont_mul(fs, x, x)
        x4 = L.mont_mul(fs, x2, x2)
        return L.mont_mul(fs, L.mont_mul(fs, x4, x2), x)

    def round_(s, rc_r):
        sb = sbox7(s)
        rows = []
        for i in range(T):
            acc = L.mont_mul(fs, mds[:, i, 0], sb[:, 0])
            for j in range(1, T):
                acc = L.add(fs, acc, L.mont_mul(fs, mds[:, i, j], sb[:, j]))
            rows.append(acc)
        return L.add(fs, jnp.stack(rows, axis=1), rc_r), None

    state, _ = jax.lax.scan(round_, state, pp.rc_dev)
    return state


@functools.partial(jax.jit, static_argnums=0)
def hash2_batch(pp: NilPoseidonParams, a: jnp.ndarray,
                b: jnp.ndarray) -> jnp.ndarray:
    n = a.shape[-1]
    state = jnp.stack([a, b, L.zeros(pp.fs, (n,))], axis=1)
    return permute_batch(pp, state)[:, 0]
