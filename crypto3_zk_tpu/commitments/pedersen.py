"""Pedersen verifiable secret sharing commitment.

`commitments/polynomial/pedersen.hpp:43-192` (Pedersen '81 VSS): commit
E_0 = g^s h^t, deal shares along two degree-(k-1) polynomials, publish
coefficient commitments E_i; any k of n parties verify and reconstruct.
Host group math — the scheme is O(n*k) tiny operations.
"""
from __future__ import annotations

import dataclasses
import random

from ..fields import curves as CV


@dataclasses.dataclass
class PedersenParams:
    curve: CV.CurveSpec
    n: int
    k: int
    g: tuple
    h: tuple


@dataclasses.dataclass
class PedersenPrivateKey:
    s: int
    t: int


@dataclasses.dataclass
class PedersenProof:
    E_0: tuple
    E: list
    pk: list[PedersenPrivateKey]


def key_generator(curve: CV.CurveSpec, n: int, k: int,
                  rng: random.Random | None = None) -> PedersenParams:
    rng = rng if rng is not None else random.SystemRandom()
    g = CV.g1_mul(curve, curve.g1, rng.randrange(1, curve.fr.p))
    h = g
    while h == g:
        h = CV.g1_mul(curve, curve.g1, rng.randrange(1, curve.fr.p))
    return PedersenParams(curve, n, k, g, h)


def commitment(params: PedersenParams, pk: PedersenPrivateKey):
    c = params.curve
    return CV.g1_add(c, CV.g1_mul(c, params.g, pk.s),
                     CV.g1_mul(c, params.h, pk.t))


def _poly_eval(params: PedersenParams, coeffs: list[int]) -> list[int]:
    p = params.curve.fr.p
    out = []
    for i in range(1, params.n + 1):
        spare = 1
        total = coeffs[0]
        for j in range(1, params.k):
            spare = spare * i % p
            total = (total + spare * coeffs[j]) % p
        out.append(total)
    return out


def proof_eval(params: PedersenParams, w: int,
               rng: random.Random | None = None) -> PedersenProof:
    rng = rng if rng is not None else random.SystemRandom()
    p = params.curve.fr.p
    t = rng.randrange(p)
    E_0 = commitment(params, PedersenPrivateKey(w, t))
    f_coeffs = [w] + [rng.randrange(p) for _ in range(params.k - 1)]
    g_coeffs = [t] + [rng.randrange(p) for _ in range(params.k - 1)]
    s_i = _poly_eval(params, f_coeffs)
    t_i = _poly_eval(params, g_coeffs)
    pk = [PedersenPrivateKey(s, tt) for s, tt in zip(s_i, t_i)]
    E = [commitment(params, PedersenPrivateKey(f_coeffs[i], g_coeffs[i]))
         for i in range(1, params.k)]
    return PedersenProof(E_0, E, pk)


def verify_eval(params: PedersenParams, prf: PedersenProof) -> bool:
    c = params.curve
    p = c.fr.p
    for i in range(1, params.n + 1):
        E = commitment(params, prf.pk[i - 1])
        total = prf.E_0
        power = 1
        for j in range(1, params.k):
            power = power * i % p
            total = CV.g1_add(c, total, CV.g1_mul(c, prf.E[j - 1], power))
        if E != total:
            return False
    return True


def message_eval(params: PedersenParams, prf: PedersenProof,
                 idx: list[int]) -> int:
    """Lagrange reconstruction from k shares (`pedersen.hpp:165-190`)."""
    p = params.curve.fr.p
    if len(idx) < params.k or not verify_eval(params, prf):
        return 0
    total = 0
    for j in range(params.k):
        mult = 1
        for l in range(params.k):
            if l != j:
                mult = mult * idx[l] % p \
                    * pow((idx[l] - idx[j]) % p, -1, p) % p
        total = (total + mult * prf.pk[idx[j] - 1].s) % p
    return total
