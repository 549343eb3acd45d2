"""Schnorr-style proof of knowledge of an exponent.

`commitments/polynomial/proof_of_knowledge.hpp:42` /
`detail/polynomial/element_proof_of_knowledge.hpp`: the contributor proves
knowledge of x by publishing (g1_s, x*g1_s, x*g2_s) where g2_s is derived by
hashing (personalization || transcript || g1_s || x*g1_s) to G2; the
verifier recomputes g2_s and checks the same-ratio pairing.

NOTE: g2_s here is derived as hash->scalar * G2 (not a full hash-to-curve
with unknown discrete log). The same-ratio verification algebra is
identical; swapping in a constant-time hash-to-G2 is a production hardening
TODO tracked for the native-extension pass.
"""
from __future__ import annotations

import dataclasses
import random

from ..fields import curves as CV
from ..transcript.hashes import blake2b_512


@dataclasses.dataclass
class PoK:
    g1_s: tuple
    g1_s_x: tuple
    g2_s_x: tuple


def _ser_g1(curve: CV.CurveSpec, pt) -> bytes:
    nb = (curve.fq.bits + 7) // 8
    if pt is None:
        return b"\x00" * (2 * nb)
    return pt[0].to_bytes(nb, "big") + pt[1].to_bytes(nb, "big")


def compute_g2_s(curve: CV.CurveSpec, g1_s, g1_s_x,
                 transcript: bytes, personalization: int):
    h = blake2b_512(bytes([personalization]) + transcript
                    + _ser_g1(curve, g1_s) + _ser_g1(curve, g1_s_x))
    k = int.from_bytes(h, "big") % curve.fr.p
    return CV.g2_mul(curve, curve.g2, k or 1)


def proof_eval(curve: CV.CurveSpec, x: int, transcript: bytes,
               personalization: int,
               rng: random.Random | None = None) -> PoK:
    rng = rng if rng is not None else random.SystemRandom()
    s = rng.randrange(1, curve.fr.p)
    g1_s = CV.g1_mul(curve, curve.g1, s)
    g1_s_x = CV.g1_mul(curve, g1_s, x)
    g2_s = compute_g2_s(curve, g1_s, g1_s_x, transcript, personalization)
    g2_s_x = CV.g2_mul(curve, g2_s, x)
    return PoK(g1_s, g1_s_x, g2_s_x)


def verify_eval(curve: CV.CurveSpec, pok: PoK, g2_s) -> bool:
    """same ratio: e(g1_s_x, g2_s) == e(g1_s, g2_s_x)."""
    return is_same_ratio(curve, (pok.g1_s, pok.g1_s_x), (g2_s, pok.g2_s_x))


def is_same_ratio(curve: CV.CurveSpec, g1_pair, g2_pair) -> bool:
    """e(a1, b2) == e(a2, b1) (`powers_of_tau.hpp` is_same_ratio)."""
    return CV.pairing(curve, g1_pair[0], g2_pair[1]) == \
        CV.pairing(curve, g1_pair[1], g2_pair[0])
