"""Mina/kimchi transcript surface.

`transcript/kimchi_transcript.hpp:59-279`: `BaseSponge` over Poseidon,
`DefaultFqSponge` (absorbs curve points over the base field, squeezes
128-bit `ScalarChallenge`s), `DefaultFrSponge` (absorbs scalar-side
evaluations), and the endomorphism-based `ScalarChallenge::to_field`
recomposition used by the pickles oracles. The sponge core lives in
`models/pickles.py::KimchiSponge`; this module adds the scalar-challenge
algebra and the named sponge roles.
"""
from __future__ import annotations

import dataclasses

from ..fields.params import FieldSpec
from ..models.pickles import CHALLENGE_LENGTH_IN_LIMBS, KimchiSponge


@dataclasses.dataclass(frozen=True)
class ScalarChallenge:
    """128-bit packed challenge with the GLV-endomorphism expansion."""
    value: int

    def to_field(self, p: int, endo_coeff: int) -> int:
        """kimchi's `ScalarChallenge.to_field`: interpret the 128 bits in
        pairs (r_{2i+1}, r_{2i}); accumulate a (endo side) and b (plain
        side) by +-1 and double each step; result a*endo + b mod p."""
        a, b = 2, 2
        v = self.value
        for i in range(63, -1, -1):
            a = a * 2 % p
            b = b * 2 % p
            r_2i = (v >> (2 * i)) & 1
            s = 1 if r_2i else -1
            if (v >> (2 * i + 1)) & 1 == 0:
                b = (b + s) % p
            else:
                a = (a + s) % p
        return (a * endo_coeff + b) % p


class DefaultFqSponge(KimchiSponge):
    """Base-field sponge: absorbs commitments (curve points), squeezes
    `ScalarChallenge`s for beta/gamma/alpha/zeta."""

    def squeeze_challenge(self) -> ScalarChallenge:
        return ScalarChallenge(self.squeeze_limbs(CHALLENGE_LENGTH_IN_LIMBS))


class DefaultFrSponge(KimchiSponge):
    """Scalar-field sponge: absorbs opened evaluations, squeezes the
    combined-inner-product challenges."""

    def absorb_evaluations(self, evals: list[int]):
        for e in evals:
            self.absorb_fr(e)

    def squeeze_challenge(self) -> ScalarChallenge:
        return ScalarChallenge(self.squeeze_limbs(CHALLENGE_LENGTH_IN_LIMBS))
