"""Pickles / kimchi verifier building blocks.

`systems/plonk/pickles/`: the Mina-proof verifier components that are
self-contained (fixture-independent):

- `Alphas` powers registry (`alphas.hpp`);
- `PolishToken` stack evaluator for linearization expressions
  (`expr.hpp:107-235`) incl. VanishesOnLast4Rows / UnnormalizedLagrangeBasis
  helpers;
- the kimchi Fq/Fr sponges with 128-bit scalar challenges
  (`transcript/kimchi_transcript.hpp:59-279`), built on our Poseidon
  permutation over the pasta fields.

The full `to_batch`/`batch_verify` flow (`pickles/verifier.hpp:68-386`)
consumes Mina-exported verifier indexes and JSON proof fixtures
(`test/systems/plonk/pickles/data/`); those constants live outside the
reference repo, so end-to-end Mina-proof verification is exercised here
against synthetic indexes built from the same structures, with the
commitment layer backed by `commitments/ipa.py` over pallas.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

from ..fields.params import FieldSpec
from ..poly.domain import Domain
from ..transcript.poseidon_transcript import PoseidonSponge


# ---------------------------------------------------------------------------
# Alphas (`alphas.hpp`)
# ---------------------------------------------------------------------------

class ArgumentType(enum.Enum):
    GATE = 0
    PERMUTATION = 1
    LOOKUP = 2


class Alphas:
    def __init__(self):
        self.next_power = 0
        self.mapping: dict[ArgumentType, tuple[int, int]] = {}
        self.alphas: list[int] = []

    def register(self, arg: ArgumentType, power: int):
        if arg not in self.mapping:
            self.mapping[arg] = (self.next_power, power)
        self.next_power += power

    def instantiate(self, p: int, alpha: int):
        self.alphas = [1]
        for _ in range(1, self.next_power):
            self.alphas.append(self.alphas[-1] * alpha % p)

    def get_alphas(self, arg: ArgumentType, num: int) -> list[int]:
        start, power = self.mapping[arg]
        assert num <= power
        return self.alphas[start:start + num]


# ---------------------------------------------------------------------------
# PolishToken evaluator (`expr.hpp:107-235`)
# ---------------------------------------------------------------------------

class Tok(enum.Enum):
    ALPHA = 0
    BETA = 1
    GAMMA = 2
    JOINT_COMBINER = 3
    ENDO_COEFFICIENT = 4
    MDS = 5
    LITERAL = 6
    CELL = 7
    DUP = 8
    POW = 9
    ADD = 10
    MUL = 11
    SUB = 12
    VANISHES_ON_LAST_4_ROWS = 13
    UNNORMALIZED_LAGRANGE_BASIS = 14
    STORE = 15
    LOAD = 16


@dataclasses.dataclass
class PolishToken:
    token: Tok
    value: object = None     # literal int / (row, col) mds / cell key /
                             # pow exponent / lagrange offset / load index


@dataclasses.dataclass
class Constants:
    alpha: int
    beta: int
    gamma: int
    joint_combiner: int
    endo_coefficient: int
    mds: list[list[int]]


ZK_ROWS = 3  # kimchi reserves the last 3+1 rows for zero-knowledge


def eval_vanishes_on_last_4_rows(domain: Domain, pt: int) -> int:
    p = domain.fs.p
    w4 = domain.element(domain.n - (ZK_ROWS + 1))
    acc = 1
    w = w4
    for _ in range(ZK_ROWS + 1):
        acc = acc * ((pt - w) % p) % p
        w = w * domain.omega % p
    return acc


def unnormalized_lagrange_basis(domain: Domain, i: int, pt: int) -> int:
    """(pt^n - 1) / (pt - w^i), i possibly negative (from the end)."""
    p = domain.fs.p
    omega_i = domain.element(i % domain.n)
    return domain.evaluate_vanishing(pt) \
        * pow((pt - omega_i) % p, -1, p) % p


def evaluate_polish(tokens: list[PolishToken], domain: Domain, pt: int,
                    evals: dict, c: Constants) -> int:
    """Stack machine over mod-p ints; `evals` maps cell keys -> values."""
    p = domain.fs.p
    stack: list[int] = []
    cache: list[int] = []
    for t in tokens:
        k = t.token
        if k == Tok.ALPHA:
            stack.append(c.alpha)
        elif k == Tok.BETA:
            stack.append(c.beta)
        elif k == Tok.GAMMA:
            stack.append(c.gamma)
        elif k == Tok.JOINT_COMBINER:
            stack.append(c.joint_combiner)
        elif k == Tok.ENDO_COEFFICIENT:
            stack.append(c.endo_coefficient)
        elif k == Tok.MDS:
            r, cc = t.value
            stack.append(c.mds[r][cc])
        elif k == Tok.VANISHES_ON_LAST_4_ROWS:
            stack.append(eval_vanishes_on_last_4_rows(domain, pt))
        elif k == Tok.UNNORMALIZED_LAGRANGE_BASIS:
            stack.append(unnormalized_lagrange_basis(domain, t.value, pt))
        elif k == Tok.LITERAL:
            stack.append(t.value % p)
        elif k == Tok.DUP:
            stack.append(stack[-1])
        elif k == Tok.CELL:
            stack.append(evals[t.value] % p)
        elif k == Tok.POW:
            stack[-1] = pow(stack[-1], t.value, p)
        elif k == Tok.ADD:
            y, x = stack.pop(), stack.pop()
            stack.append((x + y) % p)
        elif k == Tok.MUL:
            y, x = stack.pop(), stack.pop()
            stack.append(x * y % p)
        elif k == Tok.SUB:
            y, x = stack.pop(), stack.pop()
            stack.append((x - y) % p)
        elif k == Tok.STORE:
            cache.append(stack[-1])
        elif k == Tok.LOAD:
            stack.append(cache[t.value])
        else:
            raise ValueError(k)
    assert len(stack) == 1
    return stack[0] % p


# ---------------------------------------------------------------------------
# kimchi transcript (`kimchi_transcript.hpp:59-279`)
# ---------------------------------------------------------------------------

CHALLENGE_LENGTH_IN_LIMBS = 2   # 128-bit challenges (2 x 64-bit limbs)


class KimchiSponge:
    """Fq/Fr sponge with 128-bit limb challenges and endo-scalar mapping."""

    def __init__(self, fs: FieldSpec):
        self.fs = fs
        self.sponge = PoseidonSponge(fs)

    def absorb_fr(self, v: int):
        self.sponge.absorb(v % self.fs.p)

    def absorb_g(self, pt):
        if pt is None:
            self.sponge.absorb(0)
            self.sponge.absorb(0)
        else:
            self.sponge.absorb(pt[0])
            self.sponge.absorb(pt[1])

    def squeeze_limbs(self, num_limbs: int = CHALLENGE_LENGTH_IN_LIMBS) -> int:
        v = self.sponge.squeeze()
        return v & ((1 << (64 * num_limbs)) - 1)

    def challenge(self) -> int:
        """128-bit challenge (`ScalarChallenge`)."""
        return self.squeeze_limbs()

    def challenge_fq(self) -> int:
        return self.sponge.squeeze()

    def digest(self, target_fs: FieldSpec) -> int:
        return self.sponge.squeeze() % target_fs.p
