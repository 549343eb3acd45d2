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
import random
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


@dataclasses.dataclass(frozen=True)
class MinaSpongeParams:
    """Mina/kimchi Poseidon parameters (55 full rounds, x^7 S-box, width
    3, rate 2) — the fr/fq `sponge_params` the reference loads from its
    Mina-exported fixture (`data/kimchi_const.json`)."""
    p: int
    mds: tuple            # 3x3
    round_constants: tuple  # 55 x 3

    @classmethod
    def from_json(cls, p: int, obj: dict) -> "MinaSpongeParams":
        return cls(p=p,
                   mds=tuple(tuple(int(x, 16) for x in row)
                             for row in obj["mds"]),
                   round_constants=tuple(tuple(int(x, 16) for x in row)
                                         for row in obj["round_constants"]))


class MinaSponge:
    """Mina's ArithmeticSponge automaton (proof-systems/poseidon): rate-2
    absorb positions, squeeze positions, permutation = 55 rounds of
    {x^7 S-box; MDS; + round constants}. Duck-types `PoseidonSponge`."""

    RATE = 2

    def __init__(self, params: MinaSpongeParams):
        self.params = params
        self.state = [0, 0, 0]
        self.pos = 0
        self.squeezing = False

    def _permute(self):
        p = self.params.p
        mds = self.params.mds
        st = self.state
        for rc in self.params.round_constants:
            s0 = pow(st[0], 7, p)
            s1 = pow(st[1], 7, p)
            s2 = pow(st[2], 7, p)
            st = [(mds[i][0] * s0 + mds[i][1] * s1 + mds[i][2] * s2
                   + rc[i]) % p for i in range(3)]
        self.state = st

    def absorb(self, v: int):
        if self.squeezing:
            self.squeezing = False
            self.pos = 0
        if self.pos == self.RATE:
            self._permute()
            self.pos = 0
        self.state[self.pos] = (self.state[self.pos] + v) % self.params.p
        self.pos += 1

    def squeeze(self) -> int:
        if not self.squeezing or self.pos == self.RATE:
            self._permute()
            self.squeezing = True
            self.pos = 0
        out = self.state[self.pos]
        self.pos += 1
        return out

    def clone(self) -> "MinaSponge":
        other = MinaSponge(self.params)
        other.state = list(self.state)
        other.pos = self.pos
        other.squeezing = self.squeezing
        return other


class KimchiSponge:
    """Fq/Fr sponge with 128-bit limb challenges and endo-scalar mapping.
    With `params` (Mina fixture constants) the sponge is bit-compatible
    with kimchi; without, a self-consistent Poseidon stands in (synthetic
    indexes/tests)."""

    def __init__(self, fs: FieldSpec,
                 params: "MinaSpongeParams | None" = None):
        self.fs = fs
        self.params = params
        self.sponge = MinaSponge(params) if params is not None \
            else PoseidonSponge(fs)

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


# ---------------------------------------------------------------------------
# verifier index / proof structures (`verifier_index.hpp:60-103`,
# `proof.hpp:41-188`)
# ---------------------------------------------------------------------------

COLUMNS = 15
PERMUTES = 7


@dataclasses.dataclass
class Linearization:
    """`expr.hpp` Linearization: the constant term (evaluated on cells into
    ft_eval0) and per-column index terms (evaluated into f_comm scalars)."""
    constant_term: list
    index_term: list            # [(column_key, [PolishToken])]


@dataclasses.dataclass
class VerifierIndex:
    """`verifier_index.hpp:60-103` (lookups omitted: lookup_index_is_used
    is never set by the reference's own test fixtures)."""
    srs: object                 # kimchi_pedersen.SRS
    domain: Domain              # radix-2 domain over the scalar field
    max_poly_size: int
    sigma_comm: list            # PERMUTES PolyComm
    coefficients_comm: list     # COLUMNS PolyComm
    generic_comm: object
    psm_comm: object
    shift: list                 # PERMUTES scalars
    zkpm: list                  # coefficient form
    w: int                      # omega^(n - ZK_ROWS)
    endo: int
    linearization: Linearization
    powers_of_alpha: Alphas
    # Mina fixture sponge constants (None -> self-consistent Poseidon)
    fq_sponge_params: "MinaSpongeParams | None" = None
    fr_sponge_params: "MinaSpongeParams | None" = None


@dataclasses.dataclass
class ProofEvals:
    """Per-evaluation-point chunked openings (`base_proof_evaluation_type`).
    Every field is a list of chunks (single chunk when deg < max_poly_size)."""
    w: list                     # COLUMNS x chunks
    z: list
    s: list                     # PERMUTES-1 x chunks
    generic_selector: list
    poseidon_selector: list

    def combine(self, pt: int, p: int) -> "ProofEvals":
        """Collapse chunks at pt = zeta^max_poly_size (`proof.hpp:88-131`)."""
        def ev(chunks):
            acc, s = 0, 1
            for c in chunks:
                acc = (acc + s * c) % p
                s = s * pt % p
            return acc
        return ProofEvals(w=[[ev(c)] for c in self.w], z=[ev(self.z)],
                          s=[[ev(c)] for c in self.s],
                          generic_selector=[ev(self.generic_selector)],
                          poseidon_selector=[ev(self.poseidon_selector)])


@dataclasses.dataclass
class ProverCommitments:
    w_comm: list                # COLUMNS PolyComm
    z_comm: object
    t_comm: object              # PERMUTES unshifted chunks


@dataclasses.dataclass
class PicklesProof:
    commitments: ProverCommitments
    proof: object               # kimchi_pedersen.OpeningProof
    evals: list                 # [ProofEvals@zeta, ProofEvals@zetaw]
    ft_eval1: int
    public_input: list
    prev_challenges: list       # [(chals, PolyComm)] recursion accumulators


class FqSponge(KimchiSponge):
    """`DefaultFqSponge`: absorbs curve points over the base field and
    squeezes 128-bit scalar challenges, optionally endo-mapped into Fr."""

    def __init__(self, fq: FieldSpec, fr_p: int,
                 params: "MinaSpongeParams | None" = None):
        super().__init__(fq, params)
        self.fr_p = fr_p

    def absorb_comm(self, comm):
        for pt in comm.unshifted:
            self.absorb_g(pt)

    def squeeze_challenge_field(self, endo_r: int) -> int:
        from ..transcript.kimchi import ScalarChallenge
        return ScalarChallenge(self.squeeze_limbs()).to_field(
            self.fr_p, endo_r)

    def copy(self) -> "FqSponge":
        other = FqSponge(self.fs, self.fr_p, self.params)
        if isinstance(self.sponge, MinaSponge):
            other.sponge = self.sponge.clone()
        else:
            other.sponge.state = list(self.sponge.state)
            other.sponge.buffer = list(self.sponge.buffer)
            other.sponge._fresh_output = self.sponge._fresh_output
        return other


class FrSponge(KimchiSponge):
    """`DefaultFrSponge`: absorbs the opened evaluations in the reference's
    order (`kimchi_transcript.hpp:122-158`)."""

    def absorb_evaluations(self, p_eval_i: list, e: ProofEvals):
        for v in p_eval_i:
            self.absorb_fr(v)
        for chunks in ([e.z, e.generic_selector, e.poseidon_selector]
                       + e.w + e.s):
            for v in chunks:
                self.absorb_fr(v)

    def squeeze_challenge_field(self, p: int, endo_r: int) -> int:
        from ..transcript.kimchi import ScalarChallenge
        return ScalarChallenge(self.squeeze_limbs()).to_field(p, endo_r)


# ---------------------------------------------------------------------------
# scalar recipes (`constraints.hpp:20-56`)
# ---------------------------------------------------------------------------

def perm_scalars(evals: list[ProofEvals], beta: int, gamma: int,
                 alphas: list[int], zkp_zeta: int, p: int) -> int:
    res = evals[1].z[0] * beta % p * alphas[0] % p * zkp_zeta % p
    for i in range(min(len(evals[0].w), len(evals[0].s))):
        res = res * ((gamma + beta * evals[0].s[i][0]
                      + evals[0].w[i][0]) % p) % p
    return -res % p


def gnrc_scalars(alphas: list[int], w_zeta: list[int],
                 generic_zeta: int, p: int) -> list[int]:
    res = []
    for alpha_pow, off in ((alphas[0], 0), (alphas[1], 3)):
        ag = alpha_pow * generic_zeta % p
        res += [ag * w_zeta[off] % p, ag * w_zeta[off + 1] % p,
                ag * w_zeta[off + 2] % p,
                ag * w_zeta[off] % p * w_zeta[off + 1] % p, ag]
    return res


def _evals_dict(evals: list[ProofEvals]) -> dict:
    d = {}
    for row, e in enumerate(evals):
        for i, c in enumerate(e.w):
            d[("witness", i, row)] = c[0]
        for i, c in enumerate(e.s):
            d[("s", i, row)] = c[0]
        d[("z", row)] = e.z[0]
        d[("generic_selector", row)] = e.generic_selector[0]
        d[("poseidon_selector", row)] = e.poseidon_selector[0]
    return d


def _eval_poly_coeffs(coeffs: list[int], x: int, p: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


# ---------------------------------------------------------------------------
# oracles (`oracles.hpp:139-450`)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RandomOracles:
    joint_combiner: tuple
    beta: int
    gamma: int
    alpha: int
    zeta: int
    v: int
    u: int


@dataclasses.dataclass
class OraclesResult:
    fq_sponge: FqSponge
    digest: int
    oracles: RandomOracles
    all_alphas: Alphas
    p_eval: list
    powers_of_eval_points_for_chunks: list
    polys: list                 # [(PolyComm, chunk evals)] recursion
    zeta1: int
    ft_eval0: int
    combined_inner_product: int


def prev_chal_evals(srs, chals: list[int], evaluation_points: list[int],
                    powers: list[int], p: int) -> list[list[int]]:
    """b-poly evaluations of one recursion accumulator
    (`oracles.hpp:89-137`)."""
    from ..commitments import kimchi_pedersen as KP
    b_len = 1 << len(chals)
    b = None
    out = []
    for i, pt in enumerate(evaluation_points):
        full = KP.b_poly(chals, pt, p)
        if len(srs.g) == b_len:
            out.append([full])
            continue
        if b is None:
            b = KP.b_poly_coefficients(chals, p)
        betaacc, diff = 1, 0
        for j in range(len(srs.g), b_len):
            diff = (diff + betaacc * b[j]) % p
            betaacc = betaacc * pt % p
        out.append([(full - diff * powers[i]) % p, diff])
    return out


def public_comm(index: VerifierIndex, public_input: list[int]):
    """Commitment to the negated public input polynomial from the SRS's
    precomputed Lagrange commitments (`verifier.hpp:77-94`)."""
    from ..commitments import kimchi_pedersen as KP
    p = index.srs.curve.fr.p
    lgr = index.srs.lagrange_bases[index.domain.n]   # PolyComm per L_i
    com = [lgr[i] for i in range(len(public_input))]
    elm = [-v % p for v in public_input]
    if not com:
        return KP.PolyComm([None])
    return KP.PolyComm.multi_scalar_mul(index.srs.curve, com, elm)


def oracles(proof: PicklesProof, index: VerifierIndex,
            p_comm) -> OraclesResult:
    from ..commitments import kimchi_pedersen as KP
    curve = index.srs.curve
    p = curve.fr.p
    n = index.domain.n
    omega = index.domain.omega

    fq_sponge = FqSponge(curve.fq, p, index.fq_sponge_params)
    fq_sponge.absorb_comm(p_comm)
    for c in proof.commitments.w_comm:
        fq_sponge.absorb_comm(c)
    joint_combiner = (0, 0)     # lookups unused (`oracles.hpp:170-192`)
    beta = fq_sponge.challenge()
    gamma = fq_sponge.challenge()
    fq_sponge.absorb_comm(proof.commitments.z_comm)
    alpha = fq_sponge.squeeze_challenge_field(index.endo)
    assert len(proof.commitments.t_comm.unshifted) == PERMUTES, \
        "IncorrectCommitmentLength(t)"
    fq_sponge.absorb_comm(proof.commitments.t_comm)
    zeta = fq_sponge.squeeze_challenge_field(index.endo)

    digest = fq_sponge.copy().digest(curve.fr)
    fr_sponge = FrSponge(curve.fr, index.fr_sponge_params)
    fr_sponge.absorb_fr(digest)

    zeta1 = pow(zeta, n, p)
    zetaw = zeta * omega % p
    all_alphas = index.powers_of_alpha
    all_alphas.instantiate(p, alpha)

    # negated public polynomial evaluations; the reference reuses the zeta
    # accumulator for the zetaw row (`oracles.hpp:287-302`) — evaluated
    # per-point here, which is the identity the Lagrange form demands
    p_eval = [[], []]
    if proof.public_input:
        n_inv = pow(n, -1, p)
        for row, pt in enumerate((zeta, zetaw)):
            acc, wi = 0, 1
            for v in proof.public_input:
                acc = (acc - v * pow((pt - wi) % p, -1, p) * wi) % p
                wi = wi * omega % p
            p_eval[row] = [acc * (pow(pt, n, p) - 1) % p * n_inv % p]

    for i in range(2):
        fr_sponge.absorb_evaluations(p_eval[i], proof.evals[i])
    fr_sponge.absorb_fr(proof.ft_eval1)

    v = fr_sponge.squeeze_challenge_field(p, index.endo)
    u = fr_sponge.squeeze_challenge_field(p, index.endo)

    evaluation_points = [zeta, zetaw]
    powers = [pow(zeta, index.max_poly_size, p),
              pow(zetaw, index.max_poly_size, p)]
    polys = [(comm, prev_chal_evals(index.srs, chals, evaluation_points,
                                    powers, p))
             for (chals, comm) in proof.prev_challenges]
    evals = [proof.evals[0].combine(powers[0], p),
             proof.evals[1].combine(powers[1], p)]

    # ft_eval0 (`oracles.hpp:359-398`)
    zkp = _eval_poly_coeffs(index.zkpm, zeta, p)
    zeta1m1 = (zeta1 - 1) % p
    alpha_powers = all_alphas.get_alphas(ArgumentType.PERMUTATION, 3)
    alpha0, alpha1, alpha2 = alpha_powers
    ft_eval0 = (evals[0].w[PERMUTES - 1][0] + gamma) % p \
        * evals[1].z[0] % p * alpha0 % p * zkp % p
    for i in range(len(evals[0].s)):
        ft_eval0 = ft_eval0 * ((beta * evals[0].s[i][0]
                                + evals[0].w[i][0] + gamma) % p) % p
    if p_eval[0]:
        ft_eval0 = (ft_eval0 - p_eval[0][0]) % p
    tmp = alpha0 * zkp % p * evals[0].z[0] % p
    for i in range(min(len(evals[0].w), len(index.shift))):
        tmp = tmp * ((gamma + beta * zeta % p * index.shift[i]
                      + evals[0].w[i][0]) % p) % p
    ft_eval0 = (ft_eval0 - tmp) % p
    numerator = ((zeta1m1 * alpha1 % p * ((zeta - index.w) % p)
                  + zeta1m1 * alpha2 % p * ((zeta - 1) % p)) % p) \
        * ((1 - evals[0].z[0]) % p) % p
    denominator = (zeta - index.w) % p * ((zeta - 1) % p) % p
    ft_eval0 = (ft_eval0 + numerator * pow(denominator, -1, p)) % p
    cs = Constants(alpha=alpha, beta=beta, gamma=gamma,
                   joint_combiner=joint_combiner[1],
                   endo_coefficient=index.endo, mds=[])
    ft_eval0 = (ft_eval0 - evaluate_polish(
        index.linearization.constant_term, index.domain, zeta,
        _evals_dict(evals), cs)) % p

    # combined inner product over the full opened list (`oracles.hpp:401-441`)
    es = [(chunked, -1) for (_c, chunked) in polys]
    es.append((p_eval, -1))
    es.append(([[ft_eval0], [proof.ft_eval1]], -1))
    es.append(([proof.evals[0].z, proof.evals[1].z], -1))
    es.append(([proof.evals[0].generic_selector,
                proof.evals[1].generic_selector], -1))
    es.append(([proof.evals[0].poseidon_selector,
                proof.evals[1].poseidon_selector], -1))
    for i in range(len(proof.evals[0].w)):
        es.append(([proof.evals[0].w[i], proof.evals[1].w[i]], -1))
    for i in range(len(proof.evals[0].s)):
        es.append(([proof.evals[0].s[i], proof.evals[1].s[i]], -1))
    cip = KP.combined_inner_product(evaluation_points, v, u, es,
                                    len(index.srs.g), p)

    return OraclesResult(
        fq_sponge=fq_sponge, digest=digest,
        oracles=RandomOracles(joint_combiner, beta, gamma, alpha, zeta,
                              v, u),
        all_alphas=all_alphas, p_eval=p_eval,
        powers_of_eval_points_for_chunks=powers, polys=polys, zeta1=zeta1,
        ft_eval0=ft_eval0, combined_inner_product=cip)


# ---------------------------------------------------------------------------
# to_batch / batch_verify (`verifier.hpp:68-388`)
# ---------------------------------------------------------------------------

def to_batch(index: VerifierIndex, proof: PicklesProof):
    """Partial verification: defer the opening, return the batch entry
    (`verifier.hpp:68-366`)."""
    from ..commitments import kimchi_pedersen as KP
    curve = index.srs.curve
    p = curve.fr.p

    p_comm = public_comm(index, proof.public_input)
    res = oracles(proof, index, p_comm)
    o = res.oracles
    evals = [proof.evals[0].combine(res.powers_of_eval_points_for_chunks[0],
                                    p),
             proof.evals[1].combine(res.powers_of_eval_points_for_chunks[1],
                                    p)]

    # linearized commitment f_comm (`verifier.hpp:119-250`)
    zkp = _eval_poly_coeffs(index.zkpm, o.zeta, p)
    alphas = res.all_alphas.get_alphas(ArgumentType.PERMUTATION, 3)
    commitments = [index.sigma_comm[PERMUTES - 1]]
    scalars = [perm_scalars(evals, o.beta, o.gamma, alphas, zkp, p)]
    generic = gnrc_scalars(alphas, [c[0] for c in evals[0].w],
                           evals[0].generic_selector[0], p)
    scalars += generic
    commitments += index.coefficients_comm[:len(generic)]
    cs = Constants(alpha=o.alpha, beta=o.beta, gamma=o.gamma,
                   joint_combiner=o.joint_combiner[1],
                   endo_coefficient=index.endo, mds=[])
    ed = _evals_dict(evals)
    for (col, tokens) in index.linearization.index_term:
        scalar = evaluate_polish(tokens, index.domain, o.zeta, ed, cs)
        kind = col[0]
        if kind == "witness":
            commitments.append(proof.commitments.w_comm[col[1]])
        elif kind == "coefficient":
            commitments.append(index.coefficients_comm[col[1]])
        elif kind == "z":
            commitments.append(proof.commitments.z_comm)
        else:
            raise ValueError(f"unsupported linearization column {col}")
        scalars.append(scalar)
    f_comm = KP.PolyComm.multi_scalar_mul(curve, commitments, scalars)

    # chunked ft commitment (`verifier.hpp:252-257`)
    zeta_to_srs_len = pow(o.zeta, index.max_poly_size, p)
    chunked_f = f_comm.chunk_commitment(curve, zeta_to_srs_len)
    chunked_t = proof.commitments.t_comm.chunk_commitment(
        curve, zeta_to_srs_len)
    ft_comm = chunked_f.sub(
        curve, chunked_t.scale(curve, (res.zeta1 - 1) % p))

    # opened polynomials, in the order the prover aggregates them
    # (`verifier.hpp:259-353`)
    evaluation = [(comm, chunked, -1) for (comm, chunked) in res.polys]
    evaluation.append((p_comm, res.p_eval, -1))
    evaluation.append((ft_comm, [[res.ft_eval0], [proof.ft_eval1]], -1))
    evaluation.append((proof.commitments.z_comm,
                       [proof.evals[0].z, proof.evals[1].z], -1))
    evaluation.append((index.generic_comm,
                       [proof.evals[0].generic_selector,
                        proof.evals[1].generic_selector], -1))
    evaluation.append((index.psm_comm,
                       [proof.evals[0].poseidon_selector,
                        proof.evals[1].poseidon_selector], -1))
    for i in range(COLUMNS):
        evaluation.append((proof.commitments.w_comm[i],
                           [proof.evals[0].w[i], proof.evals[1].w[i]], -1))
    for i in range(PERMUTES - 1):
        evaluation.append((index.sigma_comm[i],
                           [proof.evals[0].s[i], proof.evals[1].s[i]], -1))

    return KP.BatchProof(
        sponge=res.fq_sponge, evaluation=evaluation,
        evaluation_points=[o.zeta, o.zeta * index.domain.omega % p],
        xi=o.v, r=o.u, opening=proof.proof)


def batch_verify(group_map, proofs: list[tuple]) -> bool:
    """`verifier.hpp:368-378`: partially verify every proof, then one
    aggregated MSM check."""
    from ..commitments import kimchi_pedersen as KP
    srs = proofs[0][0].srs
    batch = [to_batch(index, proof) for (index, proof) in proofs]
    return KP.verify_eval(srs, group_map, batch)


def verify(group_map, index: VerifierIndex, proof: PicklesProof) -> bool:
    return batch_verify(group_map, [(index, proof)])


# ---------------------------------------------------------------------------
# synthetic index + honest prover (test harness)
# ---------------------------------------------------------------------------
#
# The reference verifies Mina-exported fixtures
# (`test/systems/plonk/pickles/data/`) that live outside its repo; its own
# kimchi prover does not exist. To exercise to_batch/batch_verify end-to-end
# we build an honest instance instead: witness columns are free, z == 1, and
# sigma_i(x) = shift_i * x so the permutation product telescopes to zero —
# the quotient t is identically zero and every verifier formula (ft_eval0,
# perm_scalars, PolishToken linearization, p_comm, recursion b-polys, the
# batched IPA opening) is exercised with nonzero witness data.

def synthetic_index(srs, n: int, rng: random.Random) -> VerifierIndex:
    from ..commitments import kimchi_pedersen as KP
    from ..poly.domain import get_domain
    p = srs.curve.fr.p
    domain = get_domain(srs.curve.fr, n)
    KP.add_lagrange_basis(srs, n, domain.omega)

    shift = [1] + [rng.randrange(2, p) for _ in range(PERMUTES - 1)]
    sigma_comm = [KP.commit(srs, [0, s], blind=KP.PolyBlind([0]))[0]
                  for s in shift]
    zero = KP.commit(srs, [0], blind=KP.PolyBlind([0]))[0]
    coefficients_comm = [zero] * COLUMNS

    # zkpm = prod_{j=n-ZK_ROWS..n-1} (x - w^j)
    zkpm = [1]
    for j in range(n - ZK_ROWS, n):
        root = domain.element(j)
        zkpm = [(c0 - root * c1) % p
                for c0, c1 in zip([0] + zkpm, zkpm + [0])]

    # index terms: beta * w2(zeta) + gamma on column w0; alpha * z(zetaw)
    # on column w1 — arbitrary programs, the identity is restored by the
    # constant term below
    prog0 = [PolishToken(Tok.BETA), PolishToken(Tok.CELL, ("witness", 2, 0)),
             PolishToken(Tok.MUL), PolishToken(Tok.GAMMA),
             PolishToken(Tok.ADD)]
    prog1 = [PolishToken(Tok.ALPHA), PolishToken(Tok.CELL, ("z", 1)),
             PolishToken(Tok.MUL)]
    index_term = [(("witness", 0), prog0), (("witness", 1), prog1)]
    # constant term = -(prog0 * w0(zeta) + prog1 * w1(zeta)) so that
    # ft_eval0 + f(zeta) telescopes (ft = f for t == 0)
    constant = [PolishToken(Tok.LITERAL, 0)]
    constant += prog0 + [PolishToken(Tok.CELL, ("witness", 0, 0)),
                         PolishToken(Tok.MUL)]
    constant += prog1 + [PolishToken(Tok.CELL, ("witness", 1, 0)),
                         PolishToken(Tok.MUL), PolishToken(Tok.ADD),
                         PolishToken(Tok.SUB)]

    alphas = Alphas()
    alphas.register(ArgumentType.PERMUTATION, 3)

    return VerifierIndex(
        srs=srs, domain=domain, max_poly_size=len(srs.g),
        sigma_comm=sigma_comm, coefficients_comm=coefficients_comm,
        generic_comm=zero, psm_comm=zero, shift=shift, zkpm=zkpm,
        w=domain.element(n - ZK_ROWS), endo=srs.endo_r,
        linearization=Linearization(constant, index_term),
        powers_of_alpha=alphas)


def synthetic_prove(index: VerifierIndex, group_map,
                    rng: random.Random) -> PicklesProof:
    """Produce an honest kimchi-shaped proof against `synthetic_index`
    (transcript order mirrors `oracles.hpp:139-345`)."""
    from ..commitments import kimchi_pedersen as KP
    srs = index.srs
    curve = srs.curve
    p = curve.fr.p
    n = index.domain.n
    omega = index.domain.omega

    public_input = [0, 0]
    p_comm = public_comm(index, public_input)

    w_polys = [[rng.randrange(p) for _ in range(n)] for _ in range(COLUMNS)]
    w_committed = [KP.commit(srs, c, rng=rng) for c in w_polys]
    z_poly = [1]
    z_comm, z_blind = KP.commit(srs, z_poly, rng=rng)
    t_chunks = [KP.commit(srs, [0], rng=rng) for _ in range(PERMUTES)]
    t_comm = KP.PolyComm([c.unshifted[0] for c, _b in t_chunks])
    t_blinds = [b.unshifted[0] for _c, b in t_chunks]

    fq_sponge = FqSponge(curve.fq, p, index.fq_sponge_params)
    fq_sponge.absorb_comm(p_comm)
    for c, _b in w_committed:
        fq_sponge.absorb_comm(c)
    beta = fq_sponge.challenge()
    gamma = fq_sponge.challenge()
    fq_sponge.absorb_comm(z_comm)
    alpha = fq_sponge.squeeze_challenge_field(index.endo)
    fq_sponge.absorb_comm(t_comm)
    zeta = fq_sponge.squeeze_challenge_field(index.endo)
    digest = fq_sponge.copy().digest(curve.fr)

    zetaw = zeta * omega % p
    sigma_polys = [[0, s] for s in index.shift]

    def evals_at(pt):
        return ProofEvals(
            w=[[_eval_poly_coeffs(c, pt, p)] for c in w_polys],
            z=[_eval_poly_coeffs(z_poly, pt, p)],
            s=[[_eval_poly_coeffs(sigma_polys[i], pt, p)]
               for i in range(PERMUTES - 1)],
            generic_selector=[0], poseidon_selector=[0])

    evals = [evals_at(zeta), evals_at(zetaw)]
    p_eval = [[0], [0]]         # zero public input

    # linearized f = perm_scalar * sigma_6 + sum tok_scalar_j * w_j
    zkp = _eval_poly_coeffs(index.zkpm, zeta, p)
    all_alphas = index.powers_of_alpha
    all_alphas.instantiate(p, alpha)
    alphas = all_alphas.get_alphas(ArgumentType.PERMUTATION, 3)
    f_scalar0 = perm_scalars(evals, beta, gamma, alphas, zkp, p)
    cs = Constants(alpha=alpha, beta=beta, gamma=gamma, joint_combiner=0,
                   endo_coefficient=index.endo, mds=[])
    ed = _evals_dict(evals)
    f_coeffs = [0] * n
    f_blind = 0
    for i, c in enumerate(sigma_polys[PERMUTES - 1]):
        f_coeffs[i] = (f_coeffs[i] + f_scalar0 * c) % p
    for (col, tokens) in index.linearization.index_term:
        scalar = evaluate_polish(tokens, index.domain, zeta, ed, cs)
        j = col[1]
        for i, c in enumerate(w_polys[j]):
            f_coeffs[i] = (f_coeffs[i] + scalar * c) % p
        f_blind = (f_blind + scalar
                   * w_committed[j][1].unshifted[0]) % p
    # ft = f - t * (zeta^n - 1); t == 0, but its blinds flow through
    zeta1 = pow(zeta, n, p)
    zeta_to_srs = pow(zeta, index.max_poly_size, p)
    t_blind_chunked = 0
    for b in reversed(t_blinds):
        t_blind_chunked = (t_blind_chunked * zeta_to_srs + b) % p
    ft_blind = (f_blind - t_blind_chunked * (zeta1 - 1)) % p
    ft_eval1 = _eval_poly_coeffs(f_coeffs, zetaw, p)

    fr_sponge = FrSponge(curve.fr, index.fr_sponge_params)
    fr_sponge.absorb_fr(digest)
    for i in range(2):
        fr_sponge.absorb_evaluations(p_eval[i], evals[i])
    fr_sponge.absorb_fr(ft_eval1)
    v = fr_sponge.squeeze_challenge_field(p, index.endo)
    u = fr_sponge.squeeze_challenge_field(p, index.endo)

    # one recursion accumulator: committed b-poly of random challenges
    chals = [rng.randrange(1, p)
             for _ in range((len(srs.g) - 1).bit_length())]
    b_coeffs = KP.b_poly_coefficients(chals, p)
    prev_comm = KP.commit(srs, b_coeffs, blind=KP.PolyBlind([0]))[0]

    plms = [KP.PolyOpen(b_coeffs, KP.PolyBlind([0]))]
    plms.append(KP.PolyOpen([0], KP.PolyBlind([0])))            # public
    plms.append(KP.PolyOpen(f_coeffs, KP.PolyBlind([ft_blind])))  # ft
    plms.append(KP.PolyOpen(z_poly, z_blind))
    plms.append(KP.PolyOpen([0], KP.PolyBlind([0])))            # generic
    plms.append(KP.PolyOpen([0], KP.PolyBlind([0])))            # psm
    for c, (_comm, blind) in zip(w_polys, w_committed):
        plms.append(KP.PolyOpen(c, blind))
    for i in range(PERMUTES - 1):
        plms.append(KP.PolyOpen(sigma_polys[i], KP.PolyBlind([0])))

    opening = KP.proof_eval(srs, group_map, plms, [zeta, zetaw], v, u,
                            fq_sponge, rng=rng)

    return PicklesProof(
        commitments=ProverCommitments(
            w_comm=[c for c, _b in w_committed], z_comm=z_comm,
            t_comm=t_comm),
        proof=opening, evals=evals, ft_eval1=ft_eval1,
        public_input=public_input, prev_challenges=[(chals, prev_comm)])
