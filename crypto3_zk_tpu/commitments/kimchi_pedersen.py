"""kimchi Pedersen / bulletproofs-IPA batched commitment scheme (Mina).

`commitments/polynomial/kimchi_pedersen.hpp:51-760`, redesigned for this
framework: the verifier aggregates EVERY batch into one random-linear-
combination MSM that must hit the identity (`verify_eval` `:645-758`), and
the prover's opening is the bulletproofs halving recursion with a final
Schnorr-style (delta, z1, z2) blinding argument (`proof_eval` `:385-560`).

Host-side bigint group math: this is the verifier/aggregation layer of
pickles — dozens of points per batch, latency-bound, below the size where
the device MSM pays for its dispatch (ops/msm_affine handles the >=2^10
regime). Chunking (`poly_comm`) keeps polynomials longer than the SRS as
vectors of segment commitments, with the optional `shifted` top segment
for degree-bound proofs.
"""
from __future__ import annotations

import dataclasses
import random
import secrets
from typing import Optional

from ..fields import curves as CV
from ..fields.group_map import GroupMap
from ..fields.params import FieldSpec
from .ipa import PlainCurve


# ---------------------------------------------------------------------------
# chunked polynomial commitments (`poly_comm`, kimchi_pedersen.hpp:109-249)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PolyComm:
    """Segment commitments; None entries are the group identity."""
    unshifted: list
    shifted: Optional[tuple] = None

    @staticmethod
    def multi_scalar_mul(curve: PlainCurve, commits: list["PolyComm"],
                         elm: list[int]) -> "PolyComm":
        """Per-segment MSM over a list of commitments
        (kimchi_pedersen.hpp:122-159)."""
        p = curve.fr.p
        shifted = None
        for c, e in zip(commits, elm):
            if c.shifted is not None:
                shifted = CV.g1_add(curve, shifted,
                                    CV.g1_mul(curve, c.shifted, e % p))
        n = min((len(c.unshifted) for c in commits), default=0)
        unshifted = []
        for i in range(n):
            acc = None
            for c, e in zip(commits, elm):
                if i < len(c.unshifted) and c.unshifted[i] is not None:
                    acc = CV.g1_add(
                        curve, acc, CV.g1_mul(curve, c.unshifted[i], e % p))
            unshifted.append(acc)
        return PolyComm(unshifted, shifted)

    def chunk_commitment(self, curve: PlainCurve, zeta_n: int) -> "PolyComm":
        """Horner-combine the segments at zeta^max_poly_size
        (kimchi_pedersen.hpp:161-173)."""
        res = None
        for pt in reversed(self.unshifted):
            res = CV.g1_mul(curve, res, zeta_n)
            res = CV.g1_add(curve, res, pt)
        return PolyComm([res], self.shifted)

    def sub(self, curve: PlainCurve, other: "PolyComm") -> "PolyComm":
        n = max(len(self.unshifted), len(other.unshifted))
        out = []
        for i in range(n):
            a = self.unshifted[i] if i < len(self.unshifted) else None
            b = other.unshifted[i] if i < len(other.unshifted) else None
            out.append(CV.g1_add(curve, a, CV.g1_neg(curve, b)))
        sh = self.shifted
        if other.shifted is not None:
            sh = CV.g1_add(curve, sh, CV.g1_neg(curve, other.shifted))
        return PolyComm(out, sh)

    def scale(self, curve: PlainCurve, c: int) -> "PolyComm":
        return PolyComm(
            [CV.g1_mul(curve, pt, c) for pt in self.unshifted],
            None if self.shifted is None
            else CV.g1_mul(curve, self.shifted, c))


@dataclasses.dataclass
class PolyBlind:
    """Blinding scalars matching a PolyComm's segments."""
    unshifted: list
    shifted: int = 0


# ---------------------------------------------------------------------------
# SRS (`params_type`, kimchi_pedersen.hpp:63-107)
# ---------------------------------------------------------------------------

def _cube_root_of_unity(p: int) -> int:
    assert p % 3 == 1
    g = 2
    while True:
        w = pow(g, (p - 1) // 3, p)
        if w != 1:
            return w
        g += 1


@dataclasses.dataclass
class SRS:
    curve: PlainCurve
    g: list
    h: tuple
    endo_r: int                       # endo coefficient in the scalar field
    endo_q: int                       # endo coefficient in the base field
    lagrange_bases: dict              # domain size -> [commit(L_i)]

    @property
    def size(self) -> int:
        return len(self.g)


def setup(curve: PlainCurve, depth: int,
          rng: random.Random | None = None) -> SRS:
    rng = rng if rng is not None else random.SystemRandom()
    p = curve.fr.p
    g = [CV.g1_mul(curve, curve.g1, rng.randrange(1, p))
         for _ in range(depth)]
    h = CV.g1_mul(curve, curve.g1, rng.randrange(1, p))
    return SRS(curve, g, h,
               endo_r=_cube_root_of_unity(curve.fr.p),
               endo_q=_cube_root_of_unity(curve.fq.p),
               lagrange_bases={})


def add_lagrange_basis(srs: SRS, domain_n: int, omega: int):
    """Commit the Lagrange basis over the radix-2 domain (unblinded):
    L_i = (1/n) sum_k omega^{-ik} x^k."""
    if domain_n in srs.lagrange_bases:
        return
    p = srs.curve.fr.p
    n_inv = pow(domain_n, -1, p)
    basis = []
    for i in range(domain_n):
        wi = pow(omega, -i, p)
        coeffs, acc = [], n_inv
        for _ in range(domain_n):
            coeffs.append(acc)
            acc = acc * wi % p
        basis.append(commit(srs, coeffs, blind=PolyBlind([0]))[0])
    srs.lagrange_bases[domain_n] = basis


def commit(srs: SRS, coeffs: list[int], bound: int = -1,
           rng: random.Random | None = None,
           blind: PolyBlind | None = None) -> tuple[PolyComm, PolyBlind]:
    """Chunked Pedersen commitment (kimchi_pedersen.hpp:334-384). Pass
    `blind` to fix blinding scalars (0 = unblinded index commitments);
    otherwise fresh CSPRNG blinds per segment."""
    curve = srs.curve
    p = curve.fr.p
    rng = rng if rng is not None else random.SystemRandom()
    gl = len(srs.g)
    segs = [coeffs[i:i + gl] for i in range(0, max(len(coeffs), 1), gl)]
    unshifted, blinds = [], []
    for si, seg in enumerate(segs):
        w = blind.unshifted[si] if blind is not None else rng.randrange(p)
        acc = CV.g1_mul(curve, srs.h, w)
        for fi, gi in zip(seg, srs.g):
            acc = CV.g1_add(curve, acc, CV.g1_mul(curve, gi, fi % p))
        unshifted.append(acc)
        blinds.append(w)
    shifted, sh_blind = None, 0
    if bound >= 0 and any(c % p for c in coeffs):
        start = bound - bound % gl
        tail = coeffs[start:]
        if tail:
            w = blind.shifted if blind is not None else rng.randrange(p)
            shifted = CV.g1_mul(curve, srs.h, w)
            for fi, gi in zip(tail, srs.g[gl - (bound % gl):]):
                shifted = CV.g1_add(curve, shifted,
                                    CV.g1_mul(curve, gi, fi % p))
            sh_blind = w
    return PolyComm(unshifted, shifted), PolyBlind(blinds, sh_blind)


# ---------------------------------------------------------------------------
# scalar helpers (`kimchi_functions.hpp`, b_poly kimchi_pedersen.hpp:615-643)
# ---------------------------------------------------------------------------

def shift_scalar(x: int, curve: PlainCurve) -> int:
    """kimchi's shift before absorbing an Fr scalar into the Fq sponge."""
    r = curve.fr.p
    two_pow = pow(2, r.bit_length(), r)
    if curve.fr.p < curve.fq.p:
        return (x - two_pow - 1) * pow(2, -1, r) % r
    return (x - two_pow) % r


def b_poly(chals: list[int], x: int, p: int) -> int:
    """prod_i (1 + chals[i] * x^(2^(k-1-i)))."""
    k = len(chals)
    pow_twos = [x % p]
    for _ in range(1, k):
        pow_twos.append(pow_twos[-1] * pow_twos[-1] % p)
    res = 1
    for i in range(k):
        res = res * (1 + chals[i] * pow_twos[k - 1 - i]) % p
    return res


def b_poly_coefficients(chals: list[int], p: int) -> list[int]:
    rounds = len(chals)
    s = [1] * (1 << rounds)
    k, kpow = 0, 1
    for i in range(1, len(s)):
        if i == kpow:
            k += 1
            kpow <<= 1
        s[i] = s[i - (kpow >> 1)] * chals[rounds - k] % p
    return s


def combined_inner_product(evaluation_points: list[int], xi: int, r: int,
                           polys: list[tuple], g_size: int, p: int) -> int:
    """(kimchi_pedersen.hpp:562-613). `polys`: (evaluations, bound) where
    evaluations[j][i] is poly j-th eval point, i-th chunk."""
    res, xi_i = 0, 1
    for evaluations, bound in polys:
        n_chunks = len(evaluations[0]) if evaluations else 0
        for i in range(n_chunks):
            term, rj = 0, 1
            for j in range(len(evaluations)):
                term = (term + rj * evaluations[j][i]) % p
                rj = rj * r % p
            res = (res + xi_i * term) % p
            xi_i = xi_i * xi % p
        if bound != -1:
            last = [ev[-1] for ev in evaluations] \
                if bound <= n_chunks * g_size else [0] * len(evaluation_points)
            term, rj = 0, 1
            for j, e in enumerate(evaluation_points):
                shifted = pow(e, g_size - bound % g_size, p) * last[j] % p
                term = (term + rj * shifted) % p
                rj = rj * r % p
            res = (res + xi_i * term) % p
            xi_i = xi_i * xi % p
    return res


# ---------------------------------------------------------------------------
# opening proof (`proof_type` + proof_eval, kimchi_pedersen.hpp:267-560)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OpeningProof:
    lr: list                          # [(L_i, R_i)]
    delta: tuple
    z1: int
    z2: int
    sg: tuple

    def challenges(self, endo_r: int, sponge) -> tuple[list[int], list[int]]:
        """Replay the halving challenges (kimchi_pedersen.hpp:278-289)."""
        p = sponge.fr_p
        chals = []
        for (l, r) in self.lr:
            sponge.absorb_g(l)
            sponge.absorb_g(r)
            chals.append(sponge.squeeze_challenge_field(endo_r))
        return chals, [pow(c, -1, p) for c in chals]


@dataclasses.dataclass
class PolyOpen:
    """One polynomial entering the aggregated opening."""
    coeffs: list
    blind: PolyBlind
    bound: int = -1


@dataclasses.dataclass
class BatchProof:
    """(`batchproof_type`) everything verify_eval needs for one proof."""
    sponge: object                    # fq sponge, state just after zeta
    evaluation: list                  # [(PolyComm, evaluations, bound)]
    evaluation_points: list
    xi: int                           # polyscale (v)
    r: int                            # evalscale (u)
    opening: OpeningProof


def proof_eval(srs: SRS, group_map: GroupMap, plms: list[PolyOpen],
               elm: list[int], polyscale: int, evalscale: int, sponge,
               rng: random.Random | None = None) -> OpeningProof:
    """Aggregate + open (kimchi_pedersen.hpp:385-560): fold every segment
    of every polynomial into one vector `a` with powers of polyscale, the
    eval points into `b` with powers of evalscale, then run the halving
    rounds (a folds by 1/ch on the high half, b and g by ch)."""
    curve = srs.curve
    p = curve.fr.p
    rng = rng if rng is not None else random.SystemRandom()
    gl = len(srs.g)
    pow2 = 1
    while pow2 < gl:
        pow2 <<= 1
    g = list(srs.g) + [None] * (pow2 - gl)

    a = [0] * pow2
    blinding_factor = 0
    scale = 1
    for pl in plms:
        segs = [pl.coeffs[i:i + gl]
                for i in range(0, max(len(pl.coeffs), 1), gl)]
        for j, seg in enumerate(segs):
            for i, c in enumerate(seg):
                a[i] = (a[i] + c * scale) % p
            blinding_factor = (blinding_factor
                               + pl.blind.unshifted[j] * scale) % p
            scale = scale * polyscale % p
            if pl.bound >= 0 and (j + 1) * gl > pl.bound:
                for i, c in enumerate(seg):
                    a[i + gl - len(seg)] = (a[i + gl - len(seg)]
                                            + c * scale) % p
                blinding_factor = (blinding_factor
                                   + pl.blind.shifted * scale) % p
                scale = scale * polyscale % p

    b = [0] * pow2
    scale = 1
    for e in elm:
        spare = 1
        for i in range(pow2):
            b[i] = (b[i] + scale * spare) % p
            spare = spare * e % p
        scale = scale * evalscale % p

    ip = sum(x * y for x, y in zip(a, b)) % p
    sponge.absorb_fr(shift_scalar(ip, curve))
    u = group_map.to_group(sponge.challenge_fq())

    lr, blinders, chals, chal_invs = [], [], [], []
    while len(a) > 1:
        half = len(a) // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo, g_hi = g[:half], g[half:]
        rand_l, rand_r = rng.randrange(p), rng.randrange(p)
        L = CV.g1_mul(curve, srs.h, rand_l)
        for ai, gi in zip(a_hi, g_lo):
            L = CV.g1_add(curve, L, CV.g1_mul(curve, gi, ai))
        L = CV.g1_add(curve, L, CV.g1_mul(
            curve, u, sum(x * y for x, y in zip(a_hi, b_lo)) % p))
        R = CV.g1_mul(curve, srs.h, rand_r)
        for ai, gi in zip(a_lo, g_hi):
            R = CV.g1_add(curve, R, CV.g1_mul(curve, gi, ai))
        R = CV.g1_add(curve, R, CV.g1_mul(
            curve, u, sum(x * y for x, y in zip(a_lo, b_hi)) % p))
        lr.append((L, R))
        blinders.append((rand_l, rand_r))
        sponge.absorb_g(L)
        sponge.absorb_g(R)
        ch = sponge.squeeze_challenge_field(srs.endo_r)
        ch_inv = pow(ch, -1, p)
        chals.append(ch)
        chal_invs.append(ch_inv)
        a = [(hi * ch_inv + lo) % p for lo, hi in zip(a_lo, a_hi)]
        b = [(hi * ch + lo) % p for lo, hi in zip(b_lo, b_hi)]
        g = [CV.g1_add(curve, glo, CV.g1_mul(curve, ghi, ch))
             for glo, ghi in zip(g_lo, g_hi)]

    a0, b0, g0 = a[0], b[0], g[0]
    r_prime = blinding_factor
    for (l, r), ci, c in zip(blinders, chal_invs, chals):
        r_prime = (r_prime + l * ci + r * c) % p
    d = rng.randrange(p)
    r_delta = rng.randrange(p)
    gub = CV.g1_add(curve, g0, CV.g1_mul(curve, u, b0))
    delta = CV.g1_add(curve, CV.g1_mul(curve, gub, d),
                      CV.g1_mul(curve, srs.h, r_delta))
    sponge.absorb_g(delta)
    c = sponge.squeeze_challenge_field(srs.endo_r)
    return OpeningProof(lr=lr, delta=delta,
                        z1=(a0 * c + d) % p,
                        z2=(c * r_prime + r_delta) % p, sg=g0)


def verify_eval(srs: SRS, group_map: GroupMap,
                batches: list[BatchProof]) -> bool:
    """Aggregate every batch into ONE MSM that must be the identity
    (kimchi_pedersen.hpp:645-758). Fresh CSPRNG randomizers (rand_base,
    sg_rand_base) keep proofs from cancelling each other."""
    curve = srs.curve
    p = curve.fr.p
    gl = len(srs.g)
    pow2 = 1
    while pow2 < gl:
        pow2 <<= 1

    points = [srs.h] + list(srs.g) + [None] * (pow2 - gl)
    scalars = [0] * (pow2 + 1)
    sysrng = random.SystemRandom(secrets.token_bytes(32))
    rand_base = sysrng.randrange(1, p)
    sg_rand_base = sysrng.randrange(1, p)
    rand_base_i, sg_rand_base_i = 1, 1

    for batch in batches:
        es = []
        for (commit_, evaluations, bound) in batch.evaluation:
            bnd = bound if commit_.shifted is not None else -1
            es.append((evaluations, bnd))
        cip = combined_inner_product(batch.evaluation_points, batch.xi,
                                     batch.r, es, gl, p)
        sponge = batch.sponge
        sponge.absorb_fr(shift_scalar(cip, curve))
        u = group_map.to_group(sponge.challenge_fq())
        chals, chal_invs = batch.opening.challenges(srs.endo_r, sponge)
        sponge.absorb_g(batch.opening.delta)
        c = sponge.squeeze_challenge_field(srs.endo_r)

        b0, scale = 0, 1
        for e in batch.evaluation_points:
            b0 = (b0 + scale * b_poly(chals, e, p)) % p
            scale = scale * batch.r % p
        s = b_poly_coefficients(chals, p)

        points.append(batch.opening.sg)
        scalars.append((-rand_base_i * batch.opening.z1
                        - sg_rand_base_i) % p)
        for i, si in enumerate(s):
            scalars[i + 1] = (scalars[i + 1] + si * sg_rand_base_i) % p
        scalars[0] = (scalars[0] - rand_base_i * batch.opening.z2) % p
        points.append(u)
        scalars.append(-rand_base_i * batch.opening.z1 * b0 % p)

        rbc = c * rand_base_i % p
        for (l, r), ch, ci in zip(batch.opening.lr, chals, chal_invs):
            points.append(l)
            scalars.append(rbc * ci % p)
            points.append(r)
            scalars.append(rbc * ch % p)

        xi_i = 1
        for (commit_, _evals, bound) in batch.evaluation:
            for pt in commit_.unshifted:
                scalars.append(rbc * xi_i % p)
                points.append(pt)
                xi_i = xi_i * batch.xi % p
            if bound >= 0 and commit_.shifted is not None:
                scalars.append(rbc * xi_i % p)
                points.append(commit_.shifted)
                xi_i = xi_i * batch.xi % p

        points.append(u)
        scalars.append(rbc * cip % p)
        points.append(batch.opening.delta)
        scalars.append(rand_base_i)

        rand_base_i = rand_base_i * rand_base % p
        sg_rand_base_i = sg_rand_base_i * sg_rand_base % p

    acc = None
    for pt, sc in zip(points, scalars):
        if pt is not None and sc % p:
            acc = CV.g1_add(curve, acc, CV.g1_mul(curve, pt, sc % p))
    return acc is None
