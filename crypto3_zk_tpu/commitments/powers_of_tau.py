"""Powers-of-tau trusted-setup MPC ceremony.

`commitments/polynomial/powers_of_tau.hpp:21-165` +
`detail/polynomial/powers_of_tau/accumulator.hpp:38-`: an accumulator of
(tau^i G1 for i < 2m-1, tau^i G2 / alpha tau^i G1 / beta tau^i G1 for
i < m, beta G2); each participant rescales it by fresh (tau, alpha, beta)
and publishes PoKs; the chain is verified with same-ratio pairing checks and
random-linear-combination power checks.

The rescaling (`accumulator.hpp:164` transform) is fixed-base-heavy; here it
uses host group math at ceremony sizes (the device fixed-base batch kernel
is the planned optimization for production sizes — ceremonies are offline).
"""
from __future__ import annotations

import dataclasses
import random

from ..fields import curves as CV
from ..transcript.hashes import blake2b_512
from . import proof_of_knowledge as POK

TAU_PERSONALIZATION = 0
ALPHA_PERSONALIZATION = 1
BETA_PERSONALIZATION = 2


@dataclasses.dataclass
class PrivateKey:
    tau: int
    alpha: int
    beta: int


@dataclasses.dataclass
class PublicKey:
    tau_pok: POK.PoK
    alpha_pok: POK.PoK
    beta_pok: POK.PoK


class Accumulator:
    def __init__(self, curve: CV.CurveSpec, tau_powers: int):
        self.curve = curve
        self.m = tau_powers
        g1, g2 = curve.g1, curve.g2
        self.tau_powers_g1 = [g1] * (2 * tau_powers - 1)
        self.tau_powers_g2 = [g2] * tau_powers
        self.alpha_tau_powers_g1 = [g1] * tau_powers
        self.beta_tau_powers_g1 = [g1] * tau_powers
        self.beta_g2 = g2

    def copy(self) -> "Accumulator":
        out = Accumulator.__new__(Accumulator)
        out.curve = self.curve
        out.m = self.m
        out.tau_powers_g1 = list(self.tau_powers_g1)
        out.tau_powers_g2 = list(self.tau_powers_g2)
        out.alpha_tau_powers_g1 = list(self.alpha_tau_powers_g1)
        out.beta_tau_powers_g1 = list(self.beta_tau_powers_g1)
        out.beta_g2 = self.beta_g2
        return out

    def transform(self, key: PrivateKey):
        """`accumulator.hpp:164`: rescale every power by the fresh key."""
        c = self.curve
        p = c.fr.p
        taupow = [1] * len(self.tau_powers_g1)
        for i in range(1, len(taupow)):
            taupow[i] = taupow[i - 1] * key.tau % p
        self.tau_powers_g1 = [CV.g1_mul(c, pt, taupow[i])
                              for i, pt in enumerate(self.tau_powers_g1)]
        self.tau_powers_g2 = [CV.g2_mul(c, pt, taupow[i])
                              for i, pt in enumerate(self.tau_powers_g2)]
        self.alpha_tau_powers_g1 = [
            CV.g1_mul(c, pt, taupow[i] * key.alpha % p)
            for i, pt in enumerate(self.alpha_tau_powers_g1)]
        self.beta_tau_powers_g1 = [
            CV.g1_mul(c, pt, taupow[i] * key.beta % p)
            for i, pt in enumerate(self.beta_tau_powers_g1)]
        self.beta_g2 = CV.g2_mul(c, self.beta_g2, key.beta)

    def serialize(self) -> bytes:
        c = self.curve
        out = b""
        for pt in self.tau_powers_g1 + self.alpha_tau_powers_g1 \
                + self.beta_tau_powers_g1:
            out += POK._ser_g1(c, pt)
        nb = (c.fq.bits + 7) // 8
        for pt in self.tau_powers_g2 + [self.beta_g2]:
            if pt is None:
                out += b"\x00" * (4 * nb)
            else:
                out += b"".join(v.to_bytes(nb, "big")
                                for v in (*pt[0], *pt[1]))
        return out


def compute_transcript(acc: Accumulator) -> bytes:
    return blake2b_512(acc.serialize())


def generate_private_key(curve: CV.CurveSpec,
                         rng: random.Random | None = None) -> PrivateKey:
    rng = rng if rng is not None else random.SystemRandom()
    return PrivateKey(rng.randrange(1, curve.fr.p),
                      rng.randrange(1, curve.fr.p),
                      rng.randrange(1, curve.fr.p))


def proof_eval(curve: CV.CurveSpec, key: PrivateKey, before: Accumulator,
               rng: random.Random | None = None) -> PublicKey:
    transcript = compute_transcript(before)
    return PublicKey(
        POK.proof_eval(curve, key.tau, transcript, TAU_PERSONALIZATION, rng),
        POK.proof_eval(curve, key.alpha, transcript, ALPHA_PERSONALIZATION, rng),
        POK.proof_eval(curve, key.beta, transcript, BETA_PERSONALIZATION, rng),
    )


def _power_pairs(curve: CV.CurveSpec, points, rng: random.Random):
    """Random-linear-combination check pair (`detail::power_pairs`): returns
    (sum r_i P_i, sum r_i P_{i+1})."""
    rs = [rng.randrange(1, curve.fr.p) for _ in range(len(points) - 1)]
    a = None
    b = None
    for i, r in enumerate(rs):
        a = CV.g1_add(curve, a, CV.g1_mul(curve, points[i], r))
        b = CV.g1_add(curve, b, CV.g1_mul(curve, points[i + 1], r))
    return a, b


def _power_pairs_g2(curve: CV.CurveSpec, points, rng: random.Random):
    rs = [rng.randrange(1, curve.fr.p) for _ in range(len(points) - 1)]
    a = None
    b = None
    for i, r in enumerate(rs):
        a = CV.g2_add(curve, a, CV.g2_mul(curve, points[i], r))
        b = CV.g2_add(curve, b, CV.g2_mul(curve, points[i + 1], r))
    return a, b


def verify_eval(curve: CV.CurveSpec, public_key: PublicKey,
                before: Accumulator, after: Accumulator,
                rng: random.Random | None = None) -> bool:
    """`powers_of_tau.hpp:82-130`."""
    rng = rng if rng is not None else random.SystemRandom()
    transcript = compute_transcript(before)
    tau_g2_s = POK.compute_g2_s(curve, public_key.tau_pok.g1_s,
                                public_key.tau_pok.g1_s_x, transcript,
                                TAU_PERSONALIZATION)
    alpha_g2_s = POK.compute_g2_s(curve, public_key.alpha_pok.g1_s,
                                  public_key.alpha_pok.g1_s_x, transcript,
                                  ALPHA_PERSONALIZATION)
    beta_g2_s = POK.compute_g2_s(curve, public_key.beta_pok.g1_s,
                                 public_key.beta_pok.g1_s_x, transcript,
                                 BETA_PERSONALIZATION)
    if not POK.verify_eval(curve, public_key.tau_pok, tau_g2_s):
        return False
    if not POK.verify_eval(curve, public_key.alpha_pok, alpha_g2_s):
        return False
    if not POK.verify_eval(curve, public_key.beta_pok, beta_g2_s):
        return False
    if after.tau_powers_g1[0] != curve.g1 or after.tau_powers_g2[0] != curve.g2:
        return False
    sr = POK.is_same_ratio
    if not sr(curve, (before.tau_powers_g1[1], after.tau_powers_g1[1]),
              (tau_g2_s, public_key.tau_pok.g2_s_x)):
        return False
    if not sr(curve, (before.alpha_tau_powers_g1[0],
                      after.alpha_tau_powers_g1[0]),
              (alpha_g2_s, public_key.alpha_pok.g2_s_x)):
        return False
    if not sr(curve, (before.beta_tau_powers_g1[0],
                      after.beta_tau_powers_g1[0]),
              (beta_g2_s, public_key.beta_pok.g2_s_x)):
        return False
    if not sr(curve, (before.beta_tau_powers_g1[0],
                      after.beta_tau_powers_g1[0]),
              (before.beta_g2, after.beta_g2)):
        return False
    # power-consistency via random linear combinations
    tg2 = (after.tau_powers_g2[0], after.tau_powers_g2[1])
    if not sr(curve, _power_pairs(curve, after.tau_powers_g1, rng), tg2):
        return False
    a2, b2 = _power_pairs_g2(curve, after.tau_powers_g2, rng)
    if not sr(curve, (after.tau_powers_g1[0], after.tau_powers_g1[1]),
              (a2, b2)):
        return False
    if not sr(curve, _power_pairs(curve, after.alpha_tau_powers_g1, rng), tg2):
        return False
    if not sr(curve, _power_pairs(curve, after.beta_tau_powers_g1, rng), tg2):
        return False
    return True


@dataclasses.dataclass
class Result:
    """Ceremony output re-based to the Lagrange basis
    (`detail/.../powers_of_tau/result.hpp:41-146`): everything a Groth16
    CRS assembly needs, computed WITHOUT knowledge of tau."""
    curve: CV.CurveSpec
    m: int
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    coeffs_g1: list        # [L_j(tau)] G1
    coeffs_g2: list        # [L_j(tau)] G2
    alpha_coeffs_g1: list  # [alpha L_j(tau)] G1
    beta_coeffs_g1: list   # [beta L_j(tau)] G1
    h: list                # [tau^i Z(tau)] G1, i < m-1


def _group_ifft(curve: CV.CurveSpec, points, m: int, group: str):
    """[L_j(tau)]G from [tau^i]G: an inverse NTT whose butterfly is
    point-add / scalar-mul (`evaluate_all_lagrange_polynomials` over group
    elements). Host Cooley-Tukey, O(m log m) scalar muls — ceremonies are
    offline; production sizes would batch this through the device MSM."""
    p = curve.fr.p
    add = (lambda a, b: CV.g1_add(curve, a, b)) if group == "g1" \
        else (lambda a, b: CV.g2_add(curve, a, b))
    mul = (lambda a, k: CV.g1_mul(curve, a, k)) if group == "g1" \
        else (lambda a, k: CV.g2_mul(curve, a, k))
    from ..poly.domain import get_domain
    dom = get_domain(curve.fr, m)
    w_inv = dom.omega_inv

    def rec(pts, wn):
        n = len(pts)
        if n == 1:
            return list(pts)
        ev = rec(pts[0::2], wn * wn % p)
        od = rec(pts[1::2], wn * wn % p)
        out = [None] * n
        tw = 1
        for k in range(n // 2):
            t = mul(od[k], tw)
            out[k] = add(ev[k], t)
            out[k + n // 2] = add(ev[k], mul(t, p - 1))
            tw = tw * wn % p
        return out

    vals = rec(list(points[:m]), w_inv)
    m_inv = pow(m, -1, p)
    return [mul(pt, m_inv) for pt in vals]


def result_from_accumulator(acc: Accumulator, m: int) -> Result:
    """`result.hpp:76-146 from_accumulator`. `m` must be a radix-2 domain
    size with m <= acc.m; h[i] = [tau^i * Z(tau)]G1 = [tau^{i+m}] - [tau^i]
    (Z = x^m - 1 for radix-2 domains, so only Z[0]=-1, Z[m]=1 survive the
    reference's sparse loop)."""
    c = acc.curve
    assert m & (m - 1) == 0 and m <= acc.m
    coeffs_g1 = _group_ifft(c, acc.tau_powers_g1, m, "g1")
    coeffs_g2 = _group_ifft(c, acc.tau_powers_g2, m, "g2")
    alpha_coeffs_g1 = _group_ifft(c, acc.alpha_tau_powers_g1, m, "g1")
    beta_coeffs_g1 = _group_ifft(c, acc.beta_tau_powers_g1, m, "g1")
    h = [CV.g1_add(c, acc.tau_powers_g1[i + m],
                   CV.g1_neg(c, acc.tau_powers_g1[i]))
         for i in range(m - 1)]
    return Result(c, m, acc.alpha_tau_powers_g1[0], acc.beta_tau_powers_g1[0],
                  acc.beta_g2, coeffs_g1, coeffs_g2, alpha_coeffs_g1,
                  beta_coeffs_g1, h)


def to_kzg_params(acc: Accumulator, d: int):
    """The tau ceremony IS the KZG SRS (`kzg.hpp` params)."""
    from .kzg import KZGParams
    assert d <= len(acc.tau_powers_g1)
    return KZGParams(acc.curve, acc.tau_powers_g1[:d],
                     [acc.tau_powers_g2[0], acc.tau_powers_g2[1]])
