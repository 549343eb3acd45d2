"""Groth16 proof aggregation (ipp2 / SnarkPack, Bünz et al.).

`systems/ppzksnark/r1cs_gg_ppzksnark/ipp2/` + `commitments/polynomial/
kzg_ipp2.hpp`: aggregate n (power-of-two) Groth16 proofs into one
O(log n)-size proof:

- structured SRS from two powers-of-tau (`ipp2/srs.hpp:62-220`);
- pair/single GT commitments over (vkey, wkey) (`kzg_ipp2.hpp:216-290`);
- GIPA recursion halving A/B/C/r and the commitment keys, 12 transcript
  writes + 1 challenge per round (`ipp2/prover.hpp:302-445`);
- O(log n) product-form challenge polynomial evaluation + KZG openings of
  the final commitment keys (`ipp2/prover.hpp:95-283`);
- verifier with randomized pairing-check accumulator
  (`ipp2/verifier.hpp:95-710`).

All group/pairing math is host-side (aggregation is offline and
log-sized); the underlying Groth16 proofs themselves come from the device
prover.
"""
from __future__ import annotations

import dataclasses
import random

from ...fields import curves as CV
from ...fields import tower as T
from ...transcript.hashes import sha2_256
from ...utils import bincode as BC
from . import Proof

# ---------------------------------------------------------------------------
# GT helpers
# ---------------------------------------------------------------------------


def _gt_mul(curve, a, b):
    return T.fq12_mul(curve.fq.p, curve.xi, a, b)


def _gt_pow(curve, a, e):
    return T.fq12_pow(curve.fq.p, curve.xi, a, e % curve.fr.p)


def _gt_inv(curve, a):
    return T.fq12_conj(curve.fq.p, a)  # unitary inverse post final-exp


def _pair_noexp(curve, a, b):
    return CV.miller_loop(curve, a, b)


def _final_exp(curve, f):
    return CV.final_exponentiation(curve, f)


def _pair(curve, a, b):
    return _final_exp(curve, _pair_noexp(curve, a, b))


# ---------------------------------------------------------------------------
# transcript (`ipp2/transcript.hpp:46`)
# ---------------------------------------------------------------------------

class Ipp2Transcript:
    """Bit-exact `snark::transcript` (`ipp2/transcript.hpp:44-151`): an
    INCREMENTAL sha2-256 accumulator over bincode-serialized writes (LE
    field blobs, ZCash-compressed points); `read_challenge` forks the
    accumulator, appends an 8-byte little-endian counter and
    rejection-samples a scalar (LE decode, reject >= r and 0/1). Pinned by
    the bellperson vector in `..._aggregation_conformity.cpp:1041-1062`."""

    def __init__(self, curve: CV.CurveSpec, application_tag: bytes):
        import hashlib

        self.curve = curve
        self._h = hashlib.sha256()
        self._h.update(application_tag)

    def write_domain_separator(self, sep: bytes):
        self._h.update(sep)

    def write_gt(self, x):
        self._h.update(BC.fq12_to_bytes(self.curve, x))

    def write_g1(self, x):
        self._h.update(BC.g1_to_bytes(self.curve, x))

    def write_g2(self, x):
        self._h.update(BC.g2_to_bytes(self.curve, x))

    def write_fr(self, v):
        self._h.update(BC.fr_to_bytes(self.curve, v))

    def write_bytes(self, b: bytes):
        self._h.update(len(b).to_bytes(8, "little") + b)

    def read_challenge(self) -> int:
        fr = self.curve.fr
        p = fr.p
        # `field_element_from_bytes` MASKS the 256-bit digest down to
        # modulus_bits (255) before its < r validity check — recovered by
        # solving the bellperson gipa etalons for the challenge semantics
        # (tests/test_ipp2_conformance.py; an unmasked reject-if->=r
        # variant agrees on digests whose top bit is clear — all the
        # round-4 single-value pins — but diverges otherwise). Retries
        # keep hashing counter bytes into ONE forked accumulator
        # (`transcript.hpp:121-135`: `hasher_state` lives outside the
        # retry loop).
        mask = (1 << fr.bits) - 1
        h2 = self._h.copy()
        counter = 0
        while True:
            counter += 1
            h2.update(counter.to_bytes(8, "big"))
            v = int.from_bytes(h2.digest(), "little") & mask
            if v >= p or v in (0, 1):
                continue
            return v


# ---------------------------------------------------------------------------
# commitment keys + SRS
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CommitmentKey:
    a: list
    b: list

    def split(self, at: int):
        return (CommitmentKey(self.a[:at], self.b[:at]),
                CommitmentKey(self.a[at:], self.b[at:]))

    def scale(self, curve, group, s: list[int]) -> "CommitmentKey":
        mul = CV.g1_mul if group == "g1" else CV.g2_mul
        return CommitmentKey([mul(curve, x, si) for x, si in zip(self.a, s)],
                             [mul(curve, x, si) for x, si in zip(self.b, s)])

    def compress(self, curve, group, right: "CommitmentKey",
                 scale: int) -> "CommitmentKey":
        add = CV.g1_add if group == "g1" else CV.g2_add
        mul = CV.g1_mul if group == "g1" else CV.g2_mul
        return CommitmentKey(
            [add(curve, l, mul(curve, r, scale))
             for l, r in zip(self.a, right.a)],
            [add(curve, l, mul(curve, r, scale))
             for l, r in zip(self.b, right.b)])

    def first(self):
        return (self.a[0], self.b[0])


@dataclasses.dataclass
class ProverSRS:
    curve: CV.CurveSpec
    n: int
    g_alpha_powers: list
    h_alpha_powers: list
    g_beta_powers: list
    h_beta_powers: list
    vkey: CommitmentKey   # G2
    wkey: CommitmentKey   # G1


@dataclasses.dataclass
class VerifierSRS:
    curve: CV.CurveSpec
    n: int
    g: tuple
    h: tuple
    g_alpha: tuple
    g_beta: tuple
    h_alpha: tuple
    h_beta: tuple


def setup_fake_srs(curve: CV.CurveSpec, num_proofs: int,
                   rng: random.Random | None = None,
                   toxic: tuple[int, int] | None = None):
    """Generic SRS from two toxic scalars (`srs.hpp:148-151`) specialized
    for num_proofs (`srs.hpp:158-205`). `toxic` pins (alpha, beta) for the
    bellperson conformance vectors (`..._conformity.cpp:1892-1897`)."""
    rng = rng if rng is not None else random.SystemRandom()
    p = curve.fr.p
    if toxic is not None:
        alpha, beta = toxic
    else:
        alpha = rng.randrange(2, p)
        beta = rng.randrange(2, p)
    tn = 2 * num_proofs

    def powers1(s):
        out, acc = [], 1
        for _ in range(tn):
            out.append(CV.g1_mul(curve, curve.g1, acc))
            acc = acc * s % p
        return out

    def powers2(s):
        out, acc = [], 1
        for _ in range(tn):
            out.append(CV.g2_mul(curve, curve.g2, acc))
            acc = acc * s % p
        return out

    g_alpha = powers1(alpha)
    h_alpha = powers2(alpha)
    g_beta = powers1(beta)
    h_beta = powers2(beta)
    n = num_proofs
    vkey = CommitmentKey(h_alpha[:n], h_beta[:n])
    wkey = CommitmentKey(g_alpha[n:tn], g_beta[n:tn])
    pk = ProverSRS(curve, n, g_alpha, h_alpha, g_beta, h_beta, vkey, wkey)
    vk = VerifierSRS(curve, n, g_alpha[0], h_alpha[0], g_alpha[1],
                     g_beta[1], h_alpha[1], h_beta[1])
    return pk, vk


# ---------------------------------------------------------------------------
# GT commitments (`kzg_ipp2.hpp:216-290`)
# ---------------------------------------------------------------------------

def commit_pair(curve, vkey: CommitmentKey, wkey: CommitmentKey,
                a_vec: list, b_vec: list):
    t = T.FQ12_ONE
    u = T.FQ12_ONE
    for ai, v1, v2 in zip(a_vec, vkey.a, vkey.b):
        t = _gt_mul(curve, t, _pair_noexp(curve, ai, v1))
        u = _gt_mul(curve, u, _pair_noexp(curve, ai, v2))
    for w1, w2, bi in zip(wkey.a, wkey.b, b_vec):
        t = _gt_mul(curve, t, _pair_noexp(curve, w1, bi))
        u = _gt_mul(curve, u, _pair_noexp(curve, w2, bi))
    return (_final_exp(curve, t), _final_exp(curve, u))


def commit_single(curve, vkey: CommitmentKey, a_vec: list):
    t = T.FQ12_ONE
    u = T.FQ12_ONE
    for ai, v1, v2 in zip(a_vec, vkey.a, vkey.b):
        t = _gt_mul(curve, t, _pair_noexp(curve, ai, v1))
        u = _gt_mul(curve, u, _pair_noexp(curve, ai, v2))
    return (_final_exp(curve, t), _final_exp(curve, u))


# ---------------------------------------------------------------------------
# proof containers
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GipaProof:
    nproofs: int
    comms_ab: list   # [(tab_l, tab_r)] of ((T,U),(T,U))
    comms_c: list
    z_ab: list       # [(zab_l, zab_r)] GT
    z_c: list        # [(zc_l, zc_r)] G1
    final_a: tuple
    final_b: tuple
    final_c: tuple
    final_vkey: tuple
    final_wkey: tuple


@dataclasses.dataclass
class TippMippProof:
    gipa: GipaProof
    vkey_opening: tuple
    wkey_opening: tuple


@dataclasses.dataclass
class AggregateProof:
    com_ab: tuple
    com_c: tuple
    ip_ab: tuple
    agg_c: tuple
    tmipp: TippMippProof


# ---------------------------------------------------------------------------
# challenge polynomial helpers (`ipp2/prover.hpp:95-160`)
# ---------------------------------------------------------------------------

def poly_eval_product_form(p, transcript: list[int], z: int,
                           r_shift: int) -> int:
    power_zr = z * r_shift % p
    res = (1 + transcript[0] * power_zr) % p
    power_zr = power_zr * power_zr % p
    for x in transcript[1:]:
        res = res * (1 + x * power_zr) % p
        power_zr = power_zr * power_zr % p
    return res


def poly_coefficients_from_transcript(p, transcript: list[int],
                                      r_shift: int) -> list[int]:
    coeffs = [1]
    power_2_r = r_shift % p
    for x in transcript:
        n = len(coeffs)
        for j in range(n):
            coeffs.append(coeffs[j] * x % p * power_2_r % p)
        power_2_r = power_2_r * power_2_r % p
    return coeffs


def _msm_g(curve, group, bases, scalars):
    add = CV.g1_add if group == "g1" else CV.g2_add
    mul = CV.g1_mul if group == "g1" else CV.g2_mul
    acc = None
    for b, s in zip(bases, scalars):
        acc = add(curve, acc, mul(curve, b, s))
    return acc


def prove_commitment_key_kzg_opening(curve, group, srs_alpha, srs_beta,
                                     poly: list[int], eval_poly: int,
                                     z: int):
    """(f(X) - f(z)) / (X - z) committed under both alpha and beta powers
    (`ipp2/prover.hpp:171-220`). Synthetic division, host."""
    p = curve.fr.p
    coeffs = list(poly)
    coeffs[0] = (coeffs[0] - eval_poly) % p
    # divide by (x - z)
    q = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % p
        q[i - 1] = acc
    # remainder check
    assert (acc * z + coeffs[0]) % p == 0
    q += [0] * (len(poly) - len(q))
    return (_msm_g(curve, group, srs_alpha, q),
            _msm_g(curve, group, srs_beta, q))


# ---------------------------------------------------------------------------
# GIPA recursion (`ipp2/prover.hpp:302-445`)
# ---------------------------------------------------------------------------

def _gipa_tipp_mipp(curve, tr: Ipp2Transcript, a, b, c, vkey, wkey, r_vec):
    p = curve.fr.p
    m_a, m_b, m_c, m_r = list(a), list(b), list(c), list(r_vec)
    comms_ab, comms_c, z_ab, z_c = [], [], [], []
    challenges, challenges_inv = [], []

    tr.write_domain_separator(b"gipa")
    tr.read_challenge()

    while len(m_a) > 1:
        split = len(m_a) // 2
        vk_l, vk_r = vkey.split(split)
        wk_l, wk_r = wkey.split(split)

        tab_l = commit_pair(curve, vk_l, wk_r, m_a[split:], m_b[:split])
        tab_r = commit_pair(curve, vk_r, wk_l, m_a[:split], m_b[split:])

        zab_l = T.FQ12_ONE
        for ai, bi in zip(m_a[split:], m_b[:split]):
            zab_l = _gt_mul(curve, zab_l, _pair_noexp(curve, ai, bi))
        zab_l = _final_exp(curve, zab_l)
        zab_r = T.FQ12_ONE
        for ai, bi in zip(m_a[:split], m_b[split:]):
            zab_r = _gt_mul(curve, zab_r, _pair_noexp(curve, ai, bi))
        zab_r = _final_exp(curve, zab_r)

        zc_l = _msm_g(curve, "g1", m_c[split:], m_r[:split])
        zc_r = _msm_g(curve, "g1", m_c[:split], m_r[split:])
        tuc_l = commit_single(curve, vk_l, m_c[split:])
        tuc_r = commit_single(curve, vk_r, m_c[:split])

        for gt in (zab_l, zab_r):
            tr.write_gt(gt)
        tr.write_g1(zc_l)
        tr.write_g1(zc_r)
        for gt in (tab_l[0], tab_l[1], tab_r[0], tab_r[1],
                   tuc_l[0], tuc_l[1], tuc_r[0], tuc_r[1]):
            tr.write_gt(gt)
        c_inv = tr.read_challenge()
        c_chal = pow(c_inv, -1, p)

        def compress_g(vec, group, scale):
            add = CV.g1_add if group == "g1" else CV.g2_add
            mul = CV.g1_mul if group == "g1" else CV.g2_mul
            return [add(curve, vec[i], mul(curve, vec[split + i], scale))
                    for i in range(split)]

        m_a = compress_g(m_a, "g1", c_chal)
        m_b = compress_g(m_b, "g2", c_inv)
        m_c = compress_g(m_c, "g1", c_chal)
        m_r = [(m_r[i] + m_r[split + i] * c_inv) % p for i in range(split)]
        vkey = vk_l.compress(curve, "g2", vk_r, c_inv)
        wkey = wk_l.compress(curve, "g1", wk_r, c_chal)

        comms_ab.append((tab_l, tab_r))
        comms_c.append((tuc_l, tuc_r))
        z_ab.append((zab_l, zab_r))
        z_c.append((zc_l, zc_r))
        challenges.append(c_chal)
        challenges_inv.append(c_inv)

    proof = GipaProof(len(a), comms_ab, comms_c, z_ab, z_c,
                      m_a[0], m_b[0], m_c[0], vkey.first(), wkey.first())
    return proof, challenges, challenges_inv


def _prove_tipp_mipp(srs: ProverSRS, tr: Ipp2Transcript, a, b, c,
                     wkey, r_vec):
    curve = srs.curve
    p = curve.fr.p
    r_shift = r_vec[1]
    proof, challenges, challenges_inv = _gipa_tipp_mipp(
        curve, tr, a, b, c, srs.vkey, wkey, r_vec)

    challenges = list(reversed(challenges))
    challenges_inv = list(reversed(challenges_inv))
    r_inverse = pow(r_shift, -1, p)

    tr.write_domain_separator(b"random-z")
    tr.write_fr(challenges[0])
    tr.write_g2(proof.final_vkey[0])
    tr.write_g2(proof.final_vkey[1])
    tr.write_g1(proof.final_wkey[0])
    tr.write_g1(proof.final_wkey[1])
    z = tr.read_challenge()

    # vkey opening
    vkey_poly = poly_coefficients_from_transcript(p, challenges_inv, 1)
    vkey_z = poly_eval_product_form(p, challenges_inv, z, 1)
    vkey_opening = prove_commitment_key_kzg_opening(
        curve, "g2", srs.h_alpha_powers[:len(vkey_poly)],
        srs.h_beta_powers[:len(vkey_poly)], vkey_poly, vkey_z, z)
    # wkey opening: f_w(X) = X^n f(X), shifted by r^-1
    n = srs.n
    wcoeffs = poly_coefficients_from_transcript(p, challenges, r_inverse)
    wcoeffs = [0] * n + wcoeffs
    fwz = poly_eval_product_form(p, challenges, z, r_inverse) \
        * pow(z, n, p) % p
    wkey_opening = prove_commitment_key_kzg_opening(
        curve, "g1", srs.g_alpha_powers[:len(wcoeffs)],
        srs.g_beta_powers[:len(wcoeffs)], wcoeffs, fwz, z)
    return TippMippProof(proof, vkey_opening, wkey_opening)


# ---------------------------------------------------------------------------
# aggregate + verify (`ipp2/prover.hpp:520-645`, `ipp2/verifier.hpp:571-702`)
# ---------------------------------------------------------------------------

def aggregate_proofs(srs: ProverSRS, transcript_include: bytes,
                     proofs: list[Proof]) -> AggregateProof:
    curve = srs.curve
    p = curve.fr.p
    n = len(proofs)
    assert n >= 2 and n & (n - 1) == 0 and srs.n == n
    a = [pr.g_A for pr in proofs]
    b = [pr.g_B for pr in proofs]
    c = [pr.g_C for pr in proofs]

    com_ab = commit_pair(curve, srs.vkey, srs.wkey, a, b)
    com_c = commit_single(curve, srs.vkey, c)

    tr = Ipp2Transcript(curve, b"snarkpack")
    tr.write_domain_separator(b"random-r")
    tr.write_gt(com_ab[0])
    tr.write_gt(com_ab[1])
    tr.write_gt(com_c[0])
    tr.write_gt(com_c[1])
    tr.write_bytes(transcript_include)
    r = tr.read_challenge()

    r_vec = [pow(r, i, p) for i in range(n)]
    r_inv = [pow(ri, -1, p) for ri in r_vec]
    b_r = [CV.g2_mul(curve, bi, ri) for bi, ri in zip(b, r_vec)]

    ip_ab = T.FQ12_ONE
    for ai, bri in zip(a, b_r):
        ip_ab = _gt_mul(curve, ip_ab, _pair_noexp(curve, ai, bri))
    ip_ab = _final_exp(curve, ip_ab)
    agg_c = _msm_g(curve, "g1", c, r_vec)
    tr.write_gt(ip_ab)
    tr.write_g1(agg_c)

    wkey_r_inv = srs.wkey.scale(curve, "g1", r_inv)
    tmipp = _prove_tipp_mipp(srs, tr, a, b_r, c, wkey_r_inv, r_vec)
    return AggregateProof(com_ab, com_c, ip_ab, agg_c, tmipp)


class PairingCheck:
    """Randomized pairing-check accumulator (`ipp2/verifier.hpp:95-180`)."""

    def __init__(self, curve, rng: random.Random):
        self.curve = curve
        self.rng = rng
        self.left = T.FQ12_ONE        # product of miller loops
        self.right = T.FQ12_ONE       # product of GT targets (post-exp)
        self.valid = True
        self._nonrandom_done = False

    def merge_random(self, a_list, b_list, out):
        curve = self.curve
        coeff = self.rng.randrange(1, curve.fr.p)
        for ai, bi in zip(a_list, b_list):
            self.left = _gt_mul(curve, self.left,
                                _pair_noexp(curve,
                                            CV.g1_mul(curve, ai, coeff), bi))
        self.right = _gt_mul(curve, self.right, _gt_pow(curve, out, coeff))

    def merge_nonrandom(self, gt_list, out):
        curve = self.curve
        for gt in gt_list:
            self.right = _gt_mul(curve, self.right, gt)
        self.right = _gt_mul(curve, self.right, _gt_inv(curve, out))
        # fold into left as identity miller product
        self._nonrandom_done = True

    def invalidate(self):
        self.valid = False

    def verify(self) -> bool:
        return self.valid and _final_exp(self.curve, self.left) == self.right


def _gipa_verify_tipp_mipp(curve, tr: Ipp2Transcript, proof: AggregateProof,
                           r_shift: int):
    p = curve.fr.p
    gp = proof.tmipp.gipa
    challenges, challenges_inv = [], []
    tr.write_domain_separator(b"gipa")
    tr.read_challenge()
    for (cab, zab, cc, zc) in zip(gp.comms_ab, gp.z_ab, gp.comms_c, gp.z_c):
        tr.write_gt(zab[0])
        tr.write_gt(zab[1])
        tr.write_g1(zc[0])
        tr.write_g1(zc[1])
        for gt in (cab[0][0], cab[0][1], cab[1][0], cab[1][1],
                   cc[0][0], cc[0][1], cc[1][0], cc[1][1]):
            tr.write_gt(gt)
        c_inv = tr.read_challenge()
        challenges_inv.append(c_inv)
        challenges.append(pow(c_inv, -1, p))

    tab, uab = proof.com_ab
    zab = proof.ip_ab
    tc, uc = proof.com_c
    zc = proof.agg_c
    for (cab, zabp, cc, zcp, ch, ch_inv) in zip(
            gp.comms_ab, gp.z_ab, gp.comms_c, gp.z_c, challenges,
            challenges_inv):
        tab = _gt_mul(curve, tab, _gt_pow(curve, cab[0][0], ch))
        tab = _gt_mul(curve, tab, _gt_pow(curve, cab[1][0], ch_inv))
        uab = _gt_mul(curve, uab, _gt_pow(curve, cab[0][1], ch))
        uab = _gt_mul(curve, uab, _gt_pow(curve, cab[1][1], ch_inv))
        zab = _gt_mul(curve, zab, _gt_pow(curve, zabp[0], ch))
        zab = _gt_mul(curve, zab, _gt_pow(curve, zabp[1], ch_inv))
        tc = _gt_mul(curve, tc, _gt_pow(curve, cc[0][0], ch))
        tc = _gt_mul(curve, tc, _gt_pow(curve, cc[1][0], ch_inv))
        uc = _gt_mul(curve, uc, _gt_pow(curve, cc[0][1], ch))
        uc = _gt_mul(curve, uc, _gt_pow(curve, cc[1][1], ch_inv))
        zc = CV.g1_add(curve, zc,
                       CV.g1_add(curve, CV.g1_mul(curve, zcp[0], ch),
                                 CV.g1_mul(curve, zcp[1], ch_inv)))

    challenges = list(reversed(challenges))
    challenges_inv = list(reversed(challenges_inv))
    final_r = poly_eval_product_form(p, challenges_inv, r_shift, 1)
    return (tab, uab, zab, tc, uc, zc), final_r, challenges, challenges_inv


def _verify_kzg_v(v_srs: VerifierSRS, final_vkey, vkey_opening,
                  challenges_inv, z, pc: PairingCheck):
    curve = v_srs.curve
    p = curve.fr.p
    fvz = poly_eval_product_form(p, challenges_inv, z, 1)
    g_neg = CV.g1_neg(curve, v_srs.g)
    a1 = [g_neg, CV.g1_add(curve, v_srs.g_alpha,
                           CV.g1_neg(curve, CV.g1_mul(curve, v_srs.g, z)))]
    b1 = [CV.g2_add(curve, final_vkey[0],
                    CV.g2_neg(curve, CV.g2_mul(curve, v_srs.h, fvz))),
          vkey_opening[0]]
    pc.merge_random(a1, b1, T.FQ12_ONE)
    a2 = [g_neg, CV.g1_add(curve, v_srs.g_beta,
                           CV.g1_neg(curve, CV.g1_mul(curve, v_srs.g, z)))]
    b2 = [CV.g2_add(curve, final_vkey[1],
                    CV.g2_neg(curve, CV.g2_mul(curve, v_srs.h, fvz))),
          vkey_opening[1]]
    pc.merge_random(a2, b2, T.FQ12_ONE)


def _verify_kzg_w(v_srs: VerifierSRS, final_wkey, wkey_opening,
                  challenges, r_shift_inv, z, pc: PairingCheck):
    curve = v_srs.curve
    p = curve.fr.p
    fwz = poly_eval_product_form(p, challenges, z, r_shift_inv) \
        * pow(z, v_srs.n, p) % p
    h_neg = CV.g2_neg(curve, v_srs.h)
    a1 = [CV.g1_add(curve, final_wkey[0],
                    CV.g1_neg(curve, CV.g1_mul(curve, v_srs.g, fwz))),
          wkey_opening[0]]
    b1 = [h_neg, CV.g2_add(curve, v_srs.h_alpha,
                           CV.g2_neg(curve, CV.g2_mul(curve, v_srs.h, z)))]
    pc.merge_random(a1, b1, T.FQ12_ONE)
    a2 = [CV.g1_add(curve, final_wkey[1],
                    CV.g1_neg(curve, CV.g1_mul(curve, v_srs.g, fwz))),
          wkey_opening[1]]
    b2 = [h_neg, CV.g2_add(curve, v_srs.h_beta,
                           CV.g2_neg(curve, CV.g2_mul(curve, v_srs.h, z)))]
    pc.merge_random(a2, b2, T.FQ12_ONE)


def verify_aggregate_proof(v_srs: VerifierSRS, vk, public_inputs: list[list[int]],
                           proof: AggregateProof, transcript_include: bytes,
                           rng: random.Random | None = None) -> bool:
    """vk: Groth16 VerificationKey; public_inputs: per-proof primary inputs."""
    curve = v_srs.curve
    p = curve.fr.p
    rng = rng if rng is not None else random.SystemRandom()

    tr = Ipp2Transcript(curve, b"snarkpack")
    tr.write_domain_separator(b"random-r")
    tr.write_gt(proof.com_ab[0])
    tr.write_gt(proof.com_ab[1])
    tr.write_gt(proof.com_c[0])
    tr.write_gt(proof.com_c[1])
    tr.write_bytes(transcript_include)
    r = tr.read_challenge()
    tr.write_gt(proof.ip_ab)
    tr.write_g1(proof.agg_c)

    pc = PairingCheck(curve, rng)

    (tab, uab, zab, tc, uc, zc), final_r, challenges, challenges_inv = \
        _gipa_verify_tipp_mipp(curve, tr, proof, r)

    gp = proof.tmipp.gipa
    tr.write_domain_separator(b"random-z")
    tr.write_fr(challenges[0])
    tr.write_g2(gp.final_vkey[0])
    tr.write_g2(gp.final_vkey[1])
    tr.write_g1(gp.final_wkey[0])
    tr.write_g1(gp.final_wkey[1])
    z = tr.read_challenge()

    _verify_kzg_v(v_srs, gp.final_vkey, proof.tmipp.vkey_opening,
                  challenges_inv, z, pc)
    _verify_kzg_w(v_srs, gp.final_wkey, proof.tmipp.wkey_opening,
                  challenges, pow(r, -1, p), z, pc)

    # TIPP: z = e(A,B)
    pc.merge_random([gp.final_a], [gp.final_b], zab)
    # T = e(A, v1) e(w1, B)
    pc.merge_random([gp.final_a, gp.final_wkey[0]],
                    [gp.final_vkey[0], gp.final_b], tab)
    # U = e(A, v2) e(w2, B)
    pc.merge_random([gp.final_a, gp.final_wkey[1]],
                    [gp.final_vkey[1], gp.final_b], uab)
    # MIPP: Z == C^r
    final_z = CV.g1_mul(curve, gp.final_c, final_r)
    pc.merge_random([gp.final_c], [gp.final_vkey[0]], tc)
    pc.merge_random([gp.final_c], [gp.final_vkey[1]], uc)
    if final_z != zc:
        pc.invalidate()

    # aggregate Groth16 equation
    n = len(public_inputs)
    r_sum = (pow(r, n, p) - 1) * pow((r - 1) % p, -1, p) % p
    powers = [pow(r, j, p) for j in range(n)]
    multi_r = []
    for i in range(len(public_inputs[0])):
        cval = public_inputs[0][i]
        for j in range(1, n):
            cval = (cval + public_inputs[j][i] * powers[j]) % p
        multi_r.append(cval)
    left = _pair(curve, CV.g1_mul(curve, _alpha_g1(vk), r_sum), _beta_g2(vk))
    right = _pair(curve, proof.agg_c, vk.delta_g2)
    g_ic = CV.g1_mul(curve, vk.gamma_ABC_g1[0], r_sum)
    for i, ci in enumerate(multi_r):
        g_ic = CV.g1_add(curve, g_ic,
                         CV.g1_mul(curve, vk.gamma_ABC_g1[i + 1], ci))
    middle = _pair(curve, g_ic, vk.gamma_g2)
    pc.merge_nonrandom([left, middle, right], proof.ip_ab)
    return pc.verify()


def _alpha_g1(vk):
    """The aggregate verifier needs alpha_g1 / beta_g2 explicitly; the basic
    vk stores only e(alpha,beta). Extended keys carry them (set by
    make_aggregation_vk)."""
    return vk.alpha_g1


def _beta_g2(vk):
    return vk.beta_g2
