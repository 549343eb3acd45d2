"""KZG polynomial commitments: basic single-point + SHPLONK v2.

- `kzg` static algorithms (`kzg.hpp:76-206`): commit = MSM(ck, f), open
  q = (f - f(z))/(x - z), pairing verify e(pi, [alpha - z]_2) = e([eval]_1
  - C, [1]_2)^-1.
- `kzg_commitment_scheme_v2` (`kzg_v2.hpp:76-384`, BDFG20 "SHPLONK"):
  Placeholder-friendly stateful scheme with TWO proofs — pi_1 commits the
  combined quotient over the merged point set T, pi_2 the linearization at
  theta_2 — verified with one double pairing.

Commitments are byte blobs (uncompressed x||y per point, concatenated per
batch) so they absorb into the transcript like the reference's marshalled
form (`kzg_v2.hpp` update_transcript).

Device mapping: commit MSMs run through `ops/msm.py`; quotient divisions use
the evaluation-form linear-division kernel (`poly/polynomial.py`).
"""
from __future__ import annotations

import dataclasses
import random

from ..fields import curves as CV
from ..ops.msm import msm, msm_host
from ..poly.polynomial import Poly, PolyDFS
from ..transcript.fiat_shamir import Transcript, field_to_bytes
from .batched import (EvalStorage, PolysEvaluator, eval_coeffs,
                      lagrange_interpolate, poly_from_roots)


# ---------------------------------------------------------------------------
# params / serialization
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KZGParams:
    curve: CV.CurveSpec
    commitment_key: list          # [tau^i]_1, len d
    verification_key: list        # [tau^j]_2, len d2 (>= 2; basic uses 0,1)

    def transcript_repr(self) -> str:
        return f"KZG:{self.curve.name},d={len(self.commitment_key)}"

    @classmethod
    def setup(cls, curve: CV.CurveSpec, d: int,
              tau: int | None = None,
              rng: random.Random | None = None,
              d2: int = 2) -> "KZGParams":
        rng = rng if rng is not None else random.SystemRandom()
        tau = tau if tau is not None else rng.randrange(1, curve.fr.p)
        # powers of tau: tau^i * G1 (and tau^j * G2 for the batched verifier)
        ck = []
        cur = 1
        for i in range(d):
            ck.append(CV.g1_mul(curve, curve.g1, cur))
            cur = cur * tau % curve.fr.p
        vk = []
        cur = 1
        for j in range(max(2, d2)):
            vk.append(CV.g2_mul(curve, curve.g2, cur))
            cur = cur * tau % curve.fr.p
        return cls(curve, ck, vk)

    def g2_commit(self, coeffs: list[int]):
        """[f(tau)]_2 from the stored G2 powers (batched verifier side)."""
        assert len(coeffs) <= len(self.verification_key)
        acc = None
        for base, c in zip(self.verification_key, coeffs):
            if c % self.curve.fr.p:
                acc = CV.g2_add(self.curve, acc,
                                CV.g2_mul(self.curve, base, c))
        return acc


def g1_to_bytes(curve: CV.CurveSpec, pt) -> bytes:
    nb = (curve.fq.bits + 7) // 8
    if pt is None:
        return b"\x00" * (2 * nb)
    return pt[0].to_bytes(nb, "big") + pt[1].to_bytes(nb, "big")


def g1_from_bytes(curve: CV.CurveSpec, data: bytes):
    """Deserialize an UNTRUSTED G1 byte blob. Raises ValueError for points
    not in the prime-order subgroup (invalid-curve attack gate; reference
    verifiers reject via `is_well_formed()`)."""
    nb = (curve.fq.bits + 7) // 8
    x = int.from_bytes(data[:nb], "big")
    y = int.from_bytes(data[nb:2 * nb], "big")
    if x == 0 and y == 0:
        return None
    pt = (x, y)
    if not CV.g1_well_formed(curve, pt):
        raise ValueError("G1 point not in prime-order subgroup")
    return pt


# ---------------------------------------------------------------------------
# basic single-point KZG (static algorithm style)
# ---------------------------------------------------------------------------

def commit_one(params: KZGParams, coeffs: list[int]):
    """MSM(ck[:len(f)], f) (`kzg.hpp:143-148`)."""
    assert len(coeffs) <= len(params.commitment_key)
    pairs = [(b, s) for b, s in zip(params.commitment_key, coeffs)
             if s % params.curve.fr.p != 0]
    if not pairs:
        return None
    pts, sc = zip(*pairs)
    if len(pts) >= 64:
        return msm(params.curve, list(pts), list(sc), c=8)
    return msm_host(params.curve, list(pts), list(sc))


def proof_eval_one(params: KZGParams, f: Poly, z: int):
    """pi = commit((f - f(z))/(x - z)) (`kzg.hpp:156-181`)."""
    q = f.divide_by_linear(z)
    return commit_one(params, q.to_ints())


def verify_eval_one(params: KZGParams, proof, commitment, z: int,
                    eval_v: int) -> bool:
    """e(pi, [tau - z]_2) * e([eval]_1 - C, [1]_2) == 1 (`kzg.hpp:183-206`)."""
    curve = params.curve
    if not (CV.g1_well_formed(curve, proof)
            and CV.g1_well_formed(curve, commitment)):
        return False
    tau_minus_z = CV.g2_add(curve, params.verification_key[1],
                            CV.g2_neg(curve, CV.g2_mul(curve, curve.g2, z)))
    b1 = CV.g1_add(curve, CV.g1_mul(curve, curve.g1, eval_v),
                   CV.g1_neg(curve, commitment))
    from ..fields import tower as T
    out = CV.multi_pairing(curve, [(proof, tau_minus_z),
                                   (b1, params.verification_key[0])])
    return out == T.FQ12_ONE


# ---------------------------------------------------------------------------
# SHPLONK v2 stateful scheme (kzg_v2.hpp:76-384)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KZGv2Proof:
    z: EvalStorage
    pi_1: object
    pi_2: object


class KZGSchemeV2(PolysEvaluator):
    def __init__(self, params: KZGParams):
        super().__init__(params.curve.fr)
        self.params = params
        self.curve = params.curve
        self._commitments: dict[int, bytes] = {}
        self._merged_points: list[int] = []

    # interface parity
    def mark_batch_as_fixed(self, index: int):
        pass

    def preprocess(self, transcript: Transcript):
        return True

    def setup(self, transcript: Transcript, preprocessed_data=True):
        pass

    def commit(self, index: int) -> bytes:
        self.state_commited(index)
        blob = b""
        for poly in self._polys[index]:
            c = commit_one(self.params, poly.coefficients().to_ints())
            blob += g1_to_bytes(self.curve, c)
        self._commitments[index] = blob
        return blob

    # --- helpers ---
    def _merge_eval_points(self):
        s = set()
        for k in self._points:
            for pts in self._points[k]:
                s.update(pts)
        self._merged_points = sorted(s)

    def _set_difference_polynom(self, merged, points) -> list[int]:
        rest = sorted(set(merged) - set(points))
        if not rest:
            return [1]
        return poly_from_roots(self.fs.p, rest)

    def _update_transcript(self, k: int, transcript: Transcript):
        transcript.absorb(self._commitments[k])
        for i in range(self._z.batch_size(k)):
            for j in range(len(self._z.z[k][i])):
                transcript.absorb_field(self.fs, self._z.get(k, i, j))
        for i in range(len(self._points[k])):
            for c in self.get_U(k, i):
                transcript.absorb_field(self.fs, c)

    # --- proof_eval (kzg_v2.hpp:236-310) ---
    def proof_eval(self, transcript: Transcript) -> KZGv2Proof:
        p = self.fs.p
        self.eval_polys()
        self._merge_eval_points()
        for k in sorted(self._commitments.keys()):
            self._update_transcript(k, transcript)

        theta = transcript.challenge(self.fs)
        theta_i = 1
        f = Poly.zero(self.fs)
        for k in sorted(self._polys.keys()):
            for i in range(self._z.batch_size(k)):
                diff = self._set_difference_polynom(self._merged_points,
                                                    self._points[k][i])
                f_i = self._polys[k][i].coefficients()
                u = Poly.from_ints(self.fs, self.get_U(k, i))
                term = ((f_i - u) * Poly.from_ints(self.fs, diff)).scale(theta_i)
                f = f + term
                theta_i = theta_i * theta % p
        for pt in self._merged_points:
            f = f.divide_by_linear(pt)
        pi_1 = commit_one(self.params, f.to_ints())
        transcript.absorb(g1_to_bytes(self.curve, pi_1))

        theta_2 = transcript.challenge(self.fs)
        theta_i = 1
        L_poly = Poly.zero(self.fs)
        for k in sorted(self._polys.keys()):
            for i in range(self._z.batch_size(k)):
                diff = self._set_difference_polynom(self._merged_points,
                                                    self._points[k][i])
                z_t_s = eval_coeffs(p, diff, theta_2)
                f_i = self._polys[k][i].coefficients()
                u_at = eval_coeffs(p, self.get_U(k, i), theta_2)
                term = (f_i - Poly.from_ints(self.fs, [u_at])).scale(
                    theta_i * z_t_s % p)
                L_poly = L_poly + term
                theta_i = theta_i * theta % p
        v_at = eval_coeffs(p, poly_from_roots(p, self._merged_points), theta_2)
        L_poly = L_poly - f.scale(v_at)
        assert L_poly.evaluate(theta_2) == 0
        L_poly = L_poly.divide_by_linear(theta_2)
        pi_2 = commit_one(self.params, L_poly.to_ints())
        transcript.absorb(g1_to_bytes(self.curve, pi_2))
        return KZGv2Proof(z=self._z, pi_1=pi_1, pi_2=pi_2)

    # --- verify_eval (kzg_v2.hpp:312-384) ---
    def verify_eval(self, proof: KZGv2Proof,
                    commitments: dict[int, bytes],
                    transcript: Transcript) -> bool:
        if not (CV.g1_well_formed(self.curve, proof.pi_1)
                and CV.g1_well_formed(self.curve, proof.pi_2)):
            return False
        try:
            return self._verify_eval(proof, commitments, transcript)
        except ValueError:   # malformed commitment blob (off-curve point)
            return False

    def _verify_eval(self, proof: KZGv2Proof,
                     commitments: dict[int, bytes],
                     transcript: Transcript) -> bool:
        p = self.fs.p
        curve = self.curve
        self._z = proof.z
        self._commitments = dict(commitments)
        self._merge_eval_points()
        for k in sorted(self._commitments.keys()):
            self._update_transcript(k, transcript)

        theta = transcript.challenge(self.fs)
        transcript.absorb(g1_to_bytes(curve, proof.pi_1))
        theta_2 = transcript.challenge(self.fs)

        theta_i = 1
        F = None
        rsum = 0
        nb = 2 * ((curve.fq.bits + 7) // 8)
        for k in sorted(self._commitments.keys()):
            blob = self._commitments[k]
            for i in range(len(self._points[k])):
                cm_i = g1_from_bytes(curve, blob[i * nb:(i + 1) * nb])
                z_t_s = eval_coeffs(
                    p, self._set_difference_polynom(self._merged_points,
                                                    self._points[k][i]),
                    theta_2)
                F = CV.g1_add(curve, F,
                              CV.g1_mul(curve, cm_i, theta_i * z_t_s % p))
                rsum = (rsum + theta_i * z_t_s
                        * eval_coeffs(p, self.get_U(k, i), theta_2)) % p
                theta_i = theta_i * theta % p

        F = CV.g1_add(curve, F,
                      CV.g1_neg(curve, CV.g1_mul(curve, curve.g1, rsum)))
        v_at = eval_coeffs(p, poly_from_roots(p, self._merged_points), theta_2)
        F = CV.g1_add(curve, F,
                      CV.g1_neg(curve, CV.g1_mul(curve, proof.pi_1, v_at)))
        transcript.absorb(g1_to_bytes(curve, proof.pi_2))

        lhs = CV.pairing(curve,
                         CV.g1_add(curve, F,
                                   CV.g1_mul(curve, proof.pi_2, theta_2)),
                         self.params.verification_key[0])
        rhs = CV.pairing(curve, proof.pi_2, self.params.verification_key[1])
        return lhs == rhs

    def get_commitment_params(self):
        return self.params


# ---------------------------------------------------------------------------
# batched KZG, BDFG20 v1 (kzg.hpp:219-629)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KZGBDFGProof:
    z: EvalStorage
    pi: object               # single combined-quotient commitment


class KZGSchemeBDFG(PolysEvaluator):
    """Stateful batched KZG, the reference's `batched_kzg` /
    `kzg_commitment_scheme` (`kzg.hpp:219-319` scheme, `:322-629` static
    algorithms, `:636-873` stateful adapter).

    One proof pi = commit( sum_i theta^i (f_i - r_i) / Z_{S_i} ) where r_i
    interpolates f_i on its point set S_i; the verifier checks

        prod_i e(theta^i (C_i - [r_i(tau)]_1), [Z_{T \\ S_i}(tau)]_2)
            == e(pi, [Z_T(tau)]_2)

    — one pairing accumulation per poly, with [.]_2 terms built from the
    SRS's G2 powers (params.verification_key must extend past degree |T|).
    KZGSchemeV2 (above) trades those G2 powers for a second opening."""

    def __init__(self, params: KZGParams):
        super().__init__(params.curve.fr)
        self.params = params
        self.curve = params.curve
        self._commitments: dict[int, bytes] = {}
        self._merged_points: list[int] = []

    # interface parity
    def mark_batch_as_fixed(self, index: int):
        pass

    def preprocess(self, transcript: Transcript):
        return True

    def setup(self, transcript: Transcript, preprocessed_data=True):
        pass

    def commit(self, index: int) -> bytes:
        self.state_commited(index)
        blob = b""
        for poly in self._polys[index]:
            c = commit_one(self.params, poly.coefficients().to_ints())
            blob += g1_to_bytes(self.curve, c)
        self._commitments[index] = blob
        return blob

    _merge_eval_points = KZGSchemeV2._merge_eval_points
    _set_difference_polynom = KZGSchemeV2._set_difference_polynom
    _update_transcript = KZGSchemeV2._update_transcript

    def proof_eval(self, transcript: Transcript) -> KZGBDFGProof:
        p = self.fs.p
        self.eval_polys()
        self._merge_eval_points()
        for k in sorted(self._commitments.keys()):
            self._update_transcript(k, transcript)

        theta = transcript.challenge(self.fs)
        theta_i = 1
        q = Poly.zero(self.fs)
        for k in sorted(self._polys.keys()):
            for i in range(self._z.batch_size(k)):
                f_i = self._polys[k][i].coefficients()
                u = Poly.from_ints(self.fs, self.get_U(k, i))
                term = (f_i - u).scale(theta_i)
                for pt in self._points[k][i]:
                    term = term.divide_by_linear(pt)
                q = q + term
                theta_i = theta_i * theta % p
        pi = commit_one(self.params, q.to_ints())
        transcript.absorb(g1_to_bytes(self.curve, pi))
        return KZGBDFGProof(z=self._z, pi=pi)

    def verify_eval(self, proof: KZGBDFGProof,
                    commitments: dict[int, bytes],
                    transcript: Transcript) -> bool:
        if not CV.g1_well_formed(self.curve, proof.pi):
            return False
        try:
            return self._verify_eval(proof, commitments, transcript)
        except ValueError:
            return False

    def _verify_eval(self, proof: KZGBDFGProof,
                     commitments: dict[int, bytes],
                     transcript: Transcript) -> bool:
        p = self.fs.p
        curve = self.curve
        self._z = proof.z
        self._commitments = dict(commitments)
        self._merge_eval_points()
        for k in sorted(self._commitments.keys()):
            self._update_transcript(k, transcript)

        theta = transcript.challenge(self.fs)
        transcript.absorb(g1_to_bytes(curve, proof.pi))

        from ..fields import tower as T
        theta_i = 1
        nb = 2 * ((curve.fq.bits + 7) // 8)
        pairs = []
        for k in sorted(self._commitments.keys()):
            blob = self._commitments[k]
            for i in range(len(self._points[k])):
                cm_i = g1_from_bytes(curve, blob[i * nb:(i + 1) * nb])
                r_tau_1 = commit_one(self.params, self.get_U(k, i))
                lhs_g1 = CV.g1_mul(
                    curve,
                    CV.g1_add(curve, cm_i, CV.g1_neg(curve, r_tau_1)),
                    theta_i)
                z_rest = self._set_difference_polynom(self._merged_points,
                                                      self._points[k][i])
                pairs.append((lhs_g1, self.params.g2_commit(z_rest)))
                theta_i = theta_i * theta % p
        z_t_2 = self.params.g2_commit(poly_from_roots(p, self._merged_points))
        pairs.append((CV.g1_neg(curve, proof.pi), z_t_2))
        return CV.multi_pairing(curve, pairs) == T.FQ12_ONE

    def get_commitment_params(self):
        return self.params
