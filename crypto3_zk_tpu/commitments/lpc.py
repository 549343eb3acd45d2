"""LPC: batched list-polynomial commitment over FRI.

TPU-native implementation of `lpc_commitment_scheme` (`lpc.hpp:50-299`) and
its batching base `polys_evaluator` (`batched_commitment.hpp:58-244`):
stateful batches, per-poly eval points, η point for fixed batches, θ-combined
multi-point quotients fed into FRI.

TPU-first deviation (same output polynomial, different algorithm): the
reference builds combined_Q by coefficient-form long division per unique
point (`lpc.hpp:131-181`); here the quotient (Σθ^k g_k − Σθ^k z_k)/(x−ξ) is
computed in EVALUATION form over D_0 with one batched inverse of (w^i − ξ) —
exact polynomial division because the numerator vanishes at ξ, and a single
fused vector pass on device (SURVEY.md §7 Phase 3).
"""
from __future__ import annotations

import dataclasses

from ..fields.params import FieldSpec
from ..ops import limbs as L
from ..poly.polynomial import PolyDFS
from ..transcript.fiat_shamir import Transcript
from . import fri as FRI
from .batched import EvalStorage, PolysEvaluator


@dataclasses.dataclass
class LPCProof:
    z: EvalStorage
    fri_proof: FRI.FRIProof


class LPCScheme(PolysEvaluator):
    """Stateful Placeholder-friendly commitment scheme object."""

    def get_params(self) -> dict:
        """`lpc_commitment_scheme::get_params` (`lpc.hpp:275-298`)."""
        out = dict(self.fri_params.get_params())
        out["scheme"] = "lpc"
        return out

    def __init__(self, fri_params: FRI.FRIParams):
        super().__init__(fri_params.fs)
        self.fri_params = fri_params
        self._trees: dict[int, FRI.Precommitment] = {}
        self._batch_fixed: dict[int, bool] = {}
        self._fixed_polys_values: dict[int, list[int]] = {}
        self._etha: int = 0

    def commit(self, index: int):
        self.state_commited(index)
        self._trees[index] = FRI.precommit(
            self._polys[index], self.fri_params.D[0],
            self.fri_params.step_list[0], self.fri_params)
        return self._trees[index].root()

    def mark_batch_as_fixed(self, index: int):
        self._batch_fixed[index] = True

    # --- setup / preprocess (lpc.hpp:82-106) ---
    def preprocess(self, transcript: Transcript) -> dict[int, list[int]]:
        etha = transcript.challenge(self.fs)
        result = {}
        for index, fixed in self._batch_fixed.items():
            if not fixed:
                continue
            result[index] = [p.evaluate(etha) for p in self._polys[index]]
        return result

    def setup(self, transcript: Transcript,
              preprocessed_data: dict[int, list[int]]):
        self._etha = transcript.challenge(self.fs)
        self._fixed_polys_values = preprocessed_data

    # --- proof_eval (lpc.hpp:113-200) ---
    def proof_eval(self, transcript: Transcript) -> LPCProof:
        fs = self.fs
        self.eval_polys()
        for k in sorted(self._trees.keys()):
            FRI.absorb_root(transcript, self.fri_params, self._trees[k].root())

        theta = transcript.challenge(fs)
        D0 = self.fri_params.D[0]
        n0 = D0.n
        theta_acc = 1
        combined_Q_v = L.zeros(fs, (n0,))
        omega_pows = L.powers(fs, D0.omega, n0)

        def add_quotient(point: int, contribs: list[tuple[int, int, int]]):
            """contribs: list of (batch, poly, z_value); consumes theta_acc."""
            nonlocal combined_Q_v, theta_acc
            num = L.zeros(fs, (n0,))
            z_acc = 0
            for (bk, bj, zv) in contribs:
                gv = self._trees[bk].values[bj]  # (NL, n0), resized at commit
                num = L.add(fs, num,
                            L.mont_mul(fs, gv, L.const_mont(fs, theta_acc, (1,))))
                z_acc = (z_acc + zv * theta_acc) % fs.p
                theta_acc = theta_acc * theta % fs.p
            num = L.sub(fs, num, L.const_mont(fs, z_acc, (n0,)))
            den = L.sub(fs, omega_pows, L.const_mont(fs, point, (n0,)))
            q = L.mont_mul(fs, num, L.batch_inverse(fs, den, axis=1))
            combined_Q_v = L.add(fs, combined_Q_v, q)

        for point in self.get_unique_points():
            contribs = []
            for k in self._z.batches():
                for j in range(self._z.batch_size(k)):
                    if point in self._points[k][j]:
                        idx = self._points[k][j].index(point)
                        contribs.append((k, j, self._z.get(k, j, idx)))
            add_quotient(point, contribs)

        for k in self._z.batches():
            if not self._batch_fixed.get(k, False):
                continue
            contribs = [(k, j, self._fixed_polys_values[k][j])
                        for j in range(self._z.batch_size(k))]
            add_quotient(self._etha, contribs)

        combined_Q = PolyDFS(fs, combined_Q_v, self.fri_params.max_degree + 1)
        combined_Q_pre = FRI.precommit([combined_Q], D0,
                                       self.fri_params.step_list[0],
                                       self.fri_params)
        ordered_polys = {k: self._polys[k] for k in sorted(self._polys.keys())}
        fri_proof = FRI.proof_eval(ordered_polys, combined_Q, self._trees,
                                   combined_Q_pre, self.fri_params, transcript)
        return LPCProof(z=self._z, fri_proof=fri_proof)

    # --- verify_eval (lpc.hpp:202-267) ---
    def verify_eval(self, proof: LPCProof, commitments: dict[int, object],
                    transcript: Transcript) -> bool:
        fs = self.fs
        self._z = proof.z
        for k in sorted(commitments.keys()):
            FRI.absorb_root(transcript, self.fri_params, commitments[k])

        points = self.get_unique_points()
        total_points = len(points)
        has_fixed = any(self._batch_fixed.values())
        if has_fixed:
            total_points += 1

        U = [0] * total_points
        V = [None] * total_points
        poly_map: list[list[tuple[int, int]]] = [[] for _ in range(total_points)]

        theta = transcript.challenge(fs)
        theta_acc = 1
        for pi, point in enumerate(points):
            V[pi] = [(-point) % fs.p, 1]
            for k in self._z.batches():
                for j in range(self._z.batch_size(k)):
                    if point in self._points[k][j]:
                        idx = self._points[k][j].index(point)
                        U[pi] = (U[pi] + self._z.get(k, j, idx) * theta_acc) % fs.p
                        poly_map[pi].append((k, j))
                        theta_acc = theta_acc * theta % fs.p
        if has_fixed:
            pi = len(points)
            V[pi] = [(-self._etha) % fs.p, 1]
            for k in self._z.batches():
                if not self._batch_fixed.get(k, False):
                    continue
                for j in range(self._z.batch_size(k)):
                    U[pi] = (U[pi] + self._fixed_polys_values[k][j] * theta_acc) % fs.p
                    poly_map[pi].append((k, j))
                    theta_acc = theta_acc * theta % fs.p

        return FRI.verify_eval(proof.fri_proof, self.fri_params, commitments,
                               theta, poly_map, U, V, transcript)

    def get_commitment_params(self):
        return self.fri_params
