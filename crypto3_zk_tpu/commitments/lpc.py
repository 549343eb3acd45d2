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
import functools

import jax
import jax.numpy as jnp

from ..fields.params import FieldSpec
from ..ops import limbs as L
from ..poly.domain import get_domain
from ..poly.polynomial import PolyDFS
from ..transcript.fiat_shamir import Transcript
from ..utils import fusion as _fusion
from . import fri as FRI
from .batched import EvalStorage, PolysEvaluator


@functools.partial(jax.jit, static_argnums=(0,))
def _eval_batch_at_points(fs, values, points):
    """values: (B, NL, N) device-resident evals over D_0; points: (NL, P)
    Montgomery. Returns (NL, B, P) evaluations — one iFFT + P dot-reduces
    in ONE program, replacing per-(poly, point) `evaluate` round-trips."""
    n = values.shape[-1]
    # limb axis must lead before any field op (NTT twiddle broadcast and
    # mont_mul both index limbs first)
    vals = jnp.transpose(values, (1, 0, 2))          # (NL, B, N)
    coeffs = get_domain(fs, n).ifft(vals)
    outs = []
    for i in range(points.shape[1]):
        x = jnp.broadcast_to(points[:, i:i + 1], points.shape[:1] + (n,))
        pw = L.prefix_product_exclusive(fs, x, axis=1)     # [1, x, x^2 ...]
        s = L.mont_mul(fs, coeffs, pw[:, None, :])
        while s.shape[-1] > 1:
            half = s.shape[-1] // 2
            s = L.add(fs, s[..., :half], s[..., half:])
        outs.append(s[..., 0])                        # (NL, B)
    return jnp.stack(outs, axis=-1)                   # (NL, B, P)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _combined_q_program(fs, counts, gvs, theta_pows, z_accs, points_arr,
                        omega_pows):
    """Fused combined-Q (`lpc.hpp:131-181` restated in evaluation form):
    theta-weighted numerators, per-point z subtraction, ONE batched inverse
    of every (w^i - xi) denominator, sum of quotients. `counts` (static) is
    the contribution count per evaluation point; gvs (NL, C, N) are the
    contributing value tables concatenated in theta order."""
    n = gvs.shape[-1]
    terms = L.mont_mul(fs, gvs, theta_pows)           # (NL, C, N)
    nums = []
    off = 0
    for c in counts:
        s = terms[:, off, :]
        for j in range(1, c):
            s = L.add(fs, s, terms[:, off + j, :])
        nums.append(s)
        off += c
    num = jnp.stack(nums, axis=1)                     # (NL, P, N)
    num = L.sub(fs, num, z_accs)
    den = L.sub(fs, omega_pows[:, None, :], points_arr)
    p_cnt = len(counts)
    inv = L.batch_inverse(fs, den.reshape(den.shape[0], p_cnt * n), axis=1)
    q = L.mont_mul(fs, num, inv.reshape(num.shape))
    out = q[:, 0, :]
    for i in range(1, p_cnt):
        out = L.add(fs, out, q[:, i, :])
    return out


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

    def eval_polys(self):
        """Batched z-table evaluation: every committed batch's resident
        (B, NL, N0) eval table is iFFT'd and dotted against all unique
        points in one program per batch (the per-(poly, point) `evaluate`
        path costs ~5 dispatches + a host sync each)."""
        if not _fusion.fused_phases_enabled():
            return super().eval_polys()
        fs = self.fs
        points = self.get_unique_points()
        if not points:
            return super().eval_polys()
        pts_arr = L.encode(fs, points)                # (NL, P)
        for k in sorted(self._polys.keys()):
            if k not in self._trees or not self._points[k]:
                # uncommitted batch (shouldn't happen in proof_eval flows)
                vals = [[p.evaluate(pt) for pt in self._points[k][i]]
                        for i, p in enumerate(self._polys[k])]
                self._z.set_batch(k, vals)
                continue
            got = _eval_batch_at_points(fs, self._trees[k].values, pts_arr)
            flat = L.decode(fs, got)                  # row-major (B, P)
            P_ = len(points)
            vals = []
            for i in range(len(self._polys[k])):
                row = flat[i * P_:(i + 1) * P_]
                vals.append([row[points.index(pt)]
                             for pt in self._points[k][i]])
            self._z.set_batch(k, vals)

    # --- proof_eval (lpc.hpp:113-200) ---
    def proof_eval(self, transcript: Transcript) -> LPCProof:
        fs = self.fs
        self.eval_polys()
        for k in sorted(self._trees.keys()):
            FRI.absorb_root(transcript, self.fri_params, self._trees[k].root())

        theta = transcript.challenge(fs)
        D0 = self.fri_params.D[0]
        n0 = D0.n

        # contribution layout (static per circuit): per point, the (batch,
        # poly) pairs in theta order; fixed batches contribute at etha last
        groups: list[tuple[int, list]] = []
        for point in self.get_unique_points():
            contribs = []
            for k in self._z.batches():
                for j in range(self._z.batch_size(k)):
                    if point in self._points[k][j]:
                        idx = self._points[k][j].index(point)
                        contribs.append((k, j, self._z.get(k, j, idx)))
            groups.append((point, contribs))
        for k in self._z.batches():
            if not self._batch_fixed.get(k, False):
                continue
            contribs = [(k, j, self._fixed_polys_values[k][j])
                        for j in range(self._z.batch_size(k))]
            groups.append((self._etha, contribs))

        if not hasattr(self, "_omega_pows") or \
                self._omega_pows.shape[-1] != n0:
            self._omega_pows = jnp.asarray(L.powers(fs, D0.omega, n0))

        if _fusion.fused_phases_enabled() and groups:
            theta_pows, z_accs, counts, gv_list = [], [], [], []
            acc = 1
            for point, contribs in groups:
                z_acc = 0
                for (bk, bj, zv) in contribs:
                    gv_list.append(self._trees[bk].values[bj])
                    theta_pows.append(acc)
                    z_acc = (z_acc + zv * acc) % fs.p
                    acc = acc * theta % fs.p
                z_accs.append(z_acc)
                counts.append(len(contribs))
            gvs = jnp.stack(gv_list, axis=1)          # (NL, C, N0)
            combined_Q_v = _combined_q_program(
                fs, tuple(counts), gvs,
                L.encode(fs, theta_pows)[:, :, None],
                L.encode(fs, z_accs)[:, :, None],
                L.encode(fs, [pt for pt, _ in groups])[:, :, None],
                self._omega_pows)
        else:
            theta_acc = 1
            combined_Q_v = L.zeros(fs, (n0,))
            omega_pows = self._omega_pows
            for point, contribs in groups:
                num = L.zeros(fs, (n0,))
                z_acc = 0
                for (bk, bj, zv) in contribs:
                    gv = self._trees[bk].values[bj]   # (NL, n0)
                    num = L.add(fs, num, L.mont_mul(
                        fs, gv, L.const_mont(fs, theta_acc, (1,))))
                    z_acc = (z_acc + zv * theta_acc) % fs.p
                    theta_acc = theta_acc * theta % fs.p
                num = L.sub(fs, num, L.const_mont(fs, z_acc, (n0,)))
                den = L.sub(fs, omega_pows, L.const_mont(fs, point, (n0,)))
                q = L.mont_mul(fs, num, L.batch_inverse(fs, den, axis=1))
                combined_Q_v = L.add(fs, combined_Q_v, q)

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
