"""Legacy batched-FRI variants (self-contained batched low-degree tests).

`commitments/detail/polynomial/basic_batched_fri_compile_time_size.hpp` and
`..._runtime_size.hpp` (608+510 LoC) are older self-contained FRI codepaths
kept in the reference but unused by LPC/Placeholder. Their surface: commit
a batch of polynomials jointly, then prove/verify that every member is
low-degree via one theta-combined FRI run. The distinguishing difference
between the two is when the batch size is fixed: at compile time (template
parameter `leaf_size`) vs at runtime (vector length).

Both reduce to the modern `fri.py` machinery here (the fold/query/verify
core is shared); these classes reproduce the calling convention so
reference users find the same entry points.
"""
from __future__ import annotations

from ..poly.domain import Domain
from ..poly.polynomial import PolyDFS
from ..transcript.fiat_shamir import Transcript
from . import fri as F


class BasicBatchedFriRuntimeSize:
    """Runtime-size batch: any list length; one theta-combined FRI run."""

    def __init__(self, params: F.FRIParams):
        self.params = params

    def precommit(self, polys: list[PolyDFS]) -> F.Precommitment:
        return F.precommit(polys, self.params.D[0],
                           self.params.step_list[0], self.params)

    def _combine(self, polys: list[PolyDFS], theta: int) -> PolyDFS:
        fs = self.params.fs
        combined = polys[0]
        theta_i = theta
        for g in polys[1:]:
            combined = combined + g.scale(theta_i)
            theta_i = theta_i * theta % fs.p
        return combined

    def proof_eval(self, polys: list[PolyDFS], pre: F.Precommitment,
                   transcript: Transcript) -> F.FRIProof:
        fs = self.params.fs
        F.absorb_root(transcript, self.params, pre.root())
        theta = transcript.challenge(fs)
        combined = self._combine(polys, theta)
        cpre = F.precommit([combined], self.params.D[0],
                           self.params.step_list[0], self.params)
        return F.proof_eval({0: polys}, combined, {0: pre}, cpre,
                            self.params, transcript)

    def verify_eval(self, proof: F.FRIProof, root, batch_size: int,
                    transcript: Transcript) -> bool:
        fs = self.params.fs
        F.absorb_root(transcript, self.params, root)
        theta = transcript.challenge(fs)
        return F.verify_eval(
            proof, self.params, {0: root}, theta=theta,
            poly_ids=[[(0, j) for j in range(batch_size)]],
            combined_U=[0], denominators=[[1]], transcript=transcript)


class BasicBatchedFriCompileTimeSize(BasicBatchedFriRuntimeSize):
    """Compile-time-size batch: the batch length is fixed at construction
    and enforced on every call (the template-parameter discipline of the
    `leaf_size` variant)."""

    def __init__(self, params: F.FRIParams, leaf_size: int):
        super().__init__(params)
        self.leaf_size = leaf_size

    def _check(self, n: int):
        if n != self.leaf_size:
            raise ValueError(f"batch size {n} != leaf_size {self.leaf_size}")

    def precommit(self, polys: list[PolyDFS]) -> F.Precommitment:
        self._check(len(polys))
        return super().precommit(polys)

    def proof_eval(self, polys: list[PolyDFS], pre: F.Precommitment,
                   transcript: Transcript) -> F.FRIProof:
        self._check(len(polys))
        return super().proof_eval(polys, pre, transcript)

    def verify_eval(self, proof: F.FRIProof, root,
                    transcript: Transcript) -> bool:
        return super().verify_eval(proof, root, self.leaf_size, transcript)
