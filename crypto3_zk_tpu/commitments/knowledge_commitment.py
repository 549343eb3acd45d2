"""Knowledge commitments: (g, h) group-element pairs and their multiexps.

`commitments/polynomial/knowledge_commitment.hpp:50` (`knowledge_commitment`
= pair in two groups), `detail/polynomial/element_knowledge_commitment.hpp:54`
and `knowledge_commitment_multiexp.hpp` (`kc_multiexp_with_mixed_addition`,
`kc_batch_exp`). Used by PGHR13's A/B/C queries (`models/pghr13.py`).

TPU mapping: both component multiexps run through the device Pippenger
(`ops/msm.py::msm`), and batch exponentiation of a fixed (g, h) pair uses
the windowed fixed-base device path — the pair structure is bookkeeping, the
group math is batched limb kernels.
"""
from __future__ import annotations

import dataclasses

from ..ops.msm import fixed_base_exp_batch


@dataclasses.dataclass
class KC:
    """knowledge_commitment element: g in the main group, h in G1."""
    g: tuple
    h: tuple


@dataclasses.dataclass
class KnowledgeCommitmentVector:
    """`knowledge_commitment_vector`: sparse storage of KC elements —
    (index, value) pairs over a conceptual dense domain."""
    indices: list[int]
    values: list[KC]
    domain_size: int

    @classmethod
    def from_dense(cls, elems: list[KC | None]) -> "KnowledgeCommitmentVector":
        idx, vals = [], []
        for i, e in enumerate(elems):
            if e is not None and not (e.g is None and e.h is None):
                idx.append(i)
                vals.append(e)
        return cls(idx, vals, len(elems))

    def to_dense(self) -> list[KC | None]:
        out: list[KC | None] = [None] * self.domain_size
        for i, v in zip(self.indices, self.values):
            out[i] = v
        return out


def kc_multiexp(curve, query: list[KC], scalars: list[int], g2_main=False,
                msm_skip_inf=None):
    """`kc_multiexp_with_mixed_addition`: component-wise multiexp of a KC
    query — returns the aggregate KC (sum s_i * g_i, sum s_i * h_i)."""
    if msm_skip_inf is None:
        from ..models.groth16 import _msm_skip_inf as msm_skip_inf
    gs = msm_skip_inf(curve, [q.g for q in query], scalars,
                      group="g2" if g2_main else "g1")
    hs = msm_skip_inf(curve, [q.h for q in query], scalars)
    return gs, hs


def kc_batch_exp(curve, g_base, h_base, scalars: list[int],
                 g2_main: bool = False, c: int = 8) -> list[KC]:
    """`kc_batch_exp`: [KC(s_i * g, s_i * h) for s_i] with both component
    batches on the device fixed-base path."""
    gs = fixed_base_exp_batch(curve, g_base, scalars, c=c,
                              group="g2" if g2_main else "g1")
    hs = fixed_base_exp_batch(curve, h_base, scalars, c=c, group="g1")
    return [KC(g, h) for g, h in zip(gs, hs)]
