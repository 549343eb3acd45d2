"""Whole-phase fusion switch.

Through the TPU tunnel, eager per-op dispatch dominates prover wall-clock,
so prover phases (permutation/gates/quotient/FRI folds/combined-Q) compile
as ONE program each, with Fiat-Shamir challenges entering as traced limb
arrays (baking them as constants would recompile every proof). On XLA:CPU
a single fused phase costs minutes of compile while the eager per-op path
compiles in seconds — so fusion defaults to accelerators only.

Override with ZK_TPU_FUSED_PHASES=1/0. `tests/test_fused_phases.py` runs
both modes on CPU and asserts bit-identical proofs, so the fused programs
that ship to the TPU are pinned against the eager oracle path.
"""
from __future__ import annotations

import os

import jax


def fused_phases_enabled() -> bool:
    v = os.environ.get("ZK_TPU_FUSED_PHASES")
    if v is not None:
        return v not in ("0", "")
    return jax.default_backend() != "cpu"
