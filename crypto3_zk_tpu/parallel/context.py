"""Mesh context: route single-chip kernels through their distributed
counterparts without threading mesh handles through every prover call.

SURVEY.md §2.7: the reference's distribution story is external
(actor-based zkLLVM provers); TPU-native distribution is mesh sharding
inside the SAME `prove()` code path. A `mesh_context` makes the
commitment layer (`commitments/fri.py`) shard its leaf hashing and query
serving over the mesh (`parallel/fri.py`), while everything else runs
replicated — proofs stay byte-identical to single-chip by construction
(the distributed kernels are bit-checked against the single-chip ones in
`tests/test_parallel.py` and the driver dryrun).
"""
from __future__ import annotations

import contextlib

_CTX: tuple | None = None


def get_mesh() -> tuple | None:
    """(mesh, axis_name) if a mesh context is active, else None."""
    return _CTX


@contextlib.contextmanager
def mesh_context(mesh, axis: str = "x"):
    """Within this context, mesh-aware kernels shard over `mesh[axis]`."""
    global _CTX
    prev = _CTX
    _CTX = (mesh, axis)
    try:
        yield
    finally:
        _CTX = prev
