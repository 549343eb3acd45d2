"""Distributed FRI precommit: Merkle leaf hashing sharded over a mesh.

SURVEY.md §2.7 ("shard FRI queries / MSM points / NTT rows across chips").
The precommit's dominant cost is the batched Poseidon sponge over all
leaf rows (`basic_fri.hpp:582-664` precommit; device kernel
`commitments/merkle.py::FieldHasher.leaf_hash_rows`). Here the leaf axis is
sharded over the mesh: every device sponges its contiguous range of leaves
inside ONE shard_map program, the per-shard digest planes are `all_gather`ed
over the interconnect, and the (cheap, O(n)) node levels finish replicated
on device via `MerkleTree.from_leaf_digests_dev` — so proofs/roots are
byte-identical to the single-chip `fri.precommit`.

Contiguous leaf ranges never split a sibling pair (power-of-two shard
counts), so the gathered digests feed the standard level loop unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..commitments.fri import FRIParams, Precommitment, _leaf_order_indices
from ..commitments.merkle import MerkleTree, make_hasher
from ..poly.polynomial import PolyDFS


def distributed_precommit(polys: list[PolyDFS], D, fri_step: int,
                          params: FRIParams, mesh: Mesh,
                          axis: str = "x") -> Precommitment:
    """Same result as `fri.precommit`, leaf hashing sharded over
    `mesh[axis]`. Requires the Poseidon (field) Merkle hash — byte hashes
    have no device kernel to shard."""
    fs = params.fs
    hasher = make_hasher(fs, params.merkle_hash)
    assert hasher.kind == "field", "distributed precommit needs field hash"
    d = mesh.shape[axis]
    assert d & (d - 1) == 0

    polys = [pl.resize(D.n) for pl in polys]
    values = jnp.stack([pl.v for pl in polys], axis=0)   # (B, NL, N)
    idx = _leaf_order_indices(D.n, fri_step)             # (leafs, coset)
    gathered = values[:, :, idx]                         # (B, NL, leafs, coset)
    rows = jnp.transpose(gathered, (0, 3, 1, 2))
    rows = rows.reshape(-1, fs.nl, idx.shape[0])         # (B*coset, NL, leafs)
    n_leaves = rows.shape[-1]
    assert n_leaves % d == 0, "leaf count must split over the mesh axis"

    def local(rows_shard):
        dig = hasher.leaf_hash_rows(rows_shard)          # (NL, leafs/d)
        return jax.lax.all_gather(dig, axis, axis=-1, tiled=True)

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(None, None, axis),),
                        out_specs=P(None, None),
                        check_vma=False)
    digests = sharded(rows)                              # (NL, leafs)
    tree = MerkleTree.from_leaf_digests_dev(hasher, digests)
    return Precommitment(tree, values, D.n, fri_step)


def distributed_query_gather(values: jnp.ndarray, need_idx, mesh: Mesh,
                             axis: str = "x") -> jnp.ndarray:
    """Serve FRI query-phase value gathers from LEAF-RANGE-SHARDED tables
    (SURVEY.md §2.7 "FRI query sharding"): `values` (B, NL, N) shards its
    last axis over `mesh[axis]`; each device gathers the requested indices
    that fall in its contiguous range (others contribute zeros) and one
    `psum` assembles the full (B, NL, K) answer on every device — the
    distributed counterpart of the single-chip batched gather in
    `fri.proof_eval` (one device op for all lambda queries)."""
    n = values.shape[-1]
    d = mesh.shape[axis]
    assert n % d == 0
    per = n // d
    idx = jnp.asarray(need_idx, dtype=jnp.int32)

    def local(vals_shard):
        me = jax.lax.axis_index(axis)
        lo = me * per
        local_ix = idx - lo
        mine = (local_ix >= 0) & (local_ix < per)
        safe = jnp.where(mine, local_ix, 0)
        got = jnp.take(vals_shard, safe, axis=-1)        # (B, NL, K)
        got = jnp.where(mine[None, None, :], got, 0)
        return jax.lax.psum(got, axis)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(None, None, axis),),
                     out_specs=P(None, None, None),
                     check_vma=False)(values)
