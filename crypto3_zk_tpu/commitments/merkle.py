"""Merkle trees (arity 2) with pluggable hashing.

TPU-native equivalent of `containers::merkle_tree<Hash,2>` / `merkle_proof`
as driven by FRI (`basic_fri.hpp:102-105,407,494`). Two hasher families:

- `FieldHasher` — Poseidon over the commitment field: leaf rows and node
  levels are hashed with the BATCHED device kernel (`ops/poseidon.py`), one
  `hash2_batch` per level; digests are field elements. Host scalar mirror for
  proof validation.
- `ByteHasher`  — keccak/sha2/blake2b over big-endian serialized field
  elements, computed on host (digests are bytes). Used for the byte-hash
  test combos; the hot path is Poseidon.

Trees keep their levels resident (device arrays for FieldHasher); only the
root and the queried authentication paths are ever decoded to host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.params import FieldSpec
from ..ops import limbs as L
from ..ops import poseidon as PO
from ..transcript.fiat_shamir import field_to_bytes
from ..transcript.hashes import get_hash


def _po_mod(pp):
    """Dispatch to the permutation module matching the params flavor
    (original Grain-LFSR Poseidon vs the nil/zkLLVM kimchi-style one)."""
    from ..ops import nil_poseidon as NP
    return NP if isinstance(pp, NP.NilPoseidonParams) else PO


class FieldHasher:
    """Poseidon 2-to-1 / sponge hashing; digests are field ints.

    `flavor="nil"` selects the NilFoundation permutation recovered from
    the reference's zkLLVM circuit dump (`ops/nil_poseidon.py`) — the
    constants the reference's own poseidon Merkle trees use."""

    kind = "field"

    def __init__(self, fs: FieldSpec, flavor: str = "original"):
        self.fs = fs
        if flavor == "nil":
            from ..ops import nil_poseidon as NP
            self.pp = NP.get_params(fs)
        else:
            self.pp = PO.get_params(fs)

    @property
    def _po(self):
        # computed, not stored: a module attribute would break
        # copy.deepcopy of scheme objects holding trees/hashers
        return _po_mod(self.pp)

    # device
    def leaf_hash_rows(self, rows: jnp.ndarray) -> jnp.ndarray:
        """rows: (k, NL, n) — sponge-absorb k elements per batch lane."""
        k, nl, n = rows.shape
        fs = self.fs
        state = L.zeros(fs, (3, n))  # (NL, 3, n)
        for i in range(0, k, 2):
            s0 = L.add(fs, state[:, 0], rows[i])
            s1 = state[:, 1]
            if i + 1 < k:
                s1 = L.add(fs, s1, rows[i + 1])
            state = jnp.stack([s0, s1, state[:, 2]], axis=1)
            state = self._po.permute_batch(self.pp, state)
        return state[:, 0]

    def node_hash(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        return self._po.hash2_batch(self.pp, left, right)

    # host
    def leaf_hash_rows_host(self, elems: list[int]) -> int:
        state = [0, 0, 0]
        for i in range(0, len(elems), 2):
            state[0] = (state[0] + elems[i]) % self.fs.p
            if i + 1 < len(elems):
                state[1] = (state[1] + elems[i + 1]) % self.fs.p
            state = self._po.permute_host(self.pp, state)
        return state[0]

    def node_hash_host(self, left: int, right: int) -> int:
        return self._po.hash2_host(self.pp, left, right)

    def digest_bytes(self, digest: int) -> bytes:
        return field_to_bytes(self.fs, digest)


class ByteHasher:
    """Byte hash over serialized field elements; digests are bytes."""

    kind = "bytes"

    def __init__(self, fs: FieldSpec, hash_name: str = "keccak_256"):
        self.fs = fs
        self.hash_name = hash_name
        self._h, self.digest_len = get_hash(hash_name)

    def leaf_hash_rows_host(self, elems: list[int]) -> bytes:
        data = b"".join(field_to_bytes(self.fs, e) for e in elems)
        return self._h(data)

    def node_hash_host(self, left: bytes, right: bytes) -> bytes:
        return self._h(left + right)

    def digest_bytes(self, digest: bytes) -> bytes:
        return digest

    # vectorized level hashing: sha2_256 batches whole tree levels on the
    # device VPU (`ops/sha256.py`); other byte hashes run scalar on host
    _DEVICE_BATCH_MIN = 64

    def leaf_hash_rows_many(self, rows: list[list[int]]) -> list[bytes]:
        msgs = [b"".join(field_to_bytes(self.fs, e) for e in r) for r in rows]
        if (self.hash_name == "sha2_256"
                and len(msgs) >= self._DEVICE_BATCH_MIN
                and len({len(m) for m in msgs}) == 1):
            from ..ops.sha256 import sha256_many
            return sha256_many(msgs)
        return [self._h(m) for m in msgs]

    def node_hash_many(self, lefts: list[bytes],
                       rights: list[bytes]) -> list[bytes]:
        if (self.hash_name == "sha2_256"
                and len(lefts) >= self._DEVICE_BATCH_MIN):
            from ..ops.sha256 import sha256_many
            return sha256_many([l + r for l, r in zip(lefts, rights)])
        return [self._h(l + r) for l, r in zip(lefts, rights)]


_DEVICE_LEVEL_MIN = 128  # below this, host hashing beats XLA recompiles


@functools.partial(jax.jit, static_argnums=(0, 1))
def _field_tree_program(pp, fs, rows):
    """(k, NL, n) leaf rows -> tuple of level digest planes ((NL, n),
    (NL, n/2), ... down to _DEVICE_LEVEL_MIN): the leaf sponge AND every
    node level in ONE compiled program — the per-level `hash2_batch`
    dispatch chain costs one device round-trip (and one first-compile)
    per distinct level shape through the TPU tunnel."""
    k, _, n = rows.shape
    state = L.zeros(fs, (3, n))
    for i in range(0, k, 2):
        s0 = L.add(fs, state[:, 0], rows[i])
        s1 = state[:, 1]
        if i + 1 < k:
            s1 = L.add(fs, s1, rows[i + 1])
        state = jnp.stack([s0, s1, state[:, 2]], axis=1)
        state = _po_mod(pp).permute_batch(pp, state)
    levels = [state[:, 0]]
    while n > max(1, _DEVICE_LEVEL_MIN):
        cur = levels[-1]
        levels.append(_po_mod(pp).hash2_batch(pp, cur[..., 0::2], cur[..., 1::2]))
        n //= 2
    return tuple(levels)


@functools.partial(jax.jit, static_argnums=(0,))
def _field_levels_program(pp, digests):
    """(NL, n) leaf digests -> all node levels in one program (used when
    leaves were hashed elsewhere, e.g. shard-parallel)."""
    levels = [digests]
    n = digests.shape[-1]
    while n > max(1, _DEVICE_LEVEL_MIN):
        cur = levels[-1]
        levels.append(_po_mod(pp).hash2_batch(pp, cur[..., 0::2], cur[..., 1::2]))
        n //= 2
    return tuple(levels)


class MerkleTree:
    """Built from leaf ROWS of field elements (each row = one leaf).

    Field (Poseidon) mode hashes large levels with the batched device kernel
    and finishes small upper levels on host — avoids one XLA compile per
    distinct level shape while keeping the heavy work on device.
    """

    def __init__(self, hasher, leaf_rows_dev: jnp.ndarray | None = None,
                 leaf_rows_host: list[list[int]] | None = None):
        self.hasher = hasher
        if (hasher.kind == "field" and leaf_rows_dev is not None
                and leaf_rows_dev.shape[-1] >= _DEVICE_LEVEL_MIN):
            from ..utils import fusion as _fusion
            if _fusion.fused_phases_enabled():
                # leaf_rows_dev: (k, NL, n_leaves); sponge + levels fused
                self.levels_dev = list(_field_tree_program(
                    hasher.pp, hasher.fs, leaf_rows_dev))
            else:
                # XLA:CPU compiles the fused whole-tree program
                # pathologically at large leaf counts; per-level kernels
                # compile in seconds there
                digests = hasher.leaf_hash_rows(leaf_rows_dev)
                self.levels_dev = [digests]
                n = digests.shape[-1]
                while n > max(1, _DEVICE_LEVEL_MIN):
                    cur = self.levels_dev[-1]
                    self.levels_dev.append(
                        hasher.node_hash(cur[..., 0::2], cur[..., 1::2]))
                    n //= 2
            # finish on host
            from ..ops import limbs as _L
            top = _L.decode(hasher.fs, self.levels_dev[-1])
            self.levels_host_tail = [top]
            while len(top) > 1:
                top = [hasher.node_hash_host(top[i], top[i + 1])
                       for i in range(0, len(top), 2)]
                self.levels_host_tail.append(top)
            self.levels_host = None
        else:
            if leaf_rows_host is None:
                # decode device rows, hash on host (limb axis must be FIRST
                # for decode: (k, NL, n) -> (NL, k, n))
                k, nl, n = leaf_rows_dev.shape
                flat = L.decode(hasher.fs,
                                jnp.transpose(leaf_rows_dev, (1, 0, 2)))
                leaf_rows_host = [[flat[i * n + j] for i in range(k)]
                                  for j in range(n)]
            if hasattr(hasher, "leaf_hash_rows_many"):
                digests = hasher.leaf_hash_rows_many(leaf_rows_host)
            else:
                digests = [hasher.leaf_hash_rows_host(r)
                           for r in leaf_rows_host]
            self.levels_host = [digests]
            while len(digests) > 1:
                if hasattr(hasher, "node_hash_many"):
                    digests = hasher.node_hash_many(digests[0::2],
                                                    digests[1::2])
                else:
                    digests = [hasher.node_hash_host(digests[i],
                                                     digests[i + 1])
                               for i in range(0, len(digests), 2)]
                self.levels_host.append(digests)
            self.levels_dev = None
            self.levels_host_tail = None

    @classmethod
    def from_leaf_digests_dev(cls, hasher, digests: jnp.ndarray,
                              ) -> "MerkleTree":
        """Build from precomputed (NL, n_leaves) field leaf digests (e.g.
        hashed shard-parallel by `parallel.fri.distributed_precommit`);
        node levels run on device exactly as the standard constructor."""
        assert hasher.kind == "field"
        self = cls.__new__(cls)
        self.hasher = hasher
        self.levels_dev = list(_field_levels_program(hasher.pp, digests))
        from ..ops import limbs as _L
        top = _L.decode(hasher.fs, self.levels_dev[-1])
        self.levels_host_tail = [top]
        while len(top) > 1:
            top = [hasher.node_hash_host(top[i], top[i + 1])
                   for i in range(0, len(top), 2)]
            self.levels_host_tail.append(top)
        self.levels_host = None
        return self

    @property
    def n_leaves(self) -> int:
        if self.levels_dev is not None:
            return self.levels_dev[0].shape[-1]
        return len(self.levels_host[0])

    def _num_levels(self) -> int:
        if self.levels_dev is not None:
            return len(self.levels_dev) + len(self.levels_host_tail) - 1
        return len(self.levels_host)

    def _digest_at(self, level: int, i: int):
        if self.levels_dev is not None:
            if level < len(self.levels_dev) - 1:
                return L.decode(self.hasher.fs,
                                self.levels_dev[level][..., i:i + 1])[0]
            return self.levels_host_tail[level - (len(self.levels_dev) - 1)][i]
        return self.levels_host[level][i]

    def root(self):
        return self._digest_at(self._num_levels() - 1, 0)

    def proof(self, idx: int) -> list:
        """Sibling digests bottom-up (`merkle_proof` over arity 2)."""
        path = []
        for lvl in range(self._num_levels() - 1):
            path.append(self._digest_at(lvl, idx ^ 1))
            idx //= 2
        return path

    def proofs(self, indices: list[int]) -> list[list]:
        """Batched `proof` for many leaves: ONE device gather + decode per
        device level instead of one per (query, level) — serving λ=40 FRI
        queries with scalar `_digest_at` pulls costs λ×levels round-trips
        through the TPU tunnel."""
        if self.levels_dev is None or not indices:
            return [self.proof(i) for i in indices]
        paths = [[] for _ in indices]
        idxs = list(indices)
        for lvl in range(self._num_levels() - 1):
            if lvl < len(self.levels_dev) - 1:
                sib = jnp.asarray([i ^ 1 for i in idxs], dtype=jnp.int32)
                vals = L.decode(self.hasher.fs,
                                jnp.take(self.levels_dev[lvl], sib, axis=-1))
                for q, v in enumerate(vals):
                    paths[q].append(v)
            else:
                tail = self.levels_host_tail[lvl - (len(self.levels_dev) - 1)]
                for q, i in enumerate(idxs):
                    paths[q].append(tail[i ^ 1])
            idxs = [i // 2 for i in idxs]
        return paths

    @staticmethod
    def validate(hasher, root, leaf_row: list[int], idx: int, path: list) -> bool:
        d = hasher.leaf_hash_rows_host(leaf_row)
        for sib in path:
            d = hasher.node_hash_host(d, sib) if idx % 2 == 0 \
                else hasher.node_hash_host(sib, d)
            idx //= 2
        return d == root


def make_hasher(fs: FieldSpec, name: str):
    if name == "poseidon":
        return FieldHasher(fs)
    if name == "poseidon_nil":
        return FieldHasher(fs, flavor="nil")
    return ByteHasher(fs, name)
