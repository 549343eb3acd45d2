"""Merkle-set membership commitment (`snark/set_commitment.hpp:39-113`):
commit to a set of byte strings as a Merkle root over hashed elements;
membership proofs are authentication paths."""
from __future__ import annotations

import dataclasses

from ..transcript.hashes import get_hash


@dataclasses.dataclass
class SetMembershipProof:
    address: int
    path: list[bytes]


class SetCommitmentAccumulator:
    def __init__(self, max_entries: int, hash_name: str = "sha2_256"):
        self._h, _ = get_hash(hash_name)
        depth = max(1, (max_entries - 1).bit_length())
        self.depth = depth
        self.size = 1 << depth
        self._leaves: list[bytes] = []
        self._index: dict[bytes, int] = {}

    def add(self, value: bytes):
        d = self._h(value)
        if d not in self._index:
            assert len(self._leaves) < self.size, "set full"
            self._index[d] = len(self._leaves)
            self._leaves.append(d)

    def _levels(self):
        zero = b"\x00" * len(self._h(b""))
        level = self._leaves + [zero] * (self.size - len(self._leaves))
        levels = [level]
        while len(level) > 1:
            level = [self._h(level[i] + level[i + 1])
                     for i in range(0, len(level), 2)]
            levels.append(level)
        return levels

    def get_commitment(self) -> bytes:
        return self._levels()[-1][0]

    def get_membership_proof(self, value: bytes) -> SetMembershipProof:
        d = self._h(value)
        assert d in self._index, "not a member"
        idx = self._index[d]
        levels = self._levels()
        path = []
        i = idx
        for lvl in levels[:-1]:
            path.append(lvl[i ^ 1])
            i //= 2
        return SetMembershipProof(address=idx, path=path)

    def is_in_set(self, commitment: bytes, value: bytes,
                  proof: SetMembershipProof) -> bool:
        d = self._h(value)
        i = proof.address
        for sib in proof.path:
            d = self._h(d + sib) if i % 2 == 0 else self._h(sib + d)
            i //= 2
        return d == commitment
