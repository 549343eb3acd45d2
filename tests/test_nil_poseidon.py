"""Nil/zkLLVM-flavor Poseidon: constant provenance pin + kernel equivalence.

The constants in `ops/nil_poseidon_constants.py` were recovered from the
poseidon gate constraints of the reference's real circuit dump
(`merkle_tree_posseidon_circuit.crct`, see module docstring). The first
test RE-extracts them from the dump on every run, so the embedded tables
can never drift from the reference artifact they came from.
"""
import os

import pytest

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.ops import nil_poseidon as NP
from crypto3_zk_tpu.ops import nil_poseidon_constants as NC

REF_BASE = ("/root/reference/test/systems/plonk/placeholder/data/"
            "merkle_tree_poseidon/")

FS = P.PALLAS_FQ


@pytest.mark.skipif(not os.path.isdir(REF_BASE),
                    reason="reference circuit dumps not mounted")
def test_constants_match_reference_circuit_dump():
    from crypto3_zk_tpu.arithmetization import plonk as PK
    from crypto3_zk_tpu.utils import zkllvm as Zk

    cs = Zk.load_circuit(REF_BASE + "merkle_tree_posseidon_circuit.crct")

    def parse_round(c):
        out, rhs = c.l, c.r
        terms = []

        def split_sum(e):
            if isinstance(e, PK.BinOp) and e.op == "+":
                split_sum(e.l)
                split_sum(e.r)
            else:
                terms.append(e)

        split_sum(rhs)
        mults, rc = {}, 0
        for t in terms:
            if isinstance(t, PK.BinOp) and t.op == "*":
                assert isinstance(t.l, PK.Pow) and t.l.exp == 7
                mults[t.l.base.index] = t.r.v
            elif isinstance(t, PK.Const):
                rc = t.v
        return out.index, mults, rc

    rows = []
    for g in cs.gates:
        if len(g.constraints) != 15:     # 5 poseidon rounds per gate
            continue
        for c in g.constraints:
            rows.append((g.selector_index,) + parse_round(c))
    rows.sort(key=lambda r: (r[0], r[1]))

    mds = [None, None, None]
    rcs = []
    for sel, o, mults, rc in rows:
        m_row = [mults[k] for k in sorted(mults)]
        pos = (o - 3) % 3
        if mds[pos] is None:
            mds[pos] = m_row
        else:
            assert mds[pos] == m_row, "MDS rows vary across rounds"
        if pos == 0:
            rcs.append([0, 0, 0])
        rcs[-1][pos] = rc

    assert mds == [list(r) for r in NC.MDS]
    assert rcs == [list(r) for r in NC.ROUND_CONSTANTS]
    assert len(rcs) == 55


def test_device_batch_matches_host():
    import random

    import jax.numpy as jnp

    from crypto3_zk_tpu.ops import limbs as L

    rng = random.Random(5)
    pp = NP.get_params(FS)
    states = [[rng.randrange(FS.p) for _ in range(3)] for _ in range(4)]
    want = [NP.permute_host(pp, s) for s in states]

    flat = [s[i] for s in states for i in range(3)]
    dev = L.encode(FS, flat).reshape(FS.nl, len(states), 3)
    dev = jnp.swapaxes(dev, 1, 2)                  # (NL, 3, n)
    out = NP.permute_batch(pp, dev)
    got_flat = L.decode(FS, jnp.swapaxes(out, 1, 2))
    got = [got_flat[i * 3:(i + 1) * 3] for i in range(len(states))]
    assert got == want


def test_nil_merkle_roundtrip():
    import random

    from crypto3_zk_tpu.commitments.merkle import MerkleTree, make_hasher
    from crypto3_zk_tpu.ops import limbs as L
    import jax.numpy as jnp

    rng = random.Random(7)
    hasher = make_hasher(FS, "poseidon_nil")
    n, k = 256, 2
    rows = [[rng.randrange(FS.p) for _ in range(k)] for _ in range(n)]
    dev = jnp.stack([L.encode(FS, [r[i] for r in rows]) for i in range(k)])
    tree = MerkleTree(hasher, leaf_rows_dev=dev)
    root = tree.root()
    for idx in (0, 1, 57, 255):
        path = tree.proof(idx)
        assert MerkleTree.validate(hasher, root, rows[idx], idx, path)
    bad = list(rows[3])
    bad[0] = (bad[0] + 1) % FS.p
    assert not MerkleTree.validate(hasher, root, bad, 3, tree.proof(3))


def test_nil_transcript_flavor():
    from crypto3_zk_tpu.transcript.poseidon_transcript import (
        PoseidonTranscript)

    t1 = PoseidonTranscript(FS, b"seed", flavor="nil")
    t2 = PoseidonTranscript(FS, b"seed", flavor="nil")
    t1.absorb_field(FS, 42)
    t2.absorb_field(FS, 42)
    c1, c2 = t1.challenge(FS), t2.challenge(FS)
    assert c1 == c2 and 0 < c1 < FS.p
    # differs from the original-flavor chain (different permutation)
    t3 = PoseidonTranscript(FS, b"seed")
    t3.absorb_field(FS, 42)
    assert t3.challenge(FS) != c1
    # second squeeze without absorb re-permutes (fiat_shamir.hpp:229-237)
    assert t1.challenge(FS) != c1
    assert t1.challenge(FS) == t2.challenges(FS, 2)[1]
