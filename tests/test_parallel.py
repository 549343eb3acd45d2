"""Multi-device (virtual 8-CPU mesh) sharding tests."""
import random

import jax
import pytest
from jax.sharding import Mesh

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.ops import limbs as L
from crypto3_zk_tpu.parallel.ntt import distributed_ntt
from crypto3_zk_tpu.poly.domain import get_domain

FS = P.BLS12_381_FR
rng = random.Random(99)


@pytest.fixture
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(devs[:8], ("x",))


@pytest.mark.parametrize("log_n", [8, 10])
def test_distributed_ntt_matches_single_chip(mesh, log_n):
    n = 1 << log_n
    coeffs = [rng.randrange(FS.p) for _ in range(n)]
    x = L.encode(FS, coeffs)
    want = L.decode(FS, get_domain(FS, n).fft(x))
    got = L.decode(FS, distributed_ntt(FS, x, mesh, "x"))
    assert got == want


def test_distributed_intt_roundtrip(mesh):
    n = 1 << 9
    coeffs = [rng.randrange(FS.p) for _ in range(n)]
    x = L.encode(FS, coeffs)
    fwd = distributed_ntt(FS, x, mesh, "x")
    back = distributed_ntt(FS, fwd, mesh, "x", inverse=True)
    assert L.decode(FS, back) == coeffs


def test_distributed_msm_matches_single(mesh):
    """2^12 points over the 8-device mesh: the whole MSM (local window
    scans + all_gather + jac tree-reduce) is ONE shard_map program."""
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.ops.msm import msm_host
    from crypto3_zk_tpu.parallel.msm import distributed_msm
    c = CV.ALT_BN128
    r = random.Random(123)
    n = 1 << 12
    base, acc = [], None
    for i in range(64):
        acc = CV.g1_add(c, acc, c.g1)
        base.append(acc)
    sel = [r.randrange(64) for _ in range(n)]
    pts = [base[j] for j in sel]
    sc = [r.randrange(c.fr.p) for _ in range(n)]
    sc[0] = 0
    got = distributed_msm(c, pts, sc, mesh=mesh, c=8)
    tot = sum(s * (j + 1) for j, s in zip(sel, sc)) % c.fr.p
    assert got == CV.g1_mul(c, c.g1, tot)


def test_distributed_msm_small_uneven(mesh):
    """n smaller than the mesh wants (pads), legacy devices= signature."""
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.ops.msm import msm_host
    from crypto3_zk_tpu.parallel.msm import distributed_msm
    c = CV.ALT_BN128
    r = random.Random(321)
    n = 33
    pts = [CV.g1_mul(c, c.g1, r.randrange(1, c.fr.p)) for _ in range(n)]
    sc = [r.randrange(c.fr.p) for _ in range(n)]
    got = distributed_msm(c, pts, sc, devices=jax.devices()[:4], c=8)
    assert got == msm_host(c, pts, sc)


def test_config_builds():
    from crypto3_zk_tpu.utils.config import ZkTpuConfig
    cfg = ZkTpuConfig(field="bls12_381_fr", transcript_hash="poseidon",
                      mesh_shape=(4,))
    assert cfg.fs.name == "bls12_381_fr"
    m = cfg.build_mesh()
    assert m.shape["x"] == 4
    fp = cfg.build_fri_params(4)
    assert fp.lambda_ == 40 and fp.merkle_hash == "poseidon"
    pp = cfg.build_placeholder_params()
    assert pp.transcript_hash == "poseidon"


def test_distributed_fri_precommit_matches_single(mesh):
    """Sharded Poseidon leaf hashing + all_gather must reproduce the
    single-chip precommit root and proofs bit-for-bit."""
    from crypto3_zk_tpu.commitments import fri as FRI
    from crypto3_zk_tpu.parallel.fri import distributed_precommit
    from crypto3_zk_tpu.poly.polynomial import Poly

    params = FRI.FRIParams.build(FS, degree_log=7, expand_factor=2,
                                 lambda_=4, merkle_hash="poseidon")
    D0 = params.D[0]
    step = params.step_list[0]
    from crypto3_zk_tpu.poly.polynomial import PolyDFS
    polys = [PolyDFS.from_poly(
        Poly.from_ints(FS, [rng.randrange(FS.p) for _ in range(1 << 7)]))
        for _ in range(2)]
    pre = distributed_precommit(polys, D0, step, params, mesh, "x")
    ref = FRI.precommit(polys, D0, step, params)
    assert pre.root() == ref.root()
    assert pre.tree.proof(3) == ref.tree.proof(3)


def test_distributed_fri_query_gather(mesh):
    """Leaf-range-sharded query serving matches the replicated gather."""
    import numpy as np

    from crypto3_zk_tpu.commitments import fri as FRI
    from crypto3_zk_tpu.parallel.fri import (distributed_precommit,
                                             distributed_query_gather)
    from crypto3_zk_tpu.poly.polynomial import Poly, PolyDFS

    fs = FS
    params = FRI.FRIParams.build(fs, degree_log=6, expand_factor=2,
                                 lambda_=4, merkle_hash="poseidon")
    rng = random.Random(12)
    f = PolyDFS.from_poly(Poly.from_ints(
        fs, [rng.randrange(fs.p) for _ in range(64)]))
    pre = distributed_precommit([f], params.D[0], params.step_list[0],
                                params, mesh, "x")
    need = sorted(rng.sample(range(params.D[0].n), 17))
    got = distributed_query_gather(pre.values, need, mesh, "x")
    want = pre.values[:, :, np.asarray(need)]
    assert (np.asarray(got) == np.asarray(want)).all()
