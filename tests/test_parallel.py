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
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.ops.msm import msm_host
    from crypto3_zk_tpu.parallel.msm import distributed_msm
    c = CV.ALT_BN128
    r = random.Random(123)
    n = 32
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
