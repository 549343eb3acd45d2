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
