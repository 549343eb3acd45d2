"""Device MSM: single-program windows, grouped segmented scan."""
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.ops import msm as M

CURVE = CV.ALT_BN128
rng = random.Random(0x315)


def _pts_sc(n):
    pts = [CV.g1_mul(CURVE, CURVE.g1, rng.randrange(1, CURVE.fr.p))
           for _ in range(n)]
    sc = [rng.randrange(CURVE.fr.p) for _ in range(n)]
    return pts, sc


def test_device_msm_single_group():
    pts, sc = _pts_sc(40)   # pads to 64, G = 1
    assert M.msm(CURVE, pts, sc, c=8) == M.msm_host(CURVE, pts, sc)


def test_device_msm_multi_group(monkeypatch):
    monkeypatch.setattr(M, "_MSM_GROUP", 8)   # 32 points -> G = 4 groups
    pts, sc = _pts_sc(32)
    # include colliding digits and zero scalars across group boundaries
    sc[3] = sc[11] = sc[19]
    sc[5] = 0
    assert M.msm(CURVE, pts, sc, c=4) == M.msm_host(CURVE, pts, sc)


@pytest.mark.skipif(
    __import__("jax").default_backend() == "cpu",
    reason="Fq2 window program takes >30 min of XLA:CPU compile; the "
           "algorithm is covered by the g1 tests and the g2 point math "
           "by the eager fixed-base/kc paths")
def test_device_msm_g2():
    pts = [CV.g2_mul(CURVE, CURVE.g2, rng.randrange(1, CURVE.fr.p))
           for _ in range(32)]
    sc = [rng.randrange(CURVE.fr.p) for _ in range(32)]
    assert M.msm(CURVE, pts, sc, c=8, group="g2") \
        == M.msm_host(CURVE, pts, sc, group="g2")
