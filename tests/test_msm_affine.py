"""Batched-affine Pippenger MSM (`ops/msm_affine.py`).

The single n2=512 program takes ~18 min of XLA:CPU compile (16-bit signed
windows => a 129x256 bucket-merge grid regardless of n), so these tests
run only when ZK_SLOW=1 (warm persistent cache or real patience). The
same code paths are exercised every round by the TPU bench and were
oracle-verified at n=512 (incl. edge scalars 0/1/p-1, duplicate and
negated points) and n=2^17 (shrinking pass schedule) on 2026-08-17.
"""
import os
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV

CURVE = CV.ALT_BN128
rng = random.Random(0xAFF)

slow = pytest.mark.skipif(
    os.environ.get("ZK_SLOW") != "1",
    reason="~18 min XLA:CPU compile for the 512-lane affine-MSM program; "
           "set ZK_SLOW=1 to run (TPU bench covers this path every round)")


@slow
def test_msm_affine_matches_host_with_edges():
    from crypto3_zk_tpu.ops import msm_affine as MA

    n = 300  # pads to 512
    pts = [CV.g1_mul(CURVE, CURVE.g1, rng.randrange(1, CURVE.fr.p))
           for _ in range(n)]
    sc = [rng.randrange(CURVE.fr.p) for _ in range(n)]
    sc[0], sc[1], sc[2] = 0, 1, CURVE.fr.p - 1
    pts[5] = pts[4]
    pts[6] = (pts[4][0], (-pts[4][1]) % CURVE.fq.p)
    exp = None
    for pt, s in zip(pts, sc):
        exp = CV.g1_add(CURVE, exp, CV.g1_mul(CURVE, pt, s))
    assert MA.msm_affine(CURVE, pts, sc) == exp


@slow
def test_msm_affine_infinity_bases_and_reuse():
    from crypto3_zk_tpu.ops import msm_affine as MA

    n = 64
    pts = [CV.g1_mul(CURVE, CURVE.g1, i + 1) for i in range(n)]
    pts[7] = None
    pts[13] = None
    bases = MA.MSMBases(CURVE, pts)
    for _ in range(2):   # second run hits the cached device tables
        sc = [rng.randrange(CURVE.fr.p) for _ in range(n)]
        tot = sum(s * (i + 1) for i, s in enumerate(sc)
                  if pts[i] is not None) % CURVE.fr.p
        assert bases.run(sc) == CV.g1_mul(CURVE, CURVE.g1, tot)
    assert bases.run([0] * n) is None
