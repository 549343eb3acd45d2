"""MNT4-298 / MNT6-298 cycle: parameter certificates, pairings, Groth16."""
import random

import pytest

from crypto3_zk_tpu.fields import mnt


def test_cycle_parameter_certificates():
    # the cycle property itself: each curve's base field is the other's
    # scalar field
    assert mnt.MNT4.p == mnt.MNT6.r and mnt.MNT4.r == mnt.MNT6.p
    # exact embedding degrees
    p4, r4 = mnt.MNT4.p, mnt.MNT4.r
    assert (p4 ** 4 - 1) % r4 == 0
    assert (p4 - 1) % r4 != 0 and (p4 ** 2 - 1) % r4 != 0
    p6, r6 = mnt.MNT6.p, mnt.MNT6.r
    assert (p6 ** 6 - 1) % r6 == 0
    assert all((p6 ** d - 1) % r6 != 0 for d in (1, 2, 3))
    # prime order: random point times r is infinity
    for curve in (mnt.MNT4, mnt.MNT6):
        g = curve.g1
        assert (g[1] ** 2 - (g[0] ** 3 + curve.a * g[0] + curve.b)) \
            % curve.p == 0
        assert mnt.g1_mul(curve, g, curve.r) is None


@pytest.mark.parametrize("curve", [mnt.MNT4, mnt.MNT6],
                         ids=["mnt4", "mnt6"])
def test_pairing_bilinear(curve):
    F = curve.ext
    e = mnt.tate_pairing(curve, curve.g1, curve.g2)
    assert e != F.one()
    assert mnt.tate_pairing(curve, mnt.g1_mul(curve, curve.g1, 5),
                            curve.g2) == F.pow(e, 5)
    assert mnt.tate_pairing(curve, curve.g1,
                            mnt.ext_mul_scalar(curve, curve.g2, 7)) \
        == F.pow(e, 7)


def test_groth16_over_mnt4():
    import sys
    from crypto3_zk_tpu.models import groth16 as G16
    from test_groth16 import power_chain_example
    rng = random.Random(3)
    cs, primary, aux = power_chain_example(mnt.MNT4, 4)
    kp = G16.generate(mnt.MNT4, cs, rng=rng)
    proof = G16.prove(kp.pk, primary, aux, rng=rng)
    assert G16.verify(kp.vk, primary, proof)
    assert not G16.verify(kp.vk, [(primary[0] + 1) % mnt.MNT4.r], proof)
