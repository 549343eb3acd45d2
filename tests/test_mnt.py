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


def test_mnt_family_equations_external_pin():
    """EXTERNAL pin of p and r (round-2 weak #9): MNT curves are a
    parameterized family (Miyaji-Nakabayashi-Takano 2001) — k=4 curves
    MUST satisfy p = x^2+x+1, r = x^2+1 and k=6 curves p = 4y^2+1,
    r = 4y^2-2y+1 for integers x, y, with the cycle forcing x = -2y.
    A single mistyped digit in any of the four 298-bit parameters breaks
    these Diophantine identities; combined with the primality/exact-
    embedding-degree/prime-order certificates this pins the parameters to
    the published family without trusting any in-repo constant."""
    import math
    p4, r4 = mnt.MNT4.p, mnt.MNT4.r
    x = math.isqrt(p4)
    assert x * x + x + 1 == p4          # MNT4: p(x) = x^2 + x + 1
    assert x * x + 1 == r4              # MNT4: r(x) = x^2 + 1 (t = x+1)
    p6, r6 = mnt.MNT6.p, mnt.MNT6.r
    y, rem = divmod(p6 - 1, 4)
    y = math.isqrt(y)
    assert rem == 0 and 4 * y * y + 1 == p6      # MNT6: p(y) = 4y^2 + 1
    # MNT6: r(y) = 4y^2 ∓ 2y + 1 (trace t = 1 ± 2y, sign of y is free)
    assert r6 in (4 * y * y - 2 * y + 1, 4 * y * y + 2 * y + 1)
    assert x == 2 * y                            # cycle: x = ±2y
    # Miller-Rabin witnesses: both characteristics are 298-bit primes
    # (actual MR — a Fermat test would be fooled by Carmichael numbers)
    def miller_rabin(q, bases=(2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)):
        d, s = q - 1, 0
        while d % 2 == 0:
            d //= 2
            s += 1
        for a in bases:
            x = pow(a, d, q)
            if x in (1, q - 1):
                continue
            for _ in range(s - 1):
                x = x * x % q
                if x == q - 1:
                    break
            else:
                return False
        return True

    for q in (p4, r4):
        assert q.bit_length() == 298
        assert miller_rabin(q)


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
