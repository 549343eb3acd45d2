"""Groth16 ipp2 aggregation (role of
`test/systems/ppzksnark/r1cs_gg_ppzksnark_aggregation_*.cpp`)."""
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.models import groth16 as G16
from crypto3_zk_tpu.models.groth16 import ipp2 as IPP2

from test_groth16 import power_chain_example

CURVE = CV.ALT_BN128


def test_aggregate_two_proofs_roundtrip():
    rng = random.Random(0x1BB2)
    cs, primary, aux = power_chain_example(CURVE, 4)
    kp = G16.generate(CURVE, cs, rng=rng)

    proofs = [G16.prove(kp.pk, primary, aux, rng=rng) for _ in range(2)]
    for pr in proofs:
        assert G16.verify(kp.vk, primary, pr)

    pk_srs, vk_srs = IPP2.setup_fake_srs(CURVE, 2, rng)
    agg = IPP2.aggregate_proofs(pk_srs, b"test-transcript", proofs)
    ok = IPP2.verify_aggregate_proof(vk_srs, kp.vk, [primary, primary],
                                     agg, b"test-transcript", rng)
    assert ok

    # wrong transcript binding rejected
    assert not IPP2.verify_aggregate_proof(vk_srs, kp.vk,
                                           [primary, primary], agg,
                                           b"other-transcript", rng)
    # tampered aggregate rejected
    bad = IPP2.AggregateProof(agg.com_ab, agg.com_c, agg.ip_ab,
                              CV.g1_add(CURVE, agg.agg_c, CURVE.g1),
                              agg.tmipp)
    assert not IPP2.verify_aggregate_proof(vk_srs, kp.vk,
                                           [primary, primary], bad,
                                           b"test-transcript", rng)
    # wrong public inputs rejected
    wrong = [primary, [primary[0] + 1]]
    assert not IPP2.verify_aggregate_proof(vk_srs, kp.vk, wrong, agg,
                                           b"test-transcript", rng)


def test_aggregate_four_proofs():
    rng = random.Random(0x1BB3)
    cs, primary, aux = power_chain_example(CURVE, 3)
    kp = G16.generate(CURVE, cs, rng=rng)
    proofs = [G16.prove(kp.pk, primary, aux, rng=rng) for _ in range(4)]
    pk_srs, vk_srs = IPP2.setup_fake_srs(CURVE, 4, rng)
    agg = IPP2.aggregate_proofs(pk_srs, b"t4", proofs)
    assert IPP2.verify_aggregate_proof(vk_srs, kp.vk, [primary] * 4, agg,
                                       b"t4", rng)
