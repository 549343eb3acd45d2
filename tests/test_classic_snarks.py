"""PGHR13 + GM17 end-to-end (mirrors the disabled-but-documented
`r1cs_ppzksnark` / `r1cs_se_ppzksnark` test flows)."""
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.models import gm17 as GM
from crypto3_zk_tpu.models import pghr13 as PG

from test_groth16 import power_chain_example

CURVE = CV.ALT_BN128


def test_gm17_roundtrip():
    rng = random.Random(0x17)
    cs, primary, aux = power_chain_example(CURVE, 6)
    kp = GM.generate(CURVE, cs, rng)
    proof = GM.prove(kp.pk, primary, aux, rng)
    assert GM.verify(kp.vk, primary, proof)
    assert not GM.verify(kp.vk, [primary[0] + 1], proof)
    bad = GM.Proof(A=proof.A, B=proof.B, C=CV.g1_add(CURVE, proof.C, CURVE.g1))
    assert not GM.verify(kp.vk, primary, bad)


def test_gm17_sap_witness_identity():
    from crypto3_zk_tpu.arithmetization import sap as SAP
    rng = random.Random(0x18)
    cs, primary, aux = power_chain_example(CURVE, 5)
    fs = CURVE.fr
    t = rng.randrange(fs.p)
    inst = SAP.instance_map_with_evaluation(fs, cs, t)
    wit = SAP.witness_map(fs, cs, primary, aux, 0, 0)
    p = fs.p
    full = [1] + wit.coefficients_for_ACs
    At = sum(a * v for a, v in zip(inst.At, full)) % p
    Ct = sum(c * v for c, v in zip(inst.Ct, full)) % p
    Ht = 0
    for i, h in enumerate(wit.coefficients_for_H):
        Ht = (Ht + h * pow(t, i, p)) % p
    assert (At * At - Ct) % p == Ht * inst.Zt % p


def test_pghr13_roundtrip():
    rng = random.Random(0x19)
    cs, primary, aux = power_chain_example(CURVE, 6)
    kp = PG.generate(CURVE, cs, rng)
    proof = PG.prove(kp.pk, primary, aux, rng)
    assert PG.verify(kp.vk, primary, proof)
    assert not PG.verify(kp.vk, [primary[0] + 1], proof)
    bad = PG.Proof(g_A=proof.g_A, g_B=proof.g_B, g_C=proof.g_C,
                   g_H=CV.g1_add(CURVE, proof.g_H, CURVE.g1), g_K=proof.g_K)
    assert not PG.verify(kp.vk, primary, bad)
