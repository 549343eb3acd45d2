"""Groth16 end-to-end (mirrors `test/systems/ppzksnark/r1cs_gg_ppzksnark.cpp`
run through `run_r1cs_gg_ppzksnark.hpp:79-`: keypair -> prove -> verify, plus
negative paths)."""
import random

import pytest

from crypto3_zk_tpu.arithmetization import r1cs as R
from crypto3_zk_tpu.arithmetization import qap as QAP
from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.models import groth16 as G16


def power_chain_example(curve, n_constraints=10):
    """x (primary); aux chain a_1 = x^2, a_{i+1} = a_i * x."""
    p = curve.fr.p
    cs = R.R1CSConstraintSystem(primary_input_size=1,
                                auxiliary_input_size=n_constraints)
    # variable indices: 0=one, 1=x, 2..=aux
    cs.add_constraint(R.lc((1, 1)), R.lc((1, 1)), R.lc((2, 1)))
    for i in range(1, n_constraints):
        cs.add_constraint(R.lc((1 + i, 1)), R.lc((1, 1)), R.lc((2 + i, 1)))
    x = 7
    aux = []
    v = x
    for _ in range(n_constraints):
        v = v * x % p
        aux.append(v)
    assert cs.is_satisfied(p, [x], aux)
    return cs, [x], aux


CURVE = CV.ALT_BN128


def test_qap_witness_map_divides():
    cs, primary, aux = power_chain_example(CURVE)
    fs = CURVE.fr
    wit = QAP.witness_map(fs, cs, primary, aux)
    # H coefficients top two must vanish (degree d-2)
    assert wit.coefficients_for_H[wit.degree - 1] == 0
    assert wit.coefficients_for_H[wit.degree] == 0
    # check A(t)*B(t) - C(t) == H(t)*Z(t) at random t (QAP identity)
    t = random.Random(3).randrange(fs.p)
    inst = QAP.instance_map_with_evaluation(fs, cs, t)
    p = fs.p
    full = [1] + primary + aux
    At = sum(a * v for a, v in zip(inst.At, full)) % p
    Bt = sum(b * v for b, v in zip(inst.Bt, full)) % p
    Ct = sum(c * v for c, v in zip(inst.Ct, full)) % p
    Ht = 0
    for i, h in enumerate(wit.coefficients_for_H):
        Ht = (Ht + h * pow(t, i, p)) % p
    assert (At * Bt - Ct) % p == Ht * inst.Zt % p


def test_groth16_roundtrip():
    rng = random.Random(11)
    cs, primary, aux = power_chain_example(CURVE)
    kp = G16.generate(CURVE, cs, rng=rng)
    proof = G16.prove(kp.pk, primary, aux, rng=rng)
    assert G16.verify(kp.vk, primary, proof)
    # wrong public input
    assert not G16.verify(kp.vk, [primary[0] + 1], proof)
    # tampered proof
    bad = G16.Proof(g_A=proof.g_A, g_B=proof.g_B,
                    g_C=CV.g1_add(CURVE, proof.g_C, CURVE.g1))
    assert not G16.verify(kp.vk, primary, bad)


def test_groth16_zk_randomness_varies_proof():
    rng = random.Random(12)
    cs, primary, aux = power_chain_example(CURVE, 4)
    kp = G16.generate(CURVE, cs, rng=rng)
    p1 = G16.prove(kp.pk, primary, aux, zk_rs=(1, 2))
    p2 = G16.prove(kp.pk, primary, aux, zk_rs=(3, 4))
    assert p1.g_A != p2.g_A
    assert G16.verify(kp.vk, primary, p1)
    assert G16.verify(kp.vk, primary, p2)


def test_groth16_verifier_variants():
    """The reference's four-verifier matrix (`run_r1cs_gg_ppzksnark.hpp:79-`):
    weak/strong input consistency x plain/online (processed vk)."""
    from crypto3_zk_tpu.models.groth16 import (online_verify_strong_ic,
                                               online_verify_weak_ic,
                                               process_verification_key,
                                               verify_strong_ic)

    curve = CV.ALT_BN128
    cs = R.R1CSConstraintSystem(primary_input_size=2, auxiliary_input_size=1)
    cs.add_constraint(R.lc((1, 1)), R.lc((2, 1)), R.lc((3, 1)))
    kp = G16.generate(curve, cs, rng=random.Random(44))
    primary = [3, 5]
    proof = G16.prove(kp.pk, primary, [15], rng=random.Random(45))
    pvk = process_verification_key(kp.vk)
    assert G16.verify(kp.vk, primary, proof)
    assert verify_strong_ic(kp.vk, primary, proof)
    assert online_verify_weak_ic(pvk, primary, proof)
    assert online_verify_strong_ic(pvk, primary, proof)
    # weak IC zero-pads a short primary input; strong rejects it
    short = [3]
    assert not verify_strong_ic(kp.vk, short, proof)
    assert not online_verify_strong_ic(pvk, short, proof)
