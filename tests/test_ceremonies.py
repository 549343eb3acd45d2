"""Powers-of-tau + Groth16 MPC (mirrors `test/commitment/powers_of_tau.cpp:181`
and `test/commitment/r1cs_gg_ppzksnark_mpc.cpp:159`)."""
import random

from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.commitments import powers_of_tau as POT
from crypto3_zk_tpu.commitments import kzg as KZG
from crypto3_zk_tpu.models import groth16 as G16
from crypto3_zk_tpu.models.groth16 import mpc as MPC
from crypto3_zk_tpu.poly.polynomial import Poly

from test_groth16 import power_chain_example

CURVE = CV.ALT_BN128


def test_powers_of_tau_contribution_chain():
    rng = random.Random(0x70)
    acc0 = POT.Accumulator(CURVE, 4)
    key1 = POT.generate_private_key(CURVE, rng)
    pub1 = POT.proof_eval(CURVE, key1, acc0, rng)
    acc1 = acc0.copy()
    acc1.transform(key1)
    assert POT.verify_eval(CURVE, pub1, acc0, acc1, rng)

    key2 = POT.generate_private_key(CURVE, rng)
    pub2 = POT.proof_eval(CURVE, key2, acc1, rng)
    acc2 = acc1.copy()
    acc2.transform(key2)
    assert POT.verify_eval(CURVE, pub2, acc1, acc2, rng)

    # tampered accumulator rejected
    bad = acc2.copy()
    bad.tau_powers_g1[2] = CV.g1_add(CURVE, bad.tau_powers_g1[2], CURVE.g1)
    assert not POT.verify_eval(CURVE, pub2, acc1, bad, rng)

    # ceremony output usable as a KZG SRS
    params = POT.to_kzg_params(acc2, 6)
    fs = CURVE.fr
    f = Poly.from_ints(fs, [rng.randrange(fs.p) for _ in range(6)])
    c = KZG.commit_one(params, f.to_ints())
    z = rng.randrange(fs.p)
    proof = KZG.proof_eval_one(params, f, z)
    assert KZG.verify_eval_one(params, proof, c, z, f.evaluate(z))


def test_groth16_mpc_phase2():
    rng = random.Random(0x71)
    cs, primary, aux = power_chain_example(CURVE, 4)
    kp0 = G16.generate(CURVE, cs, rng=rng)
    state = MPC.init_mpc(kp0)
    state = MPC.contribute(state, rng=rng)
    state = MPC.contribute(state, rng=rng)
    assert MPC.verify_contribution_chain(kp0, state)

    # proofs under the final CRS verify
    proof = G16.prove(state.keypair.pk, primary, aux, rng=rng)
    assert G16.verify(state.keypair.vk, primary, proof)
    # but not under the initial vk (delta changed)
    assert not G16.verify(kp0.vk, primary, proof)

    # a forged chain is rejected
    forged = MPC.MPCState(keypair=state.keypair,
                          contributions=list(state.contributions),
                          initial_delta_g1=state.initial_delta_g1)
    forged.contributions[-1] = MPC.MPCPublicKey(
        CV.g1_mul(CURVE, CURVE.g1, 12345), forged.contributions[-1].pok)
    assert not MPC.verify_contribution_chain(kp0, forged)


def test_ceremony_to_groth16_crs():
    """contribute x2 -> verify chain -> result -> initial keypair ->
    prove/verify -> phase-2 MPC -> prove/verify (mirrors the reference
    pipeline `result.hpp:76` + `crs_operations.hpp:23` + mpc tests)."""
    rng = random.Random(0x72)
    from test_groth16 import power_chain_example
    cs, primary, aux = power_chain_example(CURVE, 4)
    # QAP domain: num_constraints(4) + num_inputs(1) + 1 -> 8
    acc0 = POT.Accumulator(CURVE, 8)
    acc, prev = acc0, acc0
    pubs = []
    for _ in range(2):
        key = POT.generate_private_key(CURVE, rng)
        pub = POT.proof_eval(CURVE, key, acc, rng)
        nxt = acc.copy()
        nxt.transform(key)
        assert POT.verify_eval(CURVE, pub, acc, nxt, rng)
        acc = nxt
        pubs.append(pub)

    result = POT.result_from_accumulator(acc, 8)
    kp0 = MPC.keypair_from_ceremony(cs, result)

    # the gamma = delta = 1 CRS proves and verifies
    proof = G16.prove(kp0.pk, primary, aux, rng=rng)
    assert G16.verify(kp0.vk, primary, proof)
    assert not G16.verify(kp0.vk, [(primary[0] + 1) % CURVE.fr.p], proof)

    # phase-2 MPC randomizes delta; chain verifies; proofs still verify
    state = MPC.init_mpc(kp0)
    state = MPC.contribute(state, rng=rng)
    state = MPC.contribute(state, rng=rng)
    assert MPC.verify_contribution_chain(kp0, state)
    proof2 = G16.prove(state.keypair.pk, primary, aux, rng=rng)
    assert G16.verify(state.keypair.vk, primary, proof2)
    assert not G16.verify(kp0.vk, primary, proof2)
