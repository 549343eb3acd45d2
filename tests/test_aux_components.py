"""Aux components: generic API, serialization, set commitment,
encrypted-input Groth16, profiling info."""
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.models import api
from crypto3_zk_tpu.models import groth16 as G16
from crypto3_zk_tpu.models.groth16 import encrypted_input as EI
from crypto3_zk_tpu.utils import serialization as SER

from test_groth16 import power_chain_example

CURVE = CV.ALT_BN128


def test_generic_api_dispatch():
    rng = random.Random(0xA1)
    cs, primary, aux = power_chain_example(CURVE, 4)
    for name in (api.GROTH16, api.GM17, api.PGHR13):
        kp = api.generate(name, CURVE, cs, rng=rng)
        proof = api.prove(name, kp.pk, primary, aux, rng=rng)
        assert api.verify(name, kp.vk, primary, proof), name


def test_groth16_serialization_roundtrip():
    rng = random.Random(0xA2)
    cs, primary, aux = power_chain_example(CURVE, 4)
    kp = G16.generate(CURVE, cs, rng=rng)
    proof = G16.prove(kp.pk, primary, aux, rng=rng)
    blob = SER.groth16_proof_to_bytes(CURVE, proof)
    proof2 = SER.groth16_proof_from_bytes(CURVE, blob)
    assert proof2 == proof
    vk_blob = SER.groth16_vk_to_bytes(CURVE, kp.vk)
    vk2 = SER.groth16_vk_from_bytes(CURVE, vk_blob)
    pi_blob = SER.primary_input_to_bytes(CURVE, primary)
    pi2 = SER.primary_input_from_bytes(CURVE, pi_blob)
    # deserialized artifacts verify
    assert G16.verify(vk2, pi2, proof2)


def test_set_commitment():
    from crypto3_zk_tpu.commitments.set_commitment import SetCommitmentAccumulator
    acc = SetCommitmentAccumulator(8)
    for v in (b"alpha", b"beta", b"gamma"):
        acc.add(v)
    root = acc.get_commitment()
    prf = acc.get_membership_proof(b"beta")
    assert acc.is_in_set(root, b"beta", prf)
    assert not acc.is_in_set(root, b"delta", prf)


def test_encrypted_input_groth16():
    rng = random.Random(0xA3)
    p = CURVE.fr.p
    # circuit with 2 primary inputs (first is encrypted): x*y with aux chain
    from crypto3_zk_tpu.arithmetization import r1cs as R
    cs = R.R1CSConstraintSystem(primary_input_size=2, auxiliary_input_size=1)
    # x * y = z  (vars: 1=x, 2=y, 3=z)
    cs.add_constraint(R.lc((1, 1)), R.lc((2, 1)), R.lc((3, 1)))
    x, y = 3, 25
    aux = [x * y % p]
    assert cs.is_satisfied(p, [x, y], aux)

    kp, pk_enc, sk_enc = EI.generate_encrypted(CURVE, cs, n_encrypted=1,
                                               rng=rng)
    r = rng.randrange(1, p)
    ct = EI.encrypt_with_vk(pk_enc, kp.vk, [x], r)
    proof = EI.prove_encrypted(kp.pk, pk_enc, [x, y], aux, r, rng=rng)
    assert EI.verify_encrypted(kp.vk, pk_enc, ct, [y], proof)
    # decryption recovers the hidden input
    assert EI.decrypt(sk_enc, pk_enc, kp.vk, ct, max_message=64) == [x]
    # tampered ciphertext rejected
    bad = EI.Ciphertext(list(ct.elements))
    bad.elements[1] = CV.g1_add(CURVE, bad.elements[1], CURVE.g1)
    assert not EI.verify_encrypted(kp.vk, pk_enc, bad, [y], proof)


def test_placeholder_profiling_info():
    from circuits import circuit_1
    from crypto3_zk_tpu.fields import params as P
    from crypto3_zk_tpu.commitments import fri as FRI
    from crypto3_zk_tpu.commitments.lpc import LPCScheme
    from crypto3_zk_tpu.models.placeholder import common as C
    from crypto3_zk_tpu.models.placeholder import preprocessor as PP
    from crypto3_zk_tpu.models.placeholder.prover import prove
    from crypto3_zk_tpu.utils.profiling import placeholder_info, profile_scope

    FS = P.BLS12_381_FR
    rng = random.Random(0xAB)
    cs, assignment, desc, public_input = circuit_1(FS, rng)
    params = C.PlaceholderParams(FS)
    fri_params = FRI.FRIParams.build(FS, degree_log=4, expand_factor=2,
                                     lambda_=4, merkle_hash="poseidon")
    scheme = LPCScheme(fri_params)
    pub = PP.process_public(params, cs, assignment, desc, scheme)
    priv = PP.process_private(params, cs, assignment, desc)
    with profile_scope("placeholder prove"):
        proof = prove(params, pub, priv, desc, cs, scheme)
    info = placeholder_info(proof, pub.common_data)
    assert info["rows_amount"] == desc.rows_amount
    assert info["batches"]["0"] > 0
    assert info["total_opened_values"] > 0
