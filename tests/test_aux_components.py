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


def test_device_sha256_matches_hashlib():
    import hashlib
    from crypto3_zk_tpu.ops.sha256 import sha256_many
    msgs = [bytes([i % 256]) * 64 for i in range(40)]
    assert sha256_many(msgs) == [hashlib.sha256(m).digest() for m in msgs]
    multi = [bytes(range(150))] * 3   # multi-block path
    assert sha256_many(multi) == [hashlib.sha256(m).digest() for m in multi]


def test_sha2_device_merkle_matches_host():
    from crypto3_zk_tpu.commitments.merkle import ByteHasher, MerkleTree
    fs = CURVE.fr
    rng = random.Random(0xA5)
    rows = [[rng.randrange(fs.p) for _ in range(2)] for _ in range(128)]
    dev = MerkleTree(ByteHasher(fs, "sha2_256"), leaf_rows_host=rows)
    scalar_h = ByteHasher(fs, "sha2_256")
    scalar_h._DEVICE_BATCH_MIN = 10 ** 9
    host = MerkleTree(scalar_h, leaf_rows_host=rows)
    assert dev.root() == host.root()
    idx = 77
    assert MerkleTree.validate(scalar_h, dev.root(), rows[idx], idx,
                               dev.proof(idx))


def test_fixed_base_exp_batch():
    from crypto3_zk_tpu.ops.msm import fixed_base_exp_batch
    rng = random.Random(0xA6)
    sc = [0, 1, CURVE.fr.p - 1] + [rng.randrange(CURVE.fr.p)
                                   for _ in range(5)]
    got = fixed_base_exp_batch(CURVE, CURVE.g1, sc, c=8, group="g1")
    assert got == [CV.g1_mul(CURVE, CURVE.g1, s) for s in sc]


def test_non_linear_combination():
    from crypto3_zk_tpu.arithmetization.non_linear_combination import (
        expression_to_non_linear_combination)
    from crypto3_zk_tpu.arithmetization.plonk import (BinOp, Const, Pow, Var,
                                                      evaluate_expr)
    p = CURVE.fr.p
    w0, w1 = Var(0), Var(1)
    e = BinOp("*", BinOp("+", w0, Const(3)), Pow(w1, 2))
    nlc = expression_to_non_linear_combination(e).collect(p)
    vals = {0: 5, 1: 7}
    want = evaluate_expr(e, lambda v: vals[v.index] % p,
                         lambda c: c % p) % p
    assert nlc.evaluate(p, lambda v: vals[v.index]) == want
    assert nlc.max_degree() == 3
    back = nlc.to_expression()
    assert evaluate_expr(back, lambda v: vals[v.index] % p,
                         lambda c: c % p) % p == want


def test_accumulative_transcript_legacy():
    from crypto3_zk_tpu.transcript.fiat_shamir import AccumulativeTranscript
    t = AccumulativeTranscript()
    t.absorb(b"abc")
    d1 = t.digest()
    t.absorb(b"def")
    assert t.digest() != d1 and len(t.digest()) == 32
    assert t.challenge(CURVE.fr) == 1       # reference quirk: returns one()
    assert t.int_challenge() == 1


def test_commitment_type_traits():
    from crypto3_zk_tpu.commitments import kzg as KZG
    from crypto3_zk_tpu.commitments.lpc import LPCScheme
    from crypto3_zk_tpu.commitments.type_traits import (is_commitment, is_kzg,
                                                        is_lpc,
                                                        select_container)
    params = KZG.KZGParams.setup(CURVE, 4, tau=5)
    v2 = KZG.KZGSchemeV2(params)
    assert is_commitment(v2) and is_kzg(v2) and not is_lpc(v2)
    assert select_container(v2) is tuple
    assert is_kzg(KZG.KZGSchemeBDFG) and not is_lpc(KZG.KZGSchemeBDFG)
    assert is_lpc(LPCScheme) and not is_kzg(LPCScheme)


def test_algebraic_engine_and_accumulation_vector():
    from crypto3_zk_tpu.utils.algebraic_engine import AlgebraicEngine
    from crypto3_zk_tpu.utils.sparse_vector import AccumulationVector
    e1, e2 = AlgebraicEngine(42), AlgebraicEngine(42)
    assert e1.field_elements(CURVE.fr, 5) == e2.field_elements(CURVE.fr, 5)
    assert e1.g1(CURVE) == e2.g1(CURVE)
    eng = AlgebraicEngine(7)
    ic = [eng.g1(CURVE) for _ in range(4)]
    av = AccumulationVector.from_dense(ic)
    xs = [eng.field_element(CURVE.fr) for _ in range(3)]
    folded = av.accumulate_chunk(CURVE, xs)
    want = ic[0]
    for pt, x in zip(ic[1:], xs):
        want = CV.g1_add(CURVE, want, CV.g1_mul(CURVE, pt, x))
    assert folded.first == want and folded.rest.indices == []


def test_knowledge_commitment_batch_exp():
    from crypto3_zk_tpu.commitments.knowledge_commitment import (
        KnowledgeCommitmentVector, kc_batch_exp)
    from crypto3_zk_tpu.utils.algebraic_engine import AlgebraicEngine
    eng = AlgebraicEngine(9)
    h_base = eng.g1(CURVE)
    sc = [eng.field_element(CURVE.fr) for _ in range(4)]
    kcs = kc_batch_exp(CURVE, CURVE.g1, h_base, sc)
    for k, s in zip(kcs, sc):
        assert k.g == CV.g1_mul(CURVE, CURVE.g1, s)
        assert k.h == CV.g1_mul(CURVE, h_base, s)
    v = KnowledgeCommitmentVector.from_dense([None] + kcs)
    assert v.to_dense()[0] is None and v.to_dense()[1] == kcs[0]


def test_sparse_accumulator_streaming():
    from crypto3_zk_tpu.utils.algebraic_engine import AlgebraicEngine
    from crypto3_zk_tpu.utils.sparse_vector import (AccumulationVector,
                                                    SparseAccumulator)
    eng = AlgebraicEngine(11)
    ic = [eng.g1(CURVE) for _ in range(5)]
    av = AccumulationVector.from_dense(ic)
    xs = [eng.field_element(CURVE.fr) for _ in range(4)]
    acc = SparseAccumulator(CURVE, av)
    acc(xs[:2], 0)
    acc(xs[2:], 2)
    got, rest = acc.result()
    want = ic[0]
    for pt, x in zip(ic[1:], xs):
        want = CV.g1_add(CURVE, want, CV.g1_mul(CURVE, pt, x))
    assert got == want and rest.indices == []


def test_scheme_get_params_dump():
    from crypto3_zk_tpu.commitments import fri as F
    from crypto3_zk_tpu.commitments.lpc import LPCScheme
    fs = CURVE.fr
    params = F.FRIParams.build(fs, degree_log=4, expand_factor=2,
                               lambda_=4, step_list=[1, 1, 1])
    d = params.get_params()
    assert d["lambda"] == 4 and d["step_list"] == [1, 1, 1]
    scheme = LPCScheme(params)
    ld = scheme.get_params()
    assert ld["scheme"] == "lpc" and ld["domain_size"] == d["domain_size"]


def test_checkpoint_manager_roundtrip(tmp_path):
    import numpy as np
    from crypto3_zk_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, arrays={"x": np.arange(5)}, meta={"stage": "ntt"})
    mgr.save(7, meta={"stage": "msm"})
    assert mgr.latest() == 7
    arrays, meta = mgr.load(3)
    assert meta["stage"] == "ntt" and list(arrays["x"]) == [0, 1, 2, 3, 4]
    assert mgr.load(99) is None


def test_msm_checkpoint_resume(tmp_path):
    from crypto3_zk_tpu.ops.msm import msm_host
    from crypto3_zk_tpu.utils.checkpoint import (CheckpointManager,
                                                 msm_checkpointed)
    rng = random.Random(0xC4)
    n = 8
    pts = [CV.g1_mul(CURVE, CURVE.g1, rng.randrange(1, CURVE.fr.p))
           for _ in range(n)]
    sc = [rng.randrange(CURVE.fr.p) for _ in range(n)]
    out = msm_checkpointed(CURVE, pts, sc, str(tmp_path), c=8)
    assert out == msm_host(CURVE, pts, sc)
    # resume path: all windows checkpointed, second call replays from disk
    out2 = msm_checkpointed(CURVE, pts, sc, str(tmp_path), c=8)
    assert out2 == out


def test_metrics_roofline():
    from crypto3_zk_tpu.utils import metrics as MX
    MX.reset()
    muls, byts = MX.ntt_cost(1 << 20, 16)
    r = MX.record("ntt_2^20", 0.1, muls, byts)
    assert 0 < r.roofline_fraction
    with MX.timed_kernel("noop"):
        pass
    s = MX.summary()
    assert s[0]["kernel"] == "ntt_2^20" and len(s) == 2
    MX.reset()
