"""Placeholder end-to-end: preprocess -> prove -> verify.

Mirrors the templated runner of `test/systems/plonk/placeholder/
placeholder.cpp:195-266` (LPC flavor) on the re-expressed circuit fixtures.
"""
import random

import pytest

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.commitments import fri as FRI
from crypto3_zk_tpu.commitments.lpc import LPCScheme
from crypto3_zk_tpu.models.placeholder import common as C
from crypto3_zk_tpu.models.placeholder import preprocessor as PP
from crypto3_zk_tpu.models.placeholder.prover import prove
from crypto3_zk_tpu.models.placeholder.verifier import verify

from circuits import circuit_1, circuit_lookup, circuit_t

FS = P.BLS12_381_FR


def _run(circuit_fn, seed=0xAB, max_quotient_chunks=0, tamper=None):
    rng = random.Random(seed)
    cs, assignment, desc, public_input = circuit_fn(FS, rng)

    params = C.PlaceholderParams(FS, transcript_hash="keccak_256",
                                 max_quotient_chunks=max_quotient_chunks)
    degree_log = desc.rows_amount.bit_length() - 1
    fri_params = FRI.FRIParams.build(FS, degree_log=degree_log,
                                     expand_factor=2, lambda_=4,
                                     merkle_hash="poseidon")
    scheme = LPCScheme(fri_params)

    pub = PP.process_public(params, cs, assignment, desc, scheme,
                            max_quotient_poly_chunks=max_quotient_chunks)
    priv = PP.process_private(params, cs, assignment, desc)

    if tamper == "witness":
        import crypto3_zk_tpu.ops.limbs as L
        bad = L.encode(FS, [rng.randrange(FS.p)
                            for _ in range(desc.rows_amount)])
        from crypto3_zk_tpu.poly.polynomial import PolyDFS
        priv.witnesses[2] = PolyDFS(FS, bad, desc.rows_amount)

    proof = prove(params, pub, priv, desc, cs, scheme)

    vscheme = LPCScheme(fri_params)
    ok = verify(params, pub.common_data, proof, desc, cs, vscheme,
                public_input=public_input)
    return ok, proof, pub


def test_placeholder_circuit1_roundtrip():
    ok, proof, pub = _run(circuit_1)
    assert ok


def test_placeholder_circuit_t_rotations():
    ok, proof, pub = _run(circuit_t)
    assert ok


def test_placeholder_lookup_roundtrip():
    ok, proof, pub = _run(circuit_lookup)
    assert ok


def test_placeholder_lookup_rejects_tampered_proof():
    """Mirror of the reference's mutated-proof negative paths
    (`placeholder.cpp:788-927`): corrupt a LOOKUP_BATCH opened value."""
    rng = random.Random(0xAB)
    cs, assignment, desc, public_input = circuit_lookup(FS, rng)
    params = C.PlaceholderParams(FS)
    degree_log = desc.rows_amount.bit_length() - 1
    fri_params = FRI.FRIParams.build(FS, degree_log=degree_log,
                                     expand_factor=2, lambda_=4,
                                     merkle_hash="poseidon")
    scheme = LPCScheme(fri_params)
    pub = PP.process_public(params, cs, assignment, desc, scheme)
    priv = PP.process_private(params, cs, assignment, desc)
    proof = prove(params, pub, priv, desc, cs, scheme)
    z = proof.eval_proof.eval_proof.z
    from crypto3_zk_tpu.models.placeholder.common import LOOKUP_BATCH
    z.z[LOOKUP_BATCH][0][0] = (z.z[LOOKUP_BATCH][0][0] + 1) % FS.p
    vscheme = LPCScheme(fri_params)
    assert not verify(params, pub.common_data, proof, desc, cs, vscheme,
                      public_input=public_input)


def test_placeholder_rejects_bad_witness():
    ok, _, _ = _run(circuit_1, tamper="witness")
    assert not ok


def _run_with(circuit_fn, fs, transcript_hash, merkle_hash, seed=0xAB,
              max_quotient_chunks=0):
    rng = random.Random(seed)
    cs, assignment, desc, public_input = circuit_fn(fs, rng)
    params = C.PlaceholderParams(fs, transcript_hash=transcript_hash,
                                 max_quotient_chunks=max_quotient_chunks)
    degree_log = desc.rows_amount.bit_length() - 1
    fri_params = FRI.FRIParams.build(fs, degree_log=degree_log,
                                     expand_factor=2, lambda_=4,
                                     merkle_hash=merkle_hash,
                                     transcript_hash=transcript_hash)
    scheme = LPCScheme(fri_params)
    pub = PP.process_public(params, cs, assignment, desc, scheme,
                            max_quotient_poly_chunks=max_quotient_chunks)
    priv = PP.process_private(params, cs, assignment, desc)
    proof = prove(params, pub, priv, desc, cs, scheme)
    vscheme = LPCScheme(fri_params)
    return verify(params, pub.common_data, proof, desc, cs, vscheme,
                  public_input=public_input)


def test_placeholder_poseidon_transcript():
    """Poseidon-sponge transcript flavor (placeholder.cpp poseidon runners)."""
    assert _run_with(circuit_1, FS, "poseidon", "poseidon")


def test_placeholder_goldilocks_field():
    from crypto3_zk_tpu.fields.params import GOLDILOCKS
    assert _run_with(circuit_1, GOLDILOCKS, "keccak_256", "poseidon")


def test_placeholder_max_quotient_chunks():
    """Chunked permutation/quotient mode (max_quotient_chunks != 0,
    `placeholder.cpp` chunked suites)."""
    assert _run_with(circuit_t, FS, "keccak_256", "poseidon",
                     max_quotient_chunks=5)


def test_placeholder_with_kzg_v2():
    """KZG flavor of the runner (`placeholder.cpp:1471-1560`)."""
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.commitments import kzg as KZG

    curve = CV.ALT_BN128
    rng = random.Random(0xCD)
    cs, assignment, desc, public_input = circuit_1(curve.fr, rng)
    params = C.PlaceholderParams(curve.fr, transcript_hash="keccak_256")
    kparams = KZG.KZGParams.setup(curve, 4 * desc.rows_amount + 8,
                                  tau=rng.randrange(2, curve.fr.p))
    scheme = KZG.KZGSchemeV2(kparams)
    pub = PP.process_public(params, cs, assignment, desc, scheme)
    priv = PP.process_private(params, cs, assignment, desc)
    proof = prove(params, pub, priv, desc, cs, scheme)
    vscheme = KZG.KZGSchemeV2(kparams)
    assert verify(params, pub.common_data, proof, desc, cs, vscheme,
                  public_input=public_input)
    # negative: tampered quotient opening
    z = proof.eval_proof.eval_proof.z
    z.z[C.QUOTIENT_BATCH][0][0] = (z.z[C.QUOTIENT_BATCH][0][0] + 1) % curve.fr.p
    vscheme2 = KZG.KZGSchemeV2(kparams)
    assert not verify(params, pub.common_data, proof, desc, cs, vscheme2,
                      public_input=public_input)


def test_placeholder_with_batched_kzg():
    """Plain batched-KZG (BDFG20, non-v2) flavor of the runner
    (`placeholder.cpp:1316-1468`) — the reference's KZG test matrix covers
    both the v2 (SHPLONK) and this plain batched scheme."""
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.commitments import kzg as KZG

    curve = CV.ALT_BN128
    rng = random.Random(0xCE)
    cs, assignment, desc, public_input = circuit_1(curve.fr, rng)
    params = C.PlaceholderParams(curve.fr, transcript_hash="keccak_256")
    # d2: the BDFG verifier commits Z_{T} / Z_{T∖S} in G2, so it needs
    # G2 powers up to |merged eval points| (y, rotations of y, eta, ...)
    kparams = KZG.KZGParams.setup(curve, 4 * desc.rows_amount + 8,
                                  tau=rng.randrange(2, curve.fr.p), d2=8)
    scheme = KZG.KZGSchemeBDFG(kparams)
    pub = PP.process_public(params, cs, assignment, desc, scheme)
    priv = PP.process_private(params, cs, assignment, desc)
    proof = prove(params, pub, priv, desc, cs, scheme)
    vscheme = KZG.KZGSchemeBDFG(kparams)
    assert verify(params, pub.common_data, proof, desc, cs, vscheme,
                  public_input=public_input)
    # negative: tampered quotient opening
    z = proof.eval_proof.eval_proof.z
    z.z[C.QUOTIENT_BATCH][0][0] = (z.z[C.QUOTIENT_BATCH][0][0] + 1) % curve.fr.p
    vscheme2 = KZG.KZGSchemeBDFG(kparams)
    assert not verify(params, pub.common_data, proof, desc, cs, vscheme2,
                      public_input=public_input)


def test_placeholder_rejects_wrong_public_input():
    rng = random.Random(0xAB)
    cs, assignment, desc, public_input = circuit_1(FS, rng)
    params = C.PlaceholderParams(FS)
    degree_log = desc.rows_amount.bit_length() - 1
    fri_params = FRI.FRIParams.build(FS, degree_log=degree_log,
                                     expand_factor=2, lambda_=4,
                                     merkle_hash="poseidon")
    scheme = LPCScheme(fri_params)
    pub = PP.process_public(params, cs, assignment, desc, scheme)
    priv = PP.process_private(params, cs, assignment, desc)
    proof = prove(params, pub, priv, desc, cs, scheme)
    vscheme = LPCScheme(fri_params)
    bad_public = [[(public_input[0][0] + 1) % FS.p]]
    assert not verify(params, pub.common_data, proof, desc, cs, vscheme,
                      public_input=bad_public)


def test_placeholder_circuit3_tag_lookup():
    from circuits import circuit_3
    ok, _proof, _pub = _run(circuit_3)
    assert ok


def test_placeholder_circuit4_binary_mul_lookup():
    from circuits import circuit_4
    ok, _proof, _pub = _run(circuit_4)
    assert ok


def test_placeholder_circuit5_wide_table():
    from circuits import circuit_5
    ok, _proof, _pub = _run(circuit_5)
    assert ok


def test_placeholder_circuit6_range_check_multi_table():
    from circuits import circuit_6
    ok, _proof, _pub = _run(circuit_6)
    assert ok


def test_placeholder_circuit7_big_rotations():
    from circuits import circuit_7
    ok, _proof, _pub = _run(circuit_7)
    assert ok


def test_placeholder_circuit_fib():
    from circuits import circuit_fib
    ok, _proof, _pub = _run(circuit_fib)
    assert ok


def test_placeholder_circuit4_rejects_nonmember_lookup():
    """Tag-column lookup negative path (`placeholder.cpp:788-927`): a
    witness row outside the binary-product table must be rejected."""
    rng = random.Random(3)
    from circuits import circuit_4
    cs, assignment, desc, public_input = circuit_4(FS, rng)
    # break row 3: (b, b, b*b) -> (b, b, b*b+1), selected for lookups
    assignment.witnesses[2][3] = (assignment.witnesses[2][3] + 1) % FS.p
    params = C.PlaceholderParams(FS)
    degree_log = desc.rows_amount.bit_length() - 1
    fri_params = FRI.FRIParams.build(FS, degree_log=degree_log,
                                     expand_factor=2, lambda_=4,
                                     merkle_hash="poseidon")
    scheme = LPCScheme(fri_params)
    pub = PP.process_public(params, cs, assignment, desc, scheme)
    priv = PP.process_private(params, cs, assignment, desc)
    proof = prove(params, pub, priv, desc, cs, scheme)
    vscheme = LPCScheme(fri_params)
    assert not verify(params, pub.common_data, proof, desc, cs, vscheme,
                      public_input=public_input)


def test_placeholder_pallas_field():
    """Pallas-field runner (the reference's placeholder.cpp:271-1296
    instantiates its circuits over the pallas base field with poseidon)."""
    from crypto3_zk_tpu.fields.params import PALLAS_FR
    assert _run_with(circuit_1, PALLAS_FR, "keccak_256", "poseidon")
