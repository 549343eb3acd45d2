"""FRI + LPC commit→open→verify roundtrips.

Mirrors the reference golden-path tests `test/commitment/fri.cpp:83-145` and
`test/commitment/lpc.cpp` including the transcript-equivalence postcondition
(prover and verifier transcripts must yield the same next challenge — the
de-facto bit-exactness oracle, SURVEY.md §4.7).
"""
import random

import pytest

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.poly.polynomial import Poly, PolyDFS
from crypto3_zk_tpu.transcript.fiat_shamir import Transcript
from crypto3_zk_tpu.commitments import fri as FRI
from crypto3_zk_tpu.commitments.lpc import LPCScheme

FS = P.BLS12_381_FR
rng = random.Random(0xF121)
SEED = bytes(range(10))


def rand_poly(n):
    return Poly.from_ints(FS, [rng.randrange(FS.p) for _ in range(n)])


@pytest.mark.parametrize("merkle_hash", ["poseidon", "sha2_256"])
@pytest.mark.parametrize("steps", [[1, 1, 1], [2, 1]])
def test_fri_single_roundtrip(merkle_hash, steps):
    params = FRI.FRIParams.build(
        FS, degree_log=4, expand_factor=2, lambda_=4, step_list=steps,
        merkle_hash=merkle_hash, use_grinding=True, grinding_parameter=0xF)
    f = PolyDFS.from_poly(rand_poly(16))
    pre = FRI.precommit([f], params.D[0], params.step_list[0], params)
    root = pre.root()

    tr = Transcript("keccak_256", SEED)
    proof = FRI.proof_eval_single(f, pre, params, tr)

    tv = Transcript("keccak_256", SEED)
    assert FRI.verify_eval_single(proof, root, params, tv)
    # transcript equivalence (fri.cpp:142-144)
    assert tr.challenge(FS) == tv.challenge(FS)


def test_fri_rejects_tampered_value():
    params = FRI.FRIParams.build(FS, degree_log=4, expand_factor=2,
                                 lambda_=4, merkle_hash="poseidon")
    f = PolyDFS.from_poly(rand_poly(16))
    pre = FRI.precommit([f], params.D[0], params.step_list[0], params)
    root = pre.root()
    tr = Transcript("keccak_256", SEED)
    proof = FRI.proof_eval_single(f, pre, params, tr)
    # corrupt one initial value
    q = proof.query_proofs[0].initial_proof[0]
    v0 = q.values[0][0]
    q.values[0][0] = ((v0[0] + 1) % FS.p, v0[1])
    tv = Transcript("keccak_256", SEED)
    assert not FRI.verify_eval_single(proof, root, params, tv)


def test_fri_rejects_wrong_degree():
    params = FRI.FRIParams.build(FS, degree_log=4, expand_factor=2,
                                 lambda_=4, merkle_hash="poseidon")
    f = PolyDFS.from_poly(rand_poly(16))
    pre = FRI.precommit([f], params.D[0], params.step_list[0], params)
    tr = Transcript("keccak_256", SEED)
    proof = FRI.proof_eval_single(f, pre, params, tr)
    # final polynomial too large
    proof.final_polynomial = proof.final_polynomial + [1] * 10
    tv = Transcript("keccak_256", SEED)
    assert not FRI.verify_eval_single(proof, pre.root(), params, tv)


def _lpc_fixture(merkle_hash="poseidon", with_fixed=False):
    params = FRI.FRIParams.build(
        FS, degree_log=4, expand_factor=2, lambda_=4,
        merkle_hash=merkle_hash)
    scheme = LPCScheme(params)
    polys0 = [PolyDFS.from_poly(rand_poly(16)) for _ in range(2)]
    polys1 = [PolyDFS.from_poly(rand_poly(12))]
    scheme.append_to_batch(0, polys0)
    scheme.append_to_batch(1, polys1)
    roots = {0: scheme.commit(0), 1: scheme.commit(1)}
    z1, z2 = rng.randrange(FS.p), rng.randrange(FS.p)
    scheme.append_eval_point(0, z1)
    scheme.append_eval_point(0, z2)
    scheme.append_eval_point(1, z1)
    pre_data = {}
    if with_fixed:
        scheme.mark_batch_as_fixed(1)
        tpre = Transcript("keccak_256", SEED)
        pre_data = scheme.preprocess(tpre)
    tr = Transcript("keccak_256", SEED)
    if with_fixed:
        scheme.setup(tr, pre_data)
    proof = scheme.proof_eval(tr)

    # independent verifier-side scheme
    ver = LPCScheme(params)
    ver.set_batch_size(0, 2)
    ver.set_batch_size(1, 1)
    ver.append_eval_point(0, z1)
    ver.append_eval_point(0, z2)
    ver.append_eval_point(1, z1)
    tv = Transcript("keccak_256", SEED)
    if with_fixed:
        ver.mark_batch_as_fixed(1)
        ver.setup(tv, pre_data)
    return scheme, ver, proof, roots, tr, tv


@pytest.mark.parametrize("merkle_hash", ["poseidon"])
def test_lpc_roundtrip(merkle_hash):
    scheme, ver, proof, roots, tr, tv = _lpc_fixture(merkle_hash)
    assert ver.verify_eval(proof, roots, tv)
    assert tr.challenge(FS) == tv.challenge(FS)


def test_lpc_fixed_batch_roundtrip():
    scheme, ver, proof, roots, tr, tv = _lpc_fixture(with_fixed=True)
    assert ver.verify_eval(proof, roots, tv)
    assert tr.challenge(FS) == tv.challenge(FS)


def test_lpc_rejects_tampered_eval():
    scheme, ver, proof, roots, tr, tv = _lpc_fixture()
    proof.z.z[0][0][0] = (proof.z.z[0][0][0] + 1) % FS.p
    assert not ver.verify_eval(proof, roots, tv)


def test_proof_of_work_roundtrip():
    from crypto3_zk_tpu.commitments import proof_of_work as POW
    t1 = Transcript("keccak_256", SEED)
    t1.absorb(b"ctx")
    nonce = POW.generate(t1, 0xFF)
    t2 = Transcript("keccak_256", SEED)
    t2.absorb(b"ctx")
    assert POW.verify(t2, nonce, 0xFF)
    assert t1.challenge(FS) == t2.challenge(FS)
    # field variant
    t3 = Transcript("keccak_256", SEED)
    n2 = POW.field_generate(t3, FS, 6)
    t4 = Transcript("keccak_256", SEED)
    assert POW.field_verify(t4, FS, n2, 6)
    # negative
    t5 = Transcript("keccak_256", SEED)
    t5.absorb(b"ctx")
    assert not POW.verify(t5, nonce + 1, 0xFF)


def test_pedersen_vss():
    """`test/commitment/pedersen.cpp` flow: deal -> verify -> reconstruct."""
    import random as _r
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.commitments import pedersen as PD
    curve = CV.ALT_BN128
    r = _r.Random(0x9E)
    params = PD.key_generator(curve, n=6, k=3, rng=r)
    secret = 0x1234567
    prf = PD.proof_eval(params, secret, rng=r)
    assert PD.verify_eval(params, prf)
    assert PD.message_eval(params, prf, [1, 3, 5]) == secret
    assert PD.message_eval(params, prf, [2, 4, 6]) == secret
    # too few shares
    assert PD.message_eval(params, prf, [1, 2]) == 0
    # corrupted share breaks verification
    prf.pk[0].s = (prf.pk[0].s + 1) % curve.fr.p
    assert not PD.verify_eval(params, prf)


def test_legacy_batched_fri_variants():
    from crypto3_zk_tpu.commitments.legacy_fri import (
        BasicBatchedFriCompileTimeSize, BasicBatchedFriRuntimeSize)
    params = FRI.FRIParams.build(FS, degree_log=4, expand_factor=2,
                                 lambda_=4, step_list=[1, 1, 1])
    sch = BasicBatchedFriRuntimeSize(params)
    polys = [PolyDFS.from_poly(rand_poly(16)) for _ in range(3)]
    pre = sch.precommit(polys)
    tr = Transcript("keccak_256", SEED)
    proof = sch.proof_eval(polys, pre, tr)
    tv = Transcript("keccak_256", SEED)
    assert sch.verify_eval(proof, pre.root(), 3, tv)
    assert tr.challenge(FS) == tv.challenge(FS)

    ct = BasicBatchedFriCompileTimeSize(params, 3)
    pre2 = ct.precommit(polys)
    proof2 = ct.proof_eval(polys, pre2, Transcript("keccak_256", SEED))
    assert ct.verify_eval(proof2, pre2.root(), Transcript("keccak_256", SEED))
    with pytest.raises(ValueError):
        ct.precommit(polys[:2])
