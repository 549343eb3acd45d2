"""KZG roundtrips (mirrors `test/commitment/kzg.cpp:73-1001` incl. the
negative `kzg_false_test` pattern at `kzg.cpp:231`)."""
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.commitments import kzg as KZG
from crypto3_zk_tpu.poly.polynomial import Poly, PolyDFS
from crypto3_zk_tpu.transcript.fiat_shamir import Transcript

CURVE = CV.ALT_BN128
rng = random.Random(0x5E)
SEED = bytes(range(8))


def test_kzg_basic_roundtrip():
    fs = CURVE.fr
    params = KZG.KZGParams.setup(CURVE, 16, tau=rng.randrange(2, fs.p))
    f = Poly.from_ints(fs, [rng.randrange(fs.p) for _ in range(16)])
    c = KZG.commit_one(params, f.to_ints())
    z = rng.randrange(fs.p)
    ev = f.evaluate(z)
    proof = KZG.proof_eval_one(params, f, z)
    assert KZG.verify_eval_one(params, proof, c, z, ev)
    # negative: wrong eval
    assert not KZG.verify_eval_one(params, proof, c, z, (ev + 1) % fs.p)
    # negative: wrong point
    assert not KZG.verify_eval_one(params, proof, c, (z + 1) % fs.p, ev)


def test_kzg_v2_roundtrip():
    fs = CURVE.fr
    params = KZG.KZGParams.setup(CURVE, 16, tau=rng.randrange(2, fs.p))
    scheme = KZG.KZGSchemeV2(params)
    polys0 = [PolyDFS.from_poly(Poly.from_ints(
        fs, [rng.randrange(fs.p) for _ in range(8)])) for _ in range(2)]
    polys1 = [PolyDFS.from_poly(Poly.from_ints(
        fs, [rng.randrange(fs.p) for _ in range(12)]))]
    scheme.append_to_batch(0, polys0)
    scheme.append_to_batch(1, polys1)
    roots = {0: scheme.commit(0), 1: scheme.commit(1)}
    z1, z2 = rng.randrange(fs.p), rng.randrange(fs.p)
    scheme.append_eval_point(0, z1)
    scheme.append_eval_point(0, z2)
    scheme.append_eval_point(1, z1)
    tr = Transcript("keccak_256", SEED)
    proof = scheme.proof_eval(tr)

    ver = KZG.KZGSchemeV2(params)
    ver.set_batch_size(0, 2)
    ver.set_batch_size(1, 1)
    ver.append_eval_point(0, z1)
    ver.append_eval_point(0, z2)
    ver.append_eval_point(1, z1)
    tv = Transcript("keccak_256", SEED)
    assert ver.verify_eval(proof, roots, tv)
    # transcript equivalence
    assert tr.challenge(fs) == tv.challenge(fs)


def test_kzg_v2_rejects_tampered():
    fs = CURVE.fr
    params = KZG.KZGParams.setup(CURVE, 16, tau=rng.randrange(2, fs.p))
    scheme = KZG.KZGSchemeV2(params)
    polys = [PolyDFS.from_poly(Poly.from_ints(
        fs, [rng.randrange(fs.p) for _ in range(8)]))]
    scheme.append_to_batch(0, polys)
    roots = {0: scheme.commit(0)}
    z1 = rng.randrange(fs.p)
    scheme.append_eval_point(0, z1)
    tr = Transcript("keccak_256", SEED)
    proof = scheme.proof_eval(tr)
    proof.z.z[0][0][0] = (proof.z.z[0][0][0] + 1) % fs.p
    ver = KZG.KZGSchemeV2(params)
    ver.set_batch_size(0, 1)
    ver.append_eval_point(0, z1)
    tv = Transcript("keccak_256", SEED)
    assert not ver.verify_eval(proof, roots, tv)


def test_ipa_pallas_roundtrip():
    """kimchi_pedersen-style IPA over the pallas curve
    (`kimchi_pedersen.hpp:51-760` roundtrip shape)."""
    import random as _r
    from crypto3_zk_tpu.commitments import ipa as IPA
    rng = _r.Random(0x19A)
    curve = IPA.PALLAS
    p = curve.fr.p
    params = IPA.setup(curve, 8, rng)
    coeffs = [rng.randrange(p) for _ in range(8)]
    comm = IPA.commit(params, coeffs, rng)
    z = rng.randrange(p)
    proof, v = IPA.proof_eval(params, comm, coeffs, z, rng)
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(z, i, p)) % p
    assert v == want
    assert IPA.verify_eval(params, comm.c, z, v, proof)
    # wrong evaluation rejected
    assert not IPA.verify_eval(params, comm.c, z, (v + 1) % p, proof)
    # wrong point rejected
    assert not IPA.verify_eval(params, comm.c, (z + 1) % p, v, proof)


def test_kzg_bdfg_roundtrip():
    fs = CURVE.fr
    params = KZG.KZGParams.setup(CURVE, 16, tau=rng.randrange(2, fs.p), d2=8)
    scheme = KZG.KZGSchemeBDFG(params)
    polys0 = [PolyDFS.from_poly(Poly.from_ints(
        fs, [rng.randrange(fs.p) for _ in range(8)])) for _ in range(2)]
    polys1 = [PolyDFS.from_poly(Poly.from_ints(
        fs, [rng.randrange(fs.p) for _ in range(12)]))]
    scheme.append_to_batch(0, polys0)
    scheme.append_to_batch(1, polys1)
    roots = {0: scheme.commit(0), 1: scheme.commit(1)}
    z1, z2 = rng.randrange(fs.p), rng.randrange(fs.p)
    scheme.append_eval_point(0, z1)
    scheme.append_eval_point(0, z2)
    scheme.append_eval_point(1, z1)
    tr = Transcript("keccak_256", SEED)
    proof = scheme.proof_eval(tr)

    def fresh_verifier():
        v = KZG.KZGSchemeBDFG(params)
        v.set_batch_size(0, 2)
        v.set_batch_size(1, 1)
        v.append_eval_point(0, z1)
        v.append_eval_point(0, z2)
        v.append_eval_point(1, z1)
        return v

    tv = Transcript("keccak_256", SEED)
    assert fresh_verifier().verify_eval(proof, roots, tv)
    assert tr.challenge(fs) == tv.challenge(fs)

    proof.z.z[0][0][0] = (proof.z.z[0][0][0] + 1) % fs.p
    assert not fresh_verifier().verify_eval(
        proof, roots, Transcript("keccak_256", SEED))
