"""PCD chains, ADSNARK, pickles building blocks."""
import random

import pytest

from crypto3_zk_tpu.arithmetization import r1cs as R
from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.models import adsnark as AD
from crypto3_zk_tpu.models import pcd as PCD

CURVE = CV.ALT_BN128
P = CURVE.fr.p


def _counter_predicate():
    """Compliance: outgoing = incoming + 1 (one incoming message of size 1).
    Variables: 1 = outgoing (primary); 2 = local, 3 = incoming (aux)."""
    cs = R.R1CSConstraintSystem(primary_input_size=1, auxiliary_input_size=2)
    # (incoming + 1) * 1 = outgoing
    cs.add_constraint(R.LinearCombination([(3, 1), (0, 1)]), R.lc((0, 1)),
                      R.lc((1, 1)))
    return PCD.CompliancePredicate(name=1, type_id=1, constraint_system=cs,
                                   outgoing_size=1, local_data_size=1,
                                   incoming_sizes=[1])


def test_pcd_two_step_chain():
    rng = random.Random(0x9CE)
    pred = _counter_predicate()
    kp = PCD.generator(CURVE, [pred], rng=rng)
    # step 1: incoming message value 0 (genesis), outgoing 1
    step1 = PCD.prover(kp, pred, PCD.PCDMessage(1, [1]),
                       local_data=[0], incoming=[], witness=[0], rng=rng)
    # manually attach genesis incoming payload in aux: witness arg covers it
    assert PCD.verifier(kp, step1)
    # step 2: incoming = step1 (value 1), outgoing 2
    step2 = PCD.prover(kp, pred, PCD.PCDMessage(1, [2]),
                       local_data=[0], incoming=[step1], witness=[], rng=rng)
    assert PCD.verifier(kp, step2)
    # corrupt chain: tamper the inner step's message
    step1.outgoing.payload[0] = 7
    assert not PCD.verifier(kp, step2)
    # cycle mode: alternating MNT4/MNT6 per DAG depth
    kc = PCD.generator(CURVE, [pred], rng=rng, mode="cycle")
    c1 = PCD.prover(kc, pred, PCD.PCDMessage(1, [1]),
                    local_data=[0], incoming=[], witness=[0], rng=rng)
    c2 = PCD.prover(kc, pred, PCD.PCDMessage(1, [2]),
                    local_data=[0], incoming=[c1], witness=[], rng=rng)
    assert PCD.verifier(kc, c2)
    c1.outgoing.payload[0] = 9
    assert not PCD.verifier(kc, c2)


def test_adsnark_roundtrip():
    rng = random.Random(0xAD5)
    # circuit: v1 * v2 = w  (v1 authenticated, v2 public)
    cs = R.R1CSConstraintSystem(primary_input_size=2, auxiliary_input_size=1)
    cs.add_constraint(R.lc((1, 1)), R.lc((2, 1)), R.lc((3, 1)))
    v1, v2 = 6, 7
    aux = [42]
    assert cs.is_satisfied(P, [v1, v2], aux)
    pub = AD.generate(CURVE, cs, n_auth=1, rng=rng)
    sak, pak = AD.auth_generator(CURVE, rng=rng)
    labels = [b"sensor-1"]
    authdata = AD.auth_sign(CURVE, sak, labels, [v1], rng=rng)
    # standalone data checks (both key flavors)
    assert AD.auth_verify_symmetric(CURVE, sak, [v1], authdata)
    assert AD.auth_verify_public(CURVE, pak, [v1], authdata)
    assert not AD.auth_verify_symmetric(CURVE, sak, [v1 + 1], authdata)
    assert not AD.auth_verify_public(CURVE, pak, [v1 + 1], authdata)

    proof = AD.prove(pub, authdata, [v1, v2], aux, rng=rng)
    # the SAME authenticated proof verifies symmetrically AND publicly
    assert AD.verify_symmetric(pub, sak, labels, [v2], proof)
    assert AD.verify_public(pub, pak, authdata, [v2], proof)

    # tampered acc_auth (claims a different authenticated value) rejected
    bad = AD.ADSNARKProof(
        g16=proof.g16,
        acc_auth=CV.g1_add(CURVE, proof.acc_auth,
                           pub.groth16.vk.gamma_ABC_g1[1]),
        muA=proof.muA)
    assert not AD.verify_symmetric(pub, sak, labels, [v2], bad)
    assert not AD.verify_public(pub, pak, authdata, [v2], bad)

    # auth data for a DIFFERENT label (different Lambda) fails the public
    # MAC pairing equation; note same-label/different-value data leaves
    # Lambda unchanged by design — the value binding lives in muA.
    other = AD.auth_sign(CURVE, sak, [b"sensor-X"], [v1], rng=rng)
    assert not AD.verify_public(pub, pak, other, [v2], proof)

    # forged Lambda (bad signature) rejected by the public verifier
    forged = AD.AuthData(label=authdata[0].label, mu=authdata[0].mu,
                         Lambda=CV.g2_add(CURVE, authdata[0].Lambda,
                                          CURVE.g2),
                         sig=authdata[0].sig)
    assert not AD.verify_public(pub, pak, [forged], [v2], proof)

    # wrong label -> symmetric verifier recomputes a different lambda
    assert not AD.verify_symmetric(pub, sak, [b"sensor-X"], [v2], proof)


def test_pickles_polish_token_and_alphas():
    from crypto3_zk_tpu.fields import params as FP
    from crypto3_zk_tpu.models import pickles as PKL
    from crypto3_zk_tpu.poly.domain import get_domain
    fs = FP.PALLAS_FR
    p = fs.p
    dom = get_domain(fs, 16)
    c = PKL.Constants(alpha=3, beta=5, gamma=7, joint_combiner=11,
                      endo_coefficient=13, mds=[[1, 2], [3, 4]])
    evals = {("w", 0): 100, ("w", 1): 200}
    # expr: alpha * cell(w0) + cell(w1)^2 - gamma
    toks = [
        PKL.PolishToken(PKL.Tok.ALPHA),
        PKL.PolishToken(PKL.Tok.CELL, ("w", 0)),
        PKL.PolishToken(PKL.Tok.MUL),
        PKL.PolishToken(PKL.Tok.CELL, ("w", 1)),
        PKL.PolishToken(PKL.Tok.POW, 2),
        PKL.PolishToken(PKL.Tok.ADD),
        PKL.PolishToken(PKL.Tok.GAMMA),
        PKL.PolishToken(PKL.Tok.SUB),
    ]
    got = PKL.evaluate_polish(toks, dom, 123, evals, c)
    assert got == (3 * 100 + 200 * 200 - 7) % p
    # store/load
    toks2 = [
        PKL.PolishToken(PKL.Tok.LITERAL, 9),
        PKL.PolishToken(PKL.Tok.STORE),
        PKL.PolishToken(PKL.Tok.LOAD, 0),
        PKL.PolishToken(PKL.Tok.MUL),
    ]
    assert PKL.evaluate_polish(toks2, dom, 1, {}, c) == 81
    # vanishes-on-last-4-rows is zero on those rows
    w_last = dom.element(dom.n - 1)
    assert PKL.eval_vanishes_on_last_4_rows(dom, w_last) == 0
    # unnormalized lagrange basis identity
    pt = 987654321
    ulb = PKL.unnormalized_lagrange_basis(dom, 3, pt)
    assert ulb * ((pt - dom.element(3)) % p) % p == dom.evaluate_vanishing(pt)
    # alphas registry
    al = PKL.Alphas()
    al.register(PKL.ArgumentType.GATE, 3)
    al.register(PKL.ArgumentType.PERMUTATION, 2)
    al.instantiate(p, 5)
    assert al.get_alphas(PKL.ArgumentType.GATE, 3) == [1, 5, 25]
    assert al.get_alphas(PKL.ArgumentType.PERMUTATION, 2) == [125, 625]
    # kimchi sponge 128-bit challenge
    sp = PKL.KimchiSponge(FP.PALLAS_FQ)
    sp.absorb_fr(42)
    ch = sp.challenge()
    assert 0 <= ch < (1 << 128)


def test_kimchi_transcript_sponges():
    from crypto3_zk_tpu.fields.params import PALLAS_FR
    from crypto3_zk_tpu.transcript.kimchi import (DefaultFqSponge,
                                                  DefaultFrSponge,
                                                  ScalarChallenge)
    s = DefaultFqSponge(PALLAS_FR)
    s.absorb_g((5, 7))
    s.absorb_g(None)
    ch = s.squeeze_challenge()
    assert 0 <= ch.value < (1 << 128)
    s2 = DefaultFqSponge(PALLAS_FR)
    s2.absorb_g((5, 7))
    s2.absorb_g(None)
    assert s2.squeeze_challenge() == ch
    p = PALLAS_FR.p
    endo = 0x2D33357CB532458ED3552A23A8554E5005270D29D19FC7D27B7FD22F0201B547
    assert 0 <= ch.to_field(p, endo) < p
    fr = DefaultFrSponge(PALLAS_FR)
    fr.absorb_evaluations([1, 2, 3])
    assert fr.squeeze_challenge().value != 0


def test_group_map_lands_on_curve():
    from crypto3_zk_tpu.fields.group_map import GroupMap
    from crypto3_zk_tpu.fields.params import PALLAS_FQ
    gm = GroupMap(PALLAS_FQ, 0, 5)
    p = PALLAS_FQ.p
    for t in (2, 7, 1234567, p - 3):
        x, y = gm.to_group(t)
        assert y * y % p == (x * x * x + 5) % p
    assert gm.to_group(17) == gm.to_group(17)


def test_plonk_permutation_map():
    from crypto3_zk_tpu.arithmetization.plonk import PlonkPermutation
    pm = PlonkPermutation(2, 3)
    pm.cells_equal((0, 1), (1, 2))
    assert pm[(0, 1)] == (1, 2) and pm[(1, 0)] == (1, 0)


def test_pickles_batch_verify_e2e():
    """to_batch/batch_verify (`pickles/verifier.hpp:68-388`) over a
    synthetic verifier index: honest proof accepted (single + batch of 2),
    mutated evaluations / ft_eval1 / opening rejected."""
    import copy

    from crypto3_zk_tpu.commitments import kimchi_pedersen as KP
    from crypto3_zk_tpu.commitments.ipa import PALLAS
    from crypto3_zk_tpu.fields.group_map import GroupMap
    from crypto3_zk_tpu.models import pickles as PI

    rng = random.Random(1234)
    srs = KP.setup(PALLAS, 16, rng=rng)
    gmap = GroupMap(PALLAS.fq, 0, 5)
    index = PI.synthetic_index(srs, 16, rng)
    proof = PI.synthetic_prove(index, gmap, rng)
    assert PI.verify(gmap, index, proof)

    proof2 = PI.synthetic_prove(index, gmap, rng)
    assert PI.batch_verify(gmap, [(index, proof), (index, proof2)])

    m = copy.deepcopy(proof)
    m.ft_eval1 = (m.ft_eval1 + 1) % PALLAS.fr.p
    assert not PI.verify(gmap, index, m)
    m = copy.deepcopy(proof)
    m.evals[0].w[3][0] = (m.evals[0].w[3][0] + 1) % PALLAS.fr.p
    assert not PI.verify(gmap, index, m)
    m = copy.deepcopy(proof)
    m.proof.z1 = (m.proof.z1 + 1) % PALLAS.fr.p
    assert not PI.verify(gmap, index, m)
    m = copy.deepcopy(proof)
    m.public_input = [1, 0]
    assert not PI.verify(gmap, index, m)


REF_PICKLES_DATA = "/root/reference/test/systems/plonk/pickles/data"


def test_mina_fixture_parses_and_validates():
    """The Mina-exported blockchain proof fixture the reference ships
    (`data/kimchi.json`) loads into our pickles structures with every
    point on Pallas and the index shape contract satisfied."""
    import os.path

    import pytest

    from crypto3_zk_tpu.models import pickles_fixtures as PF

    path = os.path.join(REF_PICKLES_DATA, "kimchi.json")
    if not os.path.exists(path):
        pytest.skip("reference fixture tree not mounted")
    vk, proof = PF.load_fixture(path)
    assert vk.domain_log2 == 15
    assert PF.validate_on_pallas(vk, proof)
    # negative: corrupt one commitment point off-curve
    bad_x, bad_y = proof.w_comm[0].unshifted[0]
    proof.w_comm[0].unshifted[0] = (bad_x, (bad_y + 1))
    assert not PF.validate_on_pallas(vk, proof)


def test_pickles_batch_verify_with_mina_sponge_constants():
    """to_batch/batch_verify under Mina's REAL fq/fr Poseidon constants
    (`data/kimchi_const.json` -> MinaSponge, 55 full rounds, x^7): honest
    synthetic proof accepted, mutated one rejected — the sponge swap flows
    through oracles, the fr evaluation sponge, and the IPA challenges."""
    import copy
    import os.path

    import pytest

    from crypto3_zk_tpu.commitments import kimchi_pedersen as KP
    from crypto3_zk_tpu.commitments.ipa import PALLAS
    from crypto3_zk_tpu.fields.group_map import GroupMap
    from crypto3_zk_tpu.models import pickles as PI
    from crypto3_zk_tpu.models import pickles_fixtures as PF

    const_path = os.path.join(REF_PICKLES_DATA, "kimchi_const.json")
    if not os.path.exists(const_path):
        pytest.skip("reference fixture tree not mounted")
    fr_params, fq_params = PF.load_sponge_params(const_path)
    rng = random.Random(77)
    srs = KP.setup(PALLAS, 16, rng=rng)
    gmap = GroupMap(PALLAS.fq, 0, 5)
    index = PI.synthetic_index(srs, 16, rng)
    index.fr_sponge_params = fr_params
    index.fq_sponge_params = fq_params
    proof = PI.synthetic_prove(index, gmap, rng)
    assert PI.verify(gmap, index, proof)
    m = copy.deepcopy(proof)
    m.ft_eval1 = (m.ft_eval1 + 1) % PALLAS.fr.p
    assert not PI.verify(gmap, index, m)
