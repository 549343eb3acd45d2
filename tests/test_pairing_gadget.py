"""In-circuit pairing verification gadgets (`arithmetization/pairing_gadget`).

Capability target: the reference's recursive PCD verifies Groth16 proofs
inside R1CS circuits over the MNT4/6 cycle
(`r1cs_mp_ppzkpcd/r1cs_mp_ppzkpcd.hpp:78-714`, pairing gadgets from the
sibling crypto3-blueprint). Oracles here: the host Tate pairing of
`fields/mnt.py` (itself pinned by `test_mnt.py`) and a REAL
Groth16-over-MNT4 proof produced by `models/groth16`.
"""
import random

from crypto3_zk_tpu.arithmetization import pairing_gadget as PG
from crypto3_zk_tpu.fields import mnt


def test_ext_mul_inv_gadgets_match_host():
    curve = mnt.MNT4
    F = curve.ext
    rng = random.Random(3)
    bld = PG.Builder(curve.p)
    a_val = tuple(rng.randrange(curve.p) for _ in range(F.k))
    b_val = tuple(rng.randrange(curve.p) for _ in range(F.k))
    a = PG.ext_var(bld, a_val)
    b = PG.ext_var(bld, b_val)
    c = PG.ext_mul(bld, F, a, b)
    assert PG.ext_val(bld, F, c) == F.mul(a_val, b_val)
    inv = PG.ext_inv(bld, F, a)
    assert PG.ext_val(bld, F, inv) == F.inv(a_val)
    fro = PG.ext_frobenius2(F, a)
    assert PG.ext_val(bld, F, fro) == F.pow(a_val, curve.p ** 2)
    assert bld.is_satisfied()


def test_pairing_product_bilinearity_check():
    """e(sP, Q) * e(P, sQ)^-1 == 1 proven in-circuit; a tampered witness
    breaks a constraint."""
    curve = mnt.MNT4
    F = curve.ext
    s = 0x1234567
    sP = mnt.g1_mul(curve, curve.g1, s)
    sQ = mnt.g2_mul(curve, curve.g2, s)
    bld = PG.Builder(curve.p)
    Pv = PG.g1_var(bld, sP)
    Pv2 = PG.g1_var(bld, curve.g1)
    PG.g1_on_curve(bld, curve, Pv)
    Qc = (PG.ext_const(F, curve.g2[0]), PG.ext_const(F, curve.g2[1]))
    Qc2 = (PG.ext_const(F, sQ[0]), PG.ext_const(F, sQ[1]))
    PG.pairing_product_check(bld, curve, [(Pv, Qc, +1), (Pv2, Qc2, -1)])
    assert bld.is_satisfied()
    # the builder emits a plain R1CS over MNT6's scalar field: the exact
    # shape the MNT6 Groth16 prover consumes for recursive composition
    assert curve.p == mnt.MNT6.r
    cs, aux = bld.to_r1cs()
    assert cs.is_satisfied(curve.p, [], aux)
    bld.values[1] = (bld.values[1] + 1) % curve.p
    assert not bld.is_satisfied()


def test_groth16_proof_verified_in_circuit():
    """The PCD core milestone: a REAL MNT4 Groth16 proof passes the
    in-circuit pairing-product check — proof points A, B, C and the
    public-input accumulator enter as circuit VARIABLES, gamma/delta as
    constants, e(alpha, beta)^-1 as the constant GT factor
    (`verifier.hpp (gg):138-187` mapped to
    e(A,B) e(acc,gamma)^-1 e(C,delta)^-1 e(alpha,beta)^-1 == 1)."""
    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.models import groth16 as G16
    from test_groth16 import power_chain_example

    curve = mnt.MNT4
    F = curve.ext
    rng = random.Random(5)
    cs0, primary, aux = power_chain_example(curve, n_constraints=8)
    kp = G16.generate(curve, cs0, rng=rng)
    proof = G16.prove(kp.pk, primary, aux, rng=rng)
    assert G16.verify(kp.vk, primary, proof)

    vk = kp.vk
    acc = vk.gamma_ABC_g1[0]
    for i, x in enumerate(primary):
        acc = CV.g1_add(curve, acc, CV.g1_mul(curve, vk.gamma_ABC_g1[i + 1],
                                              x))
    bld = PG.Builder(curve.p)
    Av = PG.g1_var(bld, proof.g_A)
    Cv = PG.g1_var(bld, proof.g_C)
    accv = PG.g1_var(bld, acc)
    Bv = (PG.ext_var(bld, proof.g_B[0]), PG.ext_var(bld, proof.g_B[1]))
    PG.g1_on_curve(bld, curve, Av)
    PG.g1_on_curve(bld, curve, Cv)
    gamma = (PG.ext_const(F, vk.gamma_g2[0]), PG.ext_const(F, vk.gamma_g2[1]))
    delta = (PG.ext_const(F, vk.delta_g2[0]), PG.ext_const(F, vk.delta_g2[1]))
    k_const = F.inv(vk.alpha_g1_beta_g2)
    PG.pairing_product_check(
        bld, curve,
        [(Av, Bv, +1), (accv, gamma, -1), (Cv, delta, -1)],
        const_factor=k_const)
    assert bld.is_satisfied()

    # wrong public input -> different acc -> the fixed witness chain that
    # the prover would recompute no longer satisfies the product check
    bad_acc = CV.g1_add(curve, acc, vk.gamma_ABC_g1[1])
    bld2 = PG.Builder(curve.p)
    Av = PG.g1_var(bld2, proof.g_A)
    Cv = PG.g1_var(bld2, proof.g_C)
    accv = PG.g1_var(bld2, bad_acc)
    Bv = (PG.ext_var(bld2, proof.g_B[0]), PG.ext_var(bld2, proof.g_B[1]))
    try:
        PG.pairing_product_check(
            bld2, curve,
            [(Av, Bv, +1), (accv, gamma, -1), (Cv, delta, -1)],
            const_factor=k_const)
        satisfied = bld2.is_satisfied()
    except AssertionError:
        satisfied = False
    assert not satisfied


def test_complete_groth16_verifier_gadget():
    """`groth16_verify_gadget`: in-circuit public-input accumulation
    (booleanity + fixed-base conditional-add ladders over gamma_ABC) +
    the 3-pairing product check — the full `verifier.hpp (gg):138-187`
    equation as ~46k R1CS constraints over MNT6's scalar field, satisfied
    by a REAL MNT4 proof and broken by a changed public input."""
    from crypto3_zk_tpu.models import groth16 as G16
    from test_groth16 import power_chain_example

    curve = mnt.MNT4
    rng = random.Random(5)
    cs0, primary, aux = power_chain_example(curve, n_constraints=8)
    kp = G16.generate(curve, cs0, rng=rng)
    proof = G16.prove(kp.pk, primary, aux, rng=rng)
    bld = PG.Builder(curve.p)
    x_lcs = [bld.aux(v) for v in primary]
    Av = PG.g1_var(bld, proof.g_A)
    Cv = PG.g1_var(bld, proof.g_C)
    Bv = (PG.ext_var(bld, proof.g_B[0]), PG.ext_var(bld, proof.g_B[1]))
    PG.groth16_verify_gadget(bld, curve, kp.vk, x_lcs, Av, Bv, Cv)
    assert bld.is_satisfied()
    bld.values[1] = (bld.values[1] + 1) % curve.p
    assert not bld.is_satisfied()
