"""Groth16 phase-2 MPC on delta.

`commitments/polynomial/r1cs_gg_ppzksnark_mpc.hpp:50-210` +
`detail/.../crs_operations.hpp:114`: each participant contributes a fresh
delta_j, rescaling delta_g1/delta_g2 by delta_j and H_query/L_query by
delta_j^{-1}, publishing a PoK of delta_j over the running transcript; the
chain is verified with same-ratio pairing checks against the initial
keypair.
"""
from __future__ import annotations

import dataclasses
import random

from ...commitments import proof_of_knowledge as POK
from ...fields import curves as CV
from ...transcript.hashes import blake2b_512
from . import Keypair, ProvingKey, VerificationKey

DELTA_PERSONALIZATION = 3


@dataclasses.dataclass
class MPCPublicKey:
    delta_after: tuple     # G1 delta after this contribution
    pok: POK.PoK


@dataclasses.dataclass
class MPCState:
    keypair: Keypair
    contributions: list[MPCPublicKey]
    initial_delta_g1: tuple


def _transcript(curve: CV.CurveSpec, initial_delta_g1,
                contributions: list[MPCPublicKey]) -> bytes:
    data = POK._ser_g1(curve, initial_delta_g1)
    for c in contributions:
        data += POK._ser_g1(curve, c.delta_after)
    return blake2b_512(data)


def init_mpc(keypair: Keypair) -> MPCState:
    return MPCState(keypair=keypair, contributions=[],
                    initial_delta_g1=keypair.pk.delta_g1)


def keypair_from_ceremony(cs, result) -> Keypair:
    """Assemble the initial (gamma = delta = 1) Groth16 keypair from a
    powers-of-tau ceremony result — no toxic waste involved
    (`detail/.../crs_operations.hpp:23-113 make_r1cs_gg_ppzksnark_keypair_
    from_powers_of_tau`). Phase-2 `contribute` then randomizes delta."""
    from ...arithmetization import qap as QAP

    curve = result.curve
    p = curve.fr.p
    cs.swap_AB_if_beneficial()
    qap = QAP.instance_map_lagrange(curve.fr, cs)
    assert len(result.coeffs_g1) == qap.domain.n, \
        "powers_of_tau result size does not match the constraint system"

    nv = qap.num_variables
    a_g1 = [None] * (nv + 1)
    b_g1 = [None] * (nv + 1)
    b_g2 = [None] * (nv + 1)
    beta_a_alpha_b_c = [None] * (nv + 1)     # [beta A_i + alpha B_i + C_i]G1
    for i in range(nv + 1):
        for lag, coeff in qap.A[i]:
            a_g1[i] = CV.g1_add(
                curve, a_g1[i],
                CV.g1_mul(curve, result.coeffs_g1[lag], coeff))
            beta_a_alpha_b_c[i] = CV.g1_add(
                curve, beta_a_alpha_b_c[i],
                CV.g1_mul(curve, result.beta_coeffs_g1[lag], coeff))
        for lag, coeff in qap.B[i]:
            b_g1[i] = CV.g1_add(
                curve, b_g1[i],
                CV.g1_mul(curve, result.coeffs_g1[lag], coeff))
            b_g2[i] = CV.g2_add(
                curve, b_g2[i],
                CV.g2_mul(curve, result.coeffs_g2[lag], coeff))
            beta_a_alpha_b_c[i] = CV.g1_add(
                curve, beta_a_alpha_b_c[i],
                CV.g1_mul(curve, result.alpha_coeffs_g1[lag], coeff))
        for lag, coeff in qap.C[i]:
            beta_a_alpha_b_c[i] = CV.g1_add(
                curve, beta_a_alpha_b_c[i],
                CV.g1_mul(curve, result.coeffs_g1[lag], coeff))

    H_query = result.h[: qap.degree - 1]
    L_query = beta_a_alpha_b_c[qap.num_inputs + 1:]
    gamma_ABC = beta_a_alpha_b_c[: qap.num_inputs + 1]

    pk = ProvingKey(curve, cs, result.alpha_g1, result.beta_g1,
                    result.beta_g2, curve.g1, curve.g2,
                    a_g1, b_g1, b_g2, H_query, L_query)
    vk = VerificationKey(curve,
                         CV.pairing(curve, result.alpha_g1, result.beta_g2),
                         curve.g2, curve.g2, gamma_ABC,
                         alpha_g1=result.alpha_g1, beta_g2=result.beta_g2)
    return Keypair(pk, vk)


def contribute(state: MPCState, delta: int | None = None,
               rng: random.Random | None = None) -> MPCState:
    """Rescale the keypair by a fresh delta (`crs_operations.hpp:114`)."""
    rng = rng if rng is not None else random.SystemRandom()
    curve = state.keypair.pk.curve
    p = curve.fr.p
    delta = delta if delta is not None else rng.randrange(1, p)
    dinv = pow(delta, -1, p)

    tr = _transcript(curve, state.initial_delta_g1, state.contributions)
    pok = POK.proof_eval(curve, delta, tr, DELTA_PERSONALIZATION, rng)

    pk = state.keypair.pk
    new_pk = ProvingKey(
        curve=pk.curve, constraint_system=pk.constraint_system,
        alpha_g1=pk.alpha_g1, beta_g1=pk.beta_g1, beta_g2=pk.beta_g2,
        delta_g1=CV.g1_mul(curve, pk.delta_g1, delta),
        delta_g2=CV.g2_mul(curve, pk.delta_g2, delta),
        A_query=pk.A_query, B_query_g1=pk.B_query_g1,
        B_query_g2=pk.B_query_g2,
        H_query=[CV.g1_mul(curve, h, dinv) for h in pk.H_query],
        L_query=[CV.g1_mul(curve, l, dinv) for l in pk.L_query],
    )
    vk = state.keypair.vk
    new_vk = VerificationKey(curve=vk.curve,
                             alpha_g1_beta_g2=vk.alpha_g1_beta_g2,
                             gamma_g2=vk.gamma_g2,
                             delta_g2=new_pk.delta_g2,
                             gamma_ABC_g1=vk.gamma_ABC_g1)
    return MPCState(keypair=Keypair(new_pk, new_vk),
                    contributions=state.contributions
                    + [MPCPublicKey(new_pk.delta_g1, pok)],
                    initial_delta_g1=state.initial_delta_g1)


def verify_contribution_chain(initial: Keypair, final: MPCState) -> bool:
    """`r1cs_gg_ppzksnark_mpc::verify` essentials: PoK chain + same-ratio
    checks tying the final keypair to the initial one."""
    curve = initial.pk.curve
    prev_delta = initial.pk.delta_g1
    for i, contrib in enumerate(final.contributions):
        tr = _transcript(curve, initial.pk.delta_g1, final.contributions[:i])
        g2_s = POK.compute_g2_s(curve, contrib.pok.g1_s, contrib.pok.g1_s_x,
                                tr, DELTA_PERSONALIZATION)
        if not POK.verify_eval(curve, contrib.pok, g2_s):
            return False
        # delta_after = delta_j * delta_before (same ratio vs the PoK)
        if not POK.is_same_ratio(curve, (prev_delta, contrib.delta_after),
                                 (g2_s, contrib.pok.g2_s_x)):
            return False
        prev_delta = contrib.delta_after
    fpk = final.keypair.pk
    # final delta_g1 consistent
    if fpk.delta_g1 != prev_delta:
        return False
    # delta_g1 / delta_g2 consistent
    if not POK.is_same_ratio(curve, (initial.pk.delta_g1, fpk.delta_g1),
                             (initial.pk.delta_g2, fpk.delta_g2)):
        return False
    # H/L queries rescaled by delta^{-1}: random-linear-combination
    # same-ratio check over the FULL vectors (detail::merge_pairs semantics)
    # with fresh unpredictable coefficients — a single sampled index would
    # let a malicious contributor corrupt the unchecked entries.
    rng = random.SystemRandom()
    for (orig_q, new_q) in ((initial.pk.H_query, fpk.H_query),
                            (initial.pk.L_query, fpk.L_query)):
        if len(orig_q) != len(new_q):
            return False
        if not orig_q:
            continue
        coeffs = [rng.randrange(1, curve.fr.p) for _ in orig_q]
        acc_new, acc_orig = None, None
        for r_i, q_new, q_orig in zip(coeffs, new_q, orig_q):
            acc_new = CV.g1_add(curve, acc_new,
                                CV.g1_mul(curve, q_new, r_i))
            acc_orig = CV.g1_add(curve, acc_orig,
                                 CV.g1_mul(curve, q_orig, r_i))
        if not POK.is_same_ratio(curve, (acc_new, acc_orig),
                                 (initial.pk.delta_g2, fpk.delta_g2)):
            return False
    return True
