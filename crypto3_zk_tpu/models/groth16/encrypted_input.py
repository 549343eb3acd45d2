"""Groth16 with verifiably-encrypted inputs (SAVER-style).

`systems/ppzksnark/r1cs_gg_ppzksnark/encrypted_input/` (313 LoC adapter; the
reference's encryption pubkey lives in the external crypto3-pubkey ElGamal
scheme, so the full construction is materialized here):

- the first k primary inputs are published only as an ElGamal-style
  ciphertext (c_0, c_1..c_k, c_sum) over G1;
- prover: standard Groth16 proof with g_C shifted by r * gamma_inverse_sum_s
  (`encrypted_input/prover.hpp:62-75`);
- verifier (`encrypted_input/verifier.hpp`): ciphertext well-formedness
  sum_i e(c_i, t_i G2) == e(c_sum, G2), then the Groth16 equation with the
  ciphertext elements folded into the input accumulator;
- decryption: sk_i * c_0 subtracted from c_i leaves m_i * Gamma_i (small
  message discrete log).
"""
from __future__ import annotations

import dataclasses
import random

from ...arithmetization.r1cs import R1CSConstraintSystem
from ...fields import curves as CV
from ...fields import tower as T
from . import Keypair, Proof, generate, prove as basic_prove


@dataclasses.dataclass
class EncryptionPublicKey:
    curve: CV.CurveSpec
    n_encrypted: int
    P0: tuple                 # rho * G1 (randomness base)
    S: list                   # s_i * G1, i = 1..k
    t_g2: list                # t_i * G2, i = 0..k
    T_r: tuple                # t_0*P0 + sum t_i*S_i  (for c_sum)
    T_m: list                 # t_i * Gamma_i         (for c_sum)
    gamma_inverse_sum_s_g1: tuple   # -(gamma/delta)(P0 + sum S_i)


@dataclasses.dataclass
class EncryptionSecretKey:
    sk: list                  # s_i / rho mod r, i = 1..k


@dataclasses.dataclass
class Ciphertext:
    elements: list            # [c_0, c_1..c_k, c_sum]


def generate_encrypted(curve: CV.CurveSpec, cs: R1CSConstraintSystem,
                       n_encrypted: int,
                       rng: random.Random | None = None):
    """Coupled Groth16 + encryption keygen (the encryption key needs
    gamma/delta, as in SAVER)."""
    rng = rng if rng is not None else random.SystemRandom()
    p = curve.fr.p
    toxic = {k: rng.randrange(1, p)
             for k in ("t", "alpha", "beta", "gamma", "delta")}
    kp = generate(curve, cs, rng=rng, toxic=toxic)
    assert cs.num_inputs >= n_encrypted

    rho = rng.randrange(1, p)
    s = [rng.randrange(1, p) for _ in range(n_encrypted)]
    t = [rng.randrange(1, p) for _ in range(n_encrypted + 1)]
    gammas = kp.vk.gamma_ABC_g1[1:n_encrypted + 1]

    P0 = CV.g1_mul(curve, curve.g1, rho)
    S = [CV.g1_mul(curve, curve.g1, si) for si in s]
    t_g2 = [CV.g2_mul(curve, curve.g2, ti) for ti in t]
    T_r = CV.g1_mul(curve, P0, t[0])
    for i in range(n_encrypted):
        T_r = CV.g1_add(curve, T_r, CV.g1_mul(curve, S[i], t[i + 1]))
    T_m = [CV.g1_mul(curve, gammas[i], t[i + 1]) for i in range(n_encrypted)]

    gd = toxic["gamma"] * pow(toxic["delta"], -1, p) % p
    base = P0
    for si in S:
        base = CV.g1_add(curve, base, si)
    gis = CV.g1_neg(curve, CV.g1_mul(curve, base, gd))

    pk_enc = EncryptionPublicKey(curve, n_encrypted, P0, S, t_g2, T_r, T_m,
                                 gis)
    sk_enc = EncryptionSecretKey([si * pow(rho, -1, p) % p for si in s])
    return kp, pk_enc, sk_enc


def encrypt(pk: EncryptionPublicKey, messages: list[int], r: int) -> Ciphertext:
    curve = pk.curve
    assert len(messages) == pk.n_encrypted
    # need Gamma_i implicitly via T_m for the sum; c_i uses Gamma_i from vk —
    # the caller encrypts through prove_encrypted which has the vk. To keep
    # this function self-contained, Gamma-multiples are added by the caller.
    raise NotImplementedError("use encrypt_with_vk")


def encrypt_with_vk(pk: EncryptionPublicKey, vk, messages: list[int],
                    r: int) -> Ciphertext:
    curve = pk.curve
    k = pk.n_encrypted
    assert len(messages) == k
    gammas = vk.gamma_ABC_g1[1:k + 1]
    c0 = CV.g1_mul(curve, pk.P0, r)
    cs = []
    for i in range(k):
        ci = CV.g1_add(curve, CV.g1_mul(curve, gammas[i], messages[i]),
                       CV.g1_mul(curve, pk.S[i], r))
        cs.append(ci)
    csum = CV.g1_mul(curve, pk.T_r, r)
    for i in range(k):
        csum = CV.g1_add(curve, csum,
                         CV.g1_mul(curve, pk.T_m[i], messages[i]))
    return Ciphertext([c0] + cs + [csum])


def prove_encrypted(pk_groth, pk_enc: EncryptionPublicKey,
                    primary: list[int], aux: list[int], r: int,
                    rng: random.Random | None = None) -> Proof:
    """`encrypted_input/prover.hpp:62-75`: basic proof with shifted g_C."""
    curve = pk_groth.curve
    proof = basic_prove(pk_groth, primary, aux, rng=rng)
    g_C = CV.g1_add(curve, proof.g_C,
                    CV.g1_mul(curve, pk_enc.gamma_inverse_sum_s_g1, r))
    return Proof(g_A=proof.g_A, g_B=proof.g_B, g_C=g_C)


def verify_encrypted(vk, pk_enc: EncryptionPublicKey, ct: Ciphertext,
                     unencrypted_primary: list[int], proof: Proof) -> bool:
    """`encrypted_input/verifier.hpp`: ciphertext check + shifted Groth16."""
    curve = vk.curve
    k = pk_enc.n_encrypted
    els = ct.elements
    assert len(els) == k + 2
    # 1. sum_i e(c_i, t_i G2) == e(c_sum, G2)
    pairs = [(els[i], pk_enc.t_g2[i]) for i in range(k + 1)]
    pairs.append((CV.g1_neg(curve, els[k + 1]), curve.g2))
    if CV.multi_pairing(curve, pairs) != T.FQ12_ONE:
        return False
    # 2. Groth16 with ciphertext folded into the accumulator
    acc = vk.gamma_ABC_g1[0]
    for i in range(k + 1):
        acc = CV.g1_add(curve, acc, els[i])
    for j, x in enumerate(unencrypted_primary):
        acc = CV.g1_add(curve, acc,
                        CV.g1_mul(curve, vk.gamma_ABC_g1[k + 1 + j], x))
    lhs = CV.multi_pairing(curve, [
        (proof.g_A, proof.g_B),
        (CV.g1_neg(curve, acc), vk.gamma_g2),
        (CV.g1_neg(curve, proof.g_C), vk.delta_g2),
    ])
    return lhs == vk.alpha_g1_beta_g2


def decrypt(sk: EncryptionSecretKey, pk: EncryptionPublicKey, vk,
            ct: Ciphertext, max_message: int = 1 << 16) -> list[int]:
    """Small-message discrete-log decryption."""
    curve = pk.curve
    k = pk.n_encrypted
    gammas = vk.gamma_ABC_g1[1:k + 1]
    out = []
    for i in range(k):
        mG = CV.g1_add(curve, ct.elements[1 + i],
                       CV.g1_neg(curve, CV.g1_mul(curve, ct.elements[0],
                                                  sk.sk[i])))
        m = 0
        acc = None
        while m <= max_message:
            if acc == mG:
                break
            acc = CV.g1_add(curve, acc, gammas[i])
            m += 1
        else:
            raise ValueError("message too large to decrypt")
        out.append(m)
    return out
