"""ADSNARK: SNARKs over authenticated data (labels + MACed inputs).

`systems/ppzkadsnark/r1cs_ppzkadsnark/detail/basic_policy.hpp:84-1280`:
proofs about data that was authenticated (by label) by a trusted source,
without revealing it to the verifier. The reference parameterizes over
signature + PRF plugins; here:

- PRF: blake2b keyed by the authentication seed (label -> mask r_L);
- signature: Schnorr over the proof curve's G1 (the "sig plugin");
- authenticated value for label L: Pedersen-style binding
      D_L = v * Gamma_L + r_L * K        (Gamma_L = the input's IC base)
  plus a signature over (label, D_L);
- prove: Groth16 with the authenticated inputs as leading primary inputs
  (their IC contribution is exactly sum_L v*Gamma_L, which the verifier
  reconstructs from D_L by stripping the r_L masks);
- symmetric verification (`basic_policy` verifier with secret auth key):
  recompute r_L from the seed, check signatures, subtract masks, run the
  Groth16 equation. Public (signature-only) verification needs the
  label-pairing machinery of the reference's external sig scheme and is
  tracked as a roadmap item.
"""
from __future__ import annotations

import dataclasses
import hashlib
import random

from ..arithmetization.r1cs import R1CSConstraintSystem
from ..fields import curves as CV
from . import groth16 as G16


# --- Schnorr signature plugin over G1 --------------------------------------

@dataclasses.dataclass
class SigKeypair:
    sk: int
    pk: tuple


def sig_keygen(curve, rng: random.Random) -> SigKeypair:
    sk = rng.randrange(1, curve.fr.p)
    return SigKeypair(sk, CV.g1_mul(curve, curve.g1, sk))


def _sig_hash(curve, R, pk, msg: bytes) -> int:
    nb = (curve.fq.bits + 7) // 8
    ser = lambda pt: (b"\x00" * 2 * nb if pt is None else
                      pt[0].to_bytes(nb, "big") + pt[1].to_bytes(nb, "big"))
    return int.from_bytes(hashlib.sha256(ser(R) + ser(pk) + msg).digest(),
                          "big") % curve.fr.p


def sig_sign(curve, kp: SigKeypair, msg: bytes, rng: random.Random):
    k = rng.randrange(1, curve.fr.p)
    R = CV.g1_mul(curve, curve.g1, k)
    e = _sig_hash(curve, R, kp.pk, msg)
    s = (k + kp.sk * e) % curve.fr.p
    return (R, s)


def sig_verify(curve, pk, msg: bytes, sig) -> bool:
    R, s = sig
    e = _sig_hash(curve, R, pk, msg)
    lhs = CV.g1_mul(curve, curve.g1, s)
    rhs = CV.g1_add(curve, R, CV.g1_mul(curve, pk, e))
    return lhs == rhs


# --- PRF plugin ------------------------------------------------------------

def prf(curve, seed: bytes, label: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(label, key=seed).digest(),
                          "big") % curve.fr.p


# --- ADSNARK ----------------------------------------------------------------

@dataclasses.dataclass
class AuthKeys:
    seed: bytes           # secret PRF seed (symmetric verification key)
    sig: SigKeypair
    K: tuple              # mask base


@dataclasses.dataclass
class AuthenticatedValue:
    label: bytes
    D: tuple              # v*Gamma_L + r_L*K
    sig: tuple


@dataclasses.dataclass
class ADSNARKKeypair:
    groth16: G16.Keypair
    n_auth: int           # leading primary inputs that are authenticated
    auth_pk: tuple        # signature public key
    K: tuple


def generate(curve: CV.CurveSpec, cs: R1CSConstraintSystem, n_auth: int,
             rng: random.Random | None = None):
    rng = rng if rng is not None else random.SystemRandom()
    kp = G16.generate(curve, cs, rng=rng)
    sig = sig_keygen(curve, rng)
    K = CV.g1_mul(curve, curve.g1, rng.randrange(1, curve.fr.p))
    auth = AuthKeys(seed=rng.randbytes(32), sig=sig, K=K)
    pub = ADSNARKKeypair(groth16=kp, n_auth=n_auth, auth_pk=sig.pk, K=K)
    return pub, auth


def auth_sign(pub: ADSNARKKeypair, auth: AuthKeys,
              labels: list[bytes], values: list[int],
              rng: random.Random | None = None) -> list[AuthenticatedValue]:
    """The data authenticator MACs values under labels
    (`basic_policy` auth_eval)."""
    rng = rng if rng is not None else random.SystemRandom()
    curve = pub.groth16.vk.curve
    out = []
    for i, (label, v) in enumerate(zip(labels, values)):
        gamma_i = pub.groth16.vk.gamma_ABC_g1[1 + i]
        r = prf(curve, auth.seed, label)
        D = CV.g1_add(curve, CV.g1_mul(curve, gamma_i, v),
                      CV.g1_mul(curve, auth.K, r))
        sig = sig_sign(curve, auth.sig, label + b"|" + _ser_pt(curve, D), rng)
        out.append(AuthenticatedValue(label=label, D=D, sig=sig))
    return out


def _ser_pt(curve, pt):
    nb = (curve.fq.bits + 7) // 8
    if pt is None:
        return b"\x00" * (2 * nb)
    return pt[0].to_bytes(nb, "big") + pt[1].to_bytes(nb, "big")


def prove(pub: ADSNARKKeypair, primary: list[int], aux: list[int],
          rng: random.Random | None = None) -> G16.Proof:
    """primary = [authenticated values..., public rest...]."""
    return G16.prove(pub.groth16.pk, primary, aux, rng=rng)


def verify_symmetric(pub: ADSNARKKeypair, auth: AuthKeys,
                     authdata: list[AuthenticatedValue],
                     public_rest: list[int], proof: G16.Proof) -> bool:
    """Verifier holding the secret authentication key
    (`basic_policy` symmetric verification)."""
    curve = pub.groth16.vk.curve
    vk = pub.groth16.vk
    assert len(authdata) == pub.n_auth
    # 1. signatures
    for av in authdata:
        if not sig_verify(curve, pub.auth_pk,
                          av.label + b"|" + _ser_pt(curve, av.D), av.sig):
            return False
    # 2. strip masks: acc contribution of authenticated inputs
    acc = vk.gamma_ABC_g1[0]
    for av in authdata:
        r = prf(curve, auth.seed, av.label)
        stripped = CV.g1_add(curve, av.D,
                             CV.g1_neg(curve, CV.g1_mul(curve, auth.K, r)))
        acc = CV.g1_add(curve, acc, stripped)
    for j, x in enumerate(public_rest):
        acc = CV.g1_add(
            curve, acc,
            CV.g1_mul(curve, vk.gamma_ABC_g1[1 + pub.n_auth + j], x))
    # 3. Groth16 equation with the assembled accumulator
    from ..fields import tower as T
    lhs = CV.multi_pairing(curve, [
        (proof.g_A, proof.g_B),
        (CV.g1_neg(curve, acc), vk.gamma_g2),
        (CV.g1_neg(curve, proof.g_C), vk.delta_g2),
    ])
    return lhs == vk.alpha_g1_beta_g2
