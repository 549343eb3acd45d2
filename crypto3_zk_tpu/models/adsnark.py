"""ADSNARK: SNARKs over authenticated data (labels + MACed inputs).

`systems/ppzkadsnark/r1cs_ppzkadsnark/detail/basic_policy.hpp:84-1280`:
proofs about data that was authenticated (by label) by a trusted source,
without revealing it to the verifier. The reference parameterizes over
signature + PRF plugins and builds on the PGHR13-style kc proof; this
re-design keeps the exact authentication semantics on the Groth16
backbone, with the verification-key IC bases Gamma_j playing the role of
the reference's `pvk.Ain` A-query slice:

- authentication keys (`auth_generator` `basic_policy.hpp:519-533`):
  secret scalar i + PRF seed + signature keypair; public auth key
  carries minusI2 = [-i]G2 and the signature pk;
- auth_sign (`:539-558`): per label L with value v,
      lambda_L = PRF(seed, L);  Lambda_L = [lambda_L]G2;
      sigma_L  = Sign(L || Lambda_L);   mu_L = lambda_L + i*v;
- prover extras (`prover.hpp` muA): proof additionally carries
      acc_auth = sum_j v_j * Gamma_j   (the authenticated-input IC part)
      muA      = sum_j mu_j * Gamma_j;
- symmetric verification (`online_verifier` secret-key variant
  `basic_policy.hpp:967-1090`): check
      muA == i * acc_auth + sum_j lambda_j * Gamma_j      (host G1 math);
- public verification (`online_verifier` public variant
  `basic_policy.hpp:1105-1260`): batch-verify the (label, Lambda)
  signatures, then check the pairing equation
      prod_j e(Gamma_j, Lambda_j) == e(muA, G2) * e(acc_auth, -I2);
- either way acc_auth is then used as the authenticated inputs' IC
  contribution in the standard Groth16 equation.

PRF plugin: keyed blake2b; signature plugin: Schnorr over G1.
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


# --- authentication keys ----------------------------------------------------

@dataclasses.dataclass
class SecAuthKey:
    """`sec_auth_key` (basic_policy.hpp:436): the MAC scalar i, the PRF
    seed, the signing key. Held by the data authenticator and (optionally)
    a symmetric verifier."""
    i: int
    seed: bytes
    sig: SigKeypair


@dataclasses.dataclass
class PubAuthKey:
    """`pub_auth_key` (basic_policy.hpp:420): [-i]G2 + signature pk."""
    minus_i_g2: tuple
    sig_pk: tuple


@dataclasses.dataclass
class AuthData:
    """`auth_data` (basic_policy.hpp:453): scalar MAC + [lambda]G2 + sig."""
    label: bytes
    mu: int
    Lambda: tuple          # G2
    sig: tuple


def auth_generator(curve: CV.CurveSpec,
                   rng: random.Random | None = None):
    """`basic_policy.hpp:519-533 auth_generator`."""
    rng = rng if rng is not None else random.SystemRandom()
    sig = sig_keygen(curve, rng)
    i = rng.randrange(1, curve.fr.p)
    minus_i_g2 = CV.g2_mul(curve, curve.g2, curve.fr.p - i)
    sak = SecAuthKey(i=i, seed=rng.randbytes(32), sig=sig)
    pak = PubAuthKey(minus_i_g2=minus_i_g2, sig_pk=sig.pk)
    return sak, pak


def _ser_pt2(curve, pt) -> bytes:
    nb = (curve.fq.bits + 7) // 8
    if pt is None:
        return b"\x00" * (4 * nb)
    return b"".join(v.to_bytes(nb, "big") for v in (*pt[0], *pt[1]))


def auth_sign(curve: CV.CurveSpec, sak: SecAuthKey,
              labels: list[bytes], values: list[int],
              rng: random.Random | None = None) -> list[AuthData]:
    """`basic_policy.hpp:539-558 auth_sign`."""
    rng = rng if rng is not None else random.SystemRandom()
    p = curve.fr.p
    out = []
    for label, v in zip(labels, values):
        lam = prf(curve, sak.seed, label)
        Lambda = CV.g2_mul(curve, curve.g2, lam)
        sig = sig_sign(curve, sak.sig, label + b"|" + _ser_pt2(curve, Lambda),
                       rng)
        out.append(AuthData(label=label, mu=(lam + sak.i * v) % p,
                            Lambda=Lambda, sig=sig))
    return out


def auth_verify_symmetric(curve, sak: SecAuthKey, values: list[int],
                          authdata: list[AuthData]) -> bool:
    """`basic_policy.hpp:563-578` (standalone data check, secret key)."""
    p = curve.fr.p
    return all(ad.mu == (prf(curve, sak.seed, ad.label) + sak.i * v) % p
               for ad, v in zip(authdata, values))


def auth_verify_public(curve, pak: PubAuthKey, values: list[int],
                       authdata: list[AuthData]) -> bool:
    """`basic_policy.hpp:580-600` (standalone data check, public key):
    [mu]G2 == Lambda + v*[i]G2, plus the Lambda signature."""
    ok = True
    for ad, v in zip(authdata, values):
        mup = CV.g2_add(curve, ad.Lambda,
                        CV.g2_neg(curve, CV.g2_mul(curve, pak.minus_i_g2, v)))
        ok &= CV.g2_mul(curve, curve.g2, ad.mu) == mup
        ok &= sig_verify(curve, pak.sig_pk,
                         ad.label + b"|" + _ser_pt2(curve, ad.Lambda), ad.sig)
    return ok


# --- ADSNARK ----------------------------------------------------------------

@dataclasses.dataclass
class ADSNARKKeypair:
    groth16: G16.Keypair
    n_auth: int           # leading primary inputs that are authenticated


@dataclasses.dataclass
class ADSNARKProof:
    """Groth16 proof + the reference's authentication extras
    (`basic_policy.hpp:470-513` proof type: g_Aau -> acc_auth, muA)."""
    g16: G16.Proof
    acc_auth: tuple       # sum_j v_j * Gamma_j  (G1)
    muA: tuple            # sum_j mu_j * Gamma_j (G1)


def generate(curve: CV.CurveSpec, cs: R1CSConstraintSystem, n_auth: int,
             rng: random.Random | None = None) -> ADSNARKKeypair:
    """`basic_policy.hpp:602- generator` (Groth16 backbone)."""
    rng = rng if rng is not None else random.SystemRandom()
    kp = G16.generate(curve, cs, rng=rng)
    return ADSNARKKeypair(groth16=kp, n_auth=n_auth)


def prove(pub: ADSNARKKeypair, authdata: list[AuthData],
          primary: list[int], aux: list[int],
          rng: random.Random | None = None) -> ADSNARKProof:
    """primary = [authenticated values..., public rest...]. The prover
    holds the auth_data (mu MACs) and emits muA = sum mu_j * Gamma_j
    (the reference prover's muA, `basic_policy.hpp:~860`)."""
    curve = pub.groth16.vk.curve
    vk = pub.groth16.vk
    assert len(authdata) == pub.n_auth
    g16 = G16.prove(pub.groth16.pk, primary, aux, rng=rng)
    acc_auth = None
    muA = None
    for j, ad in enumerate(authdata):
        gamma_j = vk.gamma_ABC_g1[1 + j]
        acc_auth = CV.g1_add(curve, acc_auth,
                             CV.g1_mul(curve, gamma_j, primary[j]))
        muA = CV.g1_add(curve, muA, CV.g1_mul(curve, gamma_j, ad.mu))
    return ADSNARKProof(g16=g16, acc_auth=acc_auth, muA=muA)


def _groth16_check(pub: ADSNARKKeypair, acc_auth, public_rest: list[int],
                   proof: G16.Proof) -> bool:
    """Groth16 equation with the authenticated-input IC contribution
    supplied as a (now MAC-checked) group element."""
    curve = pub.groth16.vk.curve
    vk = pub.groth16.vk
    if not (CV.g1_well_formed(curve, proof.g_A)
            and CV.g2_well_formed(curve, proof.g_B)
            and CV.g1_well_formed(curve, proof.g_C)):
        return False
    acc = CV.g1_add(curve, vk.gamma_ABC_g1[0], acc_auth)
    for j, x in enumerate(public_rest):
        acc = CV.g1_add(
            curve, acc,
            CV.g1_mul(curve, vk.gamma_ABC_g1[1 + pub.n_auth + j], x))
    lhs = CV.multi_pairing(curve, [
        (proof.g_A, proof.g_B),
        (CV.g1_neg(curve, acc), vk.gamma_g2),
        (CV.g1_neg(curve, proof.g_C), vk.delta_g2),
    ])
    return lhs == vk.alpha_g1_beta_g2


def verify_symmetric(pub: ADSNARKKeypair, sak: SecAuthKey,
                     labels: list[bytes], public_rest: list[int],
                     proof: ADSNARKProof) -> bool:
    """Secret-key verifier (`basic_policy.hpp:967-1090`): recompute the
    lambdas from the seed and check muA == i*acc_auth + sum lambda_j*Gamma_j
    in G1 — no pairings beyond the SNARK check itself."""
    curve = pub.groth16.vk.curve
    vk = pub.groth16.vk
    assert len(labels) == pub.n_auth
    if not (CV.g1_well_formed(curve, proof.acc_auth)
            and CV.g1_well_formed(curve, proof.muA)):
        return False
    prodA = CV.g1_mul(curve, proof.acc_auth, sak.i)
    for j, label in enumerate(labels):
        lam = prf(curve, sak.seed, label)
        prodA = CV.g1_add(curve, prodA,
                          CV.g1_mul(curve, vk.gamma_ABC_g1[1 + j], lam))
    if prodA != proof.muA:
        return False
    return _groth16_check(pub, proof.acc_auth, public_rest, proof.g16)


def verify_public(pub: ADSNARKKeypair, pak: PubAuthKey,
                  authdata: list[AuthData], public_rest: list[int],
                  proof: ADSNARKProof) -> bool:
    """Public verifier (`basic_policy.hpp:1105-1260`): signature checks on
    every (label, Lambda), then the MAC pairing equation
        prod_j e(Gamma_j, Lambda_j) == e(muA, G2) * e(acc_auth, -I2),
    then the Groth16 equation on the authenticated accumulator."""
    curve = pub.groth16.vk.curve
    vk = pub.groth16.vk
    assert len(authdata) == pub.n_auth
    if not (CV.g1_well_formed(curve, proof.acc_auth)
            and CV.g1_well_formed(curve, proof.muA)):
        return False
    for ad in authdata:
        if not sig_verify(curve, pak.sig_pk,
                          ad.label + b"|" + _ser_pt2(curve, ad.Lambda),
                          ad.sig):
            return False
        if not CV.g2_well_formed(curve, ad.Lambda):
            return False
    # prod_j e(Gamma_j, Lambda_j) * e(-muA, G2) * e(-acc_auth, -I2)... == 1
    # rearranged as one multi-pairing against GT identity:
    pairs = [(vk.gamma_ABC_g1[1 + j], ad.Lambda)
             for j, ad in enumerate(authdata)]
    pairs.append((CV.g1_neg(curve, proof.muA), curve.g2))
    pairs.append((proof.acc_auth, CV.g2_neg(curve, pak.minus_i_g2)))
    from ..fields import tower as T
    if CV.multi_pairing(curve, pairs) != CV.gt_one(curve):
        return False
    return _groth16_check(pub, proof.acc_auth, public_rest, proof.g16)
