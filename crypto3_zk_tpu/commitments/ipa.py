"""Inner-product-argument polynomial commitment over Pasta curves
(kimchi/Mina style).

`commitments/polynomial/kimchi_pedersen.hpp:51-760`: Pedersen vector
commitments with blinding over the pallas curve (no pairings — opening is a
log-round inner-product argument):

- setup (`:329`): bases g[0..n), blinding base h;
- commit: C = sum f_i g_i + r h (chunked for degree > n);
- proof_eval (`:385`): bulletproofs-style halving rounds with L/R
  commitments and sponge challenges, final scalar a and blinding folding;
- verify_eval (`:645`): recompute challenges, check the folded relation
  a * (G_final + v * U) + r h == folded commitment via one MSM.

The pallas curve (y^2 = x^3 + 5 over pallas_fq, scalar field pallas_fr,
generator (-1, 2)) is registered here as a plain (non-pairing) curve using
the same host group ops as the pairing curves.
"""
from __future__ import annotations

import dataclasses
import random

from ..fields import params as FP
from ..fields import curves as CV
from ..transcript.poseidon_transcript import PoseidonTranscript


@dataclasses.dataclass(frozen=True)
class PlainCurve:
    """Duck-types CurveSpec for the g1_* host ops."""
    name: str
    fq: FP.FieldSpec
    fr: FP.FieldSpec
    b: int
    g1: tuple


PALLAS = PlainCurve("pallas", FP.PALLAS_FQ, FP.PALLAS_FR, 5,
                    (FP.PALLAS_FQ.p - 1, 2))
VESTA = PlainCurve("vesta", FP.PALLAS_FR, FP.PALLAS_FQ, 5,
                   (FP.PALLAS_FR.p - 1, 2))


@dataclasses.dataclass
class IPAParams:
    curve: PlainCurve
    g: list           # n bases
    h: tuple          # blinding base
    u: tuple          # aux base for the evaluation term


@dataclasses.dataclass
class IPACommitment:
    c: tuple          # commitment point
    r: int            # blinding (prover side only)


@dataclasses.dataclass
class IPAProof:
    lr: list          # [(L_i, R_i)]
    a: int            # final folded scalar
    blind: int        # folded blinding
    c_tilde: tuple    # re-blinded commitment base (schnorr-less variant)


def setup(curve: PlainCurve, n: int,
          rng: random.Random | None = None) -> IPAParams:
    rng = rng if rng is not None else random.SystemRandom()
    p = curve.fr.p
    g = [CV.g1_mul(curve, curve.g1, rng.randrange(1, p)) for _ in range(n)]
    h = CV.g1_mul(curve, curve.g1, rng.randrange(1, p))
    u = CV.g1_mul(curve, curve.g1, rng.randrange(1, p))
    return IPAParams(curve, g, h, u)


def commit(params: IPAParams, coeffs: list[int],
           rng: random.Random | None = None) -> IPACommitment:
    rng = rng if rng is not None else random.SystemRandom()
    curve = params.curve
    p = curve.fr.p
    assert len(coeffs) <= len(params.g)
    r = rng.randrange(p)
    c = CV.g1_mul(curve, params.h, r)
    for fi, gi in zip(coeffs, params.g):
        c = CV.g1_add(curve, c, CV.g1_mul(curve, gi, fi))
    return IPACommitment(c=c, r=r)


def _sponge_point(t: PoseidonTranscript, fs, pt):
    if pt is None:
        t.absorb_field(fs, 0)
        t.absorb_field(fs, 0)
    else:
        t.absorb_field(fs, pt[0] % fs.p)
        t.absorb_field(fs, pt[1] % fs.p)


def proof_eval(params: IPAParams, comm: IPACommitment, coeffs: list[int],
               z: int, rng: random.Random | None = None) -> tuple[IPAProof, int]:
    """Open f at z. Returns (proof, evaluation)."""
    rng = rng if rng is not None else random.SystemRandom()
    curve = params.curve
    p = curve.fr.p
    n = len(params.g)
    nbit = (n - 1).bit_length()
    assert n == 1 << nbit

    a_vec = list(coeffs) + [0] * (n - len(coeffs))
    b_vec = [pow(z, i, p) for i in range(n)]
    g_vec = list(params.g)
    v = sum(ai * bi for ai, bi in zip(a_vec, b_vec)) % p

    sponge = PoseidonTranscript(curve.fq)
    _sponge_point(sponge, curve.fq, comm.c)
    sponge.absorb_field(curve.fq, z % curve.fq.p)
    sponge.absorb_field(curve.fq, v % curve.fq.p)

    blind = comm.r
    lr = []
    while len(a_vec) > 1:
        half = len(a_vec) // 2
        a_lo, a_hi = a_vec[:half], a_vec[half:]
        b_lo, b_hi = b_vec[:half], b_vec[half:]
        g_lo, g_hi = g_vec[:half], g_vec[half:]
        rl = rng.randrange(p)
        rr = rng.randrange(p)
        # L = <a_hi, g_lo> + rl*h + <a_hi, b_lo>*u
        L = CV.g1_mul(curve, params.h, rl)
        for ai, gi in zip(a_hi, g_lo):
            L = CV.g1_add(curve, L, CV.g1_mul(curve, gi, ai))
        L = CV.g1_add(curve, L, CV.g1_mul(
            curve, params.u, sum(x * y for x, y in zip(a_hi, b_lo)) % p))
        R = CV.g1_mul(curve, params.h, rr)
        for ai, gi in zip(a_lo, g_hi):
            R = CV.g1_add(curve, R, CV.g1_mul(curve, gi, ai))
        R = CV.g1_add(curve, R, CV.g1_mul(
            curve, params.u, sum(x * y for x, y in zip(a_lo, b_hi)) % p))
        _sponge_point(sponge, curve.fq, L)
        _sponge_point(sponge, curve.fq, R)
        ch = sponge.challenge(curve.fr) or 1
        ch_inv = pow(ch, -1, p)
        a_vec = [(lo + ch * hi) % p for lo, hi in zip(a_lo, a_hi)]
        b_vec = [(lo + ch_inv * hi) % p for lo, hi in zip(b_lo, b_hi)]
        g_vec = [CV.g1_add(curve, glo, CV.g1_mul(curve, ghi, ch_inv))
                 for glo, ghi in zip(g_lo, g_hi)]
        blind = (blind + rl * ch + rr * ch_inv) % p
        lr.append((L, R))

    return IPAProof(lr=lr, a=a_vec[0], blind=blind, c_tilde=g_vec[0]), v


def verify_eval(params: IPAParams, commitment: tuple, z: int, v: int,
                proof: IPAProof) -> bool:
    curve = params.curve
    p = curve.fr.p
    n = len(params.g)

    sponge = PoseidonTranscript(curve.fq)
    _sponge_point(sponge, curve.fq, commitment)
    sponge.absorb_field(curve.fq, z % curve.fq.p)
    sponge.absorb_field(curve.fq, v % curve.fq.p)

    challenges = []
    for (L, R) in proof.lr:
        _sponge_point(sponge, curve.fq, L)
        _sponge_point(sponge, curve.fq, R)
        challenges.append(sponge.challenge(curve.fr) or 1)

    # folded commitment: C' = C + v*u + sum ch_i L_i + ch_i^-1 R_i
    cprime = CV.g1_add(curve, commitment, CV.g1_mul(curve, params.u, v))
    for ch, (L, R) in zip(challenges, proof.lr):
        cprime = CV.g1_add(curve, cprime, CV.g1_mul(curve, L, ch))
        cprime = CV.g1_add(curve, cprime,
                           CV.g1_mul(curve, R, pow(ch, -1, p)))

    # folded base G_final = sum s_i g_i with s from challenge products,
    # folded b_final = b(z) under the same folding
    s = [1] * n
    nbit = n.bit_length() - 1
    for i in range(n):
        acc = 1
        for j, ch in enumerate(challenges):
            # challenge j folds halves of size n/2^{j+1}: bit (nbit-1-j)
            if (i >> (nbit - 1 - j)) & 1:
                acc = acc * pow(ch, -1, p) % p
        s[i] = acc
    g_final = None
    for gi, si in zip(params.g, s):
        g_final = CV.g1_add(curve, g_final, CV.g1_mul(curve, gi, si))
    b_final = 0
    for i in range(n):
        coeff = 1
        for j, ch in enumerate(challenges):
            if (i >> (nbit - 1 - j)) & 1:
                coeff = coeff * pow(challenges[j], -1, p) % p
        b_final = (b_final + pow(z, i, p) * coeff) % p

    # expected: C' == a*(G_final) + (a*b_final)*u + blind*h
    rhs = CV.g1_mul(curve, g_final, proof.a)
    rhs = CV.g1_add(curve, rhs,
                    CV.g1_mul(curve, params.u, proof.a * b_final % p))
    rhs = CV.g1_add(curve, rhs, CV.g1_mul(curve, params.h, proof.blind))
    return cprime == rhs
