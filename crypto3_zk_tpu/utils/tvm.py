"""TVM-compatible byte marshalling of Groth16 verifier inputs — the
`verifier_input_serializer/deserializer_tvm` format of
`r1cs_gg_ppzksnark/marshalling.hpp:98-1258`:

- proof: g_A (48 B compressed G1) || g_B (96 B compressed G2) || g_C;
- primary input: count (4 B big-endian) || count x Fr (32 B little-endian);
- verification key: alpha_g1_beta_g2 GT (576 B, 12 x Fq LE) || gamma_g2 ||
  delta_g2 || accumulation vector (first G1, then sparse vector: count,
  count x index (4 B BE), count x G1, domain size);
- verifier_input blob: proof || primary input || verification key.

Point/field byte formats come from `utils/bincode.py` (pinned by the
bellperson vectors); sizes are 4-byte big-endian
(`marshalling.hpp:975-985`). Deserialization rejects off-curve /
wrong-subgroup points (ValueError).
"""
from __future__ import annotations

from . import bincode as BC


def proof_to_bytes(curve, proof) -> bytes:
    return (BC.g1_to_bytes(curve, proof.g_A)
            + BC.g2_to_bytes(curve, proof.g_B)
            + BC.g1_to_bytes(curve, proof.g_C))


def proof_from_bytes(curve, b: bytes):
    from ..models.groth16 import Proof

    nb = (curve.fq.bits + 7) // 8
    if len(b) < 4 * nb:
        raise ValueError("proof blob too short")
    g_A = BC.g1_from_bytes(curve, b[:nb])
    g_B = BC.g2_from_bytes(curve, b[nb:3 * nb])
    g_C = BC.g1_from_bytes(curve, b[3 * nb:4 * nb])
    return Proof(g_A, g_B, g_C), b[4 * nb:]


def primary_input_to_bytes(curve, primary: list[int]) -> bytes:
    out = [BC.size_to_bytes(len(primary))]
    out.extend(BC.fr_to_bytes(curve, v) for v in primary)
    return b"".join(out)


def primary_input_from_bytes(curve, b: bytes):
    n = BC.size_from_bytes(b[:4])
    nb = (curve.fr.bits + 7) // 8
    if len(b) < 4 + n * nb:
        raise ValueError("primary input blob too short")
    vals = [BC.fr_from_bytes(curve, b[4 + i * nb:4 + (i + 1) * nb])
            for i in range(n)]
    return vals, b[4 + n * nb:]


def verification_key_to_bytes(curve, vk) -> bytes:
    """vk fields per `verification_key.hpp`: alpha_g1_beta_g2 (GT),
    gamma_g2, delta_g2, gamma_ABC_g1 (dense list -> accumulation vector
    with indices 0..n-1, `marshalling.hpp:1013-1023`)."""
    out = [BC.fq12_to_bytes(curve, vk.alpha_g1_beta_g2),
           BC.g2_to_bytes(curve, vk.gamma_g2),
           BC.g2_to_bytes(curve, vk.delta_g2)]
    gamma_abc = vk.gamma_ABC_g1
    first, rest = gamma_abc[0], gamma_abc[1:]
    out.append(BC.g1_to_bytes(curve, first))
    out.append(BC.size_to_bytes(len(rest)))
    out.extend(BC.size_to_bytes(i) for i in range(len(rest)))
    out.extend(BC.g1_to_bytes(curve, pt) for pt in rest)
    out.append(BC.size_to_bytes(len(rest)))      # domain_size
    return b"".join(out)


def verification_key_from_bytes(curve, b: bytes):
    from ..models.groth16 import VerificationKey

    nb = (curve.fq.bits + 7) // 8
    gt_nb = 12 * nb
    off = 0
    alpha_beta = BC.fq12_from_bytes(curve, b[off:off + gt_nb])
    off += gt_nb
    gamma_g2 = BC.g2_from_bytes(curve, b[off:off + 2 * nb])
    off += 2 * nb
    delta_g2 = BC.g2_from_bytes(curve, b[off:off + 2 * nb])
    off += 2 * nb
    first = BC.g1_from_bytes(curve, b[off:off + nb])
    off += nb
    count = BC.size_from_bytes(b[off:off + 4])
    off += 4
    indices = [BC.size_from_bytes(b[off + 4 * i:off + 4 * (i + 1)])
               for i in range(count)]
    off += 4 * count
    values = [BC.g1_from_bytes(curve, b[off + nb * i:off + nb * (i + 1)])
              for i in range(count)]
    off += nb * count
    domain = BC.size_from_bytes(b[off:off + 4])
    off += 4
    if sorted(indices) != list(range(count)) or domain < count:
        raise ValueError("non-dense gamma_ABC accumulation vector")
    dense = [None] * count
    for i, v in zip(indices, values):
        dense[i] = v
    vk = VerificationKey(curve, alpha_beta, gamma_g2, delta_g2,
                         [first] + dense)
    return vk, b[off:]


def verifier_input_to_bytes(curve, vk, primary: list[int], proof) -> bytes:
    """proof || primary input || vk (`marshalling.hpp:841-898` order)."""
    return (proof_to_bytes(curve, proof)
            + primary_input_to_bytes(curve, primary)
            + verification_key_to_bytes(curve, vk))


def verifier_input_from_bytes(curve, b: bytes):
    proof, b = proof_from_bytes(curve, b)
    primary, b = primary_input_from_bytes(curve, b)
    vk, b = verification_key_from_bytes(curve, b)
    return vk, primary, proof
