"""Mina-exported kimchi fixture loader.

Parses the JSON fixtures the reference tests consume
(`test/systems/plonk/pickles/data/kimchi{,_const}.json`, wired via the
TEST_DATA define in `test/CMakeLists.txt:131-132`) into this framework's
pickles structures: the blockchain verification key's commitment set and
domain (`verifier_index.hpp:60-103`) and the protocol-state proof
(`proof.hpp:41-188` — messages, chunked evaluations, ft_eval1, IPA opening).

Scope note (kept honest): the reference itself never verifies these real
fixtures end-to-end — its fixture test's verify call is commented out
(`test/.../kimchi.cpp:294`) and its hardcoded-constants test runs with
default-constructed coefficient commitments (`pickles.cpp:62-1937`), so no
working real-proof oracle exists to conform against. What IS checked here:
structural + group-level validity of every fixture point (Pallas has
cofactor 1), the verifier-index shape contract, and — via
`load_sponge_params` — the full to_batch/batch_verify flow running under
Mina's real Poseidon constants (`MinaSponge`) on synthetic instances.
"""
from __future__ import annotations

import dataclasses
import json

from ..fields import curves as CV

COLUMNS = 15
PERMUTES = 7


def _fq(h: str) -> int:
    return int(h, 16)


def _point(xy):
    """[x_hex, y_hex] -> affine tuple; Mina encodes infinity as (0, 1)?
    (never present in these fixtures' commitments)."""
    return (_fq(xy[0]), _fq(xy[1]))


def _poly_comm(chunks):
    from ..commitments.kimchi_pedersen import PolyComm
    return PolyComm([_point(c) for c in chunks])


@dataclasses.dataclass
class MinaVerificationKey:
    domain_log2: int
    domain_gen: int
    max_poly_size: int
    shifts: list
    sigma_comm: list           # PERMUTES PolyComm
    coefficients_comm: list    # COLUMNS PolyComm
    generic_comm: object
    psm_comm: object
    complete_add_comm: object
    mul_comm: object
    emul_comm: object
    endomul_scalar_comm: object


@dataclasses.dataclass
class MinaProof:
    w_comm: list               # COLUMNS PolyComm
    z_comm: object
    t_comm: object
    evals: list                # 2 x dict(w, z, s, generic/poseidon sel)
    ft_eval1: int
    lr: list                   # [(L point, R point)]
    z1: int
    z2: int
    delta: tuple
    sg: tuple


def load_fixture(path: str):
    with open(path) as f:
        data = json.load(f)["data"]
    vk_j = data["blockchainVerificationKey"]
    c = vk_j["commitments"]
    idx = vk_j["index"]
    vk = MinaVerificationKey(
        domain_log2=idx["domain"]["log_size_of_group"],
        domain_gen=_fq(idx["domain"]["group_gen"]),
        max_poly_size=int(idx["max_poly_size"]),
        shifts=[_fq(s) for s in idx["shifts"]],
        sigma_comm=[_poly_comm([p]) for p in c["sigma_comm"]],
        coefficients_comm=[_poly_comm([p]) for p in c["coefficients_comm"]],
        generic_comm=_poly_comm([c["generic_comm"]]),
        psm_comm=_poly_comm([c["psm_comm"]]),
        complete_add_comm=_poly_comm([c["complete_add_comm"]]),
        mul_comm=_poly_comm([c["mul_comm"]]),
        emul_comm=_poly_comm([c["emul_comm"]]),
        endomul_scalar_comm=_poly_comm([c["endomul_scalar_comm"]]),
    )
    prf_j = data["bestChain"][0]["protocolStateProof"]["json"]["proof"]
    msg = prf_j["messages"]
    op = prf_j["openings"]
    evals = []
    for ev in op["evals"]:
        evals.append({
            "w": [[_fq(x) for x in col] for col in ev["w"]],
            "z": [_fq(x) for x in ev["z"]],
            "s": [[_fq(x) for x in col] for col in ev["s"]],
            "generic_selector": [_fq(x) for x in ev["generic_selector"]],
            "poseidon_selector": [_fq(x) for x in ev["poseidon_selector"]],
        })
    proof = MinaProof(
        w_comm=[_poly_comm(ch) for ch in msg["w_comm"]],
        z_comm=_poly_comm(msg["z_comm"]),
        t_comm=_poly_comm(msg["t_comm"]),
        evals=evals,
        ft_eval1=_fq(op["ft_eval1"]),
        lr=[(_point(l), _point(r)) for l, r in op["proof"]["lr"]],
        z1=_fq(op["proof"]["z_1"]),
        z2=_fq(op["proof"]["z_2"]),
        delta=_point(op["proof"]["delta"]),
        sg=_point(op["proof"]["sg"]),
    )
    return vk, proof


def validate_on_pallas(vk: MinaVerificationKey, proof: MinaProof) -> bool:
    """Group-level validity of every deserialized point (Pallas has
    cofactor 1, so on-curve == in-subgroup) and the verifier-index shape
    contract (`verifier_index.hpp:60-103`)."""
    from ..commitments.ipa import PALLAS

    def ok(pt):
        x, y = pt
        p = PALLAS.fq.p
        return (y * y - (x * x * x + PALLAS.b)) % p == 0

    pts = []
    for pc in (vk.sigma_comm + vk.coefficients_comm
               + [vk.generic_comm, vk.psm_comm, vk.complete_add_comm,
                  vk.mul_comm, vk.emul_comm, vk.endomul_scalar_comm]
               + proof.w_comm + [proof.z_comm, proof.t_comm]):
        pts.extend(pc.unshifted)
    for l, r in proof.lr:
        pts.extend((l, r))
    pts.extend((proof.delta, proof.sg))
    if not all(ok(pt) for pt in pts):
        return False
    if len(vk.sigma_comm) != PERMUTES or len(vk.coefficients_comm) != COLUMNS:
        return False
    if len(proof.w_comm) != COLUMNS or len(proof.evals) != 2:
        return False
    if any(len(ev["w"]) != COLUMNS or len(ev["s"]) != PERMUTES - 1
           for ev in proof.evals):
        return False
    # domain generator really generates a 2^log2-order subgroup of Fr
    p = PALLAS.fr.p
    g = vk.domain_gen
    if pow(g, 1 << vk.domain_log2, p) != 1:
        return False
    if pow(g, 1 << (vk.domain_log2 - 1), p) == 1:
        return False
    return True


def load_sponge_params(const_path: str):
    """(fr_params, fq_params) from the Mina constants fixture
    (`data/kimchi_const.json` — the reference's `make_verify_index`
    reads the same fields, `test/.../kimchi.cpp:232-270`)."""
    from ..commitments.ipa import PALLAS
    from .pickles import MinaSpongeParams

    with open(const_path) as f:
        vi = json.load(f)["verify_index"]
    # fr sponge runs over the SCALAR field, fq over the BASE field
    fr = MinaSpongeParams.from_json(PALLAS.fr.p, vi["fr_sponge_params"])
    fq = MinaSpongeParams.from_json(PALLAS.fq.p, vi["fq_sponge_params"])
    return fr, fq


def load_verify_index_constants(const_path: str) -> dict:
    """domain/w/endo/zkpm scalars from the constants fixture."""
    with open(const_path) as f:
        vi = json.load(f)["verify_index"]
    return {
        "domain_log2": int(vi["domain"]["log_size_of_group"]),
        "domain_gen": _fq(vi["domain"]["group_gen"]),
        "w": _fq(vi["w"]),
        "endo": _fq(vi["endo"]),
        "zkpm": [_fq(c) for c in vi["zkpm"]],
    }
