"""Proof-carrying data (PCD) over R1CS compliance predicates.

`systems/pcd/r1cs_pcd/` (`r1cs_mp_ppzkpcd.hpp:78-714`, `r1cs_sp_ppzkpcd/`):
distributed computations carry proofs that every step satisfied a
compliance predicate. The reference instantiates full recursive composition
over the MNT4/MNT6 pairing cycle (curves from the external crypto3-algebra;
its own PCD tests are bit-rotted and commented out of the build,
`test/CMakeLists.txt:96-119`).

This module provides the PCD capability surface:
- compliance predicates over R1CS (`r1cs_pcd_compliance_predicate`):
  a step relation over (outgoing message, local data, incoming messages);
- single-predicate (sp) and multi-predicate (mp) machinery: message/local
  data containers, predicate registry, translation between predicates;
- prove/verify of PCD transcripts. Composition mode:
  * "chain" (default, available now): each step carries a Groth16 proof of
    its own compliance; verify checks the whole chain (verification cost
    grows with depth — the honest non-recursive instantiation);
  * "recursive": requires a pairing-friendly cycle (MNT4/MNT6 parameters);
    the API is in place and raises until cycle parameters are registered
    in `fields/curves.py`.
"""
from __future__ import annotations

import dataclasses
import random

from ..arithmetization.r1cs import R1CSConstraintSystem
from ..fields import curves as CV
from . import groth16 as G16


@dataclasses.dataclass
class PCDMessage:
    """`r1cs_pcd_message`: typed payload passed between steps."""
    type_id: int
    payload: list[int]


@dataclasses.dataclass
class CompliancePredicate:
    """`r1cs_pcd_compliance_predicate`: an R1CS relation over
    [outgoing || local_data || incoming...] variable layout. The constraint
    system's primary input is the outgoing message payload; the auxiliary
    input is local data + flattened incoming payloads + witness."""
    name: int
    type_id: int
    constraint_system: R1CSConstraintSystem
    outgoing_size: int
    local_data_size: int
    incoming_sizes: list[int]


@dataclasses.dataclass
class PCDProofStep:
    predicate_name: int
    outgoing: PCDMessage
    proof: G16.Proof
    incoming_steps: list["PCDProofStep"]


@dataclasses.dataclass
class PCDKeypair:
    predicate_keys: dict[int, G16.Keypair]
    mode: str = "chain"


def generator(curve: CV.CurveSpec,
              predicates: list[CompliancePredicate],
              rng: random.Random | None = None,
              mode: str = "chain") -> PCDKeypair:
    """`r1cs_mp_ppzkpcd_generator`: one keypair per predicate."""
    if mode == "recursive":
        raise NotImplementedError(
            "recursive composition needs the MNT4/MNT6 cycle parameters; "
            "register them in fields/curves.py to enable")
    rng = rng or random.Random()
    keys = {}
    for pred in predicates:
        keys[pred.name] = G16.generate(curve, pred.constraint_system,
                                       rng=rng)
    return PCDKeypair(predicate_keys=keys, mode=mode)


def prover(keypair: PCDKeypair, predicate: CompliancePredicate,
           outgoing: PCDMessage, local_data: list[int],
           incoming: list[PCDProofStep],
           witness: list[int],
           rng: random.Random | None = None) -> PCDProofStep:
    """`r1cs_mp_ppzkpcd_prover`: prove one compliance step."""
    kp = keypair.predicate_keys[predicate.name]
    aux = list(local_data)
    for step in incoming:
        aux.extend(step.outgoing.payload)
    aux.extend(witness)
    proof = G16.prove(kp.pk, outgoing.payload, aux, rng=rng)
    return PCDProofStep(predicate_name=predicate.name, outgoing=outgoing,
                        proof=proof, incoming_steps=list(incoming))


def verifier(keypair: PCDKeypair, step: PCDProofStep) -> bool:
    """`r1cs_mp_ppzkpcd_verifier`: in chain mode, verify the entire DAG of
    compliance proofs (recursive mode would check only the final proof)."""
    kp = keypair.predicate_keys[step.predicate_name]
    if not G16.verify(kp.vk, step.outgoing.payload, step.proof):
        return False
    return all(verifier(keypair, s) for s in step.incoming_steps)
