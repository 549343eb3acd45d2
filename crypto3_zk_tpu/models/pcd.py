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
  * "chain" (default): each step carries a Groth16 proof of its own
    compliance on ONE curve; verify checks the whole DAG (verification
    cost grows with depth — the honest non-recursive instantiation);
  * "cycle": steps alternate between MNT4-298 and MNT6-298
    (`fields/mnt.py`) by DAG depth, so every level's verifier equations
    are native to the NEXT level's constraint field — the exact data
    layout recursive composition requires. Verification still walks the
    chain; the in-circuit verifier core needed to collapse it to O(1)
    now exists (`arithmetization/pairing_gadget.groth16_verify_gadget`:
    a real MNT4 Groth16 proof verified inside an R1CS over MNT6's
    scalar field, ~46k constraints). Remaining glue: packaging that
    R1CS as each step's compliance circuit and proving it (the
    host-path MNT Groth16 prover at 46k constraints is the current
    bottleneck; the reference's equivalent lives in crypto3-blueprint).
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
    """`r1cs_mp_ppzkpcd_generator`: one keypair per predicate ("chain"),
    or one per (predicate, cycle side) over MNT4/MNT6 ("cycle")."""
    rng = rng if rng is not None else random.SystemRandom()
    if mode == "cycle":
        from ..fields import mnt as MNT
        keys = {}
        for pred in predicates:
            keys[pred.name] = {
                0: G16.generate(MNT.MNT4, pred.constraint_system, rng=rng),
                1: G16.generate(MNT.MNT6, pred.constraint_system, rng=rng),
            }
        return PCDKeypair(predicate_keys=keys, mode=mode)
    keys = {}
    for pred in predicates:
        keys[pred.name] = G16.generate(curve, pred.constraint_system,
                                       rng=rng)
    return PCDKeypair(predicate_keys=keys, mode=mode)


def _step_depth(incoming: list["PCDProofStep"]) -> int:
    return 1 + max((_step_depth(s.incoming_steps) for s in incoming),
                   default=-1)


def prover(keypair: PCDKeypair, predicate: CompliancePredicate,
           outgoing: PCDMessage, local_data: list[int],
           incoming: list[PCDProofStep],
           witness: list[int],
           rng: random.Random | None = None) -> PCDProofStep:
    """`r1cs_mp_ppzkpcd_prover`: prove one compliance step. In cycle mode
    the proving curve alternates with DAG depth (MNT4 at even levels)."""
    kp = keypair.predicate_keys[predicate.name]
    if keypair.mode == "cycle":
        kp = kp[_step_depth(incoming) % 2]
    aux = list(local_data)
    for step in incoming:
        aux.extend(step.outgoing.payload)
    aux.extend(witness)
    proof = G16.prove(kp.pk, outgoing.payload, aux, rng=rng)
    return PCDProofStep(predicate_name=predicate.name, outgoing=outgoing,
                        proof=proof, incoming_steps=list(incoming))


def verifier(keypair: PCDKeypair, step: PCDProofStep) -> bool:
    """`r1cs_mp_ppzkpcd_verifier`: verify the DAG of compliance proofs
    (in cycle mode, against the per-depth curve's keypair)."""
    kp = keypair.predicate_keys[step.predicate_name]
    if keypair.mode == "cycle":
        kp = kp[_step_depth(step.incoming_steps) % 2]
    if not G16.verify(kp.vk, step.outgoing.payload, step.proof):
        return False
    return all(verifier(keypair, s) for s in step.incoming_steps)
