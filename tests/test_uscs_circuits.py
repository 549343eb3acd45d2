"""USCS/SSP + uscs_ppzksnark + TBCS/BACS frontends (role of the reference's
commented-out uscs/tbcs/bacs test suites, revived)."""
import random

import pytest

from crypto3_zk_tpu.arithmetization import circuits as CIR
from crypto3_zk_tpu.arithmetization import uscs as USCS
from crypto3_zk_tpu.arithmetization.r1cs import LinearCombination, lc
from crypto3_zk_tpu.fields import curves as CV
from crypto3_zk_tpu.models import circuit_snarks as CS
from crypto3_zk_tpu.models import uscs_ppzksnark as UP

CURVE = CV.ALT_BN128
P = CURVE.fr.p


def uscs_example():
    """Simple satisfiable USCS: variables x1(primary), x2, x3(aux)."""
    cs = USCS.USCSConstraintSystem(primary_input_size=1,
                                   auxiliary_input_size=2)
    # x1 - x2 in {+-1}; x2 - x3 in {+-1}; x3 in {+-1}
    cs.add_constraint(LinearCombination([(1, 1), (2, -1)]))
    cs.add_constraint(LinearCombination([(2, 1), (3, -1)]))
    cs.add_constraint(LinearCombination([(3, 1)]))
    primary, aux = [3], [2, 1]
    assert cs.is_satisfied(P, primary, aux)
    return cs, primary, aux


def test_ssp_witness_identity():
    cs, primary, aux = uscs_example()
    fs = CURVE.fr
    rng = random.Random(0x55)
    t = rng.randrange(fs.p)
    inst = USCS.instance_map_with_evaluation(fs, cs, t)
    wit = USCS.witness_map(fs, cs, primary, aux, 0)
    full = [1] + wit.coefficients_for_Vs
    Vt = sum(v * w for v, w in zip(inst.Vt, full)) % P
    Ht = 0
    for i, h in enumerate(wit.coefficients_for_H):
        Ht = (Ht + h * pow(t, i, P)) % P
    assert (Vt * Vt - 1) % P == Ht * inst.Zt % P


def test_uscs_ppzksnark_roundtrip():
    rng = random.Random(0x56)
    cs, primary, aux = uscs_example()
    kp = UP.generate(CURVE, cs, rng)
    proof = UP.prove(kp.pk, primary, aux, rng)
    assert UP.verify(kp.vk, primary, proof)
    assert not UP.verify(kp.vk, [primary[0] + 1], proof)
    bad = UP.Proof(proof.V_g1, proof.alpha_V_g1,
                   CV.g1_add(CURVE, proof.H_g1, CURVE.g1), proof.V_g2)
    assert not UP.verify(kp.vk, primary, bad)


def tbcs_example():
    """(x1 NAND x2) -> w3; output gate checks w3 XOR 1... simply: output
    gate = AND(x1, x2) must be 0 (i.e. not both inputs 1)."""
    c = CIR.TBCSCircuit(primary_input_size=2, auxiliary_input_size=0)
    # wires: 1=x1, 2=x2; gate output wire 3
    c.gates.append(CIR.TBCSGate(1, 2, CIR.TBCS_GATE_AND, 3,
                                is_circuit_output=True))
    return c


def test_tbcs_ppzksnark_roundtrip():
    rng = random.Random(0x57)
    circuit = tbcs_example()
    assert circuit.is_satisfied([1, 0], [])
    assert not circuit.is_satisfied([1, 1], [])
    kp, _ = CS.tbcs_generate(CURVE, circuit, rng)
    proof = CS.tbcs_prove(kp, circuit, [1, 0], [], rng)
    assert CS.tbcs_verify(kp, [1, 0], proof)
    assert not CS.tbcs_verify(kp, [0, 1], proof)


def test_bacs_ppzksnark_roundtrip():
    rng = random.Random(0x58)
    p = P
    # wires: 1=x1 (primary), 2=a1 (aux); gate1: (x1+a1)*(x1) -> w3;
    # gate2 (output): (w3 - 12) * 1 -> w4 must be 0 => (x1+a1)*x1 == 12
    c = CIR.BACSCircuit(primary_input_size=1, auxiliary_input_size=1)
    c.gates.append(CIR.BACSGate(lc((1, 1), (2, 1)), lc((1, 1)), 3))
    c.gates.append(CIR.BACSGate(
        LinearCombination([(3, 1), (0, -12)]), lc((0, 1)), 4,
        is_circuit_output=True))
    primary, aux = [3], [1]   # (3+1)*3 = 12
    assert c.is_satisfied(p, primary, aux)
    kp, _ = CS.bacs_generate(CURVE, c, rng)
    proof = CS.bacs_prove(kp, c, primary, aux, rng)
    assert CS.bacs_verify(kp, primary, proof)
    assert not CS.bacs_verify(kp, [4], proof)
