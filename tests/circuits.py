"""Synthetic Placeholder test circuits.

Re-expressions of the reference fixtures in
`test/systems/plonk/placeholder/circuits.hpp` (circuit_test_1 at :92-186,
circuit_test_t at :225-, lookup variants) in the new API: ADD/MUL gate rows,
copy constraints to a public input, zk padding to a power of two.
"""
import random

from crypto3_zk_tpu.arithmetization import plonk as PK


def circuit_1(fs, rng: random.Random):
    """3 witness cols, 1 public input col, 2 selectors (q_add, q_mul).
    ADD rows: w0+w1=w2; MUL rows: w0*w1=w2 with copy(w1[i], pub0[0])."""
    usable_rows = 13
    w = [[0] * usable_rows for _ in range(3)]
    pub = [[0] * usable_rows]
    q_add = [0] * usable_rows
    q_mul = [0] * usable_rows
    copy_constraints = []

    pub[0][0] = rng.randrange(fs.p)
    w[0][0], w[1][0], w[2][0] = (rng.randrange(fs.p) for _ in range(3))
    for i in range(1, usable_rows - 5):
        w[0][i] = rng.randrange(fs.p)
        w[1][i] = rng.randrange(fs.p)
        w[2][i] = (w[0][i] + w[1][i]) % fs.p
        q_add[i] = 1
    for i in range(usable_rows - 5, usable_rows):
        w[0][i] = rng.randrange(fs.p)
        w[1][i] = pub[0][0]
        w[2][i] = w[0][i] * w[1][i] % fs.p
        q_mul[i] = 1
        copy_constraints.append(
            (PK.Var(1, i, PK.WITNESS), PK.Var(0, 0, PK.PUBLIC_INPUT)))

    rows = PK.pad_rows(usable_rows)
    # zk padding: random witness values, zero selectors/public
    for col in w:
        col.extend(rng.randrange(fs.p) for _ in range(rows - usable_rows))
    pub[0].extend([0] * (rows - usable_rows))
    q_add.extend([0] * (rows - usable_rows))
    q_mul.extend([0] * (rows - usable_rows))

    assignment = PK.Assignment(w, pub, [], [q_add, q_mul])
    desc = PK.TableDescription(3, 1, 0, 2, usable_rows, rows)

    w0, w1, w2 = (PK.Var(i, 0, PK.WITNESS) for i in range(3))
    add_gate = PK.Gate(0, [w0 + w1 - w2])
    mul_gate = PK.Gate(1, [w0 * w1 - w2])
    cs = PK.ConstraintSystem(gates=[add_gate, mul_gate],
                             copy_constraints=copy_constraints,
                             public_input_sizes=[1])
    public_input = [[pub[0][0]]]
    return cs, assignment, desc, public_input


def circuit_lookup(fs, rng: random.Random):
    """Small lookup circuit (role of `circuits.hpp` circuit_test_3): a
    one-column lookup table in a constant column with a tag selector, and a
    lookup gate asserting w0 values are members of the table."""
    usable_rows = 14
    table_vals = [3, 5, 7, 9, 11, 13]
    w0 = [0] * usable_rows
    const0 = [0] * usable_rows
    tag_table = [0] * usable_rows   # selector 0: table region
    tag_gate = [0] * usable_rows    # selector 1: lookup gate rows

    # Table region starts at row 1: the reference's sorting algorithm
    # (`lookup_argument.hpp:565-635`) always emits one leading zero, so the
    # compressed value column must itself begin with a zero row.
    for t, v in enumerate(table_vals):
        const0[t + 1] = v
        tag_table[t + 1] = 1
    for i in range(8, usable_rows - 1):
        w0[i] = table_vals[rng.randrange(len(table_vals))]
        tag_gate[i] = 1

    rows = PK.pad_rows(usable_rows)
    pad = rows - usable_rows
    w0.extend([0] * pad)
    const0.extend([0] * pad)
    tag_table.extend([0] * pad)
    tag_gate.extend([0] * pad)

    assignment = PK.Assignment([w0], [], [const0], [tag_table, tag_gate])
    desc = PK.TableDescription(1, 0, 1, 2, usable_rows, rows)

    lookup_table = PK.LookupTable(tag_index=0, columns_number=1)
    lookup_table.append_option([PK.Var(0, 0, PK.CONSTANT)])
    lookup_gate = PK.LookupGate(
        tag_index=1,
        constraints=[PK.LookupConstraint(table_id=1,
                                         lookup_input=[PK.Var(0, 0, PK.WITNESS)])])
    cs = PK.ConstraintSystem(
        gates=[],
        lookup_gates=[lookup_gate],
        lookup_tables=[lookup_table])
    return cs, assignment, desc, []


def circuit_t(fs, rng: random.Random):
    """Rotation circuit (`circuits.hpp` circuit_test_t): ADD rows
    x+y=z with copy(z[i-1], y[i]); MUL rows x*y + x[i-1] = z."""
    usable_rows = 5
    w = [[0] * usable_rows for _ in range(3)]
    pub = [[0] * usable_rows]
    q_add = [0] * usable_rows
    q_mul = [0] * usable_rows
    copy_constraints = []

    pub[0][0] = rng.randrange(fs.p)
    w[0][0], w[1][0], w[2][0] = (rng.randrange(fs.p) for _ in range(3))
    for i in range(1, usable_rows - 2):
        w[0][i] = rng.randrange(fs.p)
        w[1][i] = w[2][i - 1]
        w[2][i] = (w[0][i] + w[1][i]) % fs.p
        q_add[i] = 1
        copy_constraints.append(
            (PK.Var(1, i, PK.WITNESS), PK.Var(2, i - 1, PK.WITNESS)))
    for i in range(usable_rows - 2, usable_rows):
        w[0][i] = rng.randrange(fs.p)
        w[1][i] = pub[0][0]
        w[2][i] = (w[0][i] * w[1][i] + w[0][i - 1]) % fs.p
        q_mul[i] = 1
        copy_constraints.append(
            (PK.Var(1, i, PK.WITNESS), PK.Var(0, 0, PK.PUBLIC_INPUT)))

    rows = PK.pad_rows(usable_rows)
    for col in w:
        col.extend(rng.randrange(fs.p) for _ in range(rows - usable_rows))
    pub[0].extend([0] * (rows - usable_rows))
    q_add.extend([0] * (rows - usable_rows))
    q_mul.extend([0] * (rows - usable_rows))

    assignment = PK.Assignment(w, pub, [], [q_add, q_mul])
    desc = PK.TableDescription(3, 1, 0, 2, usable_rows, rows)

    w0, w1, w2 = (PK.Var(i, 0, PK.WITNESS) for i in range(3))
    w0_prev = PK.Var(0, -1, PK.WITNESS)
    add_gate = PK.Gate(0, [w0 + w1 - w2])
    mul_gate = PK.Gate(1, [w0 * w1 + w0_prev - w2])
    cs = PK.ConstraintSystem(gates=[add_gate, mul_gate],
                             copy_constraints=copy_constraints,
                             public_input_sizes=[1])
    public_input = [[pub[0][0]]]
    return cs, assignment, desc, public_input
