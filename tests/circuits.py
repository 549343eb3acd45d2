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


def circuit_3(fs, rng: random.Random):
    """`circuits.hpp:356-447` circuit_test_3: a 3-column lookup with tag
    columns — one gated input row against a (c0, c1, c2) table region."""
    usable_rows = 4
    w = [[1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    consts = [[0, 1, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0]]
    sel_lookup = [1, 0, 0, 0]
    sel_table = [0, 1, 1, 1]

    rows = PK.pad_rows(usable_rows)
    pad = rows - usable_rows
    for col in w:
        col.extend(rng.randrange(fs.p) for _ in range(pad))
    for col in consts:
        col.extend([0] * pad)
    sel_lookup.extend([0] * pad)
    sel_table.extend([0] * pad)

    assignment = PK.Assignment(w, [], consts, [sel_lookup, sel_table])
    desc = PK.TableDescription(3, 0, 3, 2, usable_rows, rows)

    table1 = PK.LookupTable(tag_index=1, columns_number=3)
    table1.append_option([PK.Var(i, 0, PK.CONSTANT) for i in range(3)])
    gate = PK.LookupGate(tag_index=0, constraints=[PK.LookupConstraint(
        table_id=1,
        lookup_input=[PK.Var(i, 0, PK.WITNESS) for i in range(3)])])
    cs = PK.ConstraintSystem(gates=[], lookup_gates=[gate],
                             lookup_tables=[table1])
    return cs, assignment, desc, []


def circuit_4(fs, rng: random.Random):
    """`circuits.hpp:449-565` circuit_test_4: binary multiplication — a
    MUL gate plus a lookup of (w0, w1, w0*w1) rows in the binary-product
    table, with one unselected random row."""
    p = fs.p
    rows = 8
    b = [rng.randrange(2) for _ in range(8)]
    r1, r2 = rng.randrange(p), rng.randrange(p)
    w0 = [b[0], b[2], r1, b[4], b[6], 0, 0, 0]
    w1 = [b[1], b[3], r2, b[5], b[7], 0, 0, 0]
    w2 = [w0[i] * w1[i] % p for i in range(5)] + [0, 0, 0]
    consts = [[0, 0, 0, 1, 1, 0, 0, 0],
              [0, 0, 1, 0, 1, 0, 0, 0],
              [0, 0, 0, 0, 1, 0, 0, 0]]
    sels = [[1, 1, 0, 1, 1, 0, 0, 0],        # lookup gate rows
            [1, 1, 1, 1, 1, 0, 0, 0],        # mul gate rows
            [0, 1, 1, 1, 1, 0, 0, 0]]        # table tag

    assignment = PK.Assignment([w0, w1, w2], [], consts, sels)
    desc = PK.TableDescription(3, 0, 3, 3, 5, rows)

    v0, v1, v2 = (PK.Var(i, 0, PK.WITNESS) for i in range(3))
    mul_gate = PK.Gate(1, [v0 * v1 - v2])
    table1 = PK.LookupTable(tag_index=2, columns_number=3)
    table1.append_option([PK.Var(i, 0, PK.CONSTANT) for i in range(3)])
    lookup_gate = PK.LookupGate(tag_index=0, constraints=[
        PK.LookupConstraint(table_id=1, lookup_input=[v0, v1, v2])])
    cs = PK.ConstraintSystem(gates=[mul_gate], lookup_gates=[lookup_gate],
                             lookup_tables=[table1])
    return cs, assignment, desc, []


def circuit_5(fs, rng: random.Random):
    """`circuits.hpp:567-645` circuit_test_5 (wide table): 30 witness
    columns, one MUL-rotation constraint per column, every column copy-
    constrained to a 30-element public input."""
    n_w = 30
    usable_rows = 30
    w = [[0] * usable_rows for _ in range(n_w)]
    pub = [[0] * usable_rows]
    sel = [0] * usable_rows
    copy_constraints = []
    for i in range(n_w):
        v = rng.randrange(n_w)
        w[i][0] = w[i][2] = pub[0][i] = v
        w[i][1] = 1
        copy_constraints.append(
            (PK.Var(0, i, PK.PUBLIC_INPUT), PK.Var(i, 0, PK.WITNESS)))
    sel[1] = 1

    rows = PK.pad_rows(usable_rows)
    pad = rows - usable_rows
    for col in w:
        col.extend(rng.randrange(fs.p) for _ in range(pad))
    pub[0].extend([0] * pad)
    sel.extend([0] * pad)

    assignment = PK.Assignment(w, pub, [], [sel])
    desc = PK.TableDescription(n_w, 1, 0, 1, usable_rows, rows)

    constraints = [PK.Var(i, -1, PK.WITNESS)
                   - PK.Var(i, 0, PK.WITNESS) * PK.Var(i, 1, PK.WITNESS)
                   for i in range(n_w)]
    cs = PK.ConstraintSystem(gates=[PK.Gate(0, constraints)],
                             copy_constraints=copy_constraints,
                             public_input_sizes=[n_w])
    public_input = [list(pub[0][:n_w])]
    return cs, assignment, desc, public_input


def circuit_fib(fs, rng: random.Random, usable_rows: int = 8):
    """`circuits.hpp:648-750` circuit_test_fib: w0(-1) + w0 == w0(+1) on
    the selector-gated fibonacci rows; public input (1, 1) seeds the run."""
    w0 = [0] * usable_rows
    pub = [[0] * usable_rows]
    sel = [0] * usable_rows
    w0[0] = w0[1] = 1
    pub[0][0] = pub[0][1] = 1
    sel[1] = 1
    for i in range(2, usable_rows - 1):
        w0[i] = (w0[i - 2] + w0[i - 1]) % fs.p
        sel[i - 1] = 1

    rows = PK.pad_rows(usable_rows)
    pad = rows - usable_rows
    w0.extend([0] * pad)
    pub[0].extend([0] * pad)
    sel.extend([0] * pad)

    assignment = PK.Assignment([w0], pub, [], [sel])
    desc = PK.TableDescription(1, 1, 0, 1, usable_rows, rows)
    gate = PK.Gate(0, [PK.Var(0, -1, PK.WITNESS) + PK.Var(0, 0, PK.WITNESS)
                       - PK.Var(0, 1, PK.WITNESS)])
    cs = PK.ConstraintSystem(gates=[gate], public_input_sizes=[2])
    return cs, assignment, desc, [[1, 1]]


def circuit_6(fs, rng: random.Random):
    """`circuits.hpp:753-880` circuit_test_6 (long range check): two
    lookup gates over two tables sharing a tag column, one with a
    rotation expression input and a 3-option table."""
    usable_rows = 6
    r = [rng.randrange(5) + 2 for _ in range(6)]
    w0 = list(r)
    w1 = [7] + [(r[i - 1] + r[i]) % fs.p for i in range(1, 6)]
    consts = [[0, 2, 3, 4, 5, 6],
              [0, 7, 8, 9, 10, 11],
              [0, 12, 12, 12, 12, 12]]
    sels = [[0, 1, 1, 1, 1, 1],              # table tag (both tables)
            [1, 1, 1, 1, 1, 1],              # first lookup gate
            [0, 1, 1, 1, 1, 1]]              # second lookup gate

    rows = PK.pad_rows(usable_rows)
    pad = rows - usable_rows
    w0.extend(rng.randrange(fs.p) for _ in range(pad))
    w1.extend(rng.randrange(fs.p) for _ in range(pad))
    for col in consts:
        col.extend([0] * pad)
    for col in sels:
        col.extend([0] * pad)

    assignment = PK.Assignment([w0, w1], [], consts, sels)
    desc = PK.TableDescription(2, 0, 3, 3, usable_rows, rows)

    v0 = PK.Var(0, 0, PK.WITNESS)
    v0_prev = PK.Var(0, -1, PK.WITNESS)
    v1 = PK.Var(1, 0, PK.WITNESS)
    c0, c1, c2 = (PK.Var(i, 0, PK.CONSTANT) for i in range(3))

    table1 = PK.LookupTable(tag_index=0, columns_number=1)
    table1.append_option([c0])
    table2 = PK.LookupTable(tag_index=0, columns_number=1)
    table2.append_option([c0])
    table2.append_option([c1])
    table2.append_option([c2])

    gate1 = PK.LookupGate(tag_index=1, constraints=[
        PK.LookupConstraint(table_id=1, lookup_input=[v0]),
        PK.LookupConstraint(table_id=2, lookup_input=[v1])])
    gate2 = PK.LookupGate(tag_index=2, constraints=[
        PK.LookupConstraint(table_id=2, lookup_input=[v0_prev + v0])])
    cs = PK.ConstraintSystem(gates=[], lookup_gates=[gate1, gate2],
                             lookup_tables=[table1, table2])
    return cs, assignment, desc, []


def circuit_7(fs, rng: random.Random):
    """`circuits.hpp:882-1059` circuit_test_7 (big column rotations):
    seven-rotation lookup inputs, a w0 == w0(-7) gate, three tables with
    multi-option tag regions."""
    usable_rows = 14
    p = fs.p
    r = rng.randrange(7)
    w0 = [0] * usable_rows
    w1 = [0] * usable_rows
    j = 0
    for i in range(7):
        if j == r:
            j += 1
        w0[i] = j
        w1[i] = pow(2, j, p)
        j += 1
    for i in range(7, 14):
        w0[i] = w0[i - 7]
        w1[i] = w1[i - 7]

    sels = [
        [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1],   # w0 == w0(-7) gate
        [0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0],   # 7-rotation lookup
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],   # (w0, w1) lookup
        [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],   # w1(-1)*w1 lookup
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1],   # tables 2, 3 tag
        [0, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0],   # 7-column table tag
    ]
    consts = [
        [0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5],
        [0, 2, 2, 1, 1, 1, 1, 1, 1, 2, 4, 8, 16, 32],
        [0, 3, 3, 3, 2, 2, 2, 2, 6, 7, 7, 7, 7, 7],
        [0, 4, 4, 4, 4, 3, 3, 3, 64, 128, 128, 128, 128, 128],
        [0, 5, 5, 5, 5, 5, 4, 4, 1, 2, 4, 8, 16, 32],
        [0, 6, 6, 6, 6, 6, 6, 5, 64, 128, 256, 512, 1024, 2048],
        [0, 7, 7, 7, 7, 7, 7, 7, 4096, 8192, 16384, 16384, 16384, 16384],
    ]

    rows = PK.pad_rows(usable_rows)
    pad = rows - usable_rows
    w0.extend([0] * pad)
    w1.extend([0] * pad)
    for col in sels + consts:
        col.extend([0] * pad)

    assignment = PK.Assignment([w0, w1], [], consts, sels)
    desc = PK.TableDescription(2, 0, 7, 6, usable_rows, rows)

    v0 = PK.Var(0, 0, PK.WITNESS)
    v1 = PK.Var(1, 0, PK.WITNESS)
    c = [PK.Var(i, 0, PK.CONSTANT) for i in range(7)]

    add_gate = PK.Gate(0, [v0 - PK.Var(0, -7, PK.WITNESS)])

    table1 = PK.LookupTable(tag_index=5, columns_number=7)
    table1.append_option(c)
    table2 = PK.LookupTable(tag_index=4, columns_number=2)
    table2.append_option([c[0], c[1]])
    table2.append_option([c[2], c[3]])
    table3 = PK.LookupTable(tag_index=4, columns_number=1)
    table3.append_option([c[4]])
    table3.append_option([c[5]])
    table3.append_option([c[6]])

    gate1 = PK.LookupGate(tag_index=1, constraints=[PK.LookupConstraint(
        table_id=1,
        lookup_input=[PK.Var(0, rot, PK.WITNESS)
                      for rot in (-3, -2, -1, 0, 1, 2, 3)])])
    gate2 = PK.LookupGate(tag_index=2, constraints=[
        PK.LookupConstraint(table_id=2, lookup_input=[v0, v1])])
    gate3 = PK.LookupGate(tag_index=3, constraints=[
        PK.LookupConstraint(table_id=3,
                            lookup_input=[PK.Var(1, -1, PK.WITNESS) * v1])])
    cs = PK.ConstraintSystem(
        gates=[add_gate], lookup_gates=[gate1, gate2, gate3],
        lookup_tables=[table1, table2, table3])
    return cs, assignment, desc, []
