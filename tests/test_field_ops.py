"""Field-op kernels vs the python-int oracle.

Mirrors the role of crypto3-multiprecision's own unit coverage: every
vectorized limb kernel is diffed against exact big-int arithmetic.
"""
import random

import numpy as np
import pytest

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.fields.field import Fp
from crypto3_zk_tpu.ops import limbs as L

FIELDS = [P.BLS12_381_FR, P.ALT_BN128_FR, P.GOLDILOCKS, P.PALLAS_FR,
          P.BLS12_381_FQ]

rng = random.Random(0xC0FFEE)


def rand_ints(fs, n):
    return [rng.randrange(fs.p) for _ in range(n)]


@pytest.mark.parametrize("fs", FIELDS, ids=lambda f: f.name)
def test_pack_roundtrip(fs):
    xs = rand_ints(fs, 7) + [0, 1, fs.p - 1]
    arr = L.pack_ints(fs, xs)
    assert L.unpack_ints(fs, arr) == xs


@pytest.mark.parametrize("fs", FIELDS, ids=lambda f: f.name)
def test_mont_encode_decode(fs):
    xs = rand_ints(fs, 5) + [0, 1, fs.p - 1]
    enc = L.encode(fs, xs)
    assert L.decode(fs, enc) == xs


@pytest.mark.parametrize("fs", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(fs):
    n = 64
    a, b = rand_ints(fs, n), rand_ints(fs, n)
    a[0], b[0] = fs.p - 1, fs.p - 1  # overflow path
    a[1], b[1] = 0, fs.p - 1         # borrow path
    da, db = L.encode(fs, a), L.encode(fs, b)
    assert L.decode(fs, L.add(fs, da, db)) == [(x + y) % fs.p for x, y in zip(a, b)]
    assert L.decode(fs, L.sub(fs, da, db)) == [(x - y) % fs.p for x, y in zip(a, b)]
    assert L.decode(fs, L.neg(fs, da)) == [(-x) % fs.p for x in a]


@pytest.mark.parametrize("fs", FIELDS, ids=lambda f: f.name)
def test_mont_mul(fs):
    n = 64
    a, b = rand_ints(fs, n), rand_ints(fs, n)
    a[0], b[0] = fs.p - 1, fs.p - 1
    a[1], b[1] = 0, 12345
    a[2], b[2] = 1, fs.p - 1
    da, db = L.encode(fs, a), L.encode(fs, b)
    got = L.decode(fs, L.mont_mul(fs, da, db))
    assert got == [x * y % fs.p for x, y in zip(a, b)]


@pytest.mark.parametrize("fs", [P.BLS12_381_FR, P.GOLDILOCKS],
                         ids=lambda f: f.name)
def test_pow_and_inv(fs):
    a = rand_ints(fs, 8)
    da = L.encode(fs, a)
    e = 0xDEADBEEF
    assert L.decode(fs, L.mont_pow_const(fs, da, e)) == [pow(x, e, fs.p) for x in a]
    inv = L.decode(fs, L.inv(fs, da))
    assert inv == [pow(x, -1, fs.p) for x in a]


@pytest.mark.parametrize("fs", [P.BLS12_381_FR, P.GOLDILOCKS],
                         ids=lambda f: f.name)
def test_batch_inverse(fs):
    n = 33  # non-power-of-two
    a = rand_ints(fs, n)
    a[5] = 0  # zero handling
    da = L.encode(fs, a)
    inv = L.decode(fs, L.batch_inverse(fs, da, axis=1))
    assert inv == [pow(x, -1, fs.p) if x else 0 for x in a]


@pytest.mark.parametrize("fs", [P.BLS12_381_FR], ids=lambda f: f.name)
def test_powers(fs):
    w = fs.root_of_unity(16)
    arr = L.decode(fs, L.powers(fs, w, 10))
    assert arr == [pow(w, i, fs.p) for i in range(10)]


@pytest.mark.parametrize("fs", [P.BLS12_381_FR], ids=lambda f: f.name)
def test_predicates_and_select(fs):
    a = [0, 1, 2, 0]
    da = L.encode(fs, a)
    assert list(np.asarray(L.is_zero(fs, da))) == [True, False, False, True]
    db = L.encode(fs, [0, 1, 3, 5])
    assert list(np.asarray(L.eq(fs, da, db))) == [True, True, False, False]
    sel = L.select(L.is_zero(fs, da), db, da)
    assert L.decode(fs, sel) == [0, 1, 2, 5]


def test_host_field_oracle():
    fs = P.BLS12_381_FR
    a, b = Fp(fs, 1234567), Fp(fs, 7654321)
    assert int(a * b) == 1234567 * 7654321 % fs.p
    assert int(a / b * b) == int(a)
    assert int(a ** (fs.p - 1)) == 1
    s = (a * a).sqrt()
    assert s == a or s == -a


def test_root_of_unity():
    fs = P.BLS12_381_FR
    w = fs.root_of_unity(1 << 10)
    assert pow(w, 1 << 10, fs.p) == 1
    assert pow(w, 1 << 9, fs.p) != 1
