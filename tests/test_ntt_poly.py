"""NTT and polynomial-module tests vs python-int oracles."""
import random

import numpy as np
import pytest

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.ops import limbs as L
from crypto3_zk_tpu.ops import ntt as N
from crypto3_zk_tpu.poly.domain import get_domain, calculate_domain_set
from crypto3_zk_tpu.poly.polynomial import Poly, PolyDFS, polynomial_product, polynomial_sum

rng = random.Random(7)
FS = P.BLS12_381_FR


def poly_eval_int(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


@pytest.mark.parametrize("log_n", [0, 1, 4, 8])
def test_ntt_matches_naive_eval(log_n):
    n = 1 << log_n
    coeffs = [rng.randrange(FS.p) for _ in range(n)]
    d = get_domain(FS, n)
    evals = L.decode(FS, d.fft(L.encode(FS, coeffs)))
    w = d.omega
    want = [poly_eval_int(coeffs, pow(w, i, FS.p), FS.p) for i in range(n)]
    assert evals == want


@pytest.mark.parametrize("log_n", [1, 6, 10])
def test_ntt_roundtrip(log_n):
    n = 1 << log_n
    coeffs = [rng.randrange(FS.p) for _ in range(n)]
    d = get_domain(FS, n)
    back = L.decode(FS, d.ifft(d.fft(L.encode(FS, coeffs))))
    assert back == coeffs


def test_ntt_goldilocks():
    g = P.GOLDILOCKS
    n = 32
    coeffs = [rng.randrange(g.p) for _ in range(n)]
    d = get_domain(g, n)
    back = L.decode(g, d.ifft(d.fft(L.encode(g, coeffs))))
    assert back == coeffs


def test_coset_ntt():
    n = 16
    g = FS.generator
    coeffs = [rng.randrange(FS.p) for _ in range(n)]
    evals = L.decode(FS, N.coset_ntt(FS, L.encode(FS, coeffs), g))
    d = get_domain(FS, n)
    want = [poly_eval_int(coeffs, g * pow(d.omega, i, FS.p) % FS.p, FS.p)
            for i in range(n)]
    assert evals == want
    back = L.decode(FS, N.coset_intt(FS, L.encode(FS, want), g))
    assert back == coeffs


def test_poly_mul_add_eval():
    a = [rng.randrange(FS.p) for _ in range(5)]
    b = [rng.randrange(FS.p) for _ in range(9)]
    pa, pb = Poly.from_ints(FS, a), Poly.from_ints(FS, b)
    prod = (pa * pb).to_ints()
    want = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            want[i + j] = (want[i + j] + x * y) % FS.p
    assert prod == want
    s = (pa + pb).to_ints()
    want_s = [(x + y) % FS.p for x, y in
              zip(a + [0] * (len(b) - len(a)), b)]
    assert s == want_s
    x = rng.randrange(FS.p)
    assert pa.evaluate(x) == poly_eval_int(a, x, FS.p)


def test_divide_by_linear():
    a = [rng.randrange(FS.p) for _ in range(10)]
    pa = Poly.from_ints(FS, a)
    z = rng.randrange(FS.p)
    q = pa.divide_by_linear(z)
    # check q*(x-z) + f(z) == f
    x = rng.randrange(FS.p)
    lhs = (q.evaluate(x) * ((x - z) % FS.p) + pa.evaluate(z)) % FS.p
    assert lhs == pa.evaluate(x)
    # probe: z inside the evaluation domain (host fallback path)
    d = get_domain(FS, 16)
    z2 = d.element(3)
    q2 = pa.divide_by_linear(z2)
    lhs2 = (q2.evaluate(x) * ((x - z2) % FS.p) + pa.evaluate(z2)) % FS.p
    assert lhs2 == pa.evaluate(x)


def test_polydfs_ops():
    a = [rng.randrange(FS.p) for _ in range(8)]
    b = [rng.randrange(FS.p) for _ in range(8)]
    da = PolyDFS.from_poly(Poly.from_ints(FS, a))
    db = PolyDFS.from_poly(Poly.from_ints(FS, b))
    # product grows the domain automatically
    prod = da * db
    assert prod.n >= 15
    x = rng.randrange(FS.p)
    assert prod.evaluate(x) == poly_eval_int(a, x, FS.p) * poly_eval_int(b, x, FS.p) % FS.p
    assert (da + db).evaluate(x) == (poly_eval_int(a, x, FS.p) + poly_eval_int(b, x, FS.p)) % FS.p
    # resize up and back
    up = da.resize(32)
    assert up.evaluate(x) == poly_eval_int(a, x, FS.p)
    assert up.coefficients().to_ints() == a


def test_polydfs_shift():
    n = 8
    evals = [rng.randrange(FS.p) for _ in range(n)]
    f = PolyDFS.from_evals_ints(FS, evals)
    d = get_domain(FS, n)
    g = f.shift(1)
    # g(w^i) = f(w^{i+1})
    assert g.to_ints() == evals[1:] + evals[:1]
    x = rng.randrange(FS.p)
    assert g.evaluate(x) == f.evaluate(x * d.omega % FS.p)


def test_sum_product_reduce():
    polys = [PolyDFS.from_poly(Poly.from_ints(FS, [rng.randrange(FS.p) for _ in range(3)]))
             for _ in range(5)]
    x = rng.randrange(FS.p)
    s = polynomial_sum(list(polys)).evaluate(x)
    pr = polynomial_product(list(polys)).evaluate(x)
    vals = [p.evaluate(x) for p in polys]
    assert s == sum(vals) % FS.p
    acc = 1
    for v in vals:
        acc = acc * v % FS.p
    assert pr == acc


def test_domain_lagrange():
    n = 8
    d = get_domain(FS, n)
    x = rng.randrange(FS.p)
    ls = d.evaluate_all_lagrange(x)
    # sum of all Lagrange polys is 1
    assert sum(ls) % FS.p == 1
    # L_i(w^j) = delta_ij
    ls2 = d.evaluate_all_lagrange(d.element(3))
    assert ls2 == [0, 0, 0, 1, 0, 0, 0, 0]
    assert d.lagrange_at(5, x) == ls[5]
    doms = calculate_domain_set(FS, 10, 4)
    assert [dd.n for dd in doms] == [1024, 512, 256, 128]


def test_mxu_ntt_matches_vpu():
    from crypto3_zk_tpu.ops.mxu_ntt import ntt_mxu
    FS = P.BLS12_381_FR
    n = 256
    xs = [rng.randrange(FS.p) for _ in range(n)]
    x = L.encode(FS, xs)
    assert L.decode(FS, ntt_mxu(FS, x)) == L.decode(FS, N.ntt(FS, x))
    assert L.decode(FS, ntt_mxu(FS, ntt_mxu(FS, x), inverse=True)) == xs


def test_mxu_ntt_recursive_four_step():
    """Deep recursion (the >2^20 code path) forced at toy size: log_block=1
    makes the first factor 2^11 > the 2^10 block cap, so the size-R stage
    itself four-steps. Also pins the device twiddle scan against the host
    object-int builder."""
    from crypto3_zk_tpu.ops import mxu_ntt as MX
    FS = P.BLS12_381_FR
    n = 1 << 12
    xs = [rng.randrange(FS.p) for _ in range(n)]
    x = L.encode(FS, xs)
    got = MX.ntt_mxu(FS, x, log_block=1)
    assert L.decode(FS, got) == L.decode(FS, N.ntt(FS, x))

    host = MX._four_step_twiddles(FS, 1 << 10, 64, 16, False)
    dev = MX._four_step_tw_device(FS, 1 << 10, 64, 16, False)
    assert np.asarray(dev).tolist() == np.asarray(host).tolist()
