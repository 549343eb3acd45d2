"""Batched-affine Pippenger MSM (`ops/msm_affine.py`).

The full-program tests (single n2=512 program: sort + halving passes +
129x256 bucket-merge grid) cost ~20-60 min of XLA:CPU compile on a cold
cache, so they run only when ZK_SLOW=1. Both passed on 2026-08-18 with
the round-2 gather-compaction passes (edge scalars 0/1/p-1, duplicate and
negated points, infinity bases, base reuse, all-zero scalars). The
always-on pass-stack tests below pin the sort + halving machinery against
exact host bucket sums for the XLA and Pallas-interpret paths; the TPU
bench exercises the full program every round.
"""
import contextlib
import os
import random

import pytest

from crypto3_zk_tpu.fields import curves as CV

CURVE = CV.ALT_BN128
rng = random.Random(0xAFF)

slow = pytest.mark.skipif(
    os.environ.get("ZK_SLOW") != "1",
    reason="~18 min XLA:CPU compile for the 512-lane affine-MSM program; "
           "set ZK_SLOW=1 to run (TPU bench covers this path every round)")


@slow
def test_msm_affine_matches_host_with_edges():
    from crypto3_zk_tpu.ops import msm_affine as MA

    n = 300  # pads to 512
    pts = [CV.g1_mul(CURVE, CURVE.g1, rng.randrange(1, CURVE.fr.p))
           for _ in range(n)]
    sc = [rng.randrange(CURVE.fr.p) for _ in range(n)]
    sc[0], sc[1], sc[2] = 0, 1, CURVE.fr.p - 1
    pts[5] = pts[4]
    pts[6] = (pts[4][0], (-pts[4][1]) % CURVE.fq.p)
    exp = None
    for pt, s in zip(pts, sc):
        exp = CV.g1_add(CURVE, exp, CV.g1_mul(CURVE, pt, s))
    assert MA.msm_affine(CURVE, pts, sc) == exp


@slow
def test_msm_affine_infinity_bases_and_reuse():
    from crypto3_zk_tpu.ops import msm_affine as MA

    n = 64
    pts = [CV.g1_mul(CURVE, CURVE.g1, i + 1) for i in range(n)]
    pts[7] = None
    pts[13] = None
    bases = MA.MSMBases(CURVE, pts)
    for _ in range(2):   # second run hits the cached device tables
        sc = [rng.randrange(CURVE.fr.p) for _ in range(n)]
        tot = sum(s * (i + 1) for i, s in enumerate(sc)
                  if pts[i] is not None) % CURVE.fr.p
        assert bases.run(sc) == CV.g1_mul(CURVE, CURVE.g1, tot)
    assert bases.run([0] * n) is None


def _run_inplace_stack(ops, X, YY, key, sign, n, size0, wg,
                       compact_after=None):
    """Sort + the IN-PLACE halving-pass stack; returns (keys, live, x, y)
    with `live` marking the rank-0 survivor lane of each non-empty
    bucket. `compact_after=(j, out_size)` exercises the mid-schedule
    `_compact` + restart-at-d=1 invariant of the segmented program."""
    import numpy as np

    from crypto3_zk_tpu.ops import msm_affine as MA

    keys, perm = MA._bitonic_sort(key)
    rank = MA._ranks(keys)
    x = MA._take(X, perm % n)
    y = MA._take(YY, (perm % n) + n * sign[perm])
    dead = keys == MA._DEAD
    total = max((size0 // max(wg, 1) - 1).bit_length(), 1)
    done = 0
    if compact_after is not None:
        seg1, out_size = compact_after
        for j in range(seg1):
            x, y, dead = MA._inplace_pass(ops, x, y, dead, keys, rank, j,
                                          size0)
        x, y, dead, keys, rank = MA._compact(x, y, dead, keys, out_size)
        size0 = out_size
        done = seg1
    for j in range(max(total - done, 1)):
        x, y, dead = MA._inplace_pass(ops, x, y, dead, keys, rank, j,
                                      size0)
    live = np.asarray((rank == 0) & ~dead)
    return np.asarray(keys), live, x, y


def _check_bucket_sums(fs, decode, keys_np, live, x, y, sums):
    """Every live rank-0 lane must hold its bucket's exact host sum;
    cancelled buckets must have NO live lane."""
    xd, yd = decode(x), decode(y)
    seen = {}
    for i in range(len(keys_np)):
        if not live[i]:
            continue
        kk = int(keys_np[i])
        assert kk != 0x7FFFFFFF
        assert kk not in seen
        seen[kk] = (xd[i], yd[i])
    for kk, pt in sums.items():
        if pt is None:
            assert kk not in seen
        else:
            assert seen.get(kk) == pt, f"bucket {kk:x} wrong"
    for kk in seen:
        assert sums.get(kk) is not None


def _pass_stack_g1(compact_after=None):
    """Sort + in-place halving-pass stack against exact per-bucket host
    sums at a tiny shape (full-program compile stays in the ZK_SLOW tests;
    the grid merge is exercised on TPU every round by the bench)."""
    import numpy as np
    import jax.numpy as jnp

    from crypto3_zk_tpu.ops import curve as CRV
    from crypto3_zk_tpu.ops import limbs as L
    from crypto3_zk_tpu.ops import msm_affine as MA

    r = random.Random(5)
    fs = CURVE.fq
    ops = CRV.FqOps(fs)
    n, wg = 64, 2
    size0 = wg * n
    pts = [CV.g1_mul(CURVE, CURVE.g1, r.randrange(1, 30)) for _ in range(n)]
    pts[3] = pts[2]
    pts[4] = (pts[2][0], (-pts[2][1]) % fs.p)
    digs = [[r.randrange(-4, 5) for _ in range(n)] for _ in range(wg)]
    for j in range(20):
        digs[1][j] = 3                      # fully-skewed run

    X = jnp.asarray(np.stack([np.asarray(l) for l in
                              L.encode(fs, [pt[0] for pt in pts])]))
    Y = jnp.asarray(np.stack([np.asarray(l) for l in
                              L.encode(fs, [pt[1] for pt in pts])]))
    YY = jnp.concatenate([Y, ops.neg(Y)], axis=-1)
    sw = jnp.asarray(np.array(digs, dtype=np.int32))
    bucket = jnp.abs(sw)
    wloc = jnp.arange(wg, dtype=jnp.int32)[:, None]
    key = jnp.where(bucket == 0, MA._DEAD,
                    (wloc << 16) | bucket).reshape(size0)
    sign = (sw < 0).astype(jnp.int32).reshape(size0)
    keys_np, live, x, y = _run_inplace_stack(ops, X, YY, key, sign, n,
                                             size0, wg,
                                             compact_after=compact_after)

    sums = {}
    for w in range(wg):
        for j in range(n):
            d = digs[w][j]
            if d == 0:
                continue
            pt = pts[j] if d > 0 else (pts[j][0], (-pts[j][1]) % fs.p)
            kk = (w << 16) | abs(d)
            sums[kk] = CV.g1_add(CURVE, sums.get(kk), pt)
    _check_bucket_sums(fs, lambda a: L.decode(fs, a), keys_np, live, x, y,
                       sums)


def test_msm_affine_pass_stack_exact():
    _pass_stack_g1()


def test_msm_affine_pass_stack_with_compaction():
    """Two full-width passes, `_compact` to the provable live bound, then
    the remaining passes at the compacted width — the segmented schedule
    of `_msm_affine_program` (live <= ceil(size/4) + #buckets after two
    passes; buckets here <= 2*9 signed digit values per window)."""
    _pass_stack_g1(compact_after=(2, 64))


def test_msm_affine_g2_pass_stack_exact():
    """Fq2 (G2) halving-pass stack against exact host bucket sums —
    Groth16 routes every B_query G2 MSM with >=512 bases through this
    program (`models/groth16/__init__.py`; reference driver
    `generator.hpp (gg):163-229`), so the tuple-coordinate path needs its
    own always-on oracle, not just the ZK_SLOW full-program test."""
    import numpy as np
    import jax.numpy as jnp

    from crypto3_zk_tpu.ops import curve as CRV
    from crypto3_zk_tpu.ops import limbs as L
    from crypto3_zk_tpu.ops import msm_affine as MA

    curve = CV.BLS12_381
    r = random.Random(11)
    fs = curve.fq
    ops = CRV.Fq2Ops(fs)
    n, wg = 32, 2
    size0 = wg * n
    pts = [CV.g2_mul(curve, curve.g2, r.randrange(1, 30)) for _ in range(n)]
    pts[3] = pts[2]
    pts[4] = (pts[2][0], ((-pts[2][1][0]) % fs.p, (-pts[2][1][1]) % fs.p))
    digs = [[r.randrange(-4, 5) for _ in range(n)] for _ in range(wg)]
    for j in range(10):
        digs[1][j] = 3                      # fully-skewed run

    X = MA._tmap(jnp.asarray, ops.encode([pt[0] for pt in pts]))
    Y = MA._tmap(jnp.asarray, ops.encode([pt[1] for pt in pts]))
    YY = MA._tmap(lambda a, b: jnp.concatenate([a, b], axis=-1),
                  Y, ops.neg(Y))
    sw = jnp.asarray(np.array(digs, dtype=np.int32))
    bucket = jnp.abs(sw)
    wloc = jnp.arange(wg, dtype=jnp.int32)[:, None]
    key = jnp.where(bucket == 0, MA._DEAD,
                    (wloc << 16) | bucket).reshape(size0)
    sign = (sw < 0).astype(jnp.int32).reshape(size0)
    keys_np, live, x, y = _run_inplace_stack(ops, X, YY, key, sign, n,
                                             size0, wg)

    sums = {}
    for w in range(wg):
        for j in range(n):
            d = digs[w][j]
            if d == 0:
                continue
            pt = pts[j] if d > 0 else (
                pts[j][0], ((-pts[j][1][0]) % fs.p, (-pts[j][1][1]) % fs.p))
            kk = (w << 16) | abs(d)
            sums[kk] = CV.g2_add(curve, sums.get(kk), pt)
    _check_bucket_sums(fs, ops.decode, keys_np, live, x, y, sums)


@slow
def test_msm_affine_g2_full_program():
    """Full single-program G2 MSM vs host oracle (ZK_SLOW: one 512-lane
    Fq2 program compile). The TPU bench's msm_g2 metric runs the same
    path at 2^16 every round."""
    from crypto3_zk_tpu.ops.msm_affine import MSMBases

    curve = CV.BLS12_381
    r = random.Random(13)
    n = 96
    pts = [CV.g2_mul(curve, curve.g2, i + 1) for i in range(n)]
    pts[7] = None
    bases = MSMBases(curve, pts, group="g2")
    sc = [r.randrange(curve.fr.p) for _ in range(n)]
    sc[0], sc[1] = 0, curve.fr.p - 1
    tot = sum(s * (i + 1) for i, s in enumerate(sc)
              if pts[i] is not None) % curve.fr.p
    assert bases.run(sc) == CV.g2_mul(curve, curve.g2, tot)


@contextlib.contextmanager
def _tiny_grid(monkeypatch_cap="1024"):
    """Shrink the bucket grid 128x256 -> 1x256 so the COMPOSED
    `_msm_affine_program` (sort + segmented halving passes + compaction +
    grid scatter + merge) runs in CI time on XLA:CPU. Valid whenever every
    signed scalar digit fits 8 bits: slot (b-1) < 256, the hi marginal is
    empty, and total = SD exactly as at full size. Restores the module
    globals and drops the traced programs afterward (the jit cache key
    does not see module globals)."""
    from crypto3_zk_tpu.ops import msm_affine as MA

    old = (MA._GRID_HI, MA._WGRID, os.environ.get("ZK_TPU_MSM_LANES_CAP"))
    MA._GRID_HI, MA._WGRID = 1, MA._GRID_LO
    os.environ["ZK_TPU_MSM_LANES_CAP"] = monkeypatch_cap
    MA._msm_affine_program.clear_cache()
    try:
        yield MA
    finally:
        MA._GRID_HI, MA._WGRID = old[0], old[1]
        if old[2] is None:
            os.environ.pop("ZK_TPU_MSM_LANES_CAP", None)
        else:
            os.environ["ZK_TPU_MSM_LANES_CAP"] = old[2]
        MA._msm_affine_program.clear_cache()


def _limb8_scalars(fr, n, r):
    """Scalars whose 16-bit limbs are all <= 255: signed-digit recode is
    the identity, so every bucket index fits the shrunk grid."""
    return [sum(r.randrange(256) << (16 * w) for w in range(fr.nl))
            for _ in range(n)]


def test_msm_one_program_tiny_grid_g1():
    """ALWAYS-ON oracle of the composed one-program MSM (VERDICT r4 #6b:
    the full-size program was only exercised by the TPU bench + ZK_SLOW).
    2^7 points, 8-bit digits, wg=8 groups of 2 — same code path as the
    2^20 bench program, 256x less merge work."""
    with _tiny_grid("1024") as MA:
        r = random.Random(0x51)
        n = 128
        base, acc = [], None
        for _ in range(32):
            acc = CV.g1_add(CURVE, acc, CURVE.g1)
            base.append(acc)
        sel = [r.randrange(32) for _ in range(n)]
        pts = [base[j] for j in sel]
        pts[9] = None
        sc = _limb8_scalars(CURVE.fr, n, r)
        sc[0], sc[1] = 0, 1
        tot = sum(s * (j + 1) for i, (j, s) in enumerate(zip(sel, sc))
                  if i != 9) % CURVE.fr.p
        exp = CV.g1_mul(CURVE, CURVE.g1, tot)
        bases = MA.MSMBases(CURVE, pts)
        assert bases.run(sc) == exp
        # second run reuses the compiled program + device tables
        sc2 = _limb8_scalars(CURVE.fr, n, r)
        tot2 = sum(s * (j + 1) for i, (j, s) in enumerate(zip(sel, sc2))
                   if i != 9) % CURVE.fr.p
        assert bases.run(sc2) == CV.g1_mul(CURVE, CURVE.g1, tot2)


@slow
def test_msm_one_program_tiny_grid_g2():
    """Same composed-program oracle for the Fq2 (G2) instantiation.
    ZK_SLOW: the Fq2 program's XLA:CPU compile peaks >36 GB RSS (measured
    2026-08-20) — stacked on the one-command suite's working set it
    OOM-killed a 125 GB box. G1 stays always-on; the composed G2 path is
    covered by the TPU bench's msm_g2 metric and this gated test."""
    with _tiny_grid("512") as MA:
        curve = CV.BLS12_381
        r = random.Random(0x52)
        n = 64
        base, acc = [], None
        for _ in range(16):
            acc = CV.g2_add(curve, acc, curve.g2)
            base.append(acc)
        sel = [r.randrange(16) for _ in range(n)]
        pts = [base[j] for j in sel]
        sc = _limb8_scalars(curve.fr, n, r)
        sc[0] = 0
        tot = sum(s * (j + 1) for j, s in zip(sel, sc)) % curve.fr.p
        bases = MA.MSMBases(curve, pts, group="g2")
        assert bases.run(sc) == CV.g2_mul(curve, curve.g2, tot)


def test_pallas_inv_scans_interpret():
    """Direct oracle test of the VMEM inversion chunk-scan kernels
    (`ops/pallas_msm.py::inv_scans_pallas` / `mul3_bcast_pallas`) in
    interpret mode at a small (C, K): exclusive prefix/suffix products
    and chunk totals vs python ints. (Enabling them inside the pass stack
    needs ZK_TPU_PALLAS_INV — interpret-mode fori_loops are too slow for
    the full-stack CPU test.)"""
    import jax.numpy as jnp

    from crypto3_zk_tpu.ops import limbs as L
    from crypto3_zk_tpu.ops import pallas_msm as PM

    fs = CURVE.fq
    p = fs.p
    r = random.Random(3)
    C, K = 4, 8
    vals = [r.randrange(1, p) for _ in range(C * K)]
    xr = L.encode(fs, vals).reshape(fs.nl, C, K)
    one_m = L.ones_mont(fs, (1,))
    f, g, tot = PM.inv_scans_pallas(fs, xr, one_m, interpret=True)
    # f, g come back in the kernel's (K, NL, C) layout (scan axis leading
    # — Mosaic's tiled-dim alignment rule); tot is (NL, C)
    for c in range(C):
        acc = 1
        for k in range(K):
            assert L.decode(fs, f[k, :, c:c + 1])[0] == acc
            acc = acc * vals[c * K + k] % p
        assert L.decode(fs, tot[:, c:c + 1])[0] == acc
        acc = 1
        for k in range(K - 1, -1, -1):
            assert L.decode(fs, g[k, :, c:c + 1])[0] == acc
            acc = acc * vals[c * K + k] % p
    # mul3: f * g * bcast(tot) elementwise (all Montgomery-form: the
    # decoded result is just the product of the decoded operands);
    # output back in (NL, C, K)
    out = PM.mul3_bcast_pallas(fs, f, g, tot, interpret=True)
    for c in range(0, C, 3):
        for k in range(0, K, 5):
            want = (L.decode(fs, f[k, :, c:c+1])[0]
                    * L.decode(fs, g[k, :, c:c+1])[0]
                    * L.decode(fs, tot[:, c:c+1])[0]) % p
            assert L.decode(fs, out[:, c, k:k+1])[0] == want


def test_signed_digits_host_mirror_and_pass_counts():
    """`_signed_digits_np` must match the device `_signed_digits` bit-for-
    bit (the host computes the dynamic pass count from it), and k* must be
    the exact ceil-log2 of the max (window, |digit|) multiplicity."""
    import jax.numpy as jnp
    import numpy as np

    from crypto3_zk_tpu.ops import limbs as L
    from crypto3_zk_tpu.ops import msm_affine as MA

    fr = CURVE.fr
    sc = [0, 1, fr.p - 1, (1 << 16) - 1, 1 << 15, (1 << 16) + (1 << 15)]
    sc += [rng.randrange(fr.p) for _ in range(58)]
    limbs = L.pack_ints(fr, sc)
    host = MA._signed_digits_np(fr.nl, limbs)
    dev = np.asarray(MA._signed_digits(fr.nl, jnp.asarray(limbs)))
    assert (host == dev).all()

    # pass counts: all-equal scalars force one bucket per window
    eq = L.pack_ints(fr, [12345] * 64)
    k_eq = MA._pass_counts(MA._signed_digits_np(fr.nl, eq), 1, fr.nl)
    assert int(k_eq[0]) == 6  # 64 equal entries -> ceil(log2(64))
    # singleton buckets need zero passes
    ones = L.pack_ints(fr, [7])
    k_one = MA._pass_counts(MA._signed_digits_np(fr.nl, ones), 1, fr.nl)
    assert int(k_one[0]) == 0
    # zero scalars never count (they land in the dead bucket)
    zeros = L.pack_ints(fr, [0] * 32)
    k_zero = MA._pass_counts(MA._signed_digits_np(fr.nl, zeros), 1, fr.nl)
    assert int(k_zero[0]) == 0
