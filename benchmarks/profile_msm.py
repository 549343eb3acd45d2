"""Stage profile of the one-program batched-affine MSM on the real chip.

Times each pipeline stage as its own jitted program (sync'd via small
device->host reads, `bench.py::sync` discipline) so the latency sinks are
measured, not modeled: digit recode+sort, halving passes, grid scatter,
grid merge, host window combine. Run:

    python benchmarks/profile_msm.py [--log-n 20] [--reps 3]

Writes one human-readable line per stage; the DESIGN.md §perf table is
regenerated from this output (VERDICT r4 next-step #2).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(o):
    if isinstance(o, (tuple, list)):
        return [sync(x) for x in o]
    return np.asarray(o[(slice(0, 1),) * o.ndim])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--group", default="g1")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/zk_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from crypto3_zk_tpu.fields import curves as CV
    from crypto3_zk_tpu.ops import msm_affine as MA
    from crypto3_zk_tpu.ops import limbs as L

    curve = CV.ALT_BN128
    n = 1 << args.log_n
    rng = np.random.default_rng(7)

    # base pool (tiny host cost), like bench.py's fixture
    base, acc = [], None
    for _ in range(256):
        acc = CV.g1_add(curve, acc, curve.g1)
        base.append(acc)
    sel = rng.integers(0, 256, n)
    pts = [base[int(j)] for j in sel]
    scalars = [int(x) % curve.fr.p for x in
               rng.integers(0, 1 << 63, n) * rng.integers(0, 1 << 63, n)]

    t0 = time.time()
    bases = MA.MSMBases(curve, pts, args.group)
    print(f"encode+upload      {time.time()-t0:8.3f}s")

    fr = curve.fr
    limbs_np = L.pack_ints(fr, [s % fr.p for s in scalars]
                           + [0] * (bases.n2 - n))
    g_cnt, wg = MA._window_grouping(fr.nl, bases.n2)
    k_stars = MA._pass_counts(MA._signed_digits_np(fr.nl, limbs_np),
                              g_cnt, wg)
    print(f"grouping: g_cnt={g_cnt} wg={wg} k_stars={list(k_stars)} "
          f"lanes/group={wg*bases.n2}")
    limbs_dev = jnp.asarray(limbs_np)
    ks_dev = jnp.asarray(k_stars)
    ops = bases.ops
    size0 = wg * bases.n2

    # ---- stage programs -------------------------------------------------
    @jax.jit
    def stage_sort(limbs):
        sdig = MA._signed_digits(fr.nl, limbs)
        sw = sdig.reshape(g_cnt, wg, bases.n2)

        def one(carry, swg):
            bucket = jnp.abs(swg)
            wloc = jnp.arange(wg, dtype=jnp.int32)[:, None]
            key = jnp.where(bucket == 0, MA._DEAD,
                            (wloc << 16) | bucket).reshape(size0)
            keys, perm = MA._bitonic_sort(key)
            rank = MA._ranks(keys)
            return carry, (keys, perm, rank)

        _, out = jax.lax.scan(one, 0, sw)
        return out

    t0 = time.time()
    keys, perm, rank = stage_sort(limbs_dev)
    sync([keys, perm, rank])
    print(f"sort compile+run   {time.time()-t0:8.3f}s")
    t0 = time.time()
    for _ in range(args.reps):
        keys, perm, rank = stage_sort(limbs_dev)
    sync([keys, perm, rank])
    dt_sort = (time.time() - t0) / args.reps
    print(f"sort steady        {dt_sort:8.3f}s   ({g_cnt} groups)")

    # passes: one group's full halving schedule, from presorted inputs
    @functools.partial(jax.jit, static_argnums=())
    def stage_passes(keys_g, perm_g, rank_g, sdig_flat, k_star):
        sign = (sdig_flat < 0).astype(jnp.int32)
        pid = perm_g % bases.n2
        YY = MA._tmap(lambda a, b: jnp.concatenate([a, b], axis=-1),
                      bases.Y, bases.Yneg)
        xs = MA._take(bases.X, pid)
        ys = MA._take(YY, pid + bases.n2 * sign[perm_g])
        dead0 = keys_g == MA._DEAD
        st = (xs, ys, dead0)
        st = jax.lax.fori_loop(
            0, k_star,
            lambda j, s: MA._inplace_pass(ops, s[0], s[1], s[2],
                                          keys_g, rank_g, j, size0), st)
        return st

    sdig_np = MA._signed_digits_np(fr.nl, limbs_np)
    sflat = jnp.asarray(sdig_np[:wg].reshape(size0))
    t0 = time.time()
    st = stage_passes(keys[0], perm[0], rank[0], sflat, int(k_stars[0]))
    sync(list(st[:2][0]) if isinstance(st[0], tuple) else [st[0]])
    print(f"passes compile+run {time.time()-t0:8.3f}s  (k*={int(k_stars[0])})")
    t0 = time.time()
    for _ in range(args.reps):
        st = stage_passes(keys[0], perm[0], rank[0], sflat, int(k_stars[0]))
    sync(list(st[0]) if isinstance(st[0], tuple) else [st[0]])
    dt_pass = (time.time() - t0) / args.reps
    print(f"passes steady      {dt_pass:8.3f}s   x{g_cnt} groups = "
          f"{dt_pass*g_cnt:.3f}s")

    # grid merge: batched over all (G, wg) windows like the real program
    x, y, dead = st
    fkeys = keys[0]

    @jax.jit
    def stage_merge(x, y, dead, fkeys, frank):
        live = (frank == 0) & ~dead
        bkt = fkeys & 0xFFFF
        tgt = jnp.where(live,
                        (fkeys >> 16) * MA._WGRID + (bkt - 1),
                        wg * MA._WGRID)

        def grid_like(a):
            return jnp.zeros(a.shape[:-1] + (wg * MA._WGRID + 1,), a.dtype)

        def grid_shape(a):
            return a[..., :wg * MA._WGRID].reshape(
                a.shape[:-1] + (wg, MA._GRID_HI, MA._GRID_LO))

        gx = MA._tmap(grid_shape,
                      MA._scatter_last(MA._tmap(grid_like, x), tgt, x))
        gy = MA._tmap(grid_shape,
                      MA._scatter_last(MA._tmap(grid_like, y), tgt, y))
        ginf = grid_shape(jnp.ones((wg * MA._WGRID + 1,), bool)
                          .at[tgt].set(~live))
        return MA._grid_merge(ops, (gx, gy, ginf))

    t0 = time.time()
    tot = stage_merge(x, y, dead, fkeys, rank[0])
    sync(list(tot))
    print(f"merge compile+run  {time.time()-t0:8.3f}s")
    t0 = time.time()
    for _ in range(args.reps):
        tot = stage_merge(x, y, dead, fkeys, rank[0])
    sync(list(tot))
    dt_merge = (time.time() - t0) / args.reps
    print(f"merge steady       {dt_merge:8.3f}s   (one group of {wg} "
          f"windows) x{g_cnt} = {dt_merge*g_cnt:.3f}s")

    # full program for reference
    t0 = time.time()
    r = bases.run(scalars)
    print(f"full compile+run   {time.time()-t0:8.3f}s")
    t0 = time.time()
    for _ in range(args.reps):
        r = bases.run(scalars)
    dt_full = (time.time() - t0) / args.reps
    print(f"full steady        {dt_full:8.3f}s -> "
          f"{n/dt_full:,.0f} pts/s")


if __name__ == "__main__":
    main()
