"""Distributed MSM: ONE shard_map program over a points axis.

SURVEY.md §2.7 ("shard MSM points across chips; bucket sums reduce via
collectives"). Points, scalars-digit orders and sort keys are sharded over
a 1-D mesh axis; every device runs the full window pipeline of
`ops/msm.py` (`lax.scan` over host-presorted windows → segmented bucket
sums → weighted reduce) on its shard, and the per-window Jacobian totals
are combined ACROSS devices inside the same program: `all_gather` over ICI
(the totals are ~W·3·NL u32 ≈ 3 KB — gathering beats ppermute halving at
this size), then a log2(D) batched Jacobian tree-reduce, identical on all
shards, so the output is replicated.

This replaces the round-1 host partition-loop + host fold: there is one
compiled program, one dispatch, and the cross-device reduction rides the
interconnect, not the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..fields import curves as CV
from ..ops import curve as CRV
from ..ops import msm as MSM


def _tmap(f, x):
    if isinstance(x, tuple):
        return tuple(_tmap(f, xx) for xx in x)
    return f(x)


def _shard_msm_fn(ops, c: int, windows: int, d: int, axis: str):
    """Per-shard body: local windows scan + cross-device jac tree-reduce."""

    def fn(X, Y, orders, keys):
        nloc = keys.shape[-1]
        # constants entering loop carries must be marked varying over the
        # mesh axis or the fori_loop carry types mismatch under shard_map
        Z = _tmap(lambda a: jax.lax.pcast(a, (axis,), to="varying"),
                  ops.ones((nloc,)))

        def step(carry, ok):
            o, k = ok
            return carry, MSM._msm_window_body(ops, (X, Y, Z), o, k, c)

        _, totals = jax.lax.scan(step, 0, (orders, keys))
        # totals coords: (W, NL, 1) (Fq2: tuples of that). Gather the
        # device axis then reduce it with log2(D) batched Jacobian adds.
        gath = _tmap(lambda a: jax.lax.all_gather(a, axis), totals)
        # (D, W, NL, 1) -> (NL, D, W): limb axis first, (D, W) batch
        gath = _tmap(lambda a: jnp.transpose(a[..., 0], (2, 0, 1)), gath)

        def body(i, pt):
            half = jnp.int32(d) >> (i + 1)
            rolled = _tmap(lambda a: jnp.roll(a, -half, axis=1), pt)
            return CRV.jac_add(ops, pt, rolled)

        red = jax.lax.fori_loop(0, max(d.bit_length() - 1, 0), body, gath)
        return _tmap(lambda a: a[:, 0, :], red)     # (NL, W)

    return fn


def distributed_msm(curve, points_affine: list, scalars: list[int],
                    mesh: Mesh | None = None, axis: str = "x",
                    devices=None, c: int = 8, group: str = "g1"):
    """Same result as `ops.msm.msm`, points sharded over `mesh[axis]`.

    `devices` (legacy) builds a 1-D mesh when no Mesh is given."""
    if mesh is None:
        devs = list(devices) if devices else jax.devices()
        d = 1 << (len(devs).bit_length() - 1)       # pow2 device count
        mesh = Mesh(np.array(devs[:d]), (axis,))
    d = mesh.shape[axis]
    assert d & (d - 1) == 0, "mesh axis must be a power of two"

    fr = curve.fr
    n = len(scalars)
    assert n == len(points_affine) and n > 0
    windows = -(-fr.bits // c)
    if group == "g1":
        ops = CRV.FqOps(curve.fq)
        host_add = lambda a, b: CV.g1_add(curve, a, b)
        host_mul = lambda a, k: CV.g1_mul(curve, a, k)
    else:
        ops = CRV.Fq2Ops(curve.fq)
        host_add = lambda a, b: CV.g2_add(curve, a, b)
        host_mul = lambda a, k: CV.g2_mul(curve, a, k)

    # pad to d * chunk, chunk a power of two (zero scalars -> bucket 0,
    # excluded by the weighted reduce)
    chunk = -(-n // d)
    chunk = 1 << (chunk - 1).bit_length() if chunk > 1 else 1
    n2 = d * chunk
    points_affine = list(points_affine) + [points_affine[0]] * (n2 - n)
    scalars = list(scalars) + [0] * (n2 - n)

    digits = MSM._digits_host(scalars, c, windows)          # (W, n2)
    # per-shard local stable sort: shard s owns columns [s*chunk,(s+1)*chunk)
    dig3 = digits.reshape(windows, d, chunk)
    orders = np.argsort(dig3, axis=2, kind="stable").astype(np.int32)
    keys = np.take_along_axis(dig3, orders, axis=2).astype(np.int32)
    orders = orders.reshape(windows, n2)
    keys = keys.reshape(windows, n2)

    X = ops.encode([pt[0] for pt in points_affine])
    Y = ops.encode([pt[1] for pt in points_affine])

    pt_spec = _tmap(lambda _: P(None, axis), X)
    fn = _shard_msm_fn(ops, c, windows, d, axis)
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(pt_spec, pt_spec, P(None, axis), P(None, axis)),
        out_specs=_tmap(lambda _: P(), X),
        check_vma=False)   # replication holds post-all_gather+reduce but
                           # can't be statically inferred through fori_loop
    totals = sharded(X, Y, jnp.asarray(orders), jnp.asarray(keys))

    window_results = CRV.to_affine_host(ops, totals)        # (NL, W) coords
    acc = None
    for w in reversed(range(windows)):
        if acc is not None:
            acc = host_mul(acc, 1 << c)
        acc = host_add(acc, window_results[w])
    return acc
