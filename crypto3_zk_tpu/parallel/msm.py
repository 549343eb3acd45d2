"""Multi-device MSM: bucket-parallel Pippenger with per-device partitions.

SURVEY.md §2.7: "shard FRI queries / MSM points / NTT rows across chips with
pjit + shard_map; this is the primary axis". Points are partitioned across
the devices of a mesh; each device runs the full window/bucket pipeline of
`ops/msm.py` on its partition (dispatch is asynchronous, so partitions
execute concurrently), and the per-window partial sums are point-added —
the collective-reduction step (a psum over EC points is a fold of the same
Jacobian adds; at partition counts ~ device counts the host fold is
negligible next to the per-device scans).
"""
from __future__ import annotations

import jax

from ..fields import curves as CV
from ..ops import msm as MSM


def distributed_msm(curve, points_affine: list, scalars: list[int],
                    devices=None, c: int = 16, group: str = "g1"):
    """Returns the same result as `ops.msm.msm` with work split across
    devices."""
    devices = devices or jax.devices()
    d = max(1, min(len(devices), len(points_affine) // 2))
    n = len(points_affine)
    chunk = -(-n // d)

    # NOTE: placement is via device_put-committed inputs (computation
    # follows data), NOT jax.default_device contexts — persistent-cache
    # writes of executables compiled under a default_device context
    # segfault on this jax build (compilation_cache
    # put_executable_and_time; reproduced twice).
    partials = []
    for i in range(d):
        lo, hi = i * chunk, min((i + 1) * chunk, n)
        if lo >= hi:
            break
        if hi - lo < 32:
            # tiny partitions aren't worth a per-device executable
            partials.append(MSM.msm_host(curve, points_affine[lo:hi],
                                         scalars[lo:hi], group=group))
        else:
            partials.append(MSM.msm(curve, points_affine[lo:hi],
                                    scalars[lo:hi], c=c, group=group,
                                    device=devices[i]))

    add = CV.g1_add if group == "g1" else CV.g2_add
    acc = None
    for ptl in partials:
        acc = add(curve, acc, ptl)
    return acc
