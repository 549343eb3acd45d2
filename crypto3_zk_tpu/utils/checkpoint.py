"""Checkpoint/resume for long-running proving jobs.

SURVEY.md §5 checkpoint row: the reference has no runtime checkpointing
(its persistence is marshalling only); the TPU framework adds orbax-style
checkpointing of intermediate state so 2^24-scale MSM/NTT jobs survive
preemption and resume deterministically. Device arrays round-trip through
numpy `.npz` files; scalar/host state through JSON.
"""
from __future__ import annotations

import json
import os

import numpy as np


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _paths(self, step: int | str):
        base = os.path.join(self.directory, f"ckpt_{step}")
        return base + ".npz", base + ".json"

    def save(self, step: int | str, arrays: dict | None = None,
             meta: dict | None = None) -> None:
        npz, js = self._paths(step)
        if arrays:
            np.savez(npz + ".tmp.npz",
                     **{k: np.asarray(v) for k, v in arrays.items()})
            os.replace(npz + ".tmp.npz", npz)    # atomic publish
        elif os.path.exists(npz):
            # drop any stale array blob from a previous save at this step so
            # load() can never pair old arrays with the new meta
            os.remove(npz)
        with open(js + ".tmp", "w") as f:
            json.dump(meta or {}, f)
        os.replace(js + ".tmp", js)

    def load(self, step: int | str):
        npz, js = self._paths(step)
        if not os.path.exists(js):
            return None
        with open(js) as f:
            meta = json.load(f)
        arrays = {}
        if os.path.exists(npz):
            with np.load(npz) as data:
                arrays = {k: data[k] for k in data.files}
        return arrays, meta

    def latest(self) -> int | None:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("ckpt_") and name.endswith(".json"):
                tag = name[len("ckpt_"):-len(".json")]
                if tag.isdigit():
                    steps.append(int(tag))
        return max(steps) if steps else None


def msm_checkpointed(curve, points_affine, scalars, ckpt_dir: str,
                     c: int = 8, group: str = "g1"):
    """Resumable MSM: each window's reduced point is checkpointed, so a
    preempted 2^24-point job resumes at the last finished window instead
    of restarting (SURVEY.md §5 "checkpoint long MSM/NTT jobs per shard;
    deterministic re-execution")."""
    from ..fields import curves as CV
    from ..ops import curve as CRV
    from ..ops.msm import _digits_host, _msm_window_dev
    import jax.numpy as jnp

    fr = curve.fr
    n = len(scalars)
    windows = -(-fr.bits // c)
    mgr = CheckpointManager(ckpt_dir)

    if group == "g1":
        ops = CRV.FqOps(curve.fq)
        host_add = lambda a, b: CV.g1_add(curve, a, b)
        host_mul = lambda a, k: CV.g1_mul(curve, a, k)
    else:
        ops = CRV.Fq2Ops(curve.fq)
        host_add = lambda a, b: CV.g2_add(curve, a, b)
        host_mul = lambda a, k: CV.g2_mul(curve, a, k)

    digits = _digits_host(scalars, c, windows)
    X = ops.encode([pt[0] for pt in points_affine])
    Y = ops.encode([pt[1] for pt in points_affine])
    Z = ops.ones((n,))

    start = 0
    results: list = []
    ck = mgr.load("msm")
    if ck is not None and ck[1].get("n") == n and ck[1].get("c") == c:
        results = [_decode_pt(r) for r in ck[1]["window_results"]]
        start = len(results)

    for w in range(start, windows):
        dw = jnp.asarray(digits[w].astype(np.int32))
        total = _msm_window_dev(ops, (X, Y, Z), dw, c)
        results.append(CRV.to_affine_host(ops, total)[0])
        mgr.save("msm", meta={
            "n": n, "c": c,
            "window_results": [_encode_pt(r) for r in results]})

    acc = None
    for w in reversed(range(windows)):
        if acc is not None:
            acc = host_mul(acc, 1 << c)
        acc = host_add(acc, results[w])
    return acc


def _encode_pt(pt):
    if pt is None:
        return "inf"

    def enc(v):
        if isinstance(v, (list, tuple)):
            return [enc(x) for x in v]
        return str(v)
    return enc(list(pt))


def _decode_pt(v):
    if v == "inf" or v is None:
        return None

    def dec(x):
        if isinstance(x, list):
            return tuple(dec(e) for e in x)
        return int(x)
    return dec(v)
