"""Scale LPC prove/verify at d >= 2^22, lambda = 40 — the TPU counterpart
of the reference's perf harness `test/commitment/lpc_performance.cpp:122-386`
(one random polynomial, one evaluation point at the multiplicative
generator, step_list of 3s, m = 2).

Differences from the reference harness, both deliberate:
- merkle/transcript hash defaults to Poseidon (device-resident hashing;
  the reference uses keccak which is host-sequential — pass --keccak for
  the byte-hash path),
- the commit phase checkpoints through `utils/checkpoint.CheckpointManager`
  so a preempted run resumes without recomputing the 2^24-point NTT +
  Merkle tree (--simulate-preemption exits after the commit checkpoint;
  rerunning the same command resumes and completes the proof).

Usage:
  python benchmarks/scale_lpc.py --degree-log 22 [--ckpt-dir DIR]
      [--simulate-preemption] [--keccak]

Prints one JSON line per phase and a final summary (wall times + peak RSS),
for SCALE.md.
"""
import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rand_poly_values(fs, n, seed=11):
    """(NL, n) uint32 16-bit limb planes of uniform-ish field elements."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 1 << 16, size=(fs.nl, n), dtype=np.uint32)
    top = int(fs.p >> (16 * (fs.nl - 1)))
    x[fs.nl - 1] = rng.integers(0, top, size=(n,), dtype=np.uint32)
    return x


def peak_rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--degree-log", type=int, default=22)
    ap.add_argument("--lambda", dest="lambda_", type=int, default=40)
    ap.add_argument("--ckpt-dir", default="/tmp/zk_scale_lpc_ckpt")
    ap.add_argument("--simulate-preemption", action="store_true")
    ap.add_argument("--keccak", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/zk_tpu_jax_cache_tpu" if not args.cpu
                      else "/tmp/zk_tpu_jax_cache")
    import jax.numpy as jnp

    from crypto3_zk_tpu.commitments import fri as FRI
    from crypto3_zk_tpu.commitments.lpc import LPCScheme
    from crypto3_zk_tpu.commitments.merkle import MerkleTree, make_hasher
    from crypto3_zk_tpu.fields import params as P
    from crypto3_zk_tpu.ops import limbs as L
    from crypto3_zk_tpu.poly.polynomial import PolyDFS
    from crypto3_zk_tpu.transcript.fiat_shamir import Transcript
    from crypto3_zk_tpu.utils.checkpoint import CheckpointManager

    fs = P.BLS12_381_FR
    dlog = args.degree_log
    merkle = "keccak_256" if args.keccak else "poseidon"
    # steps of 3 (lpc_performance step_list_3 suite), last round = 1,
    # summing to degree_log - 1 folds
    body, rem = divmod(dlog - 2, 3)
    steps = [3] * body + ([rem] if rem else []) + [1]
    params = FRI.FRIParams.build(fs, degree_log=dlog, expand_factor=2,
                                 lambda_=args.lambda_, step_list=steps,
                                 merkle_hash=merkle)
    ckpt = CheckpointManager(args.ckpt_dir)
    phases = {}
    print(json.dumps({"phase": "params", "d": 1 << dlog,
                      "D0": params.D[0].n, "lambda": args.lambda_,
                      "steps": steps, "merkle": merkle,
                      "devices": [str(d) for d in jax.devices()]}),
          flush=True)

    # --- poly + commit (checkpointed) ------------------------------------
    eval_point = fs.generator                     # lpc_performance.cpp:197
    scheme = LPCScheme(params)
    saved = ckpt.load("commit")
    if saved is not None and saved[1].get("dlog") == dlog \
            and saved[1].get("merkle") == merkle:
        arrays, meta = saved
        t0 = time.time()
        poly = PolyDFS(fs, jnp.asarray(arrays["poly_v"]), (1 << dlog) - 1)
        scheme._polys[0] = [poly]
        scheme.state_commited(0)
        if "leaf_digests" in arrays:
            values = jnp.asarray(arrays["values"])
            hasher = make_hasher(fs, merkle)
            tree = MerkleTree.from_leaf_digests_dev(
                hasher, jnp.asarray(arrays["leaf_digests"]))
            scheme._trees[0] = FRI.Precommitment(
                tree, values, params.D[0].n, params.step_list[0])
        else:                       # tiny tree took the host-hash path
            scheme._trees[0] = FRI.precommit(
                [poly], params.D[0], params.step_list[0], params)
        # the rebuilt root is validated below by verify_eval
        phases["resume_load"] = time.time() - t0
        print(json.dumps({"phase": "resume", "load_s":
                          round(phases["resume_load"], 2)}), flush=True)
    else:
        t0 = time.time()
        vals = rand_poly_values(fs, 1 << dlog)
        poly = PolyDFS(fs, jnp.asarray(vals), (1 << dlog) - 1)
        phases["build"] = time.time() - t0

        t0 = time.time()
        scheme.append_to_batch(0, [poly])
        root = scheme.commit(0)
        pre = scheme._trees[0]
        jax.block_until_ready(pre.values)
        if pre.tree.levels_dev is not None:
            np.asarray(pre.tree.levels_dev[0][:1, :1])  # force completion
        phases["commit"] = time.time() - t0
        print(json.dumps({"phase": "commit",
                          "build_s": round(phases["build"], 2),
                          "commit_s": round(phases["commit"], 2)}),
              flush=True)

        t0 = time.time()
        arrays = {"poly_v": np.asarray(poly.v)}
        if pre.tree.levels_dev is not None:
            arrays["values"] = np.asarray(pre.values)
            arrays["leaf_digests"] = np.asarray(pre.tree.levels_dev[0])
        ckpt.save("commit", arrays=arrays,
                  meta={"dlog": dlog, "merkle": merkle})
        phases["checkpoint"] = time.time() - t0
        print(json.dumps({"phase": "checkpoint",
                          "save_s": round(phases["checkpoint"], 2)}),
              flush=True)
        if args.simulate_preemption:
            print(json.dumps({"phase": "preempted", "resume_with":
                              "same command without --simulate-preemption"}),
                  flush=True)
            return

    # --- prove ------------------------------------------------------------
    scheme.append_eval_point(0, eval_point)
    seed = b"\x00" * 96
    t0 = time.time()
    tr = Transcript("keccak_256", seed)
    proof = scheme.proof_eval(tr)
    phases["prove"] = time.time() - t0
    print(json.dumps({"phase": "prove", "prove_s":
                      round(phases["prove"], 2)}), flush=True)

    # --- verify (host) ------------------------------------------------------
    t0 = time.time()
    ver = LPCScheme(params)
    ver.set_batch_size(0, 1)
    ver.append_eval_point(0, eval_point)
    tv = Transcript("keccak_256", seed)
    ok = ver.verify_eval(proof, {0: scheme._trees[0].root()}, tv)
    phases["verify"] = time.time() - t0
    assert ok, "scale LPC proof REJECTED"
    assert tr.challenge(fs) == tv.challenge(fs), "transcript divergence"

    print(json.dumps({
        "metric": f"lpc_prove_2^{dlog}_lambda{args.lambda_}_s",
        "value": round(phases["prove"], 2), "unit": "s",
        "phases_s": {k: round(v, 2) for k, v in phases.items()},
        "peak_rss_mb": round(peak_rss_mb(), 1),
        "verified": ok}), flush=True)


if __name__ == "__main__":
    main()
