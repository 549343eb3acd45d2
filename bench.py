"""Headline benchmark — runs on the real TPU chip (env: JAX_PLATFORMS=axon).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference Groth16 prover spends 11%
of 84.01 s in 7 FFTs over a ~2^20 domain (docs/perf.md:23-56, 10^6
constraints) => 9.24 s / 7 = 1.32 s per NTT => 0.757 NTT/s on the reference
CPU. Until the MSM/Groth16 path lands in bench, the headline is single-chip
2^20 NTT throughput over BLS12-381 Fr (the dominant kernel of both
Placeholder and Groth16 witness maps).
"""
import json
import sys
import time

import jax

BASELINE_NTT_PER_S = 7 / (84.01 * 0.11)  # reference: 7 FFTs in 9.24 s


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/zk_tpu_jax_cache_tpu")
    from crypto3_zk_tpu.fields import params as P
    from crypto3_zk_tpu.ops import limbs as L
    from crypto3_zk_tpu.ops.mxu_ntt import ntt_mxu

    fs = P.BLS12_381_FR
    log_n = 20
    n = 1 << log_n

    import numpy as np
    rng = np.random.default_rng(0)
    # uniform full-width field elements: every limb uniform in [0, 2^16),
    # top limb capped below p's top limb so all values stay < p
    x_np = rng.integers(0, 1 << 16, size=(fs.nl, n), dtype=np.uint32)
    top = int(fs.p >> (16 * (fs.nl - 1)))
    x_np[fs.nl - 1] = rng.integers(0, top, size=(n,), dtype=np.uint32)
    x = jax.numpy.asarray(x_np)

    # int8-MXU matmul NTT (ops/mxu_ntt.py): measured 4.1x the VPU
    # butterfly path on the same chip (9.5 vs 2.3 transforms/s @ 2^20)
    fwd = lambda a: ntt_mxu(fs, a)

    def sync(o):
        # block_until_ready does NOT reliably block through the axon tunnel;
        # a small device->host transfer forces completion of the chain.
        return np.asarray(o[:1, :1])

    # warmup / compile
    out = fwd(x)
    sync(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(out)
    sync(out)
    dt = (time.perf_counter() - t0) / iters

    value = 1.0 / dt
    print(json.dumps({
        "metric": f"ntt_bls12_381_fr_2^{log_n}_per_s",
        "value": round(value, 4),
        "unit": "transforms/s",
        "vs_baseline": round(value / BASELINE_NTT_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
