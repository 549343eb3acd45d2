"""Distributed NTT over a device mesh (four-step algorithm + all_to_all).

The reference scales its FFTs only via OpenMP loops (`r1cs_to_qap.hpp:256-318`,
SURVEY.md §2.7); here the long dimension is shard-parallelized the TPU way
(the Ulysses-style all-to-all analogue called out in SURVEY.md §2.7).

With N = R*C, n = r*C + c, k = k1*R + k2:

    X[k1*R + k2] = NTT_C over c { w_N^(c*k2) * NTT_R over r { x[r*C + c] } }

so on a 1-D mesh sharding the c axis:

  1. local size-R NTTs along rows r      (C/D columns per device)
  2. local twiddle scaling by w_N^(c*k2)
  3. all_to_all over ICI: shard k2, assemble full c per device
  4. local size-C NTTs along c

The per-shard compute reuses the single-chip kernels in `ops/ntt.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..fields.params import FieldSpec
from ..ops import limbs as L
from ..ops import ntt as NTT


def _twiddle_block(fs: FieldSpec, n: int, rows: int,
                   col_start: int, cols: int, inverse: bool) -> np.ndarray:
    """Montgomery-form w_N^(col*row) block: shape (NL, rows, cols), entry
    [k2, j] = w_N^((col_start + j) * k2)."""
    p = fs.p
    omega = fs.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    vals = []
    for k2 in range(rows):
        base = pow(omega, k2, p)
        acc = pow(base, col_start, p)
        for _ in range(cols):
            vals.append(acc * fs.R % p)
            acc = acc * base % p
    arr = L.pack_ints(fs, vals)
    return arr.reshape(fs.nl, rows, cols)


def distributed_ntt(fs: FieldSpec, x: jnp.ndarray, mesh: Mesh,
                    axis: str = "x", inverse: bool = False) -> jnp.ndarray:
    """x: (NL, N) coefficients in natural order -> evaluations in natural
    order (sharded internally; returned as a global array)."""
    n = x.shape[-1]
    d = mesh.shape[axis]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    log_c = max((log_n + 1) // 2, (d - 1).bit_length())
    assert log_c <= log_n
    c_total = 1 << log_c
    r_total = n // c_total
    assert c_total % d == 0 and r_total % d == 0, \
        "need D | C and D | R for the all_to_all transpose"
    c_loc = c_total // d

    p = fs.p

    a = x.reshape(fs.nl, r_total, c_total)  # A[r, c] = x[r*C + c]

    tw = np.stack([
        _twiddle_block(fs, n, r_total, dev * c_loc, c_loc, inverse)
        for dev in range(d)
    ])  # (D, NL, R, C_loc)

    def local_step(a_blk, tw_blk):
        tw_blk = tw_blk[0]  # shard_map keeps the sharded axis (size 1)
        # a_blk: (NL, R, C_loc); step 1: size-R NTT along axis 1
        blk = jnp.swapaxes(a_blk, 1, 2)                 # (NL, C_loc, R)
        blk = NTT.ntt_raw(fs, blk, inverse)
        blk = jnp.swapaxes(blk, 1, 2)                   # (NL, k2=R, C_loc)
        # step 2: twiddles w_N^(c * k2)
        blk = L.mont_mul(fs, blk, tw_blk)
        # step 3: all_to_all — shard k2, gather full c
        blk = jax.lax.all_to_all(blk, axis, split_axis=1, concat_axis=2,
                                 tiled=True)            # (NL, R/D, C)
        # step 4: size-C NTT along c
        blk = NTT.ntt_raw(fs, blk, inverse)             # (NL, R/D, k1=C)
        return blk

    f = shard_map(local_step, mesh=mesh,
                  in_specs=(P(None, None, axis), P(axis, None, None, None)),
                  out_specs=P(None, axis, None),
                  check_vma=False)
    out = f(a, jnp.asarray(tw))          # O[k2, k1] = X[k1*R + k2]
    out = jnp.swapaxes(out, 1, 2).reshape(fs.nl, n)
    if inverse:
        out = L.mont_mul(fs, out, L.const_mont(fs, pow(n, -1, p), (1,)))
    return out
