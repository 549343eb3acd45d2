"""Vectorized SHA-256 compression on device.

The reference hashes byte-Merkle leaves with scalar sha2 (host C++); here
the compression function runs as batched uint32 lane math on the VPU — one
`lax.scan` over the 64 rounds, thousands of independent messages per call.
Used for byte-hash (sha2) Merkle tree levels; matches hashlib bit-exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
               dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


@jax.jit
def sha256_batch_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """blocks: (N, n_blocks, 16) uint32 big-endian words of PADDED messages.
    Returns digests (N, 8) uint32.

    Both the 64 rounds and the message schedule run as ONE `lax.scan` with a
    rolling 16-word window (the schedule recurrence only ever looks back 16
    words), so the compiled graph is a single small round body — not a
    64-way unroll — and batches N messages across VPU lanes."""
    n = blocks.shape[0]
    state = jnp.broadcast_to(jnp.asarray(_H0), (n, 8)).T  # (8, N)
    ks = jnp.asarray(_K)

    def compress(state, block16):
        # block16: (16, N); carry the live schedule window and roll it
        def round_fn(carry, k):
            st, win = carry
            a, b, c, d, e, f, g, h = st
            w = win[0]
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + k + w
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            st2 = jnp.stack([t1 + s0 + maj, a, b, c, d + t1, e, f, g])
            # schedule: w16 = w0 + s0(w1) + w9 + s1(w14); unused past round 48
            ws0 = _rotr(win[1], 7) ^ _rotr(win[1], 18) ^ (win[1] >> 3)
            ws1 = _rotr(win[14], 17) ^ _rotr(win[14], 19) ^ (win[14] >> 10)
            w16 = win[0] + ws0 + win[9] + ws1
            win2 = jnp.roll(win, -1, axis=0).at[15].set(w16)
            return (st2, win2), None

        (st, _), _ = jax.lax.scan(round_fn, (state, block16), ks)
        return state + st

    def block_step(state, block16):
        return compress(state, block16), None

    state, _ = jax.lax.scan(block_step, state,
                            jnp.transpose(blocks, (1, 2, 0)))
    return state.T


def _pad_messages(messages_np: np.ndarray) -> tuple[np.ndarray, int]:
    """messages_np: (N, L) uint8, equal length L. Returns padded word
    blocks (N, n_blocks, 16) uint32."""
    n, length = messages_np.shape
    bitlen = length * 8
    padded_len = ((length + 8) // 64 + 1) * 64
    buf = np.zeros((n, padded_len), dtype=np.uint8)
    buf[:, :length] = messages_np
    buf[:, length] = 0x80
    lenb = np.frombuffer(np.uint64(bitlen).byteswap().tobytes(),
                         dtype=np.uint8)
    buf[:, -8:] = lenb
    words = buf.reshape(n, -1, 4)
    w32 = (words[..., 0].astype(np.uint32) << 24) \
        | (words[..., 1].astype(np.uint32) << 16) \
        | (words[..., 2].astype(np.uint32) << 8) \
        | words[..., 3].astype(np.uint32)
    return w32.reshape(n, -1, 16), padded_len // 64


def sha256_many(messages: list[bytes]) -> list[bytes]:
    """Batched SHA-256 of equal-length messages on device."""
    assert messages
    length = len(messages[0])
    assert all(len(m) == length for m in messages)
    arr = np.frombuffer(b"".join(messages),
                        dtype=np.uint8).reshape(len(messages), length)
    blocks, _ = _pad_messages(arr)
    digests = np.asarray(sha256_batch_blocks(jnp.asarray(blocks)))
    out = []
    for row in digests:
        out.append(b"".join(int(v).to_bytes(4, "big") for v in row))
    return out
