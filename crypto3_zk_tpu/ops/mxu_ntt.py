"""NTT on the MXU: block transforms as int8 matrix multiplication.

The radix-2 butterfly network (`ops/ntt.py`) runs on the VPU — u32 lane
math — and tops out on 32-bit-multiply throughput. The systolic array is an
order of magnitude denser, but it multiplies int8/bf16 tiles. This module
maps the NTT onto it:

- A length-M block transform is literally the matrix product W @ x with
  W[k, j] = w^{kj}: one (M x M) field matmul against a batch of columns.
- Field elements are decomposed into base-128 digit planes (7-bit digits in
  int8: products <= 127^2 and int32 accumulation over M <= 1024 columns plus
  ~40 diagonal merges stays < 2^30, no overflow). The digit-plane
  convolution becomes ND int8 matmuls with int32 accumulation — exactly the
  MXU's native contraction.
- The wide (|2 ND| plane) accumulator is reduced back to canonical
  Montgomery limbs by a tensorized Montgomery sweep (same lazy-carry
  technique as `limbs.mont_mul`, with NL+1 rounds because the unreduced
  value is C * p^2 ~ 2^520). The matrix is pre-scaled by 2^(16 (NL+1)) mod p
  so the sweep's 2^-16(NL+1) factor cancels and Montgomery form is
  preserved end to end.
- Large transforms use the four-step decomposition N = R * C (same index
  algebra as `parallel/ntt.py`): row transforms, twiddle scale, transpose,
  column transforms — every heavy op an MXU matmul or a fused VPU multiply.

Replaces the same reference surface as `ops/ntt.py`
(`r1cs_to_qap.hpp:229-310`; SURVEY.md §2.0 radix-2 FFT row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import FieldSpec
from . import limbs as L

DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def _n_digits(fs: FieldSpec) -> int:
    return -(-(fs.nl * 16) // DIGIT_BITS)


def _digitize_int(v: int, nd: int) -> list[int]:
    return [(v >> (DIGIT_BITS * j)) & DIGIT_MASK for j in range(nd)]


class MXUNttPlan:
    """Digit-plane DFT matrix + reduction constants for one (field, M)."""

    def __init__(self, fs: FieldSpec, log_m: int, inverse: bool):
        self.fs = fs
        self.log_m = log_m
        self.m = m = 1 << log_m
        self.inverse = inverse
        p = fs.p
        nd = _n_digits(fs)
        self.nd = nd
        self.rounds = fs.nl + 1          # Montgomery sweep depth
        omega = fs.root_of_unity(m)
        if inverse:
            omega = pow(omega, -1, p)
        # W'[k, j] = omega^(kj) * 2^(16 rounds) mod p, base-128 digit planes
        shift = pow(2, 16 * self.rounds, p)
        pows = np.empty(m, dtype=object)
        acc = 1
        for i in range(m):
            pows[i] = acc * shift % p
            acc = acc * omega % p
        kj = (np.outer(np.arange(m, dtype=np.int64),
                       np.arange(m, dtype=np.int64)) % m)
        ent = pows[kj].reshape(-1)        # (M*M,) python ints
        # bytes-vectorized digitization (a python loop over M^2 * ND digit
        # extractions would dominate plan build at M = 1024)
        nb = (fs.nl * 16) // 8 + 1
        raw = b"".join(int(v).to_bytes(nb, "little") for v in ent)
        u8 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, nb)
        u8 = np.concatenate([u8, np.zeros((u8.shape[0], 1), np.uint8)],
                            axis=1)
        cols = np.empty((nd, m * m), dtype=np.int8)
        for j in range(nd):
            pos = DIGIT_BITS * j
            a, s = pos // 8, pos % 8
            d = (u8[:, a].astype(np.uint16) >> s) \
                | (u8[:, a + 1].astype(np.uint16) << (8 - s))
            cols[j] = (d & DIGIT_MASK).astype(np.int8)
        self.w_digits = cols.reshape(nd, m, m)

    def __hash__(self):
        return hash((self.fs, self.log_m, self.inverse))

    def __eq__(self, o):
        return (isinstance(o, MXUNttPlan)
                and (self.fs, self.log_m, self.inverse)
                == (o.fs, o.log_m, o.inverse))

    def w_digits_dev(self) -> jnp.ndarray:
        """Device-resident copy, uploaded once (the 37 MB table must NOT be
        re-transferred per call — host->device over the TPU tunnel costs
        seconds)."""
        if not hasattr(self, "_w_dev"):
            self._w_dev = jnp.asarray(self.w_digits)
        return self._w_dev


@functools.lru_cache(maxsize=None)
def get_mxu_plan(fs: FieldSpec, log_m: int, inverse: bool) -> MXUNttPlan:
    return MXUNttPlan(fs, log_m, inverse)


def _decompose_digits(fs: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """(NL, ...) u32 16-bit limbs -> (ND, ...) int8 base-128 digits."""
    nd = _n_digits(fs)
    zero = jnp.zeros_like(x[:1])
    xp = jnp.concatenate([x, zero], axis=0)        # pad one limb
    planes = []
    for j in range(nd):
        pos = DIGIT_BITS * j
        a, s = pos // 16, pos % 16
        v = xp[a] >> s
        if s > 16 - DIGIT_BITS and a + 1 <= fs.nl:
            v = v | (xp[a + 1] << (16 - s))
        planes.append(v & DIGIT_MASK)
    return jnp.stack(planes).astype(jnp.int8)


def _mont_reduce_wide(fs: FieldSpec, planes: jnp.ndarray,
                      plane_bound: int) -> jnp.ndarray:
    """planes: (NP, ...) int32 base-128 digit sums of a value V < 2^(16 NL) *
    p; returns V * 2^(-16 (NL+1)) mod p as canonical (NL, ...) u32 limbs.

    Same lazy-carry discipline as `limbs.mont_mul`: pack the digit planes
    into 16-bit columns (kept lazy in u32), run NL+1 Montgomery rounds
    (resolve only column 0's carry), then one full sweep + cond-subtract."""
    nl = fs.nl
    rounds = nl + 1
    np_planes = planes.shape[0]
    bshape = planes.shape[1:]
    pad_batch = [(0, 0)] * len(bshape)
    db = plane_bound.bit_length()                  # per-plane digit bits

    # pack into 16-bit lazy columns DIRECTLY from the int32 plane sums:
    # column i = sum over planes j of bits [16i - 7j, 16i - 7j + 16) of
    # plane j. Each column is one fused elementwise sum of ~(16 + db)/7
    # masked shifts — no scatter, no intermediate fold pass. Column sums
    # stay < ceil((16+db)/7) * 2^16 < 2^20.
    pl32 = planes.astype(L.U32)
    nw = (DIGIT_BITS * (np_planes - 1) + db) // 16 + 2
    cols = []
    for i in range(nw):
        acc = None
        for j in range(np_planes):
            off = DIGIT_BITS * j - 16 * i          # plane j's bit offset
            if off >= 16 or off <= -db:
                continue
            if off >= 0:
                part = (pl32[j] & (L.MASK >> off)) << off
            else:
                part = (pl32[j] >> (-off)) & L.MASK
            acc = part if acc is None else acc + part
        cols.append(acc if acc is not None
                    else jnp.zeros(bshape, dtype=L.U32))
    t = jnp.stack(cols)

    # Montgomery rounds (mirrors limbs.mont_mul step 2, but the array
    # SHRINKS one column per round instead of padding — halves the traffic)
    ninv = L.U32(fs.ninv16)
    pl = jnp.asarray(fs.p_limbs, dtype=np.uint32).reshape(
        (nl,) + (1,) * len(bshape))
    for _ in range(rounds):
        w = t.shape[0]
        m = (t[0] * ninv) & L.MASK
        mp = m[None] * pl
        lo = mp & L.MASK
        hi = mp >> 16
        carry0 = (t[0] + lo[0]) >> 16
        rest = t[1:]
        rest = rest + jnp.pad(lo[1:], [(0, w - nl)] + pad_batch) \
                    + jnp.pad(hi, [(0, w - nl - 1)] + pad_batch)
        t = jnp.concatenate([(rest[0] + carry0)[None], rest[1:]], axis=0)

    # full carry sweep; value < 2p so columns beyond NL carry at most 1
    t = jnp.pad(t, [(0, max(0, nl + 1 - t.shape[0]))] + pad_batch)
    digits = []
    c = jnp.uint32(0)
    for j in range(nl):
        v = t[j] + c
        digits.append(v & L.MASK)
        c = v >> 16
    top = t[nl] + c
    return L._join(L._cond_sub_p(fs, digits, top))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _block_ntt(fs: FieldSpec, plan: MXUNttPlan, x: jnp.ndarray,
               w_digits: jnp.ndarray) -> jnp.ndarray:
    """x: (NL, M, B) Montgomery limbs; transform along axis 1 (length M).
    w_digits: (ND, M, M) int8. Returns (NL, M, B)."""
    nd = plan.nd
    m = plan.m
    xd = _decompose_digits(fs, x)                  # (ND, M, B) int8
    bshape = xd.shape[2:]

    np_planes = 2 * nd - 1
    acc = jnp.zeros((np_planes, m) + bshape, dtype=jnp.int32)
    for a in range(nd):
        # (M_out, ND, B) <- (M_out, M_j) @ (ND, M_j, B)
        part = jax.lax.dot_general(
            w_digits[a], xd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = jnp.moveaxis(part, 1, 0)            # (ND, M_out, B)
        acc = acc.at[a:a + nd].add(part)

    # per-plane bound: sum over M columns of 127^2, times <= ND diagonal
    # merges
    plane_bound = m * (DIGIT_MASK ** 2) * nd
    return _mont_reduce_wide(fs, acc, plane_bound)


def _four_step_twiddles(fs: FieldSpec, n: int, r: int, c: int,
                        inverse: bool) -> np.ndarray:
    """(NL, R, C) Montgomery table, entry [k2, cc] = w_N^(cc * k2) —
    vectorized host build (numpy object pow is too slow at 2^20)."""
    p = fs.p
    omega = fs.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    # row k2 = powers of omega^k2; build with two geometric passes
    step = np.empty(r, dtype=object)
    acc = 1
    for k2 in range(r):
        step[k2] = acc                              # omega^k2
        acc = acc * omega % p
    out = np.empty((r, c), dtype=object)
    cur = np.array([1] * r, dtype=object)
    for cc in range(c):
        out[:, cc] = cur
        cur = [cur[k2] * step[k2] % p for k2 in range(r)]
        cur = np.array(cur, dtype=object)
    vals = [int(v) * fs.R % p for v in out.reshape(-1)]
    arr = L.pack_ints(fs, vals)
    return np.asarray(arr).reshape(fs.nl, r, c)


@functools.lru_cache(maxsize=None)
def _four_step_tw_cached(fs: FieldSpec, n: int, r: int, c: int,
                         inverse: bool):
    if n > (1 << 20):
        # host object-int build is O(N) python bigint muls and the table is
        # O(N) bytes to ship through the device tunnel — generate on device
        return _four_step_tw_device(fs, n, r, c, inverse)
    return jnp.asarray(_four_step_twiddles(fs, n, r, c, inverse))


@functools.partial(jax.jit, static_argnums=(0, 3))
def _tw_device_scan(fs: FieldSpec, step: jnp.ndarray, ones: jnp.ndarray,
                    c: int) -> jnp.ndarray:
    """(NL, R) Montgomery powers step[k2]=w_N^k2 -> (NL, R, C) table with
    entry [k2, cc] = w_N^(cc*k2): a C-step geometric scan per row, run on
    device (each step is one (NL, R) mont_mul)."""

    def gen(cur, _):
        return L.mont_mul(fs, cur, step), cur

    _, cols = jax.lax.scan(gen, ones, None, length=c)   # (C, NL, R)
    return jnp.transpose(cols, (1, 2, 0))


def _four_step_tw_device(fs: FieldSpec, n: int, r: int, c: int,
                         inverse: bool) -> jnp.ndarray:
    p = fs.p
    omega = fs.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    pows, acc = [], 1
    for _ in range(r):                       # host: only R bigint muls
        pows.append(acc * fs.R % p)
        acc = acc * omega % p
    step = jnp.asarray(L.pack_ints(fs, pows))
    ones = jnp.asarray(L.pack_ints(fs, [fs.R % p] * r))
    return _tw_device_scan(fs, step, ones, c)


# largest single-block transform: plane_bound = M * 127^2 * ND must stay
# below int32 (M = 2^10, ND = 37 -> 6.1e8); and the (2ND-1, M, B) int32
# accumulator of a block call is capped at ~2^29 bytes by chunking the batch
_MAX_LOG_BLOCK = 10
_ACC_BYTES_CAP = 1 << 29


def _block_ntt_chunked(fs: FieldSpec, plan: MXUNttPlan,
                       x: jnp.ndarray) -> jnp.ndarray:
    """(NL, M, B) block transform with the batch axis chunked so the wide
    int32 accumulator stays under _ACC_BYTES_CAP (at 2^24 a single call
    would materialize a ~5 GB accumulator)."""
    w = plan.w_digits_dev()
    b = x.shape[2]
    np_planes = 2 * plan.nd - 1
    bmax = _ACC_BYTES_CAP // (np_planes * plan.m * 4)
    bmax = 1 << max(bmax.bit_length() - 1, 9)
    if b <= bmax:
        return _block_ntt(fs, plan, x, w)
    k = b // bmax
    xr = jnp.moveaxis(x.reshape(fs.nl, plan.m, k, bmax), 2, 0)
    out = jax.lax.map(lambda xc: _block_ntt(fs, plan, xc, w), xr)
    return jnp.moveaxis(out, 0, 2).reshape(fs.nl, plan.m, b)


def _ntt_axis1(fs: FieldSpec, x: jnp.ndarray, inverse: bool,
               log_block: int | None = None) -> jnp.ndarray:
    """(NL, M, B) -> (NL, M, B): natural-order NTT along axis 1. M <= 2^10
    is one MXU block matmul; larger M recurses four-step (M = R * C, C the
    block side), so any size reduces to int8 matmuls + twiddle mults."""
    m = x.shape[1]
    log_m = m.bit_length() - 1
    if log_m <= _MAX_LOG_BLOCK and log_block is None:
        plan = get_mxu_plan(fs, log_m, inverse)
        return _block_ntt_chunked(fs, plan, x)
    log_c = log_block if log_block is not None \
        else min((log_m + 1) // 2, _MAX_LOG_BLOCK)
    log_r = log_m - log_c
    r, c = 1 << log_r, 1 << log_c
    nl = fs.nl
    b = x.shape[2]

    tw = _four_step_tw_cached(fs, m, r, c, inverse)
    # step 1: size-R transforms over rows (batch c*b)
    a = _ntt_axis1(fs, x.reshape(nl, r, c * b), inverse)
    # step 2: twiddle w_M^(cc * k2), broadcast over the caller batch
    a = L.mont_mul(fs, a.reshape(nl, r, c, b), tw[..., None])
    # steps 3+4: size-C transforms along c (batch r*b)
    a = jnp.swapaxes(a, 1, 2)                       # (NL, C, R, B)
    a = _ntt_axis1(fs, a.reshape(nl, c, r * b), inverse)
    # output O[k1, k2] -> X[k1 * R + k2]
    return a.reshape(nl, m, b)


def ntt_mxu(fs: FieldSpec, x: jnp.ndarray, inverse: bool = False,
            log_block: int | None = None) -> jnp.ndarray:
    """(NL, N) -> (NL, N), natural order both ways, Montgomery form.
    Recursive four-step N = R * C with every factor an MXU block matmul.
    Matches `ops/ntt.py::ntt` bit-exactly (same 1/N scaling on inverse)."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    out = _ntt_axis1(fs, x.reshape(fs.nl, n, 1), inverse,
                     log_block).reshape(fs.nl, n)
    if inverse:
        out = L.mont_mul(fs, out, L.const_mont(fs, pow(n, -1, fs.p),
                                               (1,)))
    return out
