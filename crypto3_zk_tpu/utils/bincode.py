"""Byte-exact (de)serialization of field and curve elements — the
`nil::marshalling::bincode::curve<bls12<381>>` format consumed by the
reference's ipp2 transcript (`ipp2/transcript.hpp:50-118`) and TVM
marshalling (`r1cs_gg_ppzksnark/marshalling.hpp:98-898`), pinned by the
hardcoded bellperson vectors in
`r1cs_gg_ppzksnark_aggregation_conformity.cpp:932-1062` (bls381_transcript_
test):

- Fr / Fq / Fq12 field elements: fixed-width LITTLE-endian byteblobs,
  Fq12 coefficients in declaration order c0.c0.c0, c0.c0.c1, ..., c1.c2.c1.
- G1: 48-byte ZCash-style compressed point — big-endian x with flag bits
  in the top byte (0x80 compressed, 0x40 infinity, 0x20 lexicographically
  largest y).
- G2: 96 bytes — x.c1 first then x.c0, flags on the first byte, sort on
  (y.c1, y.c0).

Deserialization validates curve membership AND r-subgroup order (the
reference's `octets_to_g1_point` plus the verifier's `is_well_formed`
gate; off-curve or wrong-subgroup input raises ValueError — invalid-curve
attack surface).
"""
from __future__ import annotations

from ..fields import curves as CV

_F_COMPRESSED = 0x80
_F_INFINITY = 0x40
_F_SORT = 0x20


def _fq_nb(curve) -> int:
    return (curve.fq.bits + 7) // 8


def _fr_nb(curve) -> int:
    return (curve.fr.bits + 7) // 8


# --- field elements (little-endian) ----------------------------------------

def fr_to_bytes(curve, v: int) -> bytes:
    return (v % curve.fr.p).to_bytes(_fr_nb(curve), "little")


def fr_from_bytes(curve, b: bytes) -> int:
    v = int.from_bytes(b, "little")
    if v >= curve.fr.p:
        raise ValueError("fr out of range")
    return v


def fq_to_bytes(curve, v: int) -> bytes:
    return (v % curve.fq.p).to_bytes(_fq_nb(curve), "little")


def fq12_to_bytes(curve, x) -> bytes:
    out = []
    for c6 in x:
        for c2 in c6:
            for c in c2:
                out.append(fq_to_bytes(curve, c))
    return b"".join(out)


def fq12_from_bytes(curve, b: bytes):
    nb = _fq_nb(curve)
    if len(b) != 12 * nb:
        raise ValueError("bad gt blob size")
    vals = []
    for i in range(12):
        v = int.from_bytes(b[i * nb:(i + 1) * nb], "little")
        if v >= curve.fq.p:
            raise ValueError("fq out of range")
        vals.append(v)
    return (((vals[0], vals[1]), (vals[2], vals[3]), (vals[4], vals[5])),
            ((vals[6], vals[7]), (vals[8], vals[9]), (vals[10], vals[11])))


# --- compressed points -------------------------------------------------------

def _y_is_largest(p: int, y: int) -> bool:
    return y > (p - 1) // 2


def g1_to_bytes(curve, pt) -> bytes:
    nb = _fq_nb(curve)
    if pt is None:
        out = bytearray(nb)
        out[0] = _F_COMPRESSED | _F_INFINITY
        return bytes(out)
    x, y = pt
    out = bytearray(x.to_bytes(nb, "big"))
    out[0] |= _F_COMPRESSED
    if _y_is_largest(curve.fq.p, y):
        out[0] |= _F_SORT
    return bytes(out)


def g1_from_bytes(curve, b: bytes):
    nb = _fq_nb(curve)
    if len(b) != nb:
        raise ValueError("bad g1 blob size")
    flags = b[0]
    if not flags & _F_COMPRESSED:
        raise ValueError("uncompressed g1 not supported")
    if flags & _F_INFINITY:
        return None
    x = int.from_bytes(bytes([b[0] & 0x1F]) + b[1:], "big")
    p = curve.fq.p
    if x >= p:
        raise ValueError("g1 x out of range")
    y2 = (x * x * x + curve.b) % p
    y = CV.sqrt_fq(curve, y2)
    if y is None:
        raise ValueError("g1 x not on curve")
    if bool(flags & _F_SORT) != _y_is_largest(p, y):
        y = (-y) % p
    pt = (x, y)
    if not CV.g1_well_formed(curve, pt):
        raise ValueError("g1 point not in r-subgroup")
    return pt


def g2_to_bytes(curve, pt) -> bytes:
    nb = _fq_nb(curve)
    if pt is None:
        out = bytearray(2 * nb)
        out[0] = _F_COMPRESSED | _F_INFINITY
        return bytes(out)
    (x0, x1), (y0, y1) = pt
    out = bytearray(x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big"))
    out[0] |= _F_COMPRESSED
    if (y1, y0) > (0, 0) and _y2_is_largest(curve.fq.p, (y0, y1)):
        out[0] |= _F_SORT
    return bytes(out)


def _y2_is_largest(p: int, y) -> bool:
    """Lexicographic order on (c1, c0) per ZCash spec."""
    y0, y1 = y
    ny0, ny1 = (-y0) % p, (-y1) % p
    return (y1, y0) > (ny1, ny0)


def g2_from_bytes(curve, b: bytes):
    nb = _fq_nb(curve)
    if len(b) != 2 * nb:
        raise ValueError("bad g2 blob size")
    flags = b[0]
    if not flags & _F_COMPRESSED:
        raise ValueError("uncompressed g2 not supported")
    if flags & _F_INFINITY:
        return None
    p = curve.fq.p
    x1 = int.from_bytes(bytes([b[0] & 0x1F]) + b[1:nb], "big")
    x0 = int.from_bytes(b[nb:], "big")
    if x0 >= p or x1 >= p:
        raise ValueError("g2 x out of range")
    y = CV.g2_y_from_x(curve, (x0, x1))
    if y is None:
        raise ValueError("g2 x not on curve")
    if bool(flags & _F_SORT) != _y2_is_largest(p, y):
        y = ((-y[0]) % p, (-y[1]) % p)
    pt = ((x0, x1), y)
    if not CV.g2_well_formed(curve, pt):
        raise ValueError("g2 point not in r-subgroup")
    return pt


# --- std::size_t (TVM marshalling; 4-byte big-endian,
#     `marshalling.hpp:975-985`) ---------------------------------------------

def size_to_bytes(n: int) -> bytes:
    return int(n).to_bytes(4, "big")


def size_from_bytes(b: bytes) -> int:
    return int.from_bytes(b[:4], "big")
