"""Per-kernel throughput metrics against speed-of-light.

SURVEY.md §5 observability row: the reference logs wall-clock prints only;
the TPU framework records structured per-kernel counters — useful work
(field muls), bytes moved, achieved rate, and the roofline fraction — so a
regression shows up as a number, not a feeling. Registered kernels report
through `record()`; `summary()` yields the table.
"""
from __future__ import annotations

import dataclasses
import time

# Rough single-chip ceilings, overridable per deployment (TPU v5e defaults:
# int8 MXU TOPS and HBM bandwidth; field-mul rate assumes the ~350-u32-op
# tensorized Montgomery multiply on the VPU).
CHIP = {
    "hbm_bytes_per_s": 800e9,
    "int8_macs_per_s": 394e12,
    "u32_ops_per_s": 50e12,
}


@dataclasses.dataclass
class KernelRecord:
    name: str
    seconds: float
    field_muls: int = 0
    bytes_moved: int = 0

    @property
    def mul_rate(self) -> float:
        return self.field_muls / self.seconds if self.seconds else 0.0

    @property
    def roofline_fraction(self) -> float:
        """Achieved / attainable under the tighter of the compute and
        memory ceilings (field mul ~ 350 u32 ops)."""
        if not self.seconds:
            return 0.0
        t_compute = self.field_muls * 350 / CHIP["u32_ops_per_s"]
        t_memory = self.bytes_moved / CHIP["hbm_bytes_per_s"]
        attainable = max(t_compute, t_memory)
        return attainable / self.seconds if attainable else 0.0


_records: list[KernelRecord] = []


def record(name: str, seconds: float, field_muls: int = 0,
           bytes_moved: int = 0) -> KernelRecord:
    r = KernelRecord(name, seconds, field_muls, bytes_moved)
    _records.append(r)
    return r


class timed_kernel:
    """with timed_kernel("ntt_2^20", field_muls=..., bytes_moved=...):"""

    def __init__(self, name: str, field_muls: int = 0, bytes_moved: int = 0):
        self.name = name
        self.field_muls = field_muls
        self.bytes_moved = bytes_moved

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        record(self.name, time.perf_counter() - self._t0,
               self.field_muls, self.bytes_moved)
        return False


def ntt_cost(n: int, nl: int) -> tuple[int, int]:
    """(field_muls, bytes) for one radix-2 NTT of size n over NL limbs."""
    import math
    log_n = int(math.log2(n))
    return (n // 2) * log_n, 2 * log_n * n * nl * 4


def msm_cost(n: int, c: int, bits: int) -> tuple[int, int]:
    """(field_muls, bytes) for Pippenger: ~2 adds per point per window,
    16 field muls per Jacobian add."""
    windows = -(-bits // c)
    adds = 2 * n * windows
    return adds * 16, adds * 3 * (bits // 16) * 4


def summary() -> list[dict]:
    return [{
        "kernel": r.name,
        "seconds": round(r.seconds, 4),
        "field_muls": r.field_muls,
        "mul_per_s": round(r.mul_rate, 1),
        "roofline_fraction": round(r.roofline_fraction, 4),
    } for r in _records]


def reset() -> None:
    _records.clear()
