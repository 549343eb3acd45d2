"""Deterministic field-to-curve map (BW19 conic map, Mina flavor).

`systems/plonk/pickles/detail/mapping.hpp` `group_map`: precompute u (the
smallest field element with f(u) = u^3 + a u + b != 0), then for an input t
derive three candidate x-coordinates and return the first whose curve
equation is a square. Used by kimchi_pedersen's `to_group` when deriving
blinding/shift points from challenges. Host-side (tiny, verifier-side).
"""
from __future__ import annotations

from .params import FieldSpec


class GroupMap:
    def __init__(self, fs: FieldSpec, a: int, b: int):
        self.fs = fs
        self.a = a % fs.p
        self.b = b % fs.p
        p = fs.p
        u = 1
        while self._curve_eqn(u) == 0:
            u += 1
        self.u = u
        self.fu = self._curve_eqn(u)
        three_u2 = 3 * u * u % p
        self.inv_three_u_squared = pow(three_u2, -1, p)
        self.sqrt_neg_three_u_squared = self._sqrt((-three_u2) % p)
        self.sqrt_neg_three_u_squared_minus_u_over_2 = (
            (self.sqrt_neg_three_u_squared - u)
            * pow(2, -1, p)) % p

    def _curve_eqn(self, x: int) -> int:
        p = self.fs.p
        return (x * x % p * x + self.a * x + self.b) % p

    def _sqrt(self, v: int) -> int:
        from .field import Fp
        return Fp(self.fs, v).sqrt().v

    def _is_square(self, v: int) -> bool:
        p = self.fs.p
        return v == 0 or pow(v, (p - 1) // 2, p) == 1

    def potential_xs(self, t: int) -> tuple[int, int, int]:
        p = self.fs.p
        t = t % p
        t2 = t * t % p
        alpha = pow((t2 + self.fu) * t2 % p, -1, p)
        x1 = (self.sqrt_neg_three_u_squared_minus_u_over_2
              - t2 * t2 % p * alpha % p * self.sqrt_neg_three_u_squared) % p
        x2 = (-self.u - x1) % p
        t2_plus_fu = (t2 + self.fu) % p
        x3 = (self.u - t2_plus_fu * t2_plus_fu % p * alpha % p
              * t2_plus_fu % p * self.inv_three_u_squared) % p
        return (x1, x2, x3)

    def to_group(self, t: int) -> tuple[int, int] | None:
        """First candidate x with square f(x); y is the principal root."""
        for x in self.potential_xs(t):
            fx = self._curve_eqn(x)
            if self._is_square(fx):
                return (x, self._sqrt(fx))
        return None
