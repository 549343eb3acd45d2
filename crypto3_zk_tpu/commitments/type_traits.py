"""Commitment-scheme trait detection.

Duck-typed equivalent of `commitments/type_traits.hpp:100-145`
(`is_commitment`, `is_kzg`, `is_lpc`, `select_container`): the reference
uses SFINAE on nested typedefs; here a scheme qualifies by the protocol it
implements (methods `commit`/`proof_eval`/`verify_eval`), and the flavor
predicates identify the concrete classes.
"""
from __future__ import annotations


def is_commitment(obj) -> bool:
    """True for any object implementing the commitment-scheme protocol."""
    t = obj if isinstance(obj, type) else type(obj)
    return all(callable(getattr(t, m, None))
               for m in ("commit", "proof_eval", "verify_eval"))


def is_kzg(obj) -> bool:
    from .kzg import KZGSchemeV2, KZGSchemeBDFG
    t = obj if isinstance(obj, type) else type(obj)
    return issubclass(t, (KZGSchemeV2, KZGSchemeBDFG))


def is_lpc(obj) -> bool:
    from .lpc import LPCScheme
    t = obj if isinstance(obj, type) else type(obj)
    return issubclass(t, LPCScheme)


def select_container(obj) -> type:
    """`select_container` (`type_traits.hpp`): commitments are raw bytes for
    LPC (Merkle roots / field elements) and curve points for KZG — the
    container a proof stores per batch."""
    if is_lpc(obj):
        return bytes
    if is_kzg(obj):
        return tuple
    raise TypeError(f"not a commitment scheme: {obj!r}")
