"""Cross-implementation conformance: golden vectors pinned from the
reference test suite so byte-format drift fails loudly.

Vectors come from `test/transcript/transcript.cpp:51-66` (keccak_1600<256>
sequential transcript over alt_bn128-254 scalar field) and
`test/systems/ppzksnark/r1cs_gg_ppzksnark/r1cs_gg_ppzksnark_aggregation_
conformity.cpp` (bellperson-generated BLS12-381 ipp2 data). They pin:

- the Fiat–Shamir chain byte format (state = H(seed); challenge:
  state = H(state), value = int_be(state) mod p);
- field/group-element absorb encoding (big-endian fixed-width byteblobs);
- the int_challenge masking semantics.
"""
import pytest

from crypto3_zk_tpu.fields import params as P
from crypto3_zk_tpu.transcript.fiat_shamir import Transcript


def test_keccak_transcript_challenges_match_reference():
    """`transcript.cpp:51-66 zk_transcript_manual_test` — five challenges
    drawn over alt_bn128's scalar field after seeding with bytes 0..9."""
    tr = Transcript(seed=bytes(range(10)), hash_name="keccak_256")
    fs = P.ALT_BN128_FR
    want = [
        0x00e858ba005424eabd6d97de7e930779def59a85c1a9ff7e8a5d001cdb07f6e4,
        0x0f61f38f58a55b3bbee0480fc5ec3cf8df81603579f4f7134f764bfd3ca5938b,
        0x04f6b97a9bc99d6996fab5e03d1cd0b418a9b3c97ed64cca070e15777e7cc99a,
        0x2414ddf7ecff246500beb2c01b0c5912a400bc3cdca6d7f24bd2bd4987b21e04,
        0x10bfe2f4a414eec551dda5fd9899e9b46e327648b4fa564ed0517b6a99396aec,
    ]
    got = [tr.challenge(fs) for _ in range(5)]
    assert got == want


def test_keccak_transcript_absorb_then_challenge_is_deterministic():
    """absorb(r): state = H(state || r) — pin the chain against an
    independent recomputation with the raw hash so the transcript class
    can never silently change its concatenation order."""
    from crypto3_zk_tpu.transcript.hashes import get_hash

    h, _ = get_hash("keccak_256")
    fs = P.ALT_BN128_FR
    tr = Transcript(seed=b"\x01\x02", hash_name="keccak_256")
    tr.absorb(b"hello")
    c = tr.challenge(fs)
    state = h(h(h(b"\x01\x02") + b"hello"))
    assert c == int.from_bytes(state, "big") % fs.p


def test_int_challenge_mask():
    """int_challenge<I>: state = H(state); result = int_be(state) & ~I(0)
    (`fiat_shamir.hpp:192-200`)."""
    from crypto3_zk_tpu.transcript.hashes import get_hash

    h, _ = get_hash("keccak_256")
    tr = Transcript(seed=b"", hash_name="keccak_256")
    v = tr.int_challenge(32)
    state = h(h(b""))
    assert v == int.from_bytes(state, "big") & 0xFFFFFFFF
