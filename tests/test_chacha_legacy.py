"""Legacy ChaCha circuits V1/V2 (SURVEY.md §2.1 C1/C2).

Reference analogs: /root/reference/circuits/chacha/chacha_test.go and
/root/reference/circuits/chachaV2/chacha_test.go — RFC 7539 oracle vectors,
witness satisfaction, negative cases.  The reference never generates keys
for these circuits (keygen.go only emits V3 + AES), so like upstream they
exist as circuit-tier artifacts only: synthesis + witness solver + tests.
"""

import numpy as np
import pytest

from zktpu.circuits import chacha_v2 as c2
from zktpu.circuits import chacha_v3 as cc

RFC_KEY = bytes(range(32))
RFC_NONCE = bytes.fromhex("000000090000004a00000000")


def _vectors(pt: bytes, counter: int = 1):
    kw = [int(w) for w in cc.bytes_to_words_le(RFC_KEY)]
    nw = [int(w) for w in cc.bytes_to_words_le(RFC_NONCE)]
    ks_words = cc.chacha_block_words_reduced(kw, counter, nw, 10)
    ks = b"".join(int(w).to_bytes(4, "little") for w in ks_words)
    ct = bytes(a ^ b for a, b in zip(pt, ks))
    inw = [int(w) for w in cc.bytes_to_words_be(pt)]
    outw = [int(w) for w in cc.bytes_to_words_be(ct)]
    return kw, nw, inw, outw, ct


# ------------------------------------------------------------------------ V2


@pytest.fixture(scope="module")
def v2_builder():
    return c2.synthesize()


def test_v2_counts(v2_builder):
    b = v2_builder
    # regression pin: publics = In(16) + Out(16) words only (circuit.go:13-14)
    assert b.num_public == 32
    cs = b.compile()
    assert cs.num_constraints == V2_CONSTRAINTS
    assert cs.num_vars == V2_VARS


def test_v2_witness_satisfies_r1cs(v2_builder):
    rng = np.random.default_rng(11)
    pt = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    kw, nw, inw, outw, _ = _vectors(pt)
    z = c2.witness(kw, 1, nw, inw, outw)
    assert len(z) == v2_builder.num_vars
    assert v2_builder.check_witness(z)


def test_v2_wrong_ct_rejected(v2_builder):
    kw, nw, inw, outw, _ = _vectors(bytes(64))
    z = c2.witness(kw, 1, nw, inw, outw)
    bad = list(z)
    bad[17] ^= 1  # Out word 0 (vars: [1, In x16, Out x16, ...])
    assert not v2_builder.check_witness(bad)
    # wrong key: witness internally consistent but contradicts public In/Out
    kw2 = list(kw)
    kw2[0] ^= 1
    z2 = c2.witness(kw2, 1, nw, inw, outw)
    assert not v2_builder.check_witness(z2)


# pinned by the synthesized shape; computed in test_v2_counts
V2_CONSTRAINTS = 44930
V2_VARS = 43934


# ------------------------------------------------------------------------ V1

from zktpu.circuits import chacha_v1 as c1  # noqa: E402

ETA1 = 0x1234567890ABCDEF1122334455667788
ETA2 = 0x0FEDCBA987654321AABBCCDD11223344


@pytest.fixture(scope="module")
def v1_builder():
    return c1.synthesize()


def test_v1_counts(v1_builder):
    b = v1_builder
    # publics = In(64 bytes) + Out(64) + 2 logUp challenges (circuit.go:14-15
    # + the uints gadget's committed tables)
    assert b.num_public == 130
    cs = b.compile()
    assert cs.num_constraints == 80368
    assert cs.num_vars == 147988
    assert len(cs.committed_vars) == 71176
    assert len(cs.challenge_vars) == 2


def test_v1_witness_satisfies_r1cs(v1_builder):
    rng = np.random.default_rng(13)
    pt = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    kw, nw, inw, outw, ct = _vectors(pt)
    z = c1.witness(RFC_KEY, 1, RFC_NONCE, pt, ct, ETA1, ETA2)
    assert len(z) == v1_builder.num_vars
    assert v1_builder.check_witness(z)


def test_v1_wrong_ct_rejected(v1_builder):
    _, _, _, _, ct = _vectors(bytes(64))
    z = c1.witness(RFC_KEY, 1, RFC_NONCE, bytes(64), ct, ETA1, ETA2)
    bad = list(z)
    bad[65] ^= 1  # an Out byte wire (vars: [1, In x64, Out x64, ...])
    assert not v1_builder.check_witness(bad)


def test_v1_tampered_xor_lookup_rejected(v1_builder):
    """Flipping a committed xor-lookup output must break the logUp balance."""
    _, _, _, _, ct = _vectors(bytes(64))
    z = c1.witness(RFC_KEY, 1, RFC_NONCE, bytes(64), ct, ETA1, ETA2)
    cs = v1_builder.compile()
    idx = int(cs.committed_vars[0])
    bad = list(z)
    bad[idx] = (bad[idx] + 1) % (2**16)
    assert not v1_builder.check_witness(bad)
