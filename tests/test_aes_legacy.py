"""Legacy AES circuit V1 (SURVEY.md §2.1 C4).

Reference analogs: /root/reference/circuits/aes/{aes128_test.go,
aes256_test.go} — CTR vectors as the oracle, witness satisfaction,
negative cases.  Like upstream, V1 is circuit-tier only (keygen.go never
emits keys for it; production AES is aes_v2)."""

import numpy as np
import pytest

from zktpu.circuits import aes_v1 as a1
from zktpu.circuits.aes_v2 import aes_ctr_encrypt

# NIST SP800-38A F.5.1/F.5.5 split as nonce || BE counter (one block —
# BLOCKS = 1, aes256.go:14)
NONCE = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafb")
COUNTER = 0xFCFDFEFF
PT = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
KEY128 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
KEY256 = bytes.fromhex(
    "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4"
)


def _vectors(key):
    ct = aes_ctr_encrypt(key, NONCE, COUNTER, PT)
    return ct


@pytest.fixture(scope="module")
def v1_128():
    return a1.synthesize("aes-128-ctr")


def test_aes128_v1_counts(v1_128):
    b = v1_128
    assert b.num_public == 32  # Plaintext(16) + Ciphertext(16)
    cs = b.compile()
    assert cs.num_constraints == A128_CONSTRAINTS
    assert cs.num_vars == A128_VARS
    assert len(cs.committed_vars) == 0  # V1 predates the lookup commitment


def test_aes128_v1_witness_satisfies_r1cs(v1_128):
    ct = _vectors(KEY128)
    z = a1.witness("aes-128-ctr", KEY128, NONCE, COUNTER, PT, ct)
    assert len(z) == v1_128.num_vars
    assert v1_128.check_witness(z)


def test_aes128_v1_wrong_ct_rejected(v1_128):
    ct = bytearray(_vectors(KEY128))
    z = a1.witness("aes-128-ctr", KEY128, NONCE, COUNTER, PT, bytes(ct))
    bad = list(z)
    bad[17] ^= 1  # a Ciphertext wire ([1, pt x16, ct x16, ...])
    assert not v1_128.check_witness(bad)
    # wrong key: internally consistent replay, contradicts public ct
    key2 = bytearray(KEY128)
    key2[0] ^= 1
    z2 = a1.witness("aes-128-ctr", bytes(key2), NONCE, COUNTER, PT, bytes(ct))
    assert not v1_128.check_witness(z2)


@pytest.mark.slow
def test_aes256_v1_witness_satisfies_r1cs():
    b = a1.synthesize("aes-256-ctr")
    ct = _vectors(KEY256)
    z = a1.witness("aes-256-ctr", KEY256, NONCE, COUNTER, PT, ct)
    assert b.check_witness(z)


A128_CONSTRAINTS = 129583  # pinned: an accidental circuit change fails loudly
A128_VARS = 127471
