"""AES-V2 circuit test tier (VERDICT.md round-1 missing #2).

Reference analogs:
  * NIST SP800-38A F.5.1/F.5.5 CTR vectors for the native-cipher oracle
    (/root/reference/circuits/aesV2/aes128_test.go:33-91, aes256_test.go:32-91
    use crypto/aes + cipher.NewCTR as the oracle);
  * R1CS-satisfaction of the full aes_v2 witness (the check_witness pattern,
    gnark analog test.IsSolved);
  * lookup-balance negative cases (tampered multiplicity must break the
    logUp constraint rows);
  * constraint-count regression (aes128_test.go:117-133 analog).
"""

import numpy as np
import pytest

from zktpu.circuits import aes_v2 as av
from zktpu.field import limb
from zktpu.field.params import FR

# NIST SP800-38A F.5.1 (CTR-AES128) / F.5.5 (CTR-AES256): initial counter
# block f0..ff split as nonce (12B) || BE counter (4B) — exactly the
# circuit's IV convention (aesV2/common.go:113-120).
NONCE = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafb")
COUNTER = 0xFCFDFEFF
PT = bytes.fromhex(
    "6bc1bee22e409f96e93d7e117393172a"
    "ae2d8a571e03ac9c9eb76fac45af8e51"
    "30c81c46a35ce411e5fbc1191a0a52ef"
    "f69f2445df4f9b17ad2b417be66c3710"
)
KEY128 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
CT128 = bytes.fromhex(
    "874d6191b620e3261bef6864990db6ce"
    "9806f66b7970fdff8617187bb9fffdff"
    "5ae4df3edbd5d35e5b4f09020db03eab"
    "1e031dda2fbe03d1792170a0f3009cee"
)
KEY256 = bytes.fromhex(
    "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4"
)
CT256 = bytes.fromhex(
    "601ec313775789a5b7a7f504bbf3d228"
    "f443e3ca4d62b59aca84e990cacaf5c5"
    "2b0930daa23de94ce87017ba2d84988d"
    "dfc9c58db67aada613c2dd08457941a6"
)


def test_oracle_nist_ctr_aes128():
    assert av.aes_ctr_encrypt(KEY128, NONCE, COUNTER, PT) == CT128


def test_oracle_nist_ctr_aes256():
    assert av.aes_ctr_encrypt(KEY256, NONCE, COUNTER, PT) == CT256


def test_oracle_fips197_single_block():
    # FIPS-197 C.1 AES-128: key 000102..0f, block 00112233..ff.
    # CTR keystream block 0 = AES_ECB(key, nonce||BE counter).
    key = bytes(range(16))
    nonce = bytes.fromhex("00112233445566778899aabb")
    counter = 0xCCDDEEFF
    ct = av.aes_ctr_encrypt(key, nonce, counter, bytes(64))
    assert ct[:16] == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")


# ------------------------------------------------------- witness satisfaction


def _witness_and_builder(variant, key, ct):
    b = av.synthesize(variant)

    def solve():
        nb = np.frombuffer(NONCE, np.uint8).astype(np.uint32)[None]
        ptb = np.frombuffer(PT, np.uint8).astype(np.uint32)[None]
        ctb = np.frombuffer(ct, np.uint8).astype(np.uint32)[None]
        kb = np.frombuffer(key, np.uint8).astype(np.uint32)[None]
        cnt = np.array([COUNTER], np.uint32)
        # fixed nonzero challenges: the logUp rows only balance when f/g
        # columns are consistent with these exact etas
        e1 = limb.encode([0x1234567890ABCDEF1122334455667788], FR, mont=False)
        e2 = limb.encode([0x0FEDCBA987654321AABBCCDD11223344], FR, mont=False)
        return np.asarray(
            av.witness_canonical(variant, nb, cnt, ptb, ctb, kb, e1, e2)
        )[0]

    # eager witness solve costs minutes on XLA:CPU — memoize on disk keyed
    # by the circuit/solver/field sources (conftest.cached_witness docs)
    from conftest import cached_witness

    z = cached_witness(
        f"aesv2-{variant}",
        [av.__file__, limb.__file__],
        key + ct + NONCE + PT + COUNTER.to_bytes(4, "big"),
        solve,
    )
    return b, limb.decode(z, FR, mont=False)  # witness limbs are canonical


@pytest.fixture(scope="module")
def aes128_witness():
    return _witness_and_builder("aes-128-ctr", KEY128, CT128)


def test_aes128_witness_satisfies_r1cs(aes128_witness):
    b, vals = aes128_witness
    assert b.check_witness(vals)


def test_aes128_constraint_count(aes128_witness):
    # regression pin (aes128_test.go:117-133 analog): the ACTUAL numbers,
    # so an accidental circuit change fails loudly (VERDICT r3 weak #10 —
    # the old assert compared compile() to itself).  Update deliberately
    # if the circuit changes; keygen prints the same counts.
    b, _ = aes128_witness
    cs = b.compile()
    assert cs.num_constraints == 45571
    assert cs.num_vars == 46844
    # 141 real public inputs + 2 verifier-derived lookup challenges, which
    # Builder.challenge() allocates as public wires (builder.py:210-217)
    assert cs.num_public == 143
    assert len(cs.committed_vars) == 2640
    assert len(cs.challenge_vars) == 2


def test_aes128_tampered_multiplicity_fails(aes128_witness):
    b, vals = aes128_witness
    bad = list(vals)
    # committed logUp columns live at the tail of the witness; flipping any
    # committed wire must break a lookup-balance row
    cs = b.compile()
    idx = int(cs.committed_vars[len(cs.committed_vars) // 2])
    bad[idx] = (bad[idx] + 1) % FR.modulus
    assert not b.check_witness(bad)


def test_aes128_wrong_ciphertext_fails(aes128_witness):
    # claim a different ciphertext byte on the PUBLIC ct wire: the final
    # keystream-xor row must reject (no re-solve needed — every other wire
    # still carries the honest execution).  publics order: nonce(12),
    # counter(1), pt(64), ct(64) — witness_canonical/aes_v2.define.
    b, vals = aes128_witness
    bad = list(vals)
    ct0 = 1 + 12 + 1 + 64  # var index of ct byte 0 (z[0] first)
    assert bad[ct0] == CT128[0]
    bad[ct0] ^= 1
    assert not b.check_witness(bad)


@pytest.mark.slow
def test_aes256_witness_satisfies_r1cs():
    b, vals = _witness_and_builder("aes-256-ctr", KEY256, CT256)
    assert b.check_witness(vals)
