"""ChaChaV3 circuit synthesis + witness tests.

Mirrors the reference's circuit-unit-test tier (SURVEY.md §4 tier 1;
/root/reference/circuits/chachaV3/chacha_test.go): RFC 7539 vectors as the
oracle, native cipher vs circuit witness satisfaction, negative cases.
"""

import numpy as np
import pytest

from zktpu.circuits import chacha_v3 as cc

RFC_KEY = bytes(range(32))
RFC_NONCE = bytes.fromhex("000000090000004a00000000")
RFC_KS_BLOCK1 = bytes.fromhex(
    "10f1e7e4d13b5915500fdd1fa32071c4c7d1f4c733c068030422aa9ac3d46c4e"
    "d2826446079faa0914c2d705d98b02a2b5129cd1de164eb9cbd083e8a2503c4e"
)


@pytest.fixture(scope="module")
def builder():
    return cc.synthesize()


def test_constraint_shape(builder):
    # add32: 80 QRs x 4 + 16 final = 336 -> 336*34 constraints; xorRot: 320*32;
    # ct xor: 512; out assert: 512
    assert len(builder.constraints) == 336 * 34 + 320 * 32 + 512 + 512
    assert builder.num_public == 32 + 96 + 512 + 512  # counter, nonce, in, out
    assert builder.num_vars == 1 + 1152 + 256 + 336 * 33 + 320 * 32 + 512


def test_rfc7539_block_vector():
    kw = cc.bytes_to_words_le(RFC_KEY)[None]
    nw = cc.bytes_to_words_le(RFC_NONCE)[None]
    ctr = np.array([1], dtype=np.uint32)
    ks = np.asarray(cc.chacha20_block_words(kw, ctr, nw))
    assert cc.words_to_bytes_le(ks[0]) == RFC_KS_BLOCK1


def _witness_for(key, nonce, counter, pt):
    kw = cc.bytes_to_words_le(key)[None]
    nw = cc.bytes_to_words_le(nonce)[None]
    ctr = np.array([counter], dtype=np.uint32)
    ks = np.asarray(cc.chacha20_block_words(kw, ctr, nw))
    ct = bytes(a ^ b for a, b in zip(pt, cc.words_to_bytes_le(ks[0])))
    inp = cc.bytes_to_words_be(pt)[None]
    outp = cc.bytes_to_words_be(ct)[None]
    # the witness_bits XLA:CPU compile costs ~70 s; disk-memoized keyed by
    # the circuit source (conftest.cached_witness docs)
    from conftest import cached_witness

    z = cached_witness(
        "chachav3",
        [cc.__file__],
        key + nonce + counter.to_bytes(4, "big") + pt,
        lambda: cc.witness_bits(ctr, nw, inp, outp, kw),
    )
    return z, ct


def test_witness_satisfies_r1cs(builder):
    rng = np.random.default_rng(7)
    pt = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    z, _ = _witness_for(RFC_KEY, RFC_NONCE, 1, pt)
    assert z.shape == (1, builder.num_vars)
    assert set(np.unique(z)) <= {0, 1}
    assert builder.check_witness(z[0])


def test_bad_witness_rejected(builder):
    pt = bytes(64)
    z, _ = _witness_for(RFC_KEY, RFC_NONCE, 1, pt)
    bad = z[0].copy()
    bad[1 + 32 + 96 + 512 + 3] ^= 1  # flip an Out bit
    assert not builder.check_witness(bad)
    bad2 = z[0].copy()
    bad2[1] ^= 1  # flip a Counter bit
    assert not builder.check_witness(bad2)


@pytest.mark.slow
def test_batched_witness(builder):
    B = 4
    rng = np.random.default_rng(3)
    kw = rng.integers(0, 2**32, (B, 8), dtype=np.uint32)
    nw = rng.integers(0, 2**32, (B, 3), dtype=np.uint32)
    ctr = rng.integers(0, 2**32, B, dtype=np.uint32)
    ks = np.asarray(cc.chacha20_block_words(kw, ctr, nw))
    pt = rng.integers(0, 2**32, (B, 16), dtype=np.uint32)
    # In/Out are BE-packed words of the byte streams; operating on LE words
    # then byteswapping both sides equals operating on BE words directly.
    def bswap(x):
        return ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) | ((x >> 8) & 0xFF00) | (x >> 24)

    inp = bswap(pt)
    outp = bswap(pt ^ ks)
    z = np.asarray(cc.witness_bits(ctr, nw, inp, outp, kw))
    assert z.shape == (B, builder.num_vars)
    for i in range(B):
        assert builder.check_witness(z[i])
