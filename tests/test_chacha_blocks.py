"""Scaled-Blocks ChaCha (the SURVEY §5 "long-context" analog): plaintext
length per proof grows via the block constant, scaling the quotient domain
and MSM sizes — the axis the mesh shards.  Production stays at the
reference's Blocks=1; this tier pins that the scaled circuit is exactly
block-replicated structure plus the CTR counter chain, and that the batched
solver still satisfies it."""

import numpy as np
import pytest

from zktpu.circuits import chacha_v3 as cc

KEY = bytes(range(32))
NONCE = bytes.fromhex("000000090000004a00000000")


def test_blocks2_constraint_scaling():
    b1 = cc.synthesize()
    b2 = cc.synthesize(blocks=2)
    per_block = len(b1.constraints)
    # block 2 adds: a full block's constraints + one add32 counter chain (34)
    assert len(b2.constraints) == 2 * per_block + 34
    assert b2.num_public == 32 + 96 + 2 * (512 + 512)


def test_blocks2_witness_satisfies_r1cs():
    builder = cc.synthesize(blocks=2)
    rng = np.random.default_rng(21)
    pt = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    kw = cc.bytes_to_words_le(KEY)[None]
    nw = cc.bytes_to_words_le(NONCE)[None]
    ctr = np.array([7], dtype=np.uint32)
    # keystream: CTR chain over two blocks
    ks0 = np.asarray(cc.chacha20_block_words(kw, ctr, nw))[0]
    ks1 = np.asarray(cc.chacha20_block_words(kw, ctr + 1, nw))[0]
    ks = cc.words_to_bytes_le(ks0) + cc.words_to_bytes_le(ks1)
    ct = bytes(a ^ b for a, b in zip(pt, ks))
    inp = cc.bytes_to_words_be(pt)[None]
    outp = cc.bytes_to_words_be(ct)[None]

    from conftest import cached_witness

    z = cached_witness(
        "chachav3-b2",
        [cc.__file__],
        KEY + NONCE + pt,
        lambda: cc.witness_bits(ctr, nw, inp, outp, kw, blocks=2),
    )
    assert z.shape == (1, builder.num_vars)
    assert builder.check_witness(z[0])

    # tampering the SECOND block's Out words must be caught (the counter
    # chain actually feeds block 2)
    bad = z[0].copy()
    bad[1 + 32 + 96 + 1024 + 512 + 3] ^= 1
    assert not builder.check_witness(bad)
