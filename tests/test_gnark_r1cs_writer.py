"""gnark r1cs WRITER: byte-equality against the reference's own artifacts.

The bar (same as the round-4 pk writer): read_r1cs(reference bytes) ->
write_r1cs(decoded) must reproduce the file byte-for-byte, proving every
derived quantity (intcomp packing, instruction arrays, dependency levels,
CBOR, coefficient table, framing) matches gnark's own serializer.
Reference write site: keygen.go:324-435 (cs.WriteTo); read site:
prove_impl.go:102-107.
"""

import os

import pytest

from zktpu.compat import intcomp
from zktpu.compat.gnark_r1cs import read_r1cs
from zktpu.compat.gnark_r1cs_write import (
    compute_levels,
    read_levels,
    write_r1cs,
)

REF = "/root/reference/circuits/generated"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not present"
)


def _roundtrip(name):
    with open(os.path.join(REF, f"r1cs.{name}"), "rb") as f:
        data = f.read()
    r1 = read_r1cs(data)
    out = write_r1cs(r1)
    assert out == data, (
        f"writer output differs from the reference r1cs.{name} "
        f"({len(out)} vs {len(data)} bytes)"
    )


@needs_ref
def test_chacha20_roundtrip_byte_exact():
    _roundtrip("chacha20")


@needs_ref
@pytest.mark.slow
def test_aes128_roundtrip_byte_exact():
    _roundtrip("aes128")


@needs_ref
@pytest.mark.slow
def test_aes256_roundtrip_byte_exact():
    _roundtrip("aes256")


@needs_ref
def test_levels_rule_matches_reference():
    """compute_levels re-derives the reference's own solver levels (so the
    writer does not depend on having decoded them)."""
    with open(os.path.join(REF, "r1cs.chacha20"), "rb") as f:
        data = f.read()
    assert compute_levels(read_r1cs(data)) == read_levels(data)


def test_export_own_chacha_circuit():
    """Our chachaV3 -> gnark binary -> gnark-semantics solve == our witness.

    The exported file must decode with read_r1cs, its instruction stream
    must SOLVE sequentially under gnark's solver rules (nBits hints fill
    the bit decompositions), the solved witness must equal our jitted
    witness value-for-value (wire order is identity), and the bytes must
    re-serialize stably."""
    import struct as _struct

    import numpy as np

    from zktpu.circuits import chacha_v3 as cc
    from zktpu.compat.gnark_r1cs import check_satisfied, solve_witness
    from zktpu.compat.gnark_r1cs_write import export_gnark_r1cs

    b = cc.synthesize(2)  # 2 double-rounds: full structure, fast solve
    npub = b.num_public
    nsec = len(b.secret_vars)
    data = export_gnark_r1cs(
        b,
        [f"Public_{i}" for i in range(npub)],
        [f"Key_{i}" for i in range(nsec)],
    )
    r1 = read_r1cs(data)
    assert r1.meta.nb_constraints == len(b.constraints)
    assert r1.meta.nb_public == npub and len(r1.meta.secret_names) == nsec
    assert write_r1cs(r1) == data  # stable re-serialization

    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    counter = 1
    kw = list(_struct.unpack("<8I", key))
    nw = list(_struct.unpack("<3I", nonce))
    ks = _struct.pack("<16I", *cc.chacha_block_words_reduced(kw, counter, nw, 2))
    pt = bytes(range(64))
    ct = bytes(x ^ y for x, y in zip(pt, ks))
    z = np.asarray(
        cc.witness_bits(
            np.array([counter], np.uint32),
            cc.bytes_to_words_le(nonce)[None],
            cc.bytes_to_words_be(pt)[None],
            cc.bytes_to_words_be(ct)[None],
            cc.bytes_to_words_le(key)[None],
            double_rounds=2,
        )
    )[0]
    pub_vals = [int(v) for v in z[1 : 1 + npub]]
    sec_vals = [int(v) for v in z[1 + npub : 1 + npub + nsec]]
    w = solve_witness(r1, pub_vals, sec_vals)
    assert check_satisfied(r1, w)
    assert w == [int(v) for v in z], "gnark-solved witness != our witness"


def test_intcomp_codec_properties():
    """Codec round-trip on synthetic streams incl. cases the reference
    artifacts never exercise: negative tail deltas, >1-block groups with
    mixed zigzag/plain subgroups, empty and tiny streams."""
    cases = [
        [],
        [7],
        [5, 4, 3, 2, 1, 0, 2**32 - 1],
        list(range(1000)),
        [i * 37 % 2**32 for i in range(128)],
        [2**31 + (-1) ** i * i for i in range(300)],
        [0] * 500,
    ]
    for vals in cases:
        assert intcomp.decode_u32(intcomp.encode_u32(vals)) == vals
    cases64 = [
        [],
        [2**40],
        [2**63 + (-1) ** i * i * 3 for i in range(520)],
        list(range(0, 2560, 7)),
    ]
    for vals in cases64:
        assert intcomp.decode_u64(intcomp.encode_u64(vals)) == vals
