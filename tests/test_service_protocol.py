"""Service-layer wire protocol tests (no proving — fast).

Covers the JSON contracts of prove/verify (reference analogs
prove_impl.go/verify_impl.go), the proof byte codecs, the publicSignals
layout including the ChaCha-LE vs AES-BE counter asymmetry
(core_test.go:161,205), and error paths (TestPanic analog, core_test.go:120)."""

import base64
import json

import numpy as np
import pytest

from zktpu.api import service
from zktpu.groth16.prove import Proof


def test_decode_bytes_accepts_base64_and_arrays():
    assert service._decode_bytes(base64.b64encode(b"abc").decode()) == b"abc"
    assert service._decode_bytes([1, 2, 255]) == bytes([1, 2, 255])
    assert service._decode_bytes(b"xy") == b"xy"
    assert service._decode_bytes(None) == b""


def test_proof_codec_roundtrip():
    p = Proof(a=(1, 2), b=((3, 4), (5, 6)), c=(7, 8))
    b = service.proof_to_bytes(p)
    assert len(b) == 4 + 8 * 32
    q = service.proof_from_bytes(b)
    assert q == p
    with pytest.raises(ValueError):
        service.proof_from_bytes(b"bogus")


def test_committed_proof_codec_roundtrip():
    p = Proof(a=(1, 2), b=((3, 4), (5, 6)), c=(7, 8), d=(9, 10), d_sigma=(11, 12))
    b = service.proof_to_bytes_committed(p)
    assert len(b) == 4 + 12 * 32
    q = service.proof_from_bytes_committed(b)
    assert q == p


def test_chacha_public_bits_layout():
    counter = 0x01020304
    nonce = bytes(range(12))
    pt = bytes(range(64))
    ct = bytes(64)
    bits = service.chacha_public_bits(counter, nonce, pt, ct)
    assert len(bits) == 1152
    # counter bits LSB-first
    assert bits[:8] == [0, 0, 1, 0, 0, 0, 0, 0]  # 0x04
    # nonce is LE-word packed: first word = bytes 0..3 LE = 0x03020100
    w = sum(b << i for i, b in enumerate(bits[32:64]))
    assert w == 0x03020100
    # In is BE-word packed: first word = 0x00010203
    w = sum(b << i for i, b in enumerate(bits[128:160]))
    assert w == 0x00010203


def test_verify_malformed_returns_false():
    assert not service.verify(b"not json")
    assert not service.verify(json.dumps({"cipher": "nope"}).encode())
    assert not service.verify(
        json.dumps(
            {"cipher": "chacha20", "proof": "", "publicSignals": ""}
        ).encode()
    )


def test_prove_unknown_cipher_raises():
    with pytest.raises(Exception):
        service.prove(json.dumps({"cipher": "des"}).encode())


def test_init_bad_algorithm_id():
    assert not service.init_algorithm(7, b"", b"")
