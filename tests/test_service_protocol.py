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


def test_init_rejects_mismatched_pk_r1cs():
    """pk<->r1cs hash binding (VERDICT.md round-1 missing #6): a pk bound to
    one circuit must refuse to initialize against another circuit's r1cs
    (the reference's dormant hash registry, prove_impl.go:27-43, enforced)."""
    import io

    from zktpu.api import service
    from zktpu.groth16.setup import setup
    from zktpu.r1cs import serialize as r1cs_ser
    from zktpu.r1cs.builder import Builder, lc_var

    b = Builder()
    p = b.pub(1)[0]
    s = b.secret(1)[0]
    b.assert_bool(lc_var(s))
    b.xor(lc_var(s), lc_var(p))
    cs = b.compile()
    r1cs_bytes = r1cs_ser.dumps(cs)
    pk, _vk = setup(cs, seed=b"bind-test")
    pk.bind_r1cs(r1cs_bytes)
    buf = io.BytesIO()
    pk.save(buf)
    pk_bytes = buf.getvalue()

    b2 = Builder()
    q = b2.pub(1)[0]
    s2 = b2.secret(1)[0]
    b2.assert_bool(lc_var(s2))
    b2.xor(lc_var(s2), lc_var(q))
    b2.xor(lc_var(s2), lc_var(q))  # one extra wire: different bytes, same shape
    bad_bytes = r1cs_ser.dumps(b2.compile())

    saved = service._PROVERS.pop("chacha20", None)
    try:
        assert service.init_algorithm(0, pk_bytes, bad_bytes) is False
        assert "chacha20" not in service._PROVERS
        assert service.init_algorithm(0, pk_bytes, r1cs_bytes) is True
    finally:
        service._PROVERS.pop("chacha20", None)
        if saved is not None:
            service._PROVERS["chacha20"] = saved


def test_prove_many_protocol_routing():
    """prove_many JSON contract: batch path used when the service has one,
    per-item fallback otherwise; per-item wire format matches prove()."""

    class FakeBatch:
        calls = []

        def prove(self, key, nonce, counter, inp):
            FakeBatch.calls.append("single")
            return b"P" + bytes([counter]), b"C" * 4

        def prove_many(self, reqs):
            FakeBatch.calls.append(("batch", len(reqs)))
            return [(b"P" + bytes([c]), b"C" * 4) for _, _, c, _ in reqs]

    saved = service._PROVERS.get("chacha20")
    service._PROVERS["chacha20"] = FakeBatch()
    try:
        req = {
            "cipher": "chacha20",
            "requests": [
                {"key": "", "nonce": "", "counter": i, "input": ""}
                for i in range(3)
            ],
        }
        out = json.loads(service.prove_many(json.dumps(req).encode()))
        assert FakeBatch.calls == [("batch", 3)]
        assert len(out["responses"]) == 3
        for i, r in enumerate(out["responses"]):
            assert service._decode_bytes(r["proof"]["proofJson"]) == b"P" + bytes([i])
            assert service._decode_bytes(r["publicSignals"]) == b"CCCC"
        # single-request calls fall back to the per-item path
        FakeBatch.calls.clear()
        req["requests"] = req["requests"][:1]
        out = json.loads(service.prove_many(json.dumps(req).encode()))
        assert FakeBatch.calls == ["single"]
        assert len(out["responses"]) == 1
    finally:
        if saved is not None:
            service._PROVERS["chacha20"] = saved
        else:
            service._PROVERS.pop("chacha20", None)
