"""Full-circuit ChaCha20 golden end-to-end tests (VERDICT.md round-1 items 3/5).

Reference analogs:
  * TestFullChaCha20 (/root/reference/libraries/core_test.go:130-172):
    random key/nonce/pt -> impl.Prove JSON -> 144-byte publicSignals
    (ct | nonce | counter LE | pt) -> impl.Verify == true; tampered false.
  * TestInit (core_test.go:30-36) / TestPanic (core_test.go:120-128):
    exercised through the C ABI via ctypes against native/libzkprove.so
    (the cgo c-shared analog, SURVEY.md N1).

Slow-marked: one full 22,688-constraint prove costs minutes of XLA compile
on the CPU test platform (seconds on the TPU chip, see bench.py).
"""

import base64
import ctypes
import json
import os
import struct
import subprocess

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "generated")
NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "pk.chacha20.npz")),
    reason="chacha artifacts not generated (python -m zktpu.keygen)",
)


def _artifact_bytes():
    with open(os.path.join(ART, "pk.chacha20.npz"), "rb") as f:
        pk = f.read()
    with open(os.path.join(ART, "r1cs.chacha20"), "rb") as f:
        r1cs = f.read()
    return pk, r1cs


def _public_signals(ct: bytes, nonce: bytes, counter: int, pt: bytes) -> bytes:
    # 144-byte layout, counter LE for chacha (core_test.go:160-162)
    return ct + nonce + struct.pack("<I", counter) + pt


@pytest.fixture(scope="module")
def chacha_service():
    from zktpu.api import service

    pk, r1cs = _artifact_bytes()
    assert service.init_algorithm(0, pk, r1cs)
    assert service.init_algorithm(0, pk, r1cs)  # idempotent (prove_impl.go:74-76)
    service.load_verifiers_from_dir(ART)
    return service


@pytest.mark.slow
def test_full_chacha20_prove_verify(chacha_service):
    service = chacha_service
    rng = np.random.default_rng(7)
    key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    nonce = bytes(rng.integers(0, 256, 12, dtype=np.uint8))
    counter = 1
    pt = bytes(rng.integers(0, 256, 64, dtype=np.uint8))

    req = {
        "cipher": "chacha20",
        "key": base64.b64encode(key).decode(),
        "nonce": base64.b64encode(nonce).decode(),
        "counter": counter,
        "input": base64.b64encode(pt).decode(),
    }
    out = json.loads(service.prove(json.dumps(req).encode()))
    proof_b64 = out["proof"]["proofJson"]
    ct = base64.b64decode(out["publicSignals"])
    assert len(ct) == 64

    # native-cipher oracle: the returned ciphertext must match chacha20
    from zktpu.circuits import chacha_v3 as cc

    kw = cc.bytes_to_words_le(key)[None]
    nw = cc.bytes_to_words_le(nonce)[None]
    ks = np.asarray(
        cc.chacha20_block_words(kw, np.array([counter], np.uint32), nw)
    )[0]
    expect_ct = bytes(a ^ b for a, b in zip(pt, cc.words_to_bytes_le(ks)))
    assert ct == expect_ct

    vreq = {
        "cipher": "chacha20",
        "proof": proof_b64,
        "publicSignals": base64.b64encode(
            _public_signals(ct, nonce, counter, pt)
        ).decode(),
    }
    assert service.verify(json.dumps(vreq).encode()) is True

    # tampered ciphertext byte must fail
    bad_ct = bytearray(ct)
    bad_ct[0] ^= 1
    vbad = dict(vreq)
    vbad["publicSignals"] = base64.b64encode(
        _public_signals(bytes(bad_ct), nonce, counter, pt)
    ).decode()
    assert service.verify(json.dumps(vbad).encode()) is False

    # wrong counter endianness (BE instead of LE) must fail
    vbe = dict(vreq)
    vbe["publicSignals"] = base64.b64encode(
        ct + nonce + struct.pack(">I", counter) + pt
    ).decode()
    if counter != int.from_bytes(struct.pack("<I", counter), "big"):
        assert service.verify(json.dumps(vbe).encode()) is False


def test_prove_unknown_cipher_raises(chacha_service):
    # TestPanic analog (core_test.go:120-128): prover must raise, verifier
    # must return false (never raise)
    service = chacha_service
    with pytest.raises(Exception):
        service.prove(json.dumps({"cipher": "aes-512-ctr"}).encode())
    assert (
        service.verify(
            json.dumps(
                {"cipher": "nope", "proof": "", "publicSignals": ""}
            ).encode()
        )
        is False
    )


# ------------------------------------------------------------------ C ABI


@pytest.fixture(scope="module")
def libzkprove():
    so = os.path.join(NATIVE, "libzkprove.so")
    try:
        subprocess.run(["make", "-C", NATIVE], check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build libzkprove.so: {e}")
    lib = ctypes.CDLL(so)
    lib.InitAlgorithm.restype = ctypes.c_int
    lib.InitAlgorithm.argtypes = [
        ctypes.c_ubyte,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.Prove.restype = ctypes.c_void_p
    lib.Prove.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.Free.argtypes = [ctypes.c_void_p]
    lib.Verify.restype = ctypes.c_int
    lib.Verify.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.enforce_binding()
    return lib


def test_ffi_error_contract(libzkprove):
    """Bad inputs through the C ABI: InitAlgorithm(99) -> 0, Prove(garbage)
    -> error JSON (panic->JSON contract, libprove.go:33-43), Verify(garbage)
    -> 0.  Runs before any heavy init — fast."""
    lib = libzkprove
    assert lib.InitAlgorithm(99, b"", 0, b"", 0) == 0
    out_len = ctypes.c_int(0)
    req = json.dumps({"cipher": "not-a-cipher"}).encode()
    ptr = lib.Prove(req, len(req), ctypes.byref(out_len))
    assert ptr
    payload = ctypes.string_at(ptr, out_len.value)
    lib.Free(ptr)
    assert b"error" in payload
    assert lib.Verify(b"not json", 8) == 0


@pytest.mark.slow
def test_ffi_full_roundtrip(libzkprove, chacha_service):
    """TestFullChaCha20 through the shared library (ctypes), sharing the
    in-process runtime the module fixture already initialized."""
    lib = libzkprove
    pk, r1cs = _artifact_bytes()
    assert lib.InitAlgorithm(0, pk, len(pk), r1cs, len(r1cs)) == 1

    key = bytes(range(32))
    nonce = bytes(range(12))
    pt = bytes(64)
    req = json.dumps(
        {
            "cipher": "chacha20",
            "key": base64.b64encode(key).decode(),
            "nonce": base64.b64encode(nonce).decode(),
            "counter": 7,
            "input": base64.b64encode(pt).decode(),
        }
    ).encode()
    out_len = ctypes.c_int(0)
    ptr = lib.Prove(req, len(req), ctypes.byref(out_len))
    assert ptr
    out = json.loads(ctypes.string_at(ptr, out_len.value))
    lib.Free(ptr)
    assert "error" not in out
    ct = base64.b64decode(out["publicSignals"])
    vreq = json.dumps(
        {
            "cipher": "chacha20",
            "proof": out["proof"]["proofJson"],
            "publicSignals": base64.b64encode(
                _public_signals(ct, nonce, 7, pt)
            ).decode(),
        }
    ).encode()
    assert lib.Verify(vreq, len(vreq)) == 1


@pytest.mark.slow
def test_prove_many_batch_e2e(chacha_service):
    """Batch service surface (DP axis through the product API): 2 requests
    -> one vmapped prove_batch dispatch; every response verifies."""
    service = chacha_service
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    reqs = [
        {
            "key": base64.b64encode(key).decode(),
            "nonce": base64.b64encode(nonce).decode(),
            "counter": c,
            "input": base64.b64encode(bytes([c] * 64)).decode(),
        }
        for c in (1, 2)
    ]
    out = json.loads(
        service.prove_many(
            json.dumps({"cipher": "chacha20", "requests": reqs}).encode()
        )
    )
    assert len(out["responses"]) == 2
    for c, resp in zip((1, 2), out["responses"]):
        ct = service._decode_bytes(resp["publicSignals"])
        ver = {
            "cipher": "chacha20",
            "proof": resp["proof"]["proofJson"],
            "publicSignals": base64.b64encode(
                _public_signals(ct, nonce, c, bytes([c] * 64))
            ).decode(),
        }
        assert service.verify(json.dumps(ver).encode())
