"""Concurrency contract (VERDICT r3 item 9; reference analog:
TestProveVerify, core_test.go:38-111 — three ciphers proving in goroutines,
skipped there; exercised for real here).

Fast tier: racing init_algorithm calls must converge to ONE registered
prover per cipher (double-checked _REGISTRY_LOCK).  Slow tier: concurrent
prove+verify across all three ciphers through the JSON service."""

import base64
import json
import os
import struct
import threading

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "generated")


def _art(name):
    with open(os.path.join(ART, name), "rb") as f:
        return f.read()


needs_chacha = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "pk.chacha20.npz")),
    reason="chacha artifacts not generated",
)
needs_all = pytest.mark.skipif(
    not all(
        os.path.exists(os.path.join(ART, f))
        for f in ("pk.chacha20.npz", "pk.aes128.npz", "pk.aes256.npz")
    ),
    reason="cipher artifacts not generated (python -m zktpu.keygen)",
)


@needs_chacha
def test_racing_init_is_single_and_idempotent():
    from zktpu.api import service

    service._PROVERS.pop("chacha20", None)
    pk, r1cs = _art("pk.chacha20.npz"), _art("r1cs.chacha20")
    results = []
    seen = []
    barrier = threading.Barrier(6)

    def racer():
        barrier.wait()
        results.append(service.init_algorithm(0, pk, r1cs))
        seen.append(service._PROVERS.get("chacha20"))

    threads = [threading.Thread(target=racer) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results), "every racer must see success"
    live = set(id(s) for s in seen if s is not None)
    assert len(live) == 1, "racers must all observe the SAME prover instance"
    assert service._PROVERS.get("chacha20") is not None


@needs_all
@pytest.mark.slow
def test_concurrent_prove_verify_three_ciphers():
    """TestProveVerify analog: one thread per cipher, full JSON round trip,
    all must verify (and a tampered signal must not)."""
    os.environ["ZKTPU_HOST_ASSEMBLE"] = "1"
    from zktpu.api import service

    assert service.init_algorithm(0, _art("pk.chacha20.npz"), _art("r1cs.chacha20"))
    assert service.init_algorithm(1, _art("pk.aes128.npz"), _art("r1cs.aes128"))
    assert service.init_algorithm(2, _art("pk.aes256.npz"), _art("r1cs.aes256"))
    service.load_verifiers_from_dir(ART)

    rng = np.random.default_rng(13)
    jobs = {
        "chacha20": (32, "<I"),
        "aes-128-ctr": (16, ">I"),
        "aes-256-ctr": (32, ">I"),
    }

    # warm each cipher's prove graphs SEQUENTIALLY first, each on a
    # big-stack thread (conftest sets threading.stack_size): XLA:CPU's
    # recursive compile passes overflow an 8 MB stack on the AES witness
    # graph (observed round 4 — deterministic SIGSEGV in backend_compile,
    # not a zktpu path).  The race below then exercises concurrent
    # PROVING, the contract of the reference's TestProveVerify
    # (core_test.go:38-44)
    for cipher, (key_len, _) in jobs.items():
        warm = {
            "cipher": cipher,
            "key": base64.b64encode(bytes(key_len)).decode(),
            "nonce": base64.b64encode(bytes(12)).decode(),
            "counter": 1,
            "input": base64.b64encode(bytes(64)).decode(),
        }
        th = threading.Thread(
            target=service.prove, args=(json.dumps(warm).encode(),)
        )
        th.start()
        th.join()

    errors = []
    oks = {}

    def run(cipher, key_len, ctr_fmt):
        try:
            key = bytes(rng.integers(0, 256, key_len, dtype=np.uint8))
            nonce = bytes(rng.integers(0, 256, 12, dtype=np.uint8))
            counter = 1
            pt = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
            req = {
                "cipher": cipher,
                "key": base64.b64encode(key).decode(),
                "nonce": base64.b64encode(nonce).decode(),
                "counter": counter,
                "input": base64.b64encode(pt).decode(),
            }
            out = json.loads(service.prove(json.dumps(req).encode()))
            ct = base64.b64decode(out["publicSignals"])
            sig = ct + nonce + struct.pack(ctr_fmt, counter) + pt
            vreq = {
                "cipher": cipher,
                "proof": out["proof"]["proofJson"],
                "publicSignals": base64.b64encode(sig).decode(),
            }
            oks[cipher] = service.verify(json.dumps(vreq).encode())
            bad = bytearray(sig)
            bad[1] ^= 1
            vbad = dict(vreq, publicSignals=base64.b64encode(bytes(bad)).decode())
            oks[cipher + ":tamper"] = service.verify(json.dumps(vbad).encode())
        except Exception as e:  # noqa: BLE001
            errors.append((cipher, repr(e)))

    threads = [
        threading.Thread(target=run, args=(c, kl, cf))
        for c, (kl, cf) in jobs.items()
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for c in jobs:
        assert oks[c] is True, f"{c} proof must verify"
        assert oks[c + ":tamper"] is False, f"{c} tampered signal must fail"
