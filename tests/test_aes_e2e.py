"""AES-128-CTR service-level golden e2e (VERDICT.md round-1 item 2, the
TestFullAES128 analog — /root/reference/libraries/core_test.go:174-231).

Slow-marked: one full ~45k-constraint two-phase lookup prove.  The driver's
fast CI runs the protocol/circuit tiers; this runs via `-m slow` or the TPU
e2e scripts (it completed on the tunneled chip — see ARCHITECTURE.md perf
table for timings).
"""

import base64
import json
import os
import struct

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "generated")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "pk.aes128.npz")),
    reason="aes128 artifacts not generated (python -m zktpu.keygen --ciphers aes-128-ctr)",
)


@pytest.mark.slow
def test_full_aes128_prove_verify():
    from zktpu.api import service

    with open(os.path.join(ART, "pk.aes128.npz"), "rb") as f:
        pk = f.read()
    with open(os.path.join(ART, "r1cs.aes128"), "rb") as f:
        r1cs = f.read()
    assert service.init_algorithm(1, pk, r1cs)
    service.load_verifiers_from_dir(ART)

    rng = np.random.default_rng(11)
    key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    nonce = bytes(rng.integers(0, 256, 12, dtype=np.uint8))
    counter = 0xDEADBEEF
    pt = bytes(rng.integers(0, 256, 64, dtype=np.uint8))

    req = {
        "cipher": "aes-128-ctr",
        "key": base64.b64encode(key).decode(),
        "nonce": base64.b64encode(nonce).decode(),
        "counter": counter,
        "input": base64.b64encode(pt).decode(),
    }
    out = json.loads(service.prove(json.dumps(req).encode()))
    ct = base64.b64decode(out["publicSignals"])

    # AES proofJson is gnark proof.WriteTo bytes (provers.go:152-157 serves
    # gnark bytes for every cipher): must parse with the gnark reader and
    # byte-round-trip, carrying the commitment + PoK (VERDICT r4 item 5)
    from zktpu.compat.gnark import proof_from_gnark_bytes, proof_to_gnark_bytes

    pb = base64.b64decode(out["proof"]["proofJson"])
    gp = proof_from_gnark_bytes(pb)
    assert gp.d is not None and gp.d_sigma is not None
    assert proof_to_gnark_bytes(gp) == pb

    from zktpu.circuits.aes_v2 import aes_ctr_encrypt

    assert ct == aes_ctr_encrypt(key, nonce, counter, pt)

    # 144-byte publicSignals, counter BIG-endian for AES (core_test.go:204-206)
    ps = ct + nonce + struct.pack(">I", counter) + pt
    vreq = {
        "cipher": "aes-128-ctr",
        "proof": out["proof"]["proofJson"],
        "publicSignals": base64.b64encode(ps).decode(),
    }
    assert service.verify(json.dumps(vreq).encode()) is True

    bad = bytearray(ps)
    bad[3] ^= 1  # flip a ciphertext byte
    vbad = dict(vreq)
    vbad["publicSignals"] = base64.b64encode(bytes(bad)).decode()
    assert service.verify(json.dumps(vbad).encode()) is False

    # LE counter (ChaCha's convention) must NOT verify for AES
    ps_le = ct + nonce + struct.pack("<I", counter) + pt
    vle = dict(vreq)
    vle["publicSignals"] = base64.b64encode(ps_le).decode()
    assert service.verify(json.dumps(vle).encode()) is False
