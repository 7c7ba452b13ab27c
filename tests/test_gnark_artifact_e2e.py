"""SURVEY.md §7 Phase 5 acceptance: prove from the REFERENCE'S OWN artifacts.

The reference prover loads gnark pk/r1cs at runtime (prove_impl.go:86-107)
and its proofs verify under the embedded vk (verify_impl.go:24-31).  These
tests do the same through zktpu: decode /root/reference/circuits/generated/
{r1cs,pk}.chacha20, solve the witness from the decoded instruction stream,
prove, and verify under the checked-in vk.chacha20 — plus re-serialize the
proof in gnark's own wire layout (provers.go:152-157).

The fast tier covers decode + witness-solve + constraint satisfaction; the
slow tier runs the full host-path Groth16 prove (~1 min of big-int math).
"""

import os
import struct

import numpy as np
import pytest

REF = "/root/reference"
R1CS_PATH = os.path.join(REF, "circuits", "generated", "r1cs.chacha20")
PK_PATH = os.path.join(REF, "circuits", "generated", "pk.chacha20")
VK_PATH = os.path.join(
    REF, "libraries", "verifier", "impl", "generated", "vk.chacha20"
)

needs_ref = pytest.mark.skipif(
    not os.path.isfile(R1CS_PATH), reason="reference artifacts not mounted"
)


def _rotl(x, n):
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def _chacha_block(kw, counter, nw):
    """RFC 7539 block function (native-cipher oracle, provers.go:93-101)."""
    c = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
    st = c + kw + [counter] + nw
    w = list(st)

    def qr(w, a, b, cc, d):
        w[a] = (w[a] + w[b]) & 0xFFFFFFFF
        w[d] = _rotl(w[d] ^ w[a], 16)
        w[cc] = (w[cc] + w[d]) & 0xFFFFFFFF
        w[b] = _rotl(w[b] ^ w[cc], 12)
        w[a] = (w[a] + w[b]) & 0xFFFFFFFF
        w[d] = _rotl(w[d] ^ w[a], 8)
        w[cc] = (w[cc] + w[d]) & 0xFFFFFFFF
        w[b] = _rotl(w[b] ^ w[cc], 7)

    for _ in range(10):
        for idx in (
            (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
            (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
        ):
            qr(w, *idx)
    return [(w[i] + st[i]) & 0xFFFFFFFF for i in range(16)]


def _vector(seed: int = 1234, counter: int = 3):
    """Random (key, nonce, counter, pt, ct) with ct from the native cipher."""
    rng = np.random.RandomState(seed)
    key = bytes(rng.randint(0, 256, 32, dtype=np.uint8))
    nonce = bytes(rng.randint(0, 256, 12, dtype=np.uint8))
    pt = bytes(rng.randint(0, 256, 64, dtype=np.uint8))
    kw = list(struct.unpack("<8I", key))
    nw = list(struct.unpack("<3I", nonce))
    ks = struct.pack("<16I", *_chacha_block(kw, counter, nw))
    ct = bytes(a ^ b for a, b in zip(pt, ks))
    return key, nonce, counter, pt, ct


def _assignment(key, nonce, counter, pt, ct):
    """(public_vals, secret_vals) in gnark wire order."""
    from zktpu.api.service import chacha_public_bits

    pub = chacha_public_bits(counter, nonce, pt, ct)
    kw = struct.unpack("<8I", key)
    keybits = [(w >> i) & 1 for w in kw for i in range(32)]
    return pub, keybits


@needs_ref
def test_decode_solve_and_satisfy():
    """Instruction-stream decode end-to-end: 23954 units, 23617 R1Cs, a
    witness solved from a real vector satisfies every constraint."""
    from zktpu.compat.gnark_r1cs import check_satisfied, read_r1cs, solve_witness

    r1 = read_r1cs(open(R1CS_PATH, "rb").read())
    assert r1.meta.nb_constraints == 23617
    assert len(r1.instructions) == 23954
    assert r1.nb_wires == 23281
    pub, keybits = _assignment(*_vector())
    z = solve_witness(r1, pub, keybits)
    assert check_satisfied(r1, z)
    # gnark's Xor emits a*(1-2b) intermediates: the witness is TERNARY
    from zktpu.field.params import P_FR

    vals = set()
    for v in z:
        vals.add(0 if v == 0 else (1 if v == 1 else (-1 if v == P_FR - 1 else 2)))
    assert 2 not in vals, "chacha witness must be ternary {0,1,-1}"
    assert -1 in vals


@needs_ref
def test_decode_rejects_tampered_witness():
    from zktpu.compat.gnark_r1cs import check_satisfied, read_r1cs, solve_witness

    r1 = read_r1cs(open(R1CS_PATH, "rb").read())
    pub, keybits = _assignment(*_vector(seed=77))
    z = solve_witness(r1, pub, keybits)
    z[2000] = (z[2000] + 1) % 3
    assert not check_satisfied(r1, z)


@needs_ref
@pytest.mark.slow
def test_service_accepts_reference_artifacts():
    """Drop-in contract: init_algorithm fed the reference's own gnark
    pk/r1cs bytes (prove_impl.go:86-107), Prove returns gnark proof bytes
    in proofJson (provers.go:152-157), Verify checks them against the
    reference's own binary vk.chacha20 loaded from disk."""
    import base64
    import json

    os.environ["ZKTPU_HOST_ASSEMBLE"] = "1"
    from zktpu.api import service
    from zktpu.compat.gnark import proof_from_gnark_bytes

    service._PROVERS.pop("chacha20", None)
    assert service.init_algorithm(
        0, open(PK_PATH, "rb").read(), open(R1CS_PATH, "rb").read()
    )
    assert isinstance(
        service._PROVERS["chacha20"], service.GnarkChaChaProverService
    )
    service.load_verifiers_from_dir(os.path.dirname(VK_PATH))

    key, nonce, counter, pt, ct = _vector(seed=5150)
    req = {
        "cipher": "chacha20",
        "key": base64.b64encode(key).decode(),
        "nonce": base64.b64encode(nonce).decode(),
        "counter": counter,
        "input": base64.b64encode(pt).decode(),
    }
    out = json.loads(service.prove(json.dumps(req).encode()))
    got_ct = base64.b64decode(out["publicSignals"])
    assert got_ct == ct, "native-cipher ciphertext must match the oracle"
    proof_raw = base64.b64decode(out["proof"]["proofJson"])
    proof_from_gnark_bytes(proof_raw)  # must parse as a gnark proof

    sig = ct + nonce + struct.pack("<I", counter) + pt
    vreq = {
        "cipher": "chacha20",
        "proof": base64.b64encode(proof_raw).decode(),
        "publicSignals": base64.b64encode(sig).decode(),
    }
    assert service.verify(json.dumps(vreq).encode()) is True
    bad = bytearray(sig)
    bad[0] ^= 1
    vbad = dict(vreq, publicSignals=base64.b64encode(bytes(bad)).decode())
    assert service.verify(json.dumps(vbad).encode()) is False


@needs_ref
@pytest.mark.slow
def test_prove_from_reference_artifacts_verifies_under_reference_vk():
    """THE Phase 5 acceptance: TPU-framework proof from the reference's own
    pk.chacha20/r1cs.chacha20 verifies under the checked-in vk.chacha20,
    and serializes byte-exactly in gnark's proof layout."""
    from zktpu.compat.bridge import (
        compiled_from_gnark,
        proving_key_from_gnark,
        verifying_key_from_gnark,
    )
    from zktpu.compat.gnark import (
        proof_from_gnark_bytes,
        proof_to_gnark_bytes,
        read_pk,
        read_vk,
    )
    from zktpu.compat.gnark_r1cs import read_r1cs, solve_witness
    from zktpu.groth16 import ref_prove
    from zktpu.groth16.verify import verify

    r1 = read_r1cs(open(R1CS_PATH, "rb").read())
    gpk = read_pk(open(PK_PATH, "rb").read())
    gvk = read_vk(open(VK_PATH, "rb").read())
    cs = compiled_from_gnark(r1)
    pk = proving_key_from_gnark(gpk, cs.num_instance)
    vk = verifying_key_from_gnark(gvk)

    pub, keybits = _assignment(*_vector(seed=2024))
    z = solve_witness(r1, pub, keybits)
    proof = ref_prove.prove_reference(cs, pk, z, b"gnark-artifact-e2e")

    assert verify(proof, vk, pub), "proof must verify under reference vk"

    # gnark wire format round trip (provers.go:152-157 WriteTo layout)
    raw = proof_to_gnark_bytes(proof)
    assert len(raw) == 164
    back = proof_from_gnark_bytes(raw)
    assert back.a == proof.a and back.b == proof.b and back.c == proof.c

    # tampered statement must fail
    bad = list(pub)
    bad[40] ^= 1
    assert not verify(proof, vk, bad)


@needs_ref
def test_vector_solver_matches_bigint_oracle():
    """The production drop-in witness solver (compat.fast_solver, VERDICT r4
    item 4): compiled int64 leveled replay == sequential big-int solver,
    wire for wire, on random vectors."""
    import struct as _struct

    from zktpu.api.service import _native_chacha_ct, chacha_public_bits
    from zktpu.compat import fast_solver as fs
    from zktpu.compat.gnark_r1cs import read_r1cs, solve_witness
    from zktpu.field.params import P_FR

    r1 = read_r1cs(open(R1CS_PATH, "rb").read())
    vs = fs.VectorSolver(r1)
    rng = np.random.default_rng(5150)
    for _ in range(2):
        key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        nonce = bytes(rng.integers(0, 256, 12, dtype=np.uint8))
        inp = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        counter = int(rng.integers(0, 2**32))
        ct = _native_chacha_ct(key, nonce, counter, inp)
        pub = chacha_public_bits(counter, nonce, inp, ct)
        kb = [(w >> i) & 1 for w in _struct.unpack("<8I", key) for i in range(32)]
        z = vs.solve(pub, kb)
        want = solve_witness(r1, pub, kb)
        assert [int(v) % P_FR for v in z] == [int(v) for v in want]
        zt = fs.ternary_codes(z)
        assert zt.shape == (r1.nb_wires,) and set(np.unique(zt)) <= {0, 1, 2}
