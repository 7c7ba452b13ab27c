"""gnark byte-format compatibility tests (VERDICT.md round-1 item 5).

Pins zktpu.compat.gnark against the REFERENCE'S OWN artifacts:
  * /root/reference/libraries/verifier/impl/generated/vk.{chacha20,aes128,aes256}
    (embedded by verify_impl.go:24-31),
  * /root/reference/circuits/generated/pk.chacha20 (loaded by
    prove_impl.go:86-91),
  * the example proof in /root/reference/README.md:44-50.

Round-trip byte-equality (parse -> re-serialize == original) is the oracle:
it pins every flag bit and length field, not just "parses without error".
"""

import base64
import os

import pytest

from zktpu.compat import gnark as gk
from zktpu.curve import ref_ec as ec

REF = "/root/reference"
VK_DIR = os.path.join(REF, "libraries", "verifier", "impl", "generated")
PK_PATH = os.path.join(REF, "circuits", "generated", "pk.chacha20")

# README.md:44-50 example output (a real gnark chacha20 proof)
README_PROOF_B64 = (
    "3rJu6SuPFBPDaCLxUdkYnIIoX0rAPOZqj/COpmFPZCueaxhfSs+tY8AbJy1vh0xdTPE4wanv"
    "PkK6gVDGAZFUkwJqzjV2t3Fufxh509I4Nt0LxAK0f6vofjAf0SYkFQ2OqaQxQkPaKXJvVoi7"
    "KNClPg0WWYNPxpNesaOaZ2pXVBMAAAAAQAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA="
)

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not mounted"
)


def _on_g1(aff) -> bool:
    return aff is None or ec.G1_CURVE.is_on_curve(
        ec.G1_CURVE.from_affine(aff[0], aff[1])
    )


def _on_g2(aff) -> bool:
    if aff is None:
        return True
    p = ec.G2_CURVE.from_affine(ec.Fp2(*aff[0]), ec.Fp2(*aff[1]))
    return ec.G2_CURVE.is_on_curve(p)


# ------------------------------------------------------------- point codecs


def test_g1_codec_roundtrip_generator_multiples():
    for k in (1, 2, 3, 5, 123456789, ec.R_ORDER - 1):
        p = ec.G1_CURVE.to_affine(ec.G1_CURVE.mul(ec.G1_GEN, k))
        data = gk.g1_compress(p)
        assert gk.g1_decompress(data) == (p[0], p[1])
    assert gk.g1_decompress(gk.g1_compress(None)) is None


def test_g2_codec_roundtrip_generator_multiples():
    for k in (1, 2, 7, 987654321):
        aff = ec.G2_CURVE.to_affine(ec.G2_CURVE.mul(ec.G2_GEN, k))
        t = ((aff[0].c0, aff[0].c1), (aff[1].c0, aff[1].c1))
        data = gk.g2_compress(t)
        assert gk.g2_decompress(data) == t
    assert gk.g2_decompress(gk.g2_compress(None)) is None


def test_g1_decompress_rejects_bad_flags():
    with pytest.raises(gk.GnarkDecodeError):
        gk.g1_decompress(bytes(32))  # uncompressed flag on 32 bytes
    bad = bytearray(gk.g1_compress(None))
    bad[5] = 1
    with pytest.raises(gk.GnarkDecodeError):
        gk.g1_decompress(bytes(bad))


# -------------------------------------------------------------------- proof


def test_readme_proof_parses_and_roundtrips():
    raw = base64.b64decode(README_PROOF_B64)
    assert len(raw) == 164
    proof = gk.proof_from_gnark_bytes(raw)
    assert _on_g1(proof.a) and _on_g1(proof.c) and _on_g2(proof.b)
    assert proof.d is None
    assert gk.proof_to_gnark_bytes(proof) == raw


def test_our_proof_serializes_to_gnark_format():
    from zktpu.groth16.prove import Proof

    a = ec.G1_CURVE.to_affine(ec.G1_CURVE.mul(ec.G1_GEN, 11))
    c = ec.G1_CURVE.to_affine(ec.G1_CURVE.mul(ec.G1_GEN, 13))
    b2 = ec.G2_CURVE.to_affine(ec.G2_CURVE.mul(ec.G2_GEN, 17))
    proof = Proof(
        a=(a[0], a[1]),
        b=((b2[0].c0, b2[0].c1), (b2[1].c0, b2[1].c1)),
        c=(c[0], c[1]),
    )
    raw = gk.proof_to_gnark_bytes(proof)
    assert len(raw) == 164
    back = gk.proof_from_gnark_bytes(raw)
    assert back.a == proof.a and back.b == proof.b and back.c == proof.c


# ----------------------------------------------------------------------- vk


@needs_ref
@pytest.mark.parametrize(
    "fname,n_ic,ncomm",
    [("vk.chacha20", 1153, 0), ("vk.aes128", 143, 1), ("vk.aes256", 143, 1)],
)
def test_reference_vk_parses_and_roundtrips(fname, n_ic, ncomm):
    raw = open(os.path.join(VK_DIR, fname), "rb").read()
    vk = gk.read_vk(raw)
    assert len(vk.ic) == n_ic
    assert len(vk.public_and_commitment_committed) == ncomm
    assert _on_g1(vk.alpha_g1) and _on_g1(vk.delta_g1)
    assert _on_g2(vk.beta_g2) and _on_g2(vk.gamma_g2) and _on_g2(vk.delta_g2)
    for p in vk.ic[:8]:
        assert _on_g1(p)
    if ncomm:
        assert _on_g2(vk.pedersen_g) and _on_g2(vk.pedersen_g_root_sigma_neg)
    # byte-exact re-serialization pins every flag and length field
    assert gk.write_vk(vk) == raw


# ----------------------------------------------------------------------- pk


@pytest.fixture(scope="module")
def parsed_pk():
    # read_pk on the ~100 MB reference pk costs ~16 s; share one parse
    return gk.read_pk(open(PK_PATH, "rb").read())


@needs_ref
def test_reference_pk_writer_roundtrips_byte_exact(parsed_pk):
    """write_pk is the full inverse of read_pk on the reference's own
    artifact — our artifacts are WRITABLE as gnark pk files (C12)."""
    raw = open(PK_PATH, "rb").read()
    assert gk.write_pk(parsed_pk) == raw


@needs_ref
def test_reference_pk_parses_consistently(parsed_pk):
    pk = parsed_pk
    vk = gk.read_vk(open(os.path.join(VK_DIR, "vk.chacha20"), "rb").read())
    assert pk.domain_n == 32768
    assert pk.nb_wires == 23281
    assert len(pk.a) == pk.nb_wires and len(pk.b1) == pk.nb_wires
    assert len(pk.z) == pk.domain_n - 1
    # nbPrivate = nbWires - nbPublic - 1; vk.ic has nbPublic + 1 entries
    assert len(pk.k) == pk.nb_wires - len(vk.ic)
    # pk and vk must share the CRS scalars
    assert pk.alpha_g1 == vk.alpha_g1
    assert pk.beta_g2 == vk.beta_g2
    assert pk.delta_g2 == vk.delta_g2
    # domain generator is a 32768th root of unity; coset gen matches ours
    assert pow(pk.fr_generator, pk.domain_n, ec.R_ORDER) == 1
    assert pow(pk.fr_generator, pk.domain_n // 2, ec.R_ORDER) != 1
    assert pk.coset_gen == 5
    for p in (pk.a[1], pk.b1[0], pk.z[0], pk.k[0]):
        assert p is None or _on_g1(p)
    assert _on_g2(pk.b2[0])


# --------------------------------------------------------------------- r1cs


@needs_ref
@pytest.mark.parametrize(
    "fname,n_constraints,n_public,n_secret,ncomm",
    [
        ("r1cs.chacha20", 23617, 1152, 256, 0),
        ("r1cs.aes128", None, 141, 16, 1),
        ("r1cs.aes256", None, 141, 32, 1),
    ],
)
def test_reference_r1cs_metadata(fname, n_constraints, n_public, n_secret, ncomm):
    from zktpu.compat import gnark_r1cs as gr

    raw = open(os.path.join(REF, "circuits", "generated", fname), "rb").read()
    meta = gr.read_r1cs_meta(raw)
    assert meta.gnark_version == "0.11.0"
    assert meta.scalar_field == ec.R_ORDER
    if n_constraints is not None:
        assert meta.nb_constraints == n_constraints
    assert meta.nb_public == n_public
    assert len(meta.secret_names) == n_secret
    assert meta.nb_commitments == ncomm
    # hint table names the binary-decomposition hint the circuits use
    assert any("bits" in v for v in meta.hint_names.values())


@needs_ref
def test_reference_r1cs_consistent_with_pk_vk(parsed_pk):
    """Cross-artifact consistency: wire/public counts from the r1cs must
    match the independently parsed pk (nbWires) and vk (len(ic))."""
    from zktpu.compat import gnark_r1cs as gr

    meta = gr.read_r1cs_meta(
        open(os.path.join(REF, "circuits", "generated", "r1cs.chacha20"), "rb").read()
    )
    pk = parsed_pk
    vk = gk.read_vk(open(os.path.join(VK_DIR, "vk.chacha20"), "rb").read())
    assert meta.nb_wires == pk.nb_wires == 23281
    assert len(vk.ic) == meta.nb_public + 1
    assert meta.nb_constraints <= pk.domain_n
    # witness layout contract: Counter/Nonce/In/Out bit names in order
    assert meta.public_names[0] == "1"
    assert meta.public_names[1] == "Counter_0"
    assert meta.public_names[33] == "Nonce_0_0"
    assert meta.secret_names[0] == "Key_0_0"


@needs_ref
def test_gnark_aes_vk_converts_to_verifier_form():
    """The reference's binary vk.aes128 loads into our VerifyingKey with the
    pedersen-form PoK pair and the trailing challenge slot (gnark appends
    commitment wires after the regular publics: slot = len(ic) - 1 = 142
    for 141 public bytes).  A garbage proof must verify False, not raise.
    (A POSITIVE gnark-AES interop check is impossible in this snapshot —
    pk.aes* are stripped upstream, .MISSING_LARGE_BLOBS.)"""
    from zktpu.compat.bridge import verifying_key_from_gnark
    from zktpu.groth16.prove import Proof
    from zktpu.groth16.verify import verify

    raw = open(os.path.join(VK_DIR, "vk.aes128"), "rb").read()
    vk = verifying_key_from_gnark(gk.read_vk(raw))
    assert vk.pedersen_g is not None and vk.pedersen_g_root_sigma_neg is not None
    assert vk.sigma_g2 is None
    assert vk.challenge_slots == [142]
    assert len(vk.ic) == 143
    bogus = Proof(a=(1, 2), b=((1, 0), (2, 0)), c=(1, 2), d=(1, 2), d_sigma=(1, 2))
    assert verify(bogus, vk, [0] * 142) is False
    # commitment missing entirely -> False
    assert verify(Proof(a=(1, 2), b=((1, 0), (2, 0)), c=(1, 2)), vk, [0] * 142) is False


@needs_ref
def test_service_loads_gnark_aes_vk():
    """load_verifiers_from_dir no longer skips the reference's binary AES
    vks (VERDICT r4 L3 note)."""
    from zktpu.api import service

    old = dict(service._VERIFIERS)
    try:
        service._VERIFIERS.clear()
        service.load_verifiers_from_dir(VK_DIR)
        assert "aes-128-ctr" in service._VERIFIERS
        assert "aes-256-ctr" in service._VERIFIERS
        assert "chacha20" in service._VERIFIERS
        svc = service._VERIFIERS["aes-128-ctr"]
        assert svc.vk.challenge_slots == [142]
        assert svc.verify(b"garbage", bytes(144)) is False
    finally:
        service._VERIFIERS.clear()
        service._VERIFIERS.update(old)
