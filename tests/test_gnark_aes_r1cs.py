"""gnark AES r1cs decode + witness solve (VERDICT r3 item 8 groundwork).

The reference's r1cs.aes128/aes256 use the full gnark instruction
vocabulary: 5 BlueprintLookupHint tables (entries in the blueprint
registry), logderivarg countHint multiplicities, the Randomize blinding
hint, and the Bsb22 commitment placeholder.  These tests pin the decode
(incl. the intcomp BlueprintID stream) and prove the solver reproduces a
satisfying witness from a native AES-CTR vector.

Note on scope: the reference snapshot ships NO pk.aes128/pk.aes256
(.MISSING_LARGE_BLOBS) — a proof verifying under the checked-in vk.aes128
is impossible for ANYONE without the matching (stripped) proving key, so
byte-level AES proof interop cannot be demonstrated from this snapshot;
constraint-system-level compatibility (this file) is the provable part.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
AES128 = os.path.join(REF, "circuits", "generated", "r1cs.aes128")
AES256 = os.path.join(REF, "circuits", "generated", "r1cs.aes256")

needs_ref = pytest.mark.skipif(
    not os.path.isfile(AES128), reason="reference artifacts not mounted"
)


def _vector(key_len, seed=7):
    from zktpu.circuits.aes_v2 import aes_ctr_encrypt

    rng = np.random.RandomState(seed)
    key = bytes(rng.randint(0, 256, key_len, dtype=np.uint8))
    nonce = bytes(rng.randint(0, 256, 12, dtype=np.uint8))
    pt = bytes(rng.randint(0, 256, 64, dtype=np.uint8))
    counter = 2
    ct = aes_ctr_encrypt(key, nonce, counter, pt)
    pub = list(nonce) + [counter] + list(pt) + list(ct)
    return pub, list(key)


@needs_ref
def test_aes128_decode_structure():
    from zktpu.compat.gnark_r1cs import LookupInst, read_r1cs

    r1 = read_r1cs(open(AES128, "rb").read())
    assert r1.meta.nb_constraints == 74899
    assert len(r1.lookup_tables) == 5
    assert all(len(t) == 256 for t in r1.lookup_tables)
    # the 5th table is the raw sbox (FIPS-197: sbox[0]=0x63, sbox[1]=0x7c)
    assert r1.lookup_tables[4][:4] == [0x63, 0x7C, 0x77, 0x7B]
    lk = [i for i in r1.instructions if isinstance(i, LookupInst)]
    assert len(lk) == 620
    assert r1.commitment_wire == 66179
    assert len(r1.committed_wires) == 14629


@needs_ref
def test_aes128_solve_and_satisfy():
    from zktpu.compat.gnark_r1cs import check_satisfied, read_r1cs, solve_witness

    r1 = read_r1cs(open(AES128, "rb").read())
    pub, sec = _vector(16)
    z = solve_witness(r1, pub, sec, bsb22_challenge=lambda ins: 0xC0FFEE)
    assert check_satisfied(r1, z)
    # the challenge is a free variable of the logderiv identity: any value
    # must solve (rational-function identity), pin a second one
    z2 = solve_witness(r1, pub, sec, bsb22_challenge=lambda ins: 7)
    assert check_satisfied(r1, z2)


@needs_ref
def test_aes128_rejects_wrong_ciphertext():
    from zktpu.compat.gnark_r1cs import (
        GnarkR1CSError,
        check_satisfied,
        read_r1cs,
        solve_witness,
    )

    r1 = read_r1cs(open(AES128, "rb").read())
    pub, sec = _vector(16)
    pub[20] = (pub[20] + 1) % 256
    try:
        z = solve_witness(r1, pub, sec, bsb22_challenge=lambda ins: 5)
        assert not check_satisfied(r1, z)
    except GnarkR1CSError:
        pass  # solver hitting the broken assert row is equally a rejection


@needs_ref
@pytest.mark.slow
def test_aes256_solve_and_satisfy():
    from zktpu.compat.gnark_r1cs import check_satisfied, read_r1cs, solve_witness

    r1 = read_r1cs(open(AES256, "rb").read())
    assert len(r1.lookup_tables) == 5
    pub, sec = _vector(32, seed=11)
    z = solve_witness(r1, pub, sec, bsb22_challenge=lambda ins: 42)
    assert check_satisfied(r1, z)


# ------------------------------------------- commitment-wire instance remap


def _coo_satisfied(cs, z):
    """COO satisfaction oracle for a CompiledR1CS (independent of Builder)."""
    from zktpu.field.params import P_FR

    def matvec(rows, cols, coeffs):
        out = [0] * cs.num_constraints
        for r, c, v in zip(rows, cols, coeffs):
            out[r] = (out[r] + v * z[c]) % P_FR
        return out

    az = matvec(cs.a_rows, cs.a_cols, cs.a_coeffs)
    bz = matvec(cs.b_rows, cs.b_cols, cs.b_coeffs)
    cz = matvec(cs.c_rows, cs.c_cols, cs.c_coeffs)
    return all(a * b % P_FR == c for a, b, c in zip(az, bz, cz))


@needs_ref
def test_aes128_commitment_remap_satisfies():
    """The instance remap (commitment challenge -> public wire) preserves
    satisfaction: solve in gnark order, permute, check the remapped COO."""
    from zktpu.compat.bridge import compiled_from_gnark, remap_witness
    from zktpu.compat.gnark_r1cs import read_r1cs, solve_witness

    r1 = read_r1cs(open(AES128, "rb").read())
    cs = compiled_from_gnark(r1, remap_commitment=True)
    npw = r1.nb_public_wires
    assert cs.num_public == npw  # 141 publics + the challenge slot
    assert list(cs.challenge_vars) == [npw]
    assert len(cs.committed_vars) == len(r1.committed_wires)
    assert all(int(i) > npw for i in cs.committed_vars)

    pub, sec = _vector(16)
    z = solve_witness(r1, pub, sec, bsb22_challenge=lambda ins: 0xBEEF)
    zr = remap_witness(r1, z)
    assert zr[npw] == 0xBEEF  # the challenge landed in the instance block
    assert _coo_satisfied(cs, zr)
    bad = list(zr)
    bad[5] = (bad[5] + 1) % 2**8
    assert not _coo_satisfied(cs, bad)


@needs_ref
@pytest.mark.slow
def test_aes128_gnark_cs_prove_verify_own_keys():
    """End-to-end Groth16 over the REFERENCE'S OWN aes128 constraint
    system: setup on the remapped cs (our keys — upstream ships no
    pk.aes*), two-phase commit -> challenge -> re-solve, prove through the
    production Prover, verify with the commitment extension + negative."""
    from zktpu.compat.bridge import compiled_from_gnark, remap_witness
    from zktpu.compat.gnark_r1cs import read_r1cs, solve_witness
    from zktpu.groth16.prove import Prover, encode_witness, lookup_challenges
    from zktpu.groth16.setup import setup
    from zktpu.groth16.verify import verify

    r1 = read_r1cs(open(AES128, "rb").read())
    cs = compiled_from_gnark(r1, remap_commitment=True)
    npw = r1.nb_public_wires
    pk, vk = setup(cs, seed=b"gnark-aes128-own")
    assert pk.has_commitment and vk.challenge_slots == [npw]

    pub, sec = _vector(16)
    prover = Prover(cs, pk, assemble_on_host=True)
    # phase 1: committed wires are challenge-independent; commit them
    z1 = remap_witness(r1, solve_witness(r1, pub, sec,
                                         bsb22_challenge=lambda ins: 0))
    _, z1_dig = encode_witness(z1, prover.nv_pad)
    d_aff, ds_aff = prover.commit(z1_dig)
    # phase 2: the real Fiat-Shamir challenge, derived exactly as the
    # verifier will derive it — gnark's own one-challenge BSB22 hash
    # (fr.Hash of the 64-byte commitment, dst "bsb22-commitment")
    (chal,) = lookup_challenges(d_aff, [npw])
    z2 = remap_witness(r1, solve_witness(r1, pub, sec,
                                         bsb22_challenge=lambda ins: chal))
    z_mont, z_dig = encode_witness(z2, prover.nv_pad)
    proof = prover.prove_general(z_mont, z_dig, rng_seed=b"det",
                                 d_aff=d_aff, dsig_aff=ds_aff)
    publics = [int(v) for v in z2[1 : npw + 1]]
    publics[npw - 1] = 0  # verifier derives the challenge itself
    assert verify(proof, vk, publics)
    bad = list(publics)
    bad[20] = (bad[20] + 1) % 256
    assert not verify(proof, vk, bad)
