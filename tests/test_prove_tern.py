"""Ternary-witness Prover path (gnark-artifact circuits).

A handcrafted 8-constraint system with gnark-Xor-shaped rows
w = a*(1-2b) — whose witness genuinely contains -1 — proves through
Prover.prove_tern and must be byte-identical to the host-reference
big-int proof, and verify (with tamper rejection)."""

import numpy as np
import pytest

from zktpu.field.params import P_FR
from zktpu.r1cs.builder import CompiledR1CS


def _tiny_ternary():
    """Wires: 0=1 | 1..8 public a,b (4+4) | 9..12 internal w_i=a_i*(1-2b_i).
    Constraint i: (a_i) * (1 - 2 b_i) = (w_i), i=0..3; then 4 booleanity
    rows for the a_i so every wire appears in some matrix column."""
    a_rows, a_cols, a_coeffs = [], [], []
    b_rows, b_cols, b_coeffs = [], [], []
    c_rows, c_cols, c_coeffs = [], [], []
    for i in range(4):
        a_rows.append(i); a_cols.append(1 + i); a_coeffs.append(1)
        b_rows.append(i); b_cols.append(0); b_coeffs.append(1)
        b_rows.append(i); b_cols.append(5 + i); b_coeffs.append(P_FR - 2)
        c_rows.append(i); c_cols.append(9 + i); c_coeffs.append(1)
    for i in range(4):  # a_i * (1 - a_i) = 0
        r = 4 + i
        a_rows.append(r); a_cols.append(1 + i); a_coeffs.append(1)
        b_rows.append(r); b_cols.append(0); b_coeffs.append(1)
        b_rows.append(r); b_cols.append(1 + i); b_coeffs.append(P_FR - 1)
    return CompiledR1CS(
        num_constraints=8,
        num_vars=13,
        num_public=8,
        a_rows=np.asarray(a_rows), a_cols=np.asarray(a_cols), a_coeffs=a_coeffs,
        b_rows=np.asarray(b_rows), b_cols=np.asarray(b_cols), b_coeffs=b_coeffs,
        c_rows=np.asarray(c_rows), c_cols=np.asarray(c_cols), c_coeffs=c_coeffs,
    )


def _witness():
    a = [1, 0, 1, 1]
    b = [1, 1, 0, 0]
    w = [(ai * (1 - 2 * bi)) % P_FR for ai, bi in zip(a, b)]
    return [1] + a + b + w


@pytest.fixture(scope="module")
def tern_setup():
    from zktpu.groth16.setup import setup

    cs = _tiny_ternary()
    pk, vk = setup(cs, seed=b"tern-test")
    return cs, pk, vk


@pytest.mark.slow
def test_prove_tern_matches_host_reference(tern_setup):
    from zktpu.compat.bridge import witness_ternary
    from zktpu.compat.gnark import proof_to_gnark_bytes
    from zktpu.groth16 import ref_prove
    from zktpu.groth16.prove import Prover
    from zktpu.groth16.verify import verify

    cs, pk, vk = tern_setup
    z = _witness()
    assert any(v == P_FR - 1 for v in z), "fixture must exercise -1"
    seed = b"tern-seed"
    want = ref_prove.prove_reference(cs, pk, z, seed)

    prover = Prover(cs, pk, assemble_on_host=True)
    got = prover.prove_tern(witness_ternary(z), rng_seed=seed)
    assert proof_to_gnark_bytes(got) == proof_to_gnark_bytes(want)

    pub = z[1:9]
    assert verify(got, vk, pub)
    bad = list(pub)
    bad[0] ^= 1
    assert not verify(got, vk, bad)


@pytest.mark.slow
def test_prove_tern_reduces_to_bit_path(tern_setup):
    """On an all-binary witness the ternary path must produce the same
    proof bytes as the plain bit path."""
    from zktpu.compat.gnark import proof_to_gnark_bytes
    from zktpu.groth16.prove import Prover

    cs, pk, _ = tern_setup
    a = [1, 0, 1, 0]
    b = [0, 0, 0, 0]  # all xors positive -> binary witness
    w = [ai for ai in a]
    z = np.asarray([1] + a + b + w, dtype=np.uint32)
    prover = Prover(cs, pk, assemble_on_host=True)
    p_bits = prover.prove(z, rng_seed=b"x")
    p_tern = prover.prove_tern(z, rng_seed=b"x")
    assert proof_to_gnark_bytes(p_bits) == proof_to_gnark_bytes(p_tern)
