"""Groth16 end-to-end on a tiny circuit: setup -> TPU-path prove -> CPU verify.

Exercises every prover stage (bit matvec + REDC, NTT quotient pipeline, bit
MSMs, Pippenger H MSM, proof assembly, pairing verification) at a size where
XLA compiles fast.  The full ChaCha circuit runs the same code paths
(tests/test_chacha_e2e.py, marked slow)."""

import numpy as np
import pytest

from zktpu.groth16.prove import Prover
from zktpu.groth16.setup import setup
from zktpu.groth16.verify import verify
from zktpu.r1cs.builder import Builder, lc_var


def tiny_circuit():
    """pub p must equal s0 XOR s1 for secret bits s0, s1."""
    b = Builder()
    (p,) = b.pub(1)
    s0, s1 = b.secret(2)
    b.assert_bool(lc_var(s0))
    b.assert_bool(lc_var(s1))
    t = b.xor(lc_var(s0), lc_var(s1))
    b.assert_eq(t, lc_var(p))
    return b


@pytest.fixture(scope="module")
def artifacts():
    builder = tiny_circuit()
    cs = builder.compile()
    pk, vk = setup(cs, seed=b"tiny-test-seed")
    return builder, cs, pk, vk


def _witness(s0, s1):
    t = s0 ^ s1
    return np.array([1, t, s0, s1, t], dtype=np.uint32)


@pytest.mark.slow
def test_prove_verify_roundtrip(artifacts):
    builder, cs, pk, vk = artifacts
    z = _witness(1, 0)
    assert builder.check_witness(z)
    prover = Prover(cs, pk)
    proof = prover.prove(z, rng_seed=b"det")
    assert verify(proof, vk, [1])
    # wrong public input must fail
    assert not verify(proof, vk, [0])


@pytest.mark.slow
def test_all_witness_combinations(artifacts):
    builder, cs, pk, vk = artifacts
    prover = Prover(cs, pk)
    for s0 in (0, 1):
        for s1 in (0, 1):
            z = _witness(s0, s1)
            proof = prover.prove(z, rng_seed=b"det2")
            assert verify(proof, vk, [s0 ^ s1])
            assert not verify(proof, vk, [1 - (s0 ^ s1)])


@pytest.mark.slow
def test_randomized_proofs_differ_but_verify(artifacts):
    _, cs, pk, vk = artifacts
    prover = Prover(cs, pk)
    z = _witness(0, 1)
    p1 = prover.prove(z)  # fresh randomizers
    p2 = prover.prove(z)
    assert p1.a != p2.a  # r differs
    assert verify(p1, vk, [1]) and verify(p2, vk, [1])


@pytest.mark.slow
def test_tampered_proof_rejected(artifacts):
    _, cs, pk, vk = artifacts
    prover = Prover(cs, pk)
    proof = prover.prove(_witness(1, 1), rng_seed=b"det3")
    assert verify(proof, vk, [0])
    bad = type(proof)(a=(proof.a[0] + 1, proof.a[1]), b=proof.b, c=proof.c)
    assert not verify(bad, vk, [0])
