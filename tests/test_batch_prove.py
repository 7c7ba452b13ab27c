"""Data-parallel batch proving (SURVEY §2.3 DP axis): Prover.prove_batch
must produce BYTE-IDENTICAL proofs to one-at-a-time Prover.prove for the
same rng seeds — the batch path reuses every algorithm, only vmapped."""

import numpy as np
import pytest

from zktpu.api.service import proof_to_bytes
from zktpu.groth16.prove import Prover
from zktpu.groth16.setup import setup
from zktpu.groth16.verify import verify
from zktpu.r1cs.builder import Builder, lc_var


@pytest.fixture(scope="module")
def tiny():
    b = Builder()
    pubs = b.pub(8)
    secs = b.secret(8)
    prev = None
    for p, s in zip(pubs, secs):
        b.assert_bool(lc_var(s))
        t = b.xor(lc_var(s), lc_var(p))
        prev = b.xor(t, prev) if prev is not None else t
    cs = b.compile()
    pk, vk = setup(cs, seed=b"batch-test")
    return b, cs, pk, vk


def _witness(b, cs, svals, pvals):
    z = [1] + pvals + svals
    prev = None
    for p, s in zip(pvals, svals):
        t = s ^ p
        z.append(t)
        if prev is not None:
            prev = t ^ prev
            z.append(prev)
        else:
            prev = t
    z = np.asarray(z[: cs.num_vars], dtype=np.uint32)
    assert b.check_witness(z)
    return z


@pytest.mark.slow
def test_batch_matches_single(tiny):
    b, cs, pk, vk = tiny
    prover = Prover(cs, pk)
    rng = np.random.default_rng(5)
    zs, pubs, seeds = [], [], []
    for i in range(2):
        svals = [int(x) for x in rng.integers(0, 2, 8)]
        pvals = [int(x) for x in rng.integers(0, 2, 8)]
        zs.append(_witness(b, cs, svals, pvals))
        pubs.append(pvals)
        seeds.append(b"batch-%d" % i)
    singles = [prover.prove(z, rng_seed=s) for z, s in zip(zs, seeds)]
    batch = prover.prove_batch(np.stack(zs), seeds)
    for one, many in zip(singles, batch):
        assert proof_to_bytes(one) == proof_to_bytes(many)
    # byte equality makes per-proof pairing checks redundant; verify ONE
    # (the pairing is ~60 s of pure Python per call on the CPU test host)
    assert verify(batch[0], vk, pubs[0])


@pytest.mark.slow
def test_prove_device_matches_prove(tiny):
    """The fetch-deferred pipelined path (prove_device + finish_proof) is
    byte-identical to prove() for the same seed — bench phase 4's
    throughput number measures the production proof, not a variant."""
    b, cs, pk, vk = tiny
    prover = Prover(cs, pk)
    rng = np.random.default_rng(9)
    zs, seeds = [], []
    for i in range(2):
        svals = [int(x) for x in rng.integers(0, 2, 8)]
        pvals = [int(x) for x in rng.integers(0, 2, 8)]
        zs.append(_witness(b, cs, svals, pvals))
        seeds.append(b"pipe-%d" % i)
    devs = [prover.prove_device(z, rng_seed=s) for z, s in zip(zs, seeds)]
    piped = [prover.finish_proof(d) for d in devs]
    singles = [
        prover.prove(z, rng_seed=s, assemble_on_host=False)
        for z, s in zip(zs, seeds)
    ]
    for one, many in zip(singles, piped):
        assert (one.a, one.b, one.c) == (many.a, many.b, many.c)


@pytest.mark.slow
def test_batch_dp_mesh_matches_single(tiny):
    """One-proof-per-chip DP (VERDICT r4 item 6): prove_batch(mesh=...)
    shards the batch axis over the 8-virtual-device mesh — each chip runs
    the whole single-proof graph locally; proofs must be byte-identical to
    sequential prove() for the same seeds."""
    import jax
    from jax.sharding import Mesh

    b, cs, pk, vk = tiny
    prover = Prover(cs, pk)
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("x",))
    rng = np.random.default_rng(21)
    zs, pubs, seeds = [], [], []
    for i in range(8):
        svals = [int(x) for x in rng.integers(0, 2, 8)]
        pvals = [int(x) for x in rng.integers(0, 2, 8)]
        zs.append(_witness(b, cs, svals, pvals))
        pubs.append(pvals)
        seeds.append(b"dp-%d" % i)
    batch = prover.prove_batch(np.stack(zs), seeds, mesh=mesh)
    # sequential oracle: the host-reference big-int prover (milliseconds,
    # no extra XLA compile) — independent implementation of the equations
    from zktpu.groth16 import ref_prove

    for i, (z, s) in enumerate(zip(zs, seeds)):
        one = ref_prove.prove_reference(cs, pk, [int(v) for v in z], s)
        assert proof_to_bytes(one) == proof_to_bytes(batch[i]), i
    assert verify(batch[3], vk, pubs[3])
