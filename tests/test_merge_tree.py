"""Work-efficient bucket-accumulation merge tree: integer-model validation.

stage_buckets_tree is algebra-agnostic over the point-add callback; replacing
EC addition with integer addition lets us validate the segment bookkeeping
(join/flush logic, sortedness invariants) exhaustively and fast on CPU.  The
EC instantiation is covered by the TPU MSM correctness runs."""

import jax.numpy as jnp
import numpy as np
import pytest

import zktpu.curve.jnp_curve as jc
import zktpu.msm.pippenger as pp


@pytest.fixture()
def int_add(monkeypatch):
    monkeypatch.setattr(
        jc, "point_add", lambda ops, p, q: (p[0] + q[0], p[1] + q[1], p[2] + q[2])
    )


def _run(ds, vals):
    px = vals[:, :, None]
    zeros = np.zeros_like(px)
    BX, _, _ = pp.stage_buckets_tree(
        jnp.asarray(ds), jnp.asarray(px), jnp.asarray(zeros), jnp.asarray(zeros)
    )
    return np.asarray(BX)[:, :, 0]


def _expect(ds, vals):
    out = np.zeros((ds.shape[0], 256), np.uint64)
    for w in range(ds.shape[0]):
        for d, v in zip(ds[w], vals[w]):
            out[w, d] += v
    return out


@pytest.mark.parametrize("alphabet,n", [(10, 64), (256, 64), (3, 128), (256, 256)])
def test_random_buckets(int_add, alphabet, n):
    rng = np.random.default_rng(alphabet * 1000 + n)
    ds = np.sort(rng.integers(0, alphabet, (4, n)), axis=1).astype(np.uint32)
    vals = rng.integers(1, 1000, (4, n)).astype(np.uint32)
    got = _run(ds, vals)
    exp = _expect(ds, vals)
    nz = exp != 0
    assert np.array_equal(got[nz], exp[nz].astype(got.dtype))


def test_single_bucket(int_add):
    ds = np.full((2, 32), 7, np.uint32)
    vals = np.arange(1, 65, dtype=np.uint32).reshape(2, 32)
    got = _run(ds, vals)
    assert got[0, 7] == vals[0].sum() and got[1, 7] == vals[1].sum()


def test_all_distinct(int_add):
    ds = np.tile(np.arange(0, 64, dtype=np.uint32), (2, 1))
    vals = np.arange(100, 164, dtype=np.uint32).reshape(1, -1).repeat(2, 0)
    got = _run(ds, vals)
    for j in range(64):
        assert got[0, j] == vals[0, j]


def test_two_long_runs(int_add):
    ds = np.concatenate(
        [np.zeros((2, 32), np.uint32) + 3, np.zeros((2, 32), np.uint32) + 9], axis=1
    )
    vals = np.ones((2, 64), np.uint32)
    got = _run(ds, vals)
    assert got[0, 3] == 32 and got[0, 9] == 32


@pytest.mark.parametrize("tail", [1, 8, 64, 4096])
def test_tail_width_invariance(int_add, tail):
    """The fori-tail takeover width is a pure compile/runtime trade — the
    bucket results must be identical at any tail (incl. degenerate 1 =
    all-fori and >n = all-unrolled... er, tail>n = no unrolled levels)."""
    rng = np.random.default_rng(tail)
    ds = np.sort(rng.integers(0, 256, (2, 256)), axis=1).astype(np.uint32)
    vals = rng.integers(1, 1000, (2, 256)).astype(np.uint32)
    px = vals[:, :, None]
    zeros = np.zeros_like(px)
    BX, _, _ = pp.stage_buckets_tree(
        jnp.asarray(ds), jnp.asarray(px), jnp.asarray(zeros),
        jnp.asarray(zeros), tail=tail,
    )
    got = np.asarray(BX)[:, :, 0]
    exp = _expect(ds, vals)
    nz = exp != 0
    assert np.array_equal(got[nz], exp[nz].astype(got.dtype))
