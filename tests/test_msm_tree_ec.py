"""EC-typed correctness of the merge-tree Pippenger path (VERDICT.md round-1
weak #8: the tree was only ever validated in the integer model; here it runs
with real curve points at a size that exercises BOTH the unrolled head levels
and the fixed-width fori tail, against the Python msm_reference oracle)."""

import numpy as np
import pytest

from zktpu.curve import jnp_curve as jc
from zktpu.curve import ref_ec as ec
from zktpu.field import limb
from zktpu.field.params import FR
from zktpu.msm import pippenger as pp


@pytest.fixture(scope="module")
def point_set():
    rng = np.random.default_rng(42)
    n = 4096  # > TREE_TAIL_WIDTH so the head unroll AND fori tail both run
    base = [ec.G1_CURVE.mul(ec.G1_GEN, int(k)) for k in rng.integers(1, 2**62, 64)]
    pts = [base[i % 64] for i in range(n)]  # reuse: host point gen is slow
    P = jc.g1_to_limbs(pts)
    infm = jc.g1_inf_mask(pts)
    return pts, P, infm, rng


def _run_tree(P, infm, scalars):
    S = limb.encode(scalars, FR, mont=False)
    msm = pp.StagedMSM(jc.G1)
    res = msm(P, infm, S)
    return jc.limbs_to_g1(res)


@pytest.mark.slow  # ~88 s of XLA:CPU compile; the merge tree's fast-tier
# coverage is test_merge_tree (synthetic segments) + the fixed-MSM suite
def test_tree_msm_matches_reference(point_set):
    pts, P, infm, rng = point_set
    scalars = [int(s) for s in rng.integers(0, 2**63, len(pts))]
    # mix in adversarial digit patterns: all-zero, all-255 digits, dup runs
    scalars[0] = 0
    scalars[1] = int.from_bytes(b"\xff" * 31, "big")
    scalars[2:10] = [scalars[2]] * 8  # long equal-digit segments after sort
    got = _run_tree(P, infm, scalars)
    # oracle shortcut: pts repeats base[i % 64], so fold the 4096 scalars
    # into 64 per-point sums mod r first (64 host scalar-muls, not 4096) —
    # the device-side tree still sees all 4096 (point, scalar) pairs
    base = pts[:64]
    folded = [0] * 64
    for i, s in enumerate(scalars):
        folded[i % 64] = (folded[i % 64] + s) % FR.modulus
    want = pp.msm_reference(base, folded)
    assert ec.G1_CURVE.eq(got, want)


@pytest.mark.slow
def test_tree_msm_with_infinity_points(point_set):
    pts, P, infm, rng = point_set
    P = P.copy()
    infm = infm.copy()
    infm[::7] = True  # mask out a stripe of points
    scalars = [int(s) for s in rng.integers(0, 2**31, len(pts))]
    got = _run_tree(P, infm, scalars)
    want = pp.msm_reference(
        [p for i, p in enumerate(pts) if not infm[i]],
        [s for i, s in enumerate(scalars) if not infm[i]],
    )
    assert ec.G1_CURVE.eq(got, want)
