"""Signed-bit (ternary) MSM correctness — the gnark-witness MSM primitive.

gnark r1cs witnesses contain {-1,0,1} entries (Xor intermediates a*(1-2b),
compat.gnark_r1cs); pp.msm_tern handles them by y-negation inside the same
msm_bits fold.  Oracle: ref_ec point sums."""

import numpy as np
import pytest

from zktpu.curve import jnp_curve as jc
from zktpu.curve import ref_ec as ec
from zktpu.field.params import P_FR
from zktpu.msm import pippenger as pp


@pytest.fixture(scope="module")
def g1_points():
    rng = np.random.default_rng(7)
    n = 512
    base = [ec.G1_CURVE.mul(ec.G1_GEN, int(k)) for k in rng.integers(1, 2**62, 32)]
    pts = [base[i % 32] for i in range(n)]
    return pts, jc.g1_to_limbs(pts), jc.g1_inf_mask(pts), rng


def _host_tern(pts, zt, curve=ec.G1_CURVE):
    acc = curve.infinity()
    for p, v in zip(pts, zt):
        if v == 1:
            acc = curve.add(acc, p)
        elif v == 2:
            acc = curve.add(acc, curve.neg(p))
    return acc


def test_msm_tern_matches_reference(g1_points):
    pts, P, infm, rng = g1_points
    zt = rng.integers(0, 3, len(pts)).astype(np.uint32)
    zt[:4] = [0, 1, 2, 2]  # pin all three codes
    got = jc.limbs_to_g1(pp.msm_tern(P, infm, zt))
    assert ec.G1_CURVE.eq(got, _host_tern(pts, zt))


@pytest.mark.slow
def test_msm_tern_reduces_to_bits_on_binary_input(g1_points):
    pts, P, infm, rng = g1_points
    zb = rng.integers(0, 2, len(pts)).astype(np.uint32)
    t = jc.limbs_to_g1(pp.msm_tern(P, infm, zb))
    b = jc.limbs_to_g1(pp.msm_bits(P, infm, zb))
    assert ec.G1_CURVE.eq(t, b)


@pytest.mark.slow
def test_msm_tern_all_negative(g1_points):
    pts, P, infm, _ = g1_points
    zt = np.full(len(pts), 2, dtype=np.uint32)
    got = jc.limbs_to_g1(pp.msm_tern(P, infm, zt))
    want = ec.G1_CURVE.neg(_host_tern(pts, np.ones(len(pts), np.uint32)))
    assert ec.G1_CURVE.eq(got, want)


def test_msm_tern_g2():
    rng = np.random.default_rng(11)
    n = 64
    base = [ec.G2_CURVE.mul(ec.G2_GEN, int(k)) for k in rng.integers(1, 2**40, 8)]
    pts = [base[i % 8] for i in range(n)]
    P = jc.g2_to_limbs(pts)
    infm = jc.g2_inf_mask(pts)
    zt = rng.integers(0, 3, n).astype(np.uint32)
    got = jc.limbs_to_g2(pp.msm_tern(P, infm, zt, ops=jc.G2))
    want = _host_tern(pts, zt, curve=ec.G2_CURVE)
    assert ec.G2_CURVE.eq(got, want)


def test_witness_ternary_codec():
    from zktpu.compat.bridge import witness_ternary

    zt = witness_ternary([0, 1, P_FR - 1, 1, 0])
    assert zt.tolist() == [0, 1, 2, 1, 0]
    with pytest.raises(ValueError):
        witness_ternary([0, 5])
