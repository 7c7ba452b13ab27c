"""FixedBaseMSM (16-bit-window shifted-copy H-query MSM) vs the host oracle.

The H query is constant per proving key, so pippenger.FixedBaseMSM
precomputes 2^(16w)*P_i on device and folds all windows into one flat
65536-bucket accumulation (half the point adds of the generic 8-bit
path).  Oracle: ref_ec msm_reference."""

import numpy as np
import pytest

from zktpu.curve import jnp_curve as jc
from zktpu.curve import ref_ec as ec
from zktpu.field import limb
from zktpu.field.params import FR, P_FR
from zktpu.msm import pippenger as pp


@pytest.fixture(scope="module")
def fixed_msm():
    rng = np.random.default_rng(3)
    n = 128  # flat M = 2k -> all-fori merge tail: small XLA:CPU compile
    # PAIRWISE-DISTINCT points: FixedBaseMSM's no-doubling kernels require
    # it (the real H query is distinct powers of tau; see the class
    # docstring).  Distinct scalars k give distinct k*G.
    ks = sorted({int(k) for k in rng.integers(1, 2**62, 2 * n)})[:n]
    pts = [ec.G1_CURVE.mul(ec.G1_GEN, k) for k in ks]
    P = jc.g1_to_limbs(pts)
    infm = jc.g1_inf_mask(pts)
    infm[5] = True  # exercise infinity propagation through the shift copies
    msm = pp.FixedBaseMSM(P, infm)
    return pts, infm, msm, rng


def _oracle(pts, infm, scalars):
    live_p = [p for i, p in enumerate(pts) if not infm[i]]
    live_s = [s for i, s in enumerate(scalars) if not infm[i]]
    return pp.msm_reference(live_p, live_s)


@pytest.mark.slow
def test_fixed_msm_matches_reference(fixed_msm):
    pts, infm, msm, rng = fixed_msm
    scalars = [int.from_bytes(rng.bytes(31), "big") % P_FR for s in range(len(pts))]
    scalars[0] = 0
    scalars[1] = P_FR - 1  # max canonical value
    scalars[2] = 1
    S = limb.encode(scalars, FR, mont=False)
    got = jc.limbs_to_g1(msm(S))
    assert ec.G1_CURVE.eq(got, _oracle(pts, infm, scalars))


@pytest.mark.slow
def test_fixed_msm_sparse_scalars(fixed_msm):
    """Quotient-like scalar sets: many zeros (padding tail)."""
    pts, infm, msm, rng = fixed_msm
    scalars = [0] * len(pts)
    for i in rng.integers(0, len(pts), 97):
        scalars[int(i)] = int.from_bytes(rng.bytes(30), "big")
    S = limb.encode(scalars, FR, mont=False)
    got = jc.limbs_to_g1(msm(S))
    assert ec.G1_CURVE.eq(got, _oracle(pts, infm, scalars))


def test_signed_digit_recode_roundtrip():
    """Signed recode invariant: sum_w d_w 2^(16w) == scalar, digits in
    [-2^15, 2^15), for edge scalars (0, 1, r-1, all-limbs-high)."""
    import jax

    scalars = [s % P_FR for s in
               [0, 1, P_FR - 1, (1 << 254) - 1, 0x8000, 0xFFFF, 0x18000,
                int.from_bytes(b"\x7f" * 31, "big")]]
    S = limb.encode(scalars, FR, mont=False)
    d = np.asarray(jax.jit(pp.scalars_to_signed_digits)(S))  # (16, N)
    assert d.min() >= -(1 << 15) and d.max() < (1 << 15)
    for j, s in enumerate(scalars):
        v = sum(int(d[w, j]) << (16 * w) for w in range(16))
        assert v == s, (j, s, v)


@pytest.mark.slow  # first FixedBaseMSM graph compile of the module: ~470 s
def test_fixed_msm_negation_heavy(fixed_msm):
    """Scalars whose every window recodes NEGATIVE (all limbs >= 2^15)
    exercise the y-flip path end to end."""
    pts, infm, msm, rng = fixed_msm
    base = int.from_bytes(b"\xfe\xff" * 8, "little")  # every 16-bit limb 0xFFFE
    scalars = [(base - 65536 * i - i) % P_FR for i in range(len(pts))]
    S = limb.encode(scalars, FR, mont=False)
    got = jc.limbs_to_g1(msm(S))
    assert ec.G1_CURVE.eq(got, _oracle(pts, infm, scalars))


@pytest.mark.slow
def test_fixed_msm_unrolled_affine_level(fixed_msm):
    """Force the unrolled head so the FIRST level runs the affine-add
    specialization (tail < 16N): covers the round-5 on-chip bug where the
    precomputed shift copies were still Jacobian (windows 1..15 have
    arbitrary Z after the doubling chain) and the affine kernel silently
    mis-added — fixed by the batch normalization in FixedBaseMSM.__init__."""
    pts, infm, msm, rng = fixed_msm
    m2 = pp.FixedBaseMSM(
        jc.g1_to_limbs(pts), infm, tail=1024
    )  # flat 16*128 = 2048 > 1024 -> one unrolled aff-L1 level
    scalars = [int.from_bytes(rng.bytes(31), "big") % P_FR for _ in pts]
    S = limb.encode(scalars, FR, mont=False)
    got = jc.limbs_to_g1(m2(S))
    assert ec.G1_CURVE.eq(got, _oracle(pts, infm, scalars))
