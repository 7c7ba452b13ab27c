"""f32-digit Pallas kernel correctness (interpret mode on CPU).

The full point-add kernel is exercised on real TPU runs (bench.py and the
TPU e2e scripts); interpret mode is too slow for its ~44k-op body, so here we
check the field-arithmetic building blocks and the digit codecs, which carry
all the exactness risk (24-bit f32 mantissa bounds)."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from zktpu.curve import pallas_f32 as pf
from zktpu.field import limb
from zktpu.field.params import FP, FR

random.seed(77)


def test_digit_codec_roundtrip():
    vals = [random.randrange(FP.modulus) for _ in range(128)]
    u = limb.encode(vals, FP)
    rows = pf.to_f32_digits(jnp.asarray(u))
    assert rows.shape == (32, 128)
    back = pf.from_f32_digits(rows, u.shape)
    assert np.array_equal(np.asarray(back), u)


@pytest.mark.slow
def test_f32_mont_mul_interpret_fp():
    n = 128
    va = [random.randrange(FP.modulus) for _ in range(n)]
    vb = [random.randrange(FP.modulus) for _ in range(n)]
    # worst-case-ish operands too
    va[0] = FP.modulus - 1
    vb[0] = FP.modulus - 1
    va[1] = 0
    a = limb.encode(va, FP)
    b = limb.encode(vb, FP)
    r = pf.mont_mul(jnp.asarray(a), jnp.asarray(b), field="fp", interpret=True)
    got = limb.decode(np.asarray(r), FP)
    assert got == [x * y % FP.modulus for x, y in zip(va, vb)]


@pytest.mark.slow
def test_f32_mont_mul_interpret_fr():
    n = 128
    va = [random.randrange(FR.modulus) for _ in range(n)]
    vb = [random.randrange(FR.modulus) for _ in range(n)]
    a = limb.encode(va, FR)
    b = limb.encode(vb, FR)
    r = pf.mont_mul(jnp.asarray(a), jnp.asarray(b), field="fr", interpret=True)
    got = limb.decode(np.asarray(r), FR)
    assert got == [x * y % FR.modulus for x, y in zip(va, vb)]


def _fp2_digit_pair(vals):
    """[(c0,c1) ints] -> (rows0, rows1) digit arrays in Montgomery form."""
    r0 = pf.to_f32_digits(jnp.asarray(limb.encode([v[0] for v in vals], FP)))
    r1 = pf.to_f32_digits(jnp.asarray(limb.encode([v[1] for v in vals], FP)))
    return (r0, r1)


def _fp2_from_rows(rows, n):
    # kernel-body helpers return digit rows as LISTS of (N,) arrays; the
    # limbs are the RAW Montgomery-product value — decode with mont=False
    c0 = limb.decode(
        np.asarray(pf.from_f32_digits(jnp.stack(list(rows[0])), (n, 16))), FP, mont=False
    )
    c1 = limb.decode(
        np.asarray(pf.from_f32_digits(jnp.stack(list(rows[1])), (n, 16))), FP, mont=False
    )
    return list(zip(c0, c1))


def test_f2_mul_karatsuba_exactness():
    """The G2 kernel's Karatsuba cross-term multiplies UN-normalized digit
    sums (<= 510/digit); this pins the exactness audit with worst-case
    operands (all-0xFF digits in both components)."""
    p = FP.modulus
    n = 8
    vals_a = [(random.randrange(p), random.randrange(p)) for _ in range(n)]
    vals_b = [(random.randrange(p), random.randrange(p)) for _ in range(n)]
    worst = int.from_bytes(b"\xff" * 31, "big")  # dense 0xFF digits < p
    vals_a[0] = (worst, worst)
    vals_b[0] = (worst, worst)
    vals_a[1] = (p - 1, p - 1)
    vals_b[1] = (p - 1, p - 1)
    ra = _fp2_digit_pair(vals_a)
    rb = _fp2_digit_pair(vals_b)
    out = _fp2_from_rows(pf.f2_mul(ra, rb, pf.FP_C), n)
    # encode() produced Montgomery operands aR; mont-mul semantics give
    # ((aR)(bR))R^-1 per Karatsuba component — check algebraically
    rinv = pow(FP.r, -1, p)
    enc_a = [(a0 * FP.r % p, a1 * FP.r % p) for a0, a1 in vals_a]
    enc_b = [(b0 * FP.r % p, b1 * FP.r % p) for b0, b1 in vals_b]
    for (A0, A1), (B0, B1), (g0, g1) in zip(enc_a, enc_b, out):
        E0 = (A0 * B0 - A1 * B1) % p * rinv % p
        E1 = (A0 * B1 + A1 * B0) % p * rinv % p
        assert (g0, g1) == (E0, E1)


def test_f2_padd_matches_ref_ec():
    """Full G2 Jacobian add through the kernel body (eager digit rows) vs
    the Python reference curve, including doubling and infinity edges."""
    from zktpu.curve import ref_ec as ec
    from zktpu.curve import jnp_curve as jc

    pts1, pts2, expect = [], [], []
    g = ec.G2_GEN
    cases = [(3, 5), (7, 7), (11, 2)]  # add, double (p==q), add
    for k1, k2 in cases:
        p1 = ec.G2_CURVE.mul(g, k1)
        p2 = ec.G2_CURVE.mul(g, k2)
        pts1.append(p1)
        pts2.append(p2)
        expect.append(ec.G2_CURVE.add(p1, p2))
    # infinity + P
    pts1.append(ec.G2_CURVE.infinity())
    pts2.append(ec.G2_CURVE.mul(g, 9))
    expect.append(ec.G2_CURVE.mul(g, 9))

    import numpy as _np

    def enc(pts):
        arr = jc.g2_to_limbs(pts)  # affine (N,2,2,16); lift Z
        inf = jc.g2_inf_mask(pts)
        one = jc._one_cached(True)
        Z = _np.where(inf[:, None, None], _np.zeros((len(pts), 2, 16), _np.uint32),
                      _np.broadcast_to(one, (len(pts), 2, 16)))
        X, Y = arr[:, 0], arr[:, 1]
        return (
            (pf.to_f32_digits(jnp.asarray(X[:, 0])), pf.to_f32_digits(jnp.asarray(X[:, 1]))),
            (pf.to_f32_digits(jnp.asarray(Y[:, 0])), pf.to_f32_digits(jnp.asarray(Y[:, 1]))),
            (pf.to_f32_digits(jnp.asarray(Z[:, 0])), pf.to_f32_digits(jnp.asarray(Z[:, 1]))),
        )

    x1, y1, z1 = enc(pts1)
    x2, y2, z2 = enc(pts2)
    rx, ry, rz = pf.f2_padd(x1, y1, z1, x2, y2, z2, pf.FP_C)
    n = len(pts1)

    def dec_coord(rows):
        c0 = pf.from_f32_digits(jnp.stack(list(rows[0])), (n, 16))
        c1 = pf.from_f32_digits(jnp.stack(list(rows[1])), (n, 16))
        return _np.stack([_np.asarray(c0), _np.asarray(c1)], axis=1)

    X, Y, Z = dec_coord(rx), dec_coord(ry), dec_coord(rz)
    for i in range(n):
        got = jc.limbs_to_g2((X[i], Y[i], Z[i]))
        assert ec.G2_CURVE.eq(got, expect[i]), f"case {i}"


def _rand_jac_points(n, seed):
    """Distinct Jacobian G1 points (limb SoA) + their ref_ec mirrors."""
    from zktpu.curve import jnp_curve as jc
    from zktpu.curve import ref_ec as ec

    rng = np.random.default_rng(seed)
    ks = sorted({int(k) for k in rng.integers(1, 2**61, 2 * n)})[:n]
    pts = [ec.G1_CURVE.mul(ec.G1_GEN, k) for k in ks]
    P = jc.g1_to_limbs(pts)
    one = np.asarray(jc._one_cached(False))
    Z = np.broadcast_to(one, (n, 16)).copy()
    return pts, (jnp.asarray(P[:, 0]), jnp.asarray(P[:, 1]), jnp.asarray(Z))


def _rows_of(t):
    return [r for r in pf.to_f32_digits(t)]


def _point_of(rows3, i, jc):
    import numpy as np  # noqa: F811

    xyz = []
    for rows in rows3:
        arr = jnp.stack([r for r in rows])  # (32, n)
        xyz.append(np.asarray(pf.from_f32_digits(arr, (arr.shape[1], 16)))[i])
    return jc.limbs_to_g1(tuple(xyz))


def test_f32_padd_nodbl_rows():
    """No-doubling Jacobian add FORMULA (the digit-row function the pallas
    kernel wraps) == complete add on distinct points, plus the infinity
    selects and the h=0 cancellation path.  Run as plain jnp on the rows —
    the pallas_call plumbing is byte-shared with the TPU-validated padd
    kernel; interpret mode at kernel size needs ~30 GB (not run)."""
    from zktpu.curve import jnp_curve as jc
    from zktpu.curve import ref_ec as ec

    n = 8
    pts, (X, Y, Z) = _rand_jac_points(2 * n, 991)
    p = [X[:n], Y[:n], Z[:n]]
    q = [X[n:], Y[n:], Z[n:]]
    # lane 0: q at infinity; lane 1: p at infinity; lane 2: q = -p (cancel)
    q = [q[0].at[0].set(0), q[1].at[0].set(0), q[2].at[0].set(0)]
    p = [p[0].at[1].set(0), p[1].at[1].set(0), p[2].at[1].set(0)]
    negy = jnp.asarray(np.asarray(jc.FP_OPS.neg(p[1][2])))
    q = [q[0].at[2].set(p[0][2]), q[1].at[2].set(negy), q[2].at[2].set(p[2][2])]
    rx, ry, rz = pf.f_padd_nodbl(*(_rows_of(t) for t in p + q), pf.FP_C)
    for i in range(n):
        a = jc.limbs_to_g1(tuple(np.asarray(c[i]) for c in p))
        b = jc.limbs_to_g1(tuple(np.asarray(c[i]) for c in q))
        g = _point_of((rx, ry, rz), i, jc)
        assert ec.G1_CURVE.eq(g, ec.G1_CURVE.add(a, b)), i


def test_f32_madd_aff_rows():
    """Affine+affine FORMULA (merge-tree level 1) == complete add."""
    from zktpu.curve import jnp_curve as jc
    from zktpu.curve import ref_ec as ec

    n = 8
    pts, (X, Y, Z) = _rand_jac_points(2 * n, 992)
    p = [X[:n], Y[:n], Z[:n]]
    q = [X[n:], Y[n:], Z[n:]]
    q = [q[0].at[0].set(0), q[1].at[0].set(0), q[2].at[0].set(0)]  # q inf
    p = [p[0].at[1].set(0), p[1].at[1].set(0), p[2].at[1].set(0)]  # p inf
    rx, ry, rz = pf.f_madd_aff(*(_rows_of(t) for t in p + q), pf.FP_C)
    for i in range(n):
        a = jc.limbs_to_g1(tuple(np.asarray(c[i]) for c in p))
        b = jc.limbs_to_g1(tuple(np.asarray(c[i]) for c in q))
        g = _point_of((rx, ry, rz), i, jc)
        assert ec.G1_CURVE.eq(g, ec.G1_CURVE.add(a, b)), i
