"""Batched JAX curve ops vs the pure-Python reference curve (oracle)."""

import random

import jax
import numpy as np
import pytest

from zktpu.curve import jnp_curve as jc
from zktpu.curve import ref_ec as ec
from zktpu.field.params import FP, int_to_limbs

random.seed(5)
C = ec.G1_CURVE
C2 = ec.G2_CURVE


def enc_jac(p):
    aff = C.to_affine(p)
    if aff is None:
        z = np.zeros((16,), np.uint32)
        return (z, z, z)
    return (
        int_to_limbs(FP.to_mont(aff[0])).astype(np.uint32),
        int_to_limbs(FP.to_mont(aff[1])).astype(np.uint32),
        int_to_limbs(FP.to_mont(1)).astype(np.uint32),
    )


def enc_jac2(p):
    aff = C2.to_affine(p)
    if aff is None:
        z = np.zeros((2, 16), np.uint32)
        return (z, z, z)
    x, y = aff

    def e(c):
        return np.stack(
            [int_to_limbs(FP.to_mont(c.c0)), int_to_limbs(FP.to_mont(c.c1))]
        ).astype(np.uint32)

    one = np.stack([int_to_limbs(FP.to_mont(1)), np.zeros(16, np.uint32)]).astype(
        np.uint32
    )
    return (e(x), e(y), one)


def stack_pts(encoded):
    return tuple(np.stack([e[i] for e in encoded]) for i in range(3))


KS = [random.randrange(ec.R_ORDER) for _ in range(6)]
PTS = [C.mul(ec.G1_GEN, k) for k in KS]
QTS = [C.mul(ec.G1_GEN, k + 7) for k in KS]


@pytest.fixture(scope="module")
def jitted():
    return (
        jax.jit(lambda p, q: jc.point_add(jc.G1, p, q)),
        jax.jit(lambda p: jc.point_double(jc.G1, p)),
        jax.jit(lambda p, qx, qy, qi: jc.point_madd(jc.G1, p, qx, qy, qi)),
    )


def test_g1_add_double(jitted):
    addf, dblf, _ = jitted
    P = stack_pts([enc_jac(p) for p in PTS])
    Q = stack_pts([enc_jac(p) for p in QTS])
    res = addf(P, Q)
    for i in range(6):
        got = jc.limbs_to_g1(tuple(np.asarray(r)[i] for r in res))
        assert C.eq(got, C.add(PTS[i], QTS[i]))
    res = dblf(P)
    for i in range(6):
        got = jc.limbs_to_g1(tuple(np.asarray(r)[i] for r in res))
        assert C.eq(got, C.double(PTS[i]))


def test_g1_add_edge_cases(jitted):
    addf, _, _ = jitted
    inf = C.infinity()
    lhs = [PTS[0], PTS[0], inf, PTS[1], inf]
    rhs = [PTS[0], C.neg(PTS[0]), PTS[1], inf, inf]
    expect = [C.double(PTS[0]), inf, PTS[1], PTS[1], inf]
    res = addf(stack_pts([enc_jac(p) for p in lhs]), stack_pts([enc_jac(p) for p in rhs]))
    for i in range(5):
        got = jc.limbs_to_g1(tuple(np.asarray(r)[i] for r in res))
        assert C.eq(got, expect[i]), i


def test_g1_madd(jitted):
    _, _, maddf = jitted
    P = stack_pts([enc_jac(p) for p in PTS])
    aff = jc.g1_to_limbs(QTS)
    infm = jc.g1_inf_mask(QTS)
    res = maddf(P, aff[:, 0], aff[:, 1], infm)
    for i in range(6):
        got = jc.limbs_to_g1(tuple(np.asarray(r)[i] for r in res))
        assert C.eq(got, C.add(PTS[i], QTS[i]))


def test_g1_madd_edge_cases(jitted):
    _, _, maddf = jitted
    inf = C.infinity()
    # padded to len(PTS)=6 so maddf reuses test_g1_madd's compiled shape
    pe = [inf, PTS[1], PTS[2], PTS[3], inf, PTS[4]]
    qe = [PTS[0], inf, PTS[2], C.neg(PTS[3]), inf, QTS[4]]
    expect = [PTS[0], PTS[1], C.double(PTS[2]), inf, inf, C.add(PTS[4], QTS[4])]
    P = stack_pts([enc_jac(p) for p in pe])
    aff = jc.g1_to_limbs(qe)
    infm = jc.g1_inf_mask(qe)
    res = maddf(P, aff[:, 0], aff[:, 1], infm)
    for i in range(6):
        got = jc.limbs_to_g1(tuple(np.asarray(r)[i] for r in res))
        assert C.eq(got, expect[i]), i


def test_g2_add_double():
    pts2 = [C2.mul(ec.G2_GEN, k) for k in KS[:3]]
    qts2 = [C2.mul(ec.G2_GEN, k + 11) for k in KS[:3]]
    P2 = stack_pts([enc_jac2(p) for p in pts2])
    Q2 = stack_pts([enc_jac2(p) for p in qts2])
    addf2 = jax.jit(lambda p, q: jc.point_add(jc.G2, p, q))
    res = addf2(P2, Q2)
    for i in range(3):
        got = jc.limbs_to_g2(tuple(np.asarray(r)[i] for r in res))
        assert C2.eq(got, C2.add(pts2[i], qts2[i]))
    res = addf2(P2, P2)  # doubling through the add path
    for i in range(3):
        got = jc.limbs_to_g2(tuple(np.asarray(r)[i] for r in res))
        assert C2.eq(got, C2.double(pts2[i]))
