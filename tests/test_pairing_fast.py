"""Fast-pairing path (Fp2 prepared lines + BN hard-part final exp) vs the
Fp12 oracle loop (VERDICT r3 weak #8: verifier latency).

The oracle (miller_loop over E(Fp12) + pow((p^12-1)/r)) stays in ref_ec as
the readable specification; these tests pin the production path to it."""

import random

from zktpu.curve import ref_ec as ec

random.seed(20260820)
K1 = random.randrange(1, ec.R_ORDER)
K2 = random.randrange(1, ec.R_ORDER)
P1 = ec.G1_CURVE.mul(ec.G1_GEN, K1)
Q1 = ec.G2_CURVE.mul(ec.G2_GEN, K2)


def test_final_exponentiation_matches_pow():
    f = ec.miller_loop(ec.twist_to_fp12(Q1), ec.g1_to_fp12(P1))
    assert ec.final_exponentiation(f) == f.pow(ec.FINAL_EXP)


def test_prepared_miller_matches_fp12_loop():
    f_oracle = ec.miller_loop(ec.twist_to_fp12(Q1), ec.g1_to_fp12(P1))
    prep = ec.G2Prepared(Q1)
    f_fast = ec.miller_loop_prepared(prep, ec.G1_CURVE.to_affine(P1))
    # lines are scaled by subfield factors; equality holds after final exp
    assert ec.final_exponentiation(f_fast) == ec.final_exponentiation(f_oracle)


def test_bilinearity():
    a = 424242
    e1 = ec.pairing(ec.G1_CURVE.mul(ec.G1_GEN, a), ec.G2_GEN)
    e2 = ec.pairing(ec.G1_GEN, ec.G2_CURVE.mul(ec.G2_GEN, a))
    e3 = ec.pairing(ec.G1_GEN, ec.G2_GEN).pow(a)
    assert e1 == e2 == e3


def test_multi_pairing_cancellation():
    assert ec.multi_pairing_is_one([(P1, Q1), (ec.G1_CURVE.neg(P1), Q1)])
    assert not ec.multi_pairing_is_one([(P1, Q1), (P1, Q1)])


def test_multi_pairing_accepts_prepared():
    prep = ec.G2Prepared(Q1)
    assert ec.multi_pairing_is_one([(P1, prep), (ec.G1_CURVE.neg(P1), prep)])


def test_infinity_pairs_are_skipped():
    inf1 = ec.G1_CURVE.infinity()
    assert ec.pairing(inf1, Q1) == ec.Fp12.one()
    assert ec.multi_pairing_is_one([(inf1, Q1)])
    assert ec.multi_pairing_is_one([(P1, ec.G2Prepared(ec.G2_CURVE.infinity()))])


def test_frobenius_is_p_power():
    f = ec.miller_loop(ec.twist_to_fp12(Q1), ec.g1_to_fp12(P1))
    assert ec.frobenius(f, 1) == f.pow(ec.P)
    assert ec.frobenius(f, 2) == f.pow(ec.P**2)


def test_g2_subgroup_check():
    """proof.B safety (ADVICE r4): on-curve twist points OUTSIDE the
    r-subgroup must be rejected, matching gnark Proof.ReadFrom's
    SubgroupCheck.  The pinned point was found by x-coordinate search +
    Fp2 sqrt; it satisfies y^2 = x^3 + b' but [r]Q != O."""
    assert ec.g2_subgroup_check(ec.G2_GEN)
    assert ec.g2_subgroup_check(ec.G2_CURVE.mul(ec.G2_GEN, 12345))
    assert ec.g2_subgroup_check(ec.G2_CURVE.infinity())
    x = ec.Fp2(2, 1)
    y = ec.Fp2(
        7292567877523311580221095596750716176434782432868683424513645834767876293070,
        19659275751359636165940301690575149581329631496732780143538578556285923319774,
    )
    rogue = ec.G2_CURVE.from_affine(x, y)
    assert ec.G2_CURVE.is_on_curve(rogue)
    assert not ec.g2_subgroup_check(rogue)
