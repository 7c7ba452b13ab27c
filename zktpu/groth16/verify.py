"""Groth16 verification (CPU pairing, server side).

Re-owns gnark's groth16.Verify (reference call site
/root/reference/libraries/verifier/impl/verifiers.go:99, [dep] go.mod:8):

    e(A, B) == e(alpha, beta) * e(vk_x, gamma) * e(C, delta)
    vk_x = IC_0 + sum_i pub_i * IC_i

checked as one product of four Miller loops sharing a final exponentiation.
Latency is milliseconds-to-seconds and irrelevant per SURVEY.md §3.4 — the
verifier runs on commodity servers, not TPUs.
"""

from __future__ import annotations

from ..curve import ref_ec as ec
from .prove import Proof
from .setup import VerifyingKey


def _g1_point(aff):
    if aff is None:
        return ec.G1_CURVE.infinity()
    return ec.G1_CURVE.from_affine(aff[0], aff[1])


def _g2_point(aff):
    if aff is None:
        return ec.G2_CURVE.infinity()
    return ec.G2_CURVE.from_affine(
        ec.Fp2(aff[0][0], aff[0][1]), ec.Fp2(aff[1][0], aff[1][1])
    )


def verify(proof: Proof, vk: VerifyingKey, public_inputs: list[int]) -> bool:
    """public_inputs: the instance values z[1..] (z[0]=1 is implicit)."""
    if len(public_inputs) != len(vk.ic) - 1:
        return False
    try:
        a = _g1_point(proof.a)
        b = _g2_point(proof.b)
        c = _g1_point(proof.c)
        for p in (a, c):
            if not ec.G1_CURVE.is_on_curve(p):
                return False
        if not ec.G2_CURVE.is_on_curve(b):
            return False
        vk_x = _g1_point(vk.ic[0])
        for val, icp in zip(public_inputs, vk.ic[1:]):
            val = int(val) % ec.R_ORDER
            if val == 0:
                continue
            pt = _g1_point(icp)
            vk_x = ec.G1_CURVE.add(
                vk_x, pt if val == 1 else ec.G1_CURVE.mul(pt, val)
            )
        return ec.multi_pairing_is_one(
            [
                (ec.G1_CURVE.neg(a), b),
                (_g1_point(vk.alpha_g1), _g2_point(vk.beta_g2)),
                (vk_x, _g2_point(vk.gamma_g2)),
                (c, _g2_point(vk.delta_g2)),
            ]
        )
    except (ValueError, TypeError, ZeroDivisionError):
        return False
