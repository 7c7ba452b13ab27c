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


def _prep_one(q):
    # A degenerate/adversarial vk point can abort G2Prepared.__init__ with
    # the internal _DegeneratePair; keep the raw Point in that case so
    # multi_pairing_is_one takes its Fp12-oracle fallback instead of
    # verify() raising (and the except clause masking it as False-with-
    # -no-diagnostic for every later call).
    try:
        return ec.G2Prepared(q)
    except ec._DegeneratePair:
        return q


def _prepared(vk: VerifyingKey):
    """Per-vk pairing precompute, cached on the vk object: G2Prepared line
    coefficients for the FIXED second arguments (beta/gamma/delta/sigma/G2)
    — the verifier-latency trick gnark's PreparedVerifyingKey plays."""
    prep = getattr(vk, "_pairing_prep", None)
    if prep is None:
        prep = {
            "beta": _prep_one(_g2_point(vk.beta_g2)),
            "gamma": _prep_one(_g2_point(vk.gamma_g2)),
            "delta": _prep_one(_g2_point(vk.delta_g2)),
            "g2": _prep_one(ec.G2_GEN),
        }
        if vk.sigma_g2 is not None:
            prep["sigma"] = _prep_one(_g2_point(vk.sigma_g2))
        if getattr(vk, "pedersen_g", None) is not None:
            prep["ped_g"] = _prep_one(_g2_point(vk.pedersen_g))
            prep["ped_grsn"] = _prep_one(_g2_point(vk.pedersen_g_root_sigma_neg))
        vk._pairing_prep = prep
    return prep


def verify(proof: Proof, vk: VerifyingKey, public_inputs: list[int]) -> bool:
    """public_inputs: the instance values z[1..] (z[0]=1 is implicit).

    For lookup circuits (vk.sigma_g2 set) the challenge slots in
    public_inputs are IGNORED — the verifier derives them as H(D, slot) and
    additionally checks the commitment's proof of knowledge
    e(D, [sigma]2) == e(D_sigma, [1]2)."""
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
        # proof.B is attacker-controlled and the twist has a large cofactor:
        # r-subgroup check, matching gnark Proof.ReadFrom's SubgroupCheck
        # (reference behavior via [dep] go.mod:8).  A/C are G1 (cofactor 1).
        if not ec.g2_subgroup_check(b):
            return False

        public_inputs = [int(v) % ec.R_ORDER for v in public_inputs]
        d_pt = None
        if vk.sigma_g2 is not None or vk.pedersen_g is not None:
            from .prove import lookup_challenges

            if proof.d is None or proof.d_sigma is None:
                return False
            d_pt = _g1_point(proof.d)
            ds_pt = _g1_point(proof.d_sigma)
            if not (
                ec.G1_CURVE.is_on_curve(d_pt) and ec.G1_CURVE.is_on_curve(ds_pt)
            ):
                return False
            prep = _prepared(vk)
            if vk.sigma_g2 is not None:
                # our setup's sigma form:
                # e(D, sigma*G2) * e(-D_sigma, G2) == 1
                pok_pairs = [
                    (d_pt, prep["sigma"]),
                    (ec.G1_CURVE.neg(ds_pt), prep["g2"]),
                ]
            else:
                # gnark-pedersen form (reference binary vk.aes*):
                # e(D, GRootSigmaNeg) * e(D_sigma, G) == 1
                # (gnark-crypto pedersen.VerifyingKey [dep] go.mod:9)
                pok_pairs = [
                    (d_pt, prep["ped_grsn"]),
                    (ds_pt, prep["ped_g"]),
                ]
            if not ec.multi_pairing_is_one(pok_pairs):
                return False
            chals = lookup_challenges(proof.d, vk.challenge_slots)
            for slot, chal in zip(vk.challenge_slots, chals):
                public_inputs[slot - 1] = chal

        vk_x = _g1_point(vk.ic[0])
        for val, icp in zip(public_inputs, vk.ic[1:]):
            if val == 0:
                continue
            pt = _g1_point(icp)
            vk_x = ec.G1_CURVE.add(
                vk_x, pt if val == 1 else ec.G1_CURVE.mul(pt, val)
            )
        if d_pt is not None:
            vk_x = ec.G1_CURVE.add(vk_x, d_pt)
        prep = _prepared(vk)
        return ec.multi_pairing_is_one(
            [
                (ec.G1_CURVE.neg(a), b),
                (_g1_point(vk.alpha_g1), prep["beta"]),
                (vk_x, prep["gamma"]),
                (c, prep["delta"]),
            ]
        )
    except (ValueError, TypeError, ZeroDivisionError):
        return False
