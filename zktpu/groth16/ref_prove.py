"""Host-reference Groth16 prover — pure-Python oracle (no XLA compiles).

Purpose (two consumers):
  * __graft_entry__.dryrun_multichip: the N-chip proof byte-equality oracle
    needs a trusted single-source proof.  Round 2 used a single-chip TPU
    Prover for this, which cost ~9 minutes of XLA:CPU compile on the driver
    machine (MULTICHIP_r02 rc=124).  This module computes the same proof
    with big-int math on the host in milliseconds for tiny circuits — and,
    being an independent implementation of the Groth16 equations
    (reference semantics: gnark's groth16.Prove, [dep] go.mod:8; call site
    /root/reference/libraries/prover/impl/provers.go:148), it is a
    *stronger* oracle than TPU-vs-TPU.
  * Prover(assemble_on_host=True): the final proof randomization
    (3 fixed-base muls + 2 variable-base muls + a few adds) done with
    ref_ec instead of the jitted device graph — used by tests and the
    multichip dryrun to avoid the assemble graph's XLA compile; on a real
    TPU the device assemble stays the default (host EC costs ~330 ms and
    one device->host crossing per MSM output).

Everything here is exact big-int arithmetic; for the same (witness, r, s)
the resulting proof must be byte-identical to Prover.prove's.
"""

from __future__ import annotations

import hashlib

from ..curve import ref_ec as ec
from ..field.params import P_FR
from ..ntt.ntt import FR_ROOT_OF_UNITY, FR_TWO_ADICITY


def derive_rs(rng_seed: bytes) -> tuple[int, int]:
    """Deterministic proof randomizers (must match Prover._assemble)."""
    r = int.from_bytes(hashlib.sha512(rng_seed + b"r").digest(), "big") % P_FR
    s = int.from_bytes(hashlib.sha512(rng_seed + b"s").digest(), "big") % P_FR
    return r, s


# ------------------------------------------------------------ query decode


def g1_query_points(query, inf_mask) -> list:
    """(N, 2, 16) affine Montgomery limbs + mask -> list of ref_ec points."""
    import numpy as np

    from ..curve.jnp_curve import FP
    from ..field.params import limbs_to_int

    pts = []
    q = np.asarray(query)
    for i in range(q.shape[0]):
        if inf_mask[i]:
            pts.append(ec.G1_CURVE.infinity())
        else:
            x = FP.from_mont(limbs_to_int(q[i, 0]))
            y = FP.from_mont(limbs_to_int(q[i, 1]))
            pts.append(ec.G1_CURVE.from_affine(x, y))
    return pts


def g2_query_points(query, inf_mask) -> list:
    import numpy as np

    from ..curve.jnp_curve import FP
    from ..field.params import limbs_to_int

    pts = []
    q = np.asarray(query)
    for i in range(q.shape[0]):
        if inf_mask[i]:
            pts.append(ec.G2_CURVE.infinity())
        else:
            x = ec.Fp2(
                FP.from_mont(limbs_to_int(q[i, 0, 0])),
                FP.from_mont(limbs_to_int(q[i, 0, 1])),
            )
            y = ec.Fp2(
                FP.from_mont(limbs_to_int(q[i, 1, 0])),
                FP.from_mont(limbs_to_int(q[i, 1, 1])),
            )
            pts.append(ec.G2_CURVE.from_affine(x, y))
    return pts


def _pk_consts(pk):
    """alpha1, beta1, delta1 (G1) and beta2, delta2 (G2) as ref_ec points."""
    from ..curve import jnp_curve as jc
    from ..field.params import NLIMBS, int_to_limbs

    import numpy as np

    one = int_to_limbs(jc.FP.r).astype(np.uint32)
    one2 = np.stack([one, np.zeros(NLIMBS, np.uint32)])

    def g1(c):
        return jc.limbs_to_g1((c[0], c[1], one))

    def g2(c):
        return jc.limbs_to_g2((c[0], c[1], one2))

    return g1(pk.alpha_g1), g1(pk.beta_g1), g1(pk.delta_g1), g2(pk.beta_g2), g2(
        pk.delta_g2
    )


# -------------------------------------------------------------- polynomial


def _ntt_inplace(a: list, omega: int, p: int) -> list:
    """Iterative radix-2 NTT (natural in, natural out), O(n log n) big-int."""
    n = len(a)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wlen = pow(omega, n // length, p)
        half = length // 2
        for i in range(0, n, length):
            w = 1
            for k in range(i, i + half):
                u = a[k]
                v = a[k + half] * w % p
                a[k] = (u + v) % p
                a[k + half] = (u - v) % p
                w = w * wlen % p
        length <<= 1
    return a


def quotient_coeffs(cs, z_ints, n: int) -> list[int]:
    """H = (A·B − C) / (xⁿ − 1) over Fr, exact big-int math, O(n log n)
    (iNTT -> coset NTT -> pointwise -> coset iNTT — the same pipeline as the
    device path, so it scales to the reference's 32768-row domains).

    Returns n coefficients (top slot 0, matching the device path's zeroed
    degree-(n−1) scalar)."""
    az = [0] * n
    bz = [0] * n
    cz = [0] * n
    for rows, cols, coeffs, acc in (
        (cs.a_rows, cs.a_cols, cs.a_coeffs, az),
        (cs.b_rows, cs.b_cols, cs.b_coeffs, bz),
        (cs.c_rows, cs.c_cols, cs.c_coeffs, cz),
    ):
        for r_, c_, k in zip(rows, cols, coeffs):
            acc[r_] = (acc[r_] + k * z_ints[c_]) % P_FR

    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - n.bit_length() + 1), P_FR)
    omega_inv = pow(omega, -1, P_FR)
    n_inv = pow(n, -1, P_FR)
    g = 5  # coset shift (any non-residue; cancels out of the coefficients)

    def to_coeffs(evals):
        a = _ntt_inplace(list(evals), omega_inv, P_FR)
        return [v * n_inv % P_FR for v in a]

    def coset_eval(coef):
        gj, b = 1, []
        for v in coef:
            b.append(v * gj % P_FR)
            gj = gj * g % P_FR
        return _ntt_inplace(b, omega, P_FR)

    A = coset_eval(to_coeffs(az))
    B = coset_eval(to_coeffs(bz))
    C = coset_eval(to_coeffs(cz))
    zc_inv = pow(pow(g, n, P_FR) - 1, -1, P_FR)
    hc = [(A[i] * B[i] - C[i]) % P_FR * zc_inv % P_FR for i in range(n)]
    hcoef = _ntt_inplace(hc, omega_inv, P_FR)
    ginv = pow(g, -1, P_FR)
    gj = 1
    H = []
    for v in hcoef:
        H.append(v * n_inv % P_FR * gj % P_FR)
        gj = gj * ginv % P_FR
    assert H[n - 1] == 0, "quotient degree must be ≤ n−2"
    return H


# ----------------------------------------------------------------- assembly


def assemble(pk, a_msm, b1_msm, b2_msm, l_msm, h_msm, r: int, s: int,
             d_aff=None, dsig_aff=None):
    """Groth16 combination from ref_ec MSM outputs (host big-int EC):
      A  = α₁ + Σaᵢzᵢ + r·δ₁          B₂ = β₂ + Σbᵢzᵢ·G₂ + s·δ₂
      B₁ = β₁ + Σbᵢzᵢ + s·δ₁          C  = L + H + s·A + r·B₁ − rs·δ₁"""
    from .prove import Proof

    g1, g2 = ec.G1_CURVE, ec.G2_CURVE
    alpha1, beta1, delta1, beta2, delta2 = _pk_consts(pk)
    A = g1.add(g1.add(alpha1, a_msm), g1.mul(delta1, r))
    B1 = g1.add(g1.add(beta1, b1_msm), g1.mul(delta1, s))
    B2 = g2.add(g2.add(beta2, b2_msm), g2.mul(delta2, s))
    C = g1.add(g1.add(l_msm, h_msm), g1.add(g1.mul(A, s), g1.mul(B1, r)))
    C = g1.add(C, g1.neg(g1.mul(delta1, r * s % P_FR)))
    a_aff = g1.to_affine(A)
    b_aff = g2.to_affine(B2)
    c_aff = g1.to_affine(C)
    return Proof(
        a=(a_aff[0], a_aff[1]),
        b=((b_aff[0].c0, b_aff[0].c1), (b_aff[1].c0, b_aff[1].c1)),
        c=(c_aff[0], c_aff[1]),
        d=d_aff,
        d_sigma=dsig_aff,
    )


def _msm_host(curve, pts, scalars):
    """Host MSM: direct add for 0/±1 scalars (bit/ternary witnesses),
    8-bit-window Pippenger when enough general scalars make it pay."""
    big = [(p, k) for p, k in zip(pts, scalars) if k not in (0, 1, P_FR - 1)]
    acc = curve.infinity()
    for p, k in zip(pts, scalars):
        if k == 1:
            acc = curve.add(acc, p)
        elif k == P_FR - 1:
            acc = curve.add(acc, curve.neg(p))
    if len(big) <= 64:
        for p, k in big:
            acc = curve.add(acc, curve.mul(p, k))
        return acc
    res = curve.infinity()
    for wnd in range(31, -1, -1):
        for _ in range(8):
            res = curve.double(res)
        sh = 8 * wnd
        buckets = {}
        for p, k in big:
            d = (k >> sh) & 0xFF
            if d == 0 or curve._is_inf(p):
                continue
            buckets[d] = curve.add(buckets[d], p) if d in buckets else p
        run = curve.infinity()
        tot = curve.infinity()
        for d in range(255, 0, -1):
            if d in buckets:
                run = curve.add(run, buckets[d])
            tot = curve.add(tot, run)
        res = curve.add(res, tot)
    return curve.add(acc, res)


def prove_reference(cs, pk, z_ints, rng_seed: bytes):
    """Complete host-side Groth16 proof — big-int oracle.  O(n log n)
    quotient + Pippenger MSMs make it usable at the reference's full
    ChaCha scale (n = 32768) in ~a minute; bit/ternary witness entries
    cost one point add each.

    Byte-identical to Prover.prove(z, rng_seed) for the same inputs."""
    r, s = derive_rs(rng_seed)
    n = pk.n_domain
    z = [int(v) for v in z_ints]

    zp = z + [0] * (pk.a_query.shape[0] - len(z))
    a_msm = _msm_host(ec.G1_CURVE, g1_query_points(pk.a_query, pk.a_inf), zp)
    b1_msm = _msm_host(
        ec.G1_CURVE, g1_query_points(pk.b_g1_query, pk.b_g1_inf), zp
    )
    l_msm = _msm_host(ec.G1_CURVE, g1_query_points(pk.l_query, pk.l_inf), zp)
    b2_msm = _msm_host(
        ec.G2_CURVE, g2_query_points(pk.b_g2_query, pk.b_g2_inf), zp
    )
    h = quotient_coeffs(cs, z, n)
    h_msm = _msm_host(ec.G1_CURVE, g1_query_points(pk.h_query, pk.h_inf), h)
    return assemble(pk, a_msm, b1_msm, b2_msm, l_msm, h_msm, r, s)
