"""Multi-chip SPMD primitives: sharded MSM and distributed 4-step NTT.

The reference is single-process Go (SURVEY.md §2.3): its only parallelism is
goroutine work-stealing inside one address space.  The TPU-native axes
(SURVEY.md §2.3 mapping table):

  * MSM sharding ("TP" of this domain): points + scalars partitioned across
    chips via shard_map; each chip runs the full local Pippenger; the ~1KB
    Jacobian partial results are all-gathered over ICI and tree-reduced.
    Communication volume is O(chips), not O(points) — bucket sums never
    leave the chip.
  * NTT sharding ("SP/CP"): four-step decomposition N = N1 x N2 — local
    column NTTs, twiddle scale, all_to_all transpose over ICI, local row
    NTTs.  The inter-stage transpose is the only collective.
  * Data parallel: independent proofs vmapped over the batch axis and laid
    out one-per-chip (zktpu.api batch service).

All functions take an explicit jax.sharding.Mesh and run under shard_map —
the same code drives 8 virtual CPU devices in tests and a real pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import warnings

with warnings.catch_warnings():
    # the new jax.shard_map entry point renames check_rep -> check_vma;
    # stay on the stable-behavior experimental alias until we drop the flag
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curve import jnp_curve as jc
from ..field.jnp_field import JnpField
from ..field.params import FR, P_FR, NLIMBS, int_to_limbs
from ..msm import pippenger as pp
from ..ntt.ntt import Domain, intt, ntt

F = JnpField(FR)


# ------------------------------------------------------------- sharded MSM


def sharded_msm(points, inf_mask, scalar_limbs, mesh: Mesh, axis: str = "x", ops=jc.G1):
    """MSM with points/scalars sharded across `axis`; returns one Jacobian
    point (replicated).  N must be divisible by the axis size."""

    def local(pts, inf, sc):
        x, y, z = pp.msm(pts, inf, sc, ops=ops)
        # gather the per-chip partials and reduce on every chip (cheap: the
        # partials are single points)
        gx = jax.lax.all_gather(x, axis)  # (nchips, ...)
        gy = jax.lax.all_gather(y, axis)
        gz = jax.lax.all_gather(z, axis)
        n = gx.shape[0]
        while n > 1:
            h = n // 2
            gx, gy, gz = jc.point_add(
                ops,
                (gx[:h], gy[:h], gz[:h]),
                (gx[h : 2 * h], gy[h : 2 * h], gz[h : 2 * h]),
            )
            n = h
        return gx[0], gy[0], gz[0]

    spec = P(axis)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )(points, inf_mask, scalar_limbs)


def sharded_msm_bits(points, inf_mask, bits, mesh: Mesh, axis: str = "x", ops=jc.G1):
    def local(pts, inf, b):
        x, y, z = pp.msm_bits(pts, inf, b, ops=ops)
        gx = jax.lax.all_gather(x, axis)
        gy = jax.lax.all_gather(y, axis)
        gz = jax.lax.all_gather(z, axis)
        n = gx.shape[0]
        while n > 1:
            h = n // 2
            gx, gy, gz = jc.point_add(
                ops,
                (gx[:h], gy[:h], gz[:h]),
                (gx[h : 2 * h], gy[h : 2 * h], gz[h : 2 * h]),
            )
            n = h
        return gx[0], gy[0], gz[0]

    spec = P(axis)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )(points, inf_mask, bits)


# ---------------------------------------------------- distributed 4-step NTT


@functools.lru_cache(maxsize=None)
class FourStepPlan:
    """Twiddle/layout tables for N = n1 * n2 (both powers of two)."""

    def __init__(self, n1: int, n2: int):
        self.n1, self.n2 = n1, n2
        self.n = n1 * n2
        d = Domain(self.n)
        self.d1 = Domain(n1)
        self.d2 = Domain(n2)
        # inter-stage twiddles W_N^(i1*i2), Montgomery form, (n1, n2) layout
        tw = np.empty((n1, n2, NLIMBS), dtype=np.uint32)
        twi = np.empty((n1, n2, NLIMBS), dtype=np.uint32)
        w = d.omega
        wi = d.omega_inv
        for i1 in range(n1):
            base = pow(w, i1, P_FR)
            basei = pow(wi, i1, P_FR)
            acc, acci = 1, 1
            for i2 in range(n2):
                tw[i1, i2] = int_to_limbs(FR.to_mont(acc))
                twi[i1, i2] = int_to_limbs(FR.to_mont(acci))
                acc = acc * base % P_FR
                acci = acci * basei % P_FR
        self.tw = tw
        self.twi = twi
        self.n_inv_mont = int_to_limbs(FR.to_mont(pow(self.n, -1, P_FR))).astype(
            np.uint32
        )


def four_step_ntt_local(x, plan: FourStepPlan):
    """Single-device 4-step reference: x (n,16) coeffs, natural order in,
    TRANSPOSED order out: out[i2, i1] = X[i1 + n1*i2] ... the caller treats
    the output as (n2, n1) 'NTT-transposed' layout."""
    n1, n2 = plan.n1, plan.n2
    # x[i1, i2] = coeff[i2 * n1 + i1]  (column-major split: stride-n1 subseqs)
    xm = x.reshape(n2, n1, NLIMBS).transpose(1, 0, 2)  # (n1, n2, 16)
    # stage 1: NTT of length n2 over each row (the stride-n1 subsequences)
    s1 = ntt(xm, plan.d2)  # along axis -2
    # twiddle
    s1 = F.mont_mul(s1, jnp.asarray(plan.tw))
    # transpose and stage 2: NTT of length n1
    s2 = ntt(s1.transpose(1, 0, 2), plan.d1)  # (n2, n1, 16)
    # out[k1, k2] where full index = k1 * n2 + k2 lives at s2[k2, k1]
    return s2


def four_step_intt_local(y, plan: FourStepPlan):
    """Inverse of four_step_ntt_local: y in (n2, n1) transposed layout ->
    coeffs (n,) natural order."""
    n1, n2 = plan.n1, plan.n2
    s2 = intt(y, plan.d1)  # along axis -2: length-n1 inverse (includes 1/n1)
    s1 = F.mont_mul(s2.transpose(1, 0, 2), jnp.asarray(plan.twi))  # (n1, n2, 16)
    xm = intt(s1, plan.d2)  # includes 1/n2
    return xm.transpose(1, 0, 2).reshape(n1 * n2, NLIMBS)


def sharded_four_step_ntt(x, plan: FourStepPlan, mesh: Mesh, axis: str = "x"):
    """Distributed 4-step NTT: input coeffs (n, 16) sharded contiguously;
    output in transposed layout (n2, n1, 16) sharded along n2.

    Local work is batched small NTTs; the only collective is the all_to_all
    realizing the (n1, n2) -> (n2, n1) transpose across chips."""
    n1, n2 = plan.n1, plan.n2
    nd = mesh.shape[axis]
    assert n1 % nd == 0 and n2 % nd == 0

    def local(xs, tws, twis):
        # xs: (n/nd, 16) = rows i1 in [lo, hi) of the (n1, n2) matrix after
        # the stride split.  Reconstruct: global coeff index = i2 * n1 + i1.
        # We shard over i1 blocks, so each chip holds i1 in its slice for all
        # i2: xs must arrive as the (n1/nd, n2, 16) block.
        s1 = ntt(xs, plan.d2)
        s1 = F.mont_mul(s1, tws)
        # all_to_all transpose: (n1_loc, n2, ...) -> (n1, n2_loc, ...)
        t = jax.lax.all_to_all(s1, axis, split_axis=1, concat_axis=0, tiled=True)
        s2 = ntt(t.transpose(1, 0, 2), plan.d1)  # (n2_loc, n1, 16)
        return s2

    xm = x.reshape(n2, n1, NLIMBS).transpose(1, 0, 2)  # (n1, n2, 16) host-ish view
    tw = jnp.asarray(plan.tw)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(xm, tw, jnp.asarray(plan.twi))


class ShardedQuotient:
    """Mesh-sharded Groth16 quotient: (az, bz, cz) Montgomery evaluation
    vectors (N, 16) -> H-query scalars (N, 16) canonical digits, with every
    NTT stage a distributed 4-step transform (all_to_all transposes over
    ICI) — closes VERDICT r3 weak #6 ("distributed NTT is shelf-ware").

    Pipeline (mirrors Prover._quotient, reference semantics gnark computeH
    [dep go.mod:8]): iNTT -> coset scale -> NTT -> pointwise
    (A∘B − C)·Z_coset⁻¹ -> iNTT -> un-scale.  Layout discipline: the
    output scalars are in the 4-step MATRIX order (flat index i1*n2 + i2
    holds coefficient j = i2*n1 + i1); pair them with an h_query permuted
    by `h_perm` ONCE at Prover init — the MSM result is order-invariant, so
    no cross-chip reshuffle is ever needed."""

    def __init__(self, n: int, mesh: Mesh, axis: str = "x"):
        n1 = 1 << ((n.bit_length() - 1 + 1) // 2)
        n2 = n // n1
        nd = mesh.shape[axis]
        assert n1 % nd == 0 and n2 % nd == 0, (n1, n2, nd)
        self.plan = FourStepPlan(n1, n2)
        self.mesh = mesh
        self.axis = axis
        self.n = n
        d = Domain(n)
        # coset scale tables in MATRIX layout: cell [i1, i2] scales
        # coefficient j = i2*n1 + i1
        g = d.coset_gen
        gj = np.empty((n1, n2, NLIMBS), dtype=np.uint32)
        gji = np.empty((n1, n2, NLIMBS), dtype=np.uint32)
        ginv = pow(g, -1, P_FR)
        for i1 in range(n1):
            acc = pow(g, i1, P_FR)
            acci = pow(ginv, i1, P_FR)
            step = pow(g, n1, P_FR)
            stepi = pow(ginv, n1, P_FR)
            for i2 in range(n2):
                gj[i1, i2] = int_to_limbs(FR.to_mont(acc))
                gji[i1, i2] = int_to_limbs(FR.to_mont(acci))
                acc = acc * step % P_FR
                acci = acci * stepi % P_FR
        self._gj = jnp.asarray(gj)
        self._gji = jnp.asarray(gji)
        self._zinv = jnp.asarray(d.z_coset_inv_mont)

    def h_perm(self) -> np.ndarray:
        """Permutation to apply to the h_query so its points pair with the
        matrix-ordered scalars: perm[i1*n2 + i2] = i2*n1 + i1."""
        n1, n2 = self.plan.n1, self.plan.n2
        i1 = np.arange(n1)[:, None]
        i2 = np.arange(n2)[None, :]
        return (i2 * n1 + i1).reshape(-1)

    # --- shard_map bodies (composable: outputs of one are inputs of the
    # next with matching PartitionSpecs, so XLA never reshards)
    def _intt_mat(self, yT):
        """(n2, n1, 16) transposed-eval layout (replicated input is sliced
        along n2) -> coefficient matrix (n1, n2, 16) sharded along n1."""
        plan, axis = self.plan, self.axis

        def local(ys, twis):
            s2 = intt(ys, plan.d1)
            t = jax.lax.all_to_all(s2, axis, split_axis=1, concat_axis=0, tiled=True)
            s1 = F.mont_mul(t.transpose(1, 0, 2), twis)
            return intt(s1, plan.d2)

        sp = P(axis)
        return shard_map(
            local, mesh=self.mesh, in_specs=(sp, sp), out_specs=sp,
            check_rep=False,
        )(yT, jnp.asarray(plan.twi))

    def _ntt_mat(self, xm):
        """Coefficient matrix (n1, n2, 16) sharded along n1 -> transposed
        evals (n2, n1, 16) sharded along n2."""
        plan, axis = self.plan, self.axis

        def local(xs, tws):
            s1 = ntt(xs, plan.d2)
            s1 = F.mont_mul(s1, tws)
            t = jax.lax.all_to_all(s1, axis, split_axis=1, concat_axis=0, tiled=True)
            return ntt(t.transpose(1, 0, 2), plan.d1)

        sp = P(axis)
        return shard_map(
            local, mesh=self.mesh, in_specs=(sp, sp), out_specs=sp,
            check_rep=False,
        )(xm, jnp.asarray(plan.tw))

    def __call__(self, az, bz, cz):
        """-> (N, 16) canonical H scalars in matrix order (see h_perm)."""
        plan = self.plan
        n1, n2 = plan.n1, plan.n2

        def to_T(v):  # natural evals -> (n2, n1) transposed-eval layout
            return v.reshape(n1, n2, NLIMBS).transpose(1, 0, 2)

        sp = P(self.axis)

        def scale(mat, tab):
            return shard_map(
                lambda m, t: F.mont_mul(m, t),
                mesh=self.mesh, in_specs=(sp, sp), out_specs=sp,
                check_rep=False,
            )(mat, tab)

        A = scale(self._intt_mat(to_T(az)), self._gj)
        B = scale(self._intt_mat(to_T(bz)), self._gj)
        C = scale(self._intt_mat(to_T(cz)), self._gj)
        Ac, Bc, Cc = self._ntt_mat(A), self._ntt_mat(B), self._ntt_mat(C)

        def pointwise(a, b, c):
            return F.mont_mul(F.sub(F.mont_mul(a, b), c), self._zinv)

        Hc = shard_map(
            pointwise, mesh=self.mesh, in_specs=(sp, sp, sp), out_specs=sp,
            check_rep=False,
        )(Ac, Bc, Cc)
        H = scale(self._intt_mat(Hc), self._gji)
        h = H.reshape(self.n, NLIMBS)
        # coefficient n-1 (always 0 in exact arithmetic) sits at matrix flat
        # index n1*n2 - 1; zero its scalar slot like the single-chip path
        h = h.at[-1].set(jnp.zeros(NLIMBS, jnp.uint32))
        return F.from_mont(h)


def sharded_four_step_intt(y, plan: FourStepPlan, mesh: Mesh, axis: str = "x"):
    """Inverse distributed 4-step; y (n2, n1, 16) sharded along n2 ->
    coeffs (n1, n2, 16)-as-(n1 blocks) sharded along n1 (matrix form of the
    natural order: coeff[i2*n1 + i1] = out[i1, i2])."""
    n1, n2 = plan.n1, plan.n2

    def local(ys, twis):
        s2 = intt(ys, plan.d1)  # (n2_loc, n1, 16): length-n1 inverse per k2
        # all_to_all transpose: (n2_loc, n1, .) -> (n2, n1_loc, .); received
        # blocks concatenate in device order so axis 0 is global k2 order
        t = jax.lax.all_to_all(s2, axis, split_axis=1, concat_axis=0, tiled=True)
        s1 = F.mont_mul(t.transpose(1, 0, 2), twis)  # (n1_loc, n2, 16) * twi[i1,i2]
        return intt(s1, plan.d2)  # length-n2 inverse along axis -2

    twi = jnp.asarray(plan.twi)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(y, twi)
