"""Groth16 prover — the TPU hot path.

Re-owns gnark's groth16.Prove (reference call site
/root/reference/libraries/prover/impl/provers.go:148, [dep] go.mod:8) as a
JAX pipeline (SURVEY.md §3.3 hot loops, in cost order):

  ① 4 MSMs (A/B1/L bit-path + H Pippenger, zktpu.msm) — plus the G2 MSM for B;
  ② quotient polynomial H = (A.B - C)/Z via iNTT -> coset NTT -> pointwise ->
     coset iNTT (zktpu.ntt), Z constant on the same-size coset;
  ③ "witness solve": Az/Bz/Cz sparse matvecs.  For bit-valued witnesses the
     per-entry product coeff*z_i degenerates to a select of the coefficient
     (stored pre-scaled by R^2 so ONE Montgomery REDC per matrix row replaces
     per-entry Montgomery muls), then a segment-sum in carry-save digit space.

Everything up to the final point selects runs under one jit per stage; the
tiny proof assembly (3 fixed-base scalar muls + a handful of point adds) is
host-side Python on the reference curve.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import secrets as _secrets

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import jnp_curve as jc
from ..curve import ref_ec as ec
from ..field.jnp_field import JnpField
from ..field.params import FR, P_FR, NLIMBS, int_to_limbs
from ..msm import pippenger as pp
from ..ntt.ntt import Domain, coset_intt, coset_ntt, intt
from ..r1cs.builder import CompiledR1CS
from .setup import ProvingKey

F = JnpField(FR)


@dataclasses.dataclass
class Proof:
    """Groth16 proof as affine coordinate ints (curve points on BN254)."""

    a: tuple  # (x, y) in G1
    b: tuple  # ((x0,x1),(y0,y1)) in G2
    c: tuple  # (x, y) in G1

    def to_json_dict(self) -> dict:
        return {
            "a": list(self.a),
            "b": [list(c) for c in self.b],
            "c": list(self.c),
        }

    @classmethod
    def from_json_dict(cls, d) -> "Proof":
        return cls(
            a=tuple(d["a"]),
            b=tuple(tuple(c) for c in d["b"]),
            c=tuple(d["c"]),
        )


def _coeffs_r2(coeffs) -> np.ndarray:
    """Python-int coefficients -> (nnz, 16) limbs of c * R^2 mod r, so that a
    plain digit-space sum followed by one REDC yields the Montgomery form."""
    out = np.empty((len(coeffs), NLIMBS), dtype=np.uint32)
    for i, c in enumerate(coeffs):
        out[i] = int_to_limbs(c * FR.r2 % P_FR)
    return out


class Prover:
    """Holds device-ready circuit constants + jitted stages for one circuit."""

    def __init__(self, cs: CompiledR1CS, pk: ProvingKey):
        assert pk.num_vars == cs.num_vars
        self.cs = cs
        self.pk = pk
        self.n = pk.n_domain
        self.domain = Domain(self.n)
        self.nv_pad = pk.a_query.shape[0]

        self._mat = {}
        for name, rows, cols, coeffs in (
            ("a", cs.a_rows, cs.a_cols, cs.a_coeffs),
            ("b", cs.b_rows, cs.b_cols, cs.b_coeffs),
            ("c", cs.c_rows, cs.c_cols, cs.c_coeffs),
        ):
            self._mat[name] = (
                jnp.asarray(rows, dtype=jnp.int32),
                jnp.asarray(cols, dtype=jnp.int32),
                jnp.asarray(_coeffs_r2(coeffs)),
            )

        self._h_scalars = jax.jit(self._h_scalars_impl)
        self._msm_bits_g1 = jax.jit(functools.partial(pp.msm_bits, ops=jc.G1))
        self._msm_bits_g2 = jax.jit(functools.partial(pp.msm_bits, ops=jc.G2))
        self._msm_g1 = pp.StagedMSM(jc.G1)

    # ----------------------------------------------------------- jitted core
    def _matvec_bits(self, name, zbits):
        """<M_k, z> for all rows k; zbits (nv,) uint32 in {0,1} -> (N, 16) mont."""
        rows, cols, coeffs = self._mat[name]
        sel = jnp.take(zbits, cols)  # (nnz,)
        vals = jnp.where(sel[:, None] != 0, coeffs, jnp.uint32(0))
        acc = jax.ops.segment_sum(vals, rows, num_segments=self.n)  # (N,16)
        wide = jnp.concatenate(
            [acc, jnp.zeros((self.n, NLIMBS), jnp.uint32)], axis=-1
        )
        return F.mont_reduce(wide)  # one REDC per row

    def _h_scalars_impl(self, zbits):
        """zbits (nv,) -> H-query scalars (N, 16) canonical digits."""
        d = self.domain
        az = self._matvec_bits("a", zbits)
        bz = self._matvec_bits("b", zbits)
        cz = self._matvec_bits("c", zbits)
        a_cos = coset_ntt(intt(az, d), d)
        b_cos = coset_ntt(intt(bz, d), d)
        c_cos = coset_ntt(intt(cz, d), d)
        prod = F.sub(F.mont_mul(a_cos, b_cos), c_cos)
        h_cos = F.mont_mul(prod, jnp.asarray(d.z_coset_inv_mont))
        h = coset_intt(h_cos, d)
        # degree <= N-2: the top coefficient must vanish; zero its scalar slot
        h = h.at[-1].set(jnp.zeros(NLIMBS, jnp.uint32))
        return F.from_mont(h)

    # ------------------------------------------------------------- host side
    def prove(self, zbits: np.ndarray, rng_seed: bytes | None = None) -> Proof:
        """zbits: (num_vars,) uint32 0/1 full witness (z[0] = 1 included)."""
        assert zbits.shape == (self.cs.num_vars,)
        zpad = np.zeros(self.nv_pad, dtype=np.uint32)
        zpad[: self.cs.num_vars] = zbits
        zpad_j = jnp.asarray(zpad)

        h_digits = self._h_scalars(jnp.asarray(zbits))
        pk = self.pk
        a_msm = self._msm_bits_g1(pk.a_query, pk.a_inf, zpad_j)
        b1_msm = self._msm_bits_g1(pk.b_g1_query, pk.b_g1_inf, zpad_j)
        b2_msm = self._msm_bits_g2(pk.b_g2_query, pk.b_g2_inf, zpad_j)
        l_msm = self._msm_bits_g1(pk.l_query, pk.l_inf, zpad_j)
        h_msm = self._msm_g1(pk.h_query, pk.h_inf, h_digits)

        A0 = jc.limbs_to_g1(tuple(np.asarray(t) for t in a_msm))
        B1 = jc.limbs_to_g1(tuple(np.asarray(t) for t in b1_msm))
        B2 = jc.limbs_to_g2(tuple(np.asarray(t) for t in b2_msm))
        L = jc.limbs_to_g1(tuple(np.asarray(t) for t in l_msm))
        H = jc.limbs_to_g1(tuple(np.asarray(t) for t in h_msm))

        if rng_seed is None:
            r = _secrets.randbelow(P_FR)
            s = _secrets.randbelow(P_FR)
        else:
            r = int.from_bytes(hashlib.sha512(rng_seed + b"r").digest(), "big") % P_FR
            s = int.from_bytes(hashlib.sha512(rng_seed + b"s").digest(), "big") % P_FR

        C1, C2 = ec.G1_CURVE, ec.G2_CURVE
        alpha1 = jc.limbs_to_g1((pk.alpha_g1[0], pk.alpha_g1[1], _ONE_LIMBS))
        beta1 = jc.limbs_to_g1((pk.beta_g1[0], pk.beta_g1[1], _ONE_LIMBS))
        delta1 = jc.limbs_to_g1((pk.delta_g1[0], pk.delta_g1[1], _ONE_LIMBS))
        beta2 = jc.limbs_to_g2((pk.beta_g2[0], pk.beta_g2[1], _ONE_LIMBS2))
        delta2 = jc.limbs_to_g2((pk.delta_g2[0], pk.delta_g2[1], _ONE_LIMBS2))

        a_pt = C1.add(C1.add(alpha1, A0), C1.mul(delta1, r))
        b2_pt = C2.add(C2.add(beta2, B2), C2.mul(delta2, s))
        b1_pt = C1.add(C1.add(beta1, B1), C1.mul(delta1, s))
        c_pt = C1.add(
            C1.add(L, H),
            C1.add(
                C1.add(C1.mul(a_pt, s), C1.mul(b1_pt, r)),
                C1.neg(C1.mul(delta1, r * s % P_FR)),
            ),
        )

        a_aff = C1.to_affine(a_pt)
        b_aff = C2.to_affine(b2_pt)
        c_aff = C1.to_affine(c_pt)
        return Proof(
            a=(a_aff[0], a_aff[1]),
            b=((b_aff[0].c0, b_aff[0].c1), (b_aff[1].c0, b_aff[1].c1)),
            c=(c_aff[0], c_aff[1]),
        )


from ..field.params import FP as _FP  # noqa: E402

_ONE_LIMBS = int_to_limbs(_FP.r).astype(np.uint32)  # 1 in Fp Montgomery form
_ONE_LIMBS2 = np.stack([_ONE_LIMBS, np.zeros(NLIMBS, np.uint32)])
