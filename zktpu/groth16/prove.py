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
import os
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
from ..ntt.ntt import Domain
from ..r1cs.builder import CompiledR1CS
from .setup import ProvingKey

F = JnpField(FR)


@dataclasses.dataclass
class Proof:
    """Groth16 proof as affine coordinate ints (curve points on BN254).

    d / d_sigma are the Pedersen commitment + proof-of-knowledge for lookup
    circuits (BSB22-style; None for pure-R1CS circuits)."""

    a: tuple  # (x, y) in G1
    b: tuple  # ((x0,x1),(y0,y1)) in G2
    c: tuple  # (x, y) in G1
    d: tuple = None  # (x, y) in G1 or None
    d_sigma: tuple = None

    def to_json_dict(self) -> dict:
        out = {
            "a": list(self.a),
            "b": [list(c) for c in self.b],
            "c": list(self.c),
        }
        if self.d is not None:
            out["d"] = list(self.d)
            out["d_sigma"] = list(self.d_sigma)
        return out

    @classmethod
    def from_json_dict(cls, d) -> "Proof":
        return cls(
            a=tuple(d["a"]),
            b=tuple(tuple(c) for c in d["b"]),
            c=tuple(d["c"]),
            d=tuple(d["d"]) if d.get("d") else None,
            d_sigma=tuple(d["d_sigma"]) if d.get("d_sigma") else None,
        )


def lookup_challenge(d_aff: tuple, slot: int) -> int:
    """LEGACY Fiat-Shamir challenge (zktpu-lookup-v1): H(commitment, slot)
    mod r.  Kept behind ZKTPU_LOOKUP_CHALLENGE=v1; the default derivation is
    gnark's BSB22 hash-to-field (lookup_challenges below)."""
    msg = (
        b"zktpu-lookup-v1"
        + int(d_aff[0]).to_bytes(32, "big")
        + int(d_aff[1]).to_bytes(32, "big")
        + slot.to_bytes(4, "big")
    )
    return int.from_bytes(hashlib.sha512(msg).digest(), "big") % P_FR


def expand_message_xmd(msg: bytes, dst: bytes, length: int) -> bytes:
    """RFC 9380 §5.3.1 expand_message_xmd with SHA-256 — the expansion
    gnark-crypto's fr.Hash uses (hash_to_field.go [dep] go.mod:9).  Pinned
    against the RFC's own test vectors in test_lookup_e2e."""
    assert len(dst) <= 255
    ell = (length + 31) // 32
    assert ell <= 255
    dst_prime = dst + bytes([len(dst)])
    b0 = hashlib.sha256(
        bytes(64) + msg + length.to_bytes(2, "big") + b"\x00" + dst_prime
    ).digest()
    b_prev = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
    out = [b_prev]
    for i in range(2, ell + 1):
        xored = bytes(x ^ y for x, y in zip(b0, b_prev))
        b_prev = hashlib.sha256(xored + bytes([i]) + dst_prime).digest()
        out.append(b_prev)
    return b"".join(out)[:length]


GNARK_COMMITMENT_DST = b"bsb22-commitment"  # constraint.CommitmentDst [dep]


def fr_hash(msg: bytes, dst: bytes, count: int) -> list[int]:
    """gnark-crypto fr.Hash semantics: expand_message_xmd(SHA-256) to
    count*48 bytes (L = ceil((254+128)/8)), each 48-byte chunk big-endian
    mod r."""
    L = 48
    pseudo = expand_message_xmd(msg, dst, count * L)
    return [
        int.from_bytes(pseudo[i * L : (i + 1) * L], "big") % P_FR
        for i in range(count)
    ]


def lookup_challenges(d_aff: tuple, slots) -> list[int]:
    """Challenges for the lookup-commitment wires, in slot order.

    Default = gnark's BSB22 derivation (backend/groth16 solveCommitmentWire
    [dep] go.mod:8): fr.Hash(SerializeCommitment(D.Marshal(), publicCommitted,
    32), "bsb22-commitment", 1) where D.Marshal() is the UNCOMPRESSED 64-byte
    x||y big-endian G1 encoding and our circuits commit no public wires
    (publicCommitted = []).  gnark derives ONE challenge per commitment; our
    aes_v2 re-own needs two (eta1, eta2), so count = len(slots) outputs are
    drawn from the SAME expansion — byte-identical to gnark for the
    one-challenge case (the decoded reference AES r1cs, test_gnark_aes_r1cs).
    ZKTPU_LOOKUP_CHALLENGE=v1 restores the legacy zktpu-lookup-v1 hash."""
    slots = list(slots)
    if os.environ.get("ZKTPU_LOOKUP_CHALLENGE", "gnark") == "v1":
        return [lookup_challenge(d_aff, s) for s in slots]
    msg = int(d_aff[0]).to_bytes(32, "big") + int(d_aff[1]).to_bytes(32, "big")
    return fr_hash(msg, GNARK_COMMITMENT_DST, len(slots))


def _coeffs_r2(coeffs) -> np.ndarray:
    """Python-int coefficients -> (nnz, 16) limbs of c * R^2 mod r, so that a
    plain digit-space sum followed by one REDC yields the Montgomery form."""
    out = np.empty((len(coeffs), NLIMBS), dtype=np.uint32)
    for i, c in enumerate(coeffs):
        out[i] = int_to_limbs(c * FR.r2 % P_FR)
    return out


def encode_witness(values, nv_pad: int):
    """Python-int witness -> ((nv,16) Montgomery limbs, (nv_pad,16) canonical
    digits) for the general prover path."""
    from ..field import limb

    z_mont = limb.encode(values, FR, mont=True)
    z_can = limb.encode(values, FR, mont=False)
    pad = nv_pad - len(values)
    if pad:
        z_can = np.concatenate([z_can, np.zeros((pad, NLIMBS), np.uint32)])
    return z_mont, z_can


class Prover:
    """Holds device-ready circuit constants + jitted stages for one circuit.

    mesh: optional jax.sharding.Mesh — when given, every MSM runs sharded
    over `axis` (points/scalars partitioned per chip, single-point partials
    all-gathered over ICI; zktpu.parallel.sharded).  Field arithmetic is
    exact, so an N-chip proof is byte-identical to the single-chip proof for
    the same rng_seed (SURVEY.md §7 Phase 7 oracle, exercised by
    __graft_entry__.dryrun_multichip)."""

    def __init__(self, cs: CompiledR1CS, pk: ProvingKey, mesh=None, axis: str = "x",
                 assemble_on_host: bool = False):
        assert pk.num_vars == cs.num_vars
        self.cs = cs
        self.pk = pk
        # assemble_on_host: do the final proof randomization with ref_ec
        # big-int math instead of the jitted device graph — spares the
        # assemble XLA compile (tests, multichip dryrun); on a real TPU the
        # device assemble is the default (host EC costs ~330 ms per proof).
        self.assemble_on_host = assemble_on_host
        self.n = pk.n_domain
        self.domain = Domain(self.n)
        self.nv_pad = pk.a_query.shape[0]
        self.mesh = mesh
        # HBM residency (SURVEY §5 checkpoint: "proving-key layout for
        # sharded HBM residency"): pin every MSM query on device ONCE —
        # numpy args would re-upload ~12 MB per proof (several hundred ms
        # over a tunneled chip)
        self._dev = {
            name: (
                jnp.asarray(getattr(pk, name)),
                jnp.asarray(getattr(pk, name[: -len("_query")] + "_inf")),
            )
            for name in ("a_query", "b_g1_query", "b_g2_query", "l_query", "h_query")
        }
        if pk.has_commitment:
            self._dev["ck_query"] = (jnp.asarray(pk.ck_query), jnp.asarray(pk.ck_inf))
            self._dev["ck_sigma_query"] = (
                jnp.asarray(pk.ck_sigma_query),
                jnp.asarray(pk.ck_sigma_inf),
            )

        # A/B/C COO fused into ONE index space: rows of B offset by N, rows
        # of C by 2N — the whole witness solve is a single take + where +
        # segment_sum over 3N segments (one dispatch instead of three; the
        # matvecs dominate h_scalars on chip).
        rows_all = np.concatenate(
            [np.asarray(cs.a_rows), np.asarray(cs.b_rows) + self.n,
             np.asarray(cs.c_rows) + 2 * self.n]
        )
        cols_all = np.concatenate(
            [np.asarray(cs.a_cols), np.asarray(cs.b_cols), np.asarray(cs.c_cols)]
        )
        coeffs_all = list(cs.a_coeffs) + list(cs.b_coeffs) + list(cs.c_coeffs)
        self._mat_fused = (
            jnp.asarray(rows_all, dtype=jnp.int32),
            jnp.asarray(cols_all, dtype=jnp.int32),
            jnp.asarray(_coeffs_r2(coeffs_all)),
        )

        self._h_scalars = jax.jit(self._h_scalars_impl)
        self._h_scalars_general = jax.jit(self._h_scalars_general_impl)
        # H-query MSM: the points are fixed per pk, so the 16-bit-window
        # shifted-copy path (FixedBaseMSM) halves the bucket-accumulation
        # adds vs the generic 8-bit Pippenger.  Opt out with
        # ZKTPU_MSM_H_FIXED=0 (and the generic path remains the fallback
        # for tiny domains and mesh-sharded Provers).
        default_fixed = "1" if jax.default_backend() == "tpu" else "0"
        # XLA:CPU takes hours to compile the 16N-lane flat merge tree at AES
        # domain sizes, and CPU runs are tests — keep the generic path there
        self._use_h_fixed = (
            mesh is None
            and self.n >= 2048
            and os.environ.get("ZKTPU_MSM_H_FIXED", default_fixed) == "1"
        )
        self._msm_h_fixed_inst = None
        if mesh is None:
            self._msm_bits_g1 = jax.jit(functools.partial(pp.msm_bits, ops=jc.G1))
            self._msm_bits_g2 = jax.jit(functools.partial(pp.msm_bits, ops=jc.G2))
            self._msm_g1 = pp.StagedMSM(jc.G1)
            self._msm_g2 = pp.StagedMSM(jc.G2)
            # the three G1 witness MSMs (A, B1, L) share the bit vector and
            # the sequential fold depth — vmap them into ONE dispatch (3x
            # lanes, same latency) instead of three round trips
            self._g1_stack = jnp.asarray(
                np.stack([pk.a_query, pk.b_g1_query, pk.l_query])
            )
            self._g1_stack_inf = jnp.asarray(
                np.stack([pk.a_inf, pk.b_g1_inf, pk.l_inf])
            )
            self._msm_bits_g1x3 = jax.jit(
                jax.vmap(functools.partial(pp.msm_bits, ops=jc.G1), in_axes=(0, 0, None))
            )
        else:
            from ..parallel import sharded as sh

            def _sh(fn, ops):
                return jax.jit(
                    functools.partial(fn, mesh=mesh, axis=axis, ops=ops)
                )

            self._msm_bits_g1 = _sh(sh.sharded_msm_bits, jc.G1)
            self._msm_bits_g2 = _sh(sh.sharded_msm_bits, jc.G2)
            self._msm_g1 = _sh(sh.sharded_msm, jc.G1)
            self._msm_g2 = _sh(sh.sharded_msm, jc.G2)
            # mesh quotient: every NTT stage runs as the distributed 4-step
            # transform (all_to_all over ICI); the resulting H scalars are in
            # the 4-step matrix order, so the h_query is co-permuted ONCE
            # here and the sharded MSM consumes both directly (the MSM sum
            # is order-invariant — no cross-chip reshuffle per proof).
            nd = mesh.shape[axis]
            if self.n >= nd * nd:
                self._sq = sh.ShardedQuotient(self.n, mesh, axis)
                hperm = self._sq.h_perm()
                self._dev["h_query_perm"] = (
                    jnp.asarray(pk.h_query[hperm]),
                    jnp.asarray(pk.h_inf[hperm]),
                )
                self._h_scalars = jax.jit(
                    lambda zbits: self._sq(*self._matvecs_bits(zbits))
                )
            else:
                # domain too small to split n1/n2 across nd chips (n < nd^2,
                # only toy circuits): quotient stays replicated
                self._sq = None
        self._from_mont = jax.jit(F.from_mont)
        # the assemble graph depends only on pk constants — share ONE jitted
        # instance across Provers over the same pk (e.g. the single-chip and
        # mesh Provers in dryrun_multichip), halving its compile cost
        if not assemble_on_host:
            if getattr(pk, "_assemble_core_jit", None) is None:
                pk._fb_tables = self._build_fb_tables(pk)
                pk._assemble_core_jit = jax.jit(self._assemble_core_impl)
            self._assemble_core = pk._assemble_core_jit

    # ----------------------------------------------------------- jitted core
    def _matvecs_bits(self, zbits):
        """<A_k,z>, <B_k,z>, <C_k,z> for all rows in ONE fused segment_sum;
        zbits (nv,) uint32 in {0,1} -> three (N, 16) Montgomery arrays."""
        rows, cols, coeffs = self._mat_fused
        sel = jnp.take(zbits, cols)  # (nnz,)
        vals = jnp.where(sel[:, None] != 0, coeffs, jnp.uint32(0))
        acc = jax.ops.segment_sum(vals, rows, num_segments=3 * self.n)
        wide = jnp.concatenate(
            [acc, jnp.zeros((3 * self.n, NLIMBS), jnp.uint32)], axis=-1
        )
        m = F.mont_reduce(wide)  # one REDC per row
        return m[: self.n], m[self.n : 2 * self.n], m[2 * self.n :]

    def _matvecs_tern(self, zt):
        """Ternary-witness matvecs: zt (nv,) uint32 in {0,1,2} ({0,+1,-1}).
        gnark r1cs witnesses are ternary (Xor intermediates a*(1-2b), see
        compat.gnark_r1cs); a -1 entry selects the NEGATED pre-scaled
        coefficient, so the cost stays one select + segment_sum."""
        rows, cols, coeffs = self._mat_fused
        negc = self._mat_fused_neg
        sel = jnp.take(zt, cols)  # (nnz,)
        vals = jnp.where(
            (sel == 1)[:, None],
            coeffs,
            jnp.where((sel == 2)[:, None], negc, jnp.uint32(0)),
        )
        acc = jax.ops.segment_sum(vals, rows, num_segments=3 * self.n)
        wide = jnp.concatenate(
            [acc, jnp.zeros((3 * self.n, NLIMBS), jnp.uint32)], axis=-1
        )
        m = F.mont_reduce(wide)
        return m[: self.n], m[self.n : 2 * self.n], m[2 * self.n :]

    def _matvecs_general(self, z_mont):
        """Fused A/B/C matvecs for a general field witness (nv, 16) mont."""
        rows, cols, coeffs = self._mat_fused
        zz = jnp.take(z_mont, cols, axis=0)  # (nnz, 16)
        # coeffs stored as c*R^2 (canonical): mont_mul(cR^2, zR) = czR^2, so a
        # digit-space segment sum + ONE final REDC per row lands in mont form.
        vals = F.mont_mul(coeffs, zz)
        acc = jax.ops.segment_sum(vals, rows, num_segments=3 * self.n)
        wide = jnp.concatenate(
            [acc, jnp.zeros((3 * self.n, NLIMBS), jnp.uint32)], axis=-1
        )
        m = F.mont_reduce(wide)
        return m[: self.n], m[self.n : 2 * self.n], m[2 * self.n :]

    def _quotient(self, az, bz, cz):
        """H = (A.B - C)/Z on the coset, with every elementwise scale FUSED
        (VERDICT r4 item 1): 1/N + g^k collapse into one table between the
        transforms, and 1/N + 1/Z + g^-k + from_mont collapse into one
        PLAIN-form table after the last (Z is constant on the coset so it
        commutes through the linear transform) — 3 full-width mul passes
        where the unfused chain had 7."""
        from ..ntt.ntt import core_raw, ntt as ntt_fwd

        d = self.domain
        y = core_raw(jnp.stack([az, bz, cz]), d, inverse=True)
        y = F.mont_mul(y, jnp.asarray(d.q_scale_fwd))
        cos = ntt_fwd(y, d)
        a_cos, b_cos, c_cos = cos[0], cos[1], cos[2]
        prod = F.sub(F.mont_mul(a_cos, b_cos), c_cos)
        h = core_raw(prod, d, inverse=True)
        h = F.mont_mul(h, jnp.asarray(d.q_scale_inv_plain))  # -> canonical
        # degree <= N-2: the top coefficient must vanish; zero its scalar slot
        return h.at[-1].set(jnp.zeros(NLIMBS, jnp.uint32))

    def _h_scalars_impl(self, zbits):
        """zbits (nv,) -> H-query scalars (N, 16) canonical digits."""
        return self._quotient(*self._matvecs_bits(zbits))

    def _h_scalars_general_impl(self, z_mont):
        return self._quotient(*self._matvecs_general(z_mont))

    # ------------------------------------------------------------- host side
    def _pad_bits(self, zbits) -> jnp.ndarray:
        """Zero-pad the witness to nv_pad ON DEVICE (accepts a device array:
        the service keeps the witness on device end-to-end — a host round
        trip costs ~130 ms on a tunneled chip)."""
        if not hasattr(self, "_pad_jit"):
            nv, nv_pad = self.cs.num_vars, self.nv_pad
            self._pad_jit = jax.jit(
                lambda z: jnp.zeros(nv_pad, jnp.uint32).at[:nv].set(z)
            )
        return self._pad_jit(jnp.asarray(zbits))

    # ------------------------------------------------- device proof assembly
    @staticmethod
    def _build_fb_tables(pk):
        """Host-precomputed 8-bit-window fixed-base tables for delta1/delta2
        (the reference's Setup-style precompute, ref_ec.FixedBaseTable): the
        proof randomizer muls r*d1, s*d1, rs*d1, s*d2 become 32 gathers + a
        5-step tree sum instead of a 256-step double-and-add fori."""
        d1 = jc.limbs_to_g1((pk.delta_g1[0], pk.delta_g1[1], _ONE_LIMBS))
        d2 = jc.limbs_to_g2((pk.delta_g2[0], pk.delta_g2[1], _ONE_LIMBS2))
        t1 = ec.FixedBaseTable(ec.G1_CURVE, d1)
        t2 = ec.FixedBaseTable(ec.G2_CURVE, d2)
        flat1 = [p for row in t1.tables for p in row]
        flat2 = [p for row in t2.tables for p in row]
        T1 = jnp.asarray(jc.g1_to_limbs(flat1).reshape(32, 256, 2, NLIMBS))
        I1 = jnp.asarray(jc.g1_inf_mask(flat1).reshape(32, 256))
        T2 = jnp.asarray(jc.g2_to_limbs(flat2).reshape(32, 256, 2, 2, NLIMBS))
        I2 = jnp.asarray(jc.g2_inf_mask(flat2).reshape(32, 256))
        return T1, I1, T2, I2

    @staticmethod
    def _tree_sum(ops, X, Y, Z, width):
        """Halving-tree sum along axis 1, UNROLLED at true shapes: log2(w)
        point_add instances, but the whole tree fuses into one dispatch —
        loop-carried tiny point ops cost ~ms each on a tunneled chip."""
        m = width
        while m > 1:
            h = m // 2
            X, Y, Z = jc.point_add(
                ops,
                (X[:, :h], Y[:, :h], Z[:, :h]),
                (X[:, h : 2 * h], Y[:, h : 2 * h], Z[:, h : 2 * h]),
            )
            m = h
        return X[:, 0], Y[:, 0], Z[:, 0]

    def _fb_mul(self, ops, T, Tinf, digits):
        """digits (k, 32) base-256 LE digits -> (k,) points = sum_w T[w, d_w]."""
        k = digits.shape[0]
        widx = jnp.broadcast_to(jnp.arange(32)[None], (k, 32))
        pts = T[widx, digits]  # (k, 32, 2, coord)
        inf = Tinf[widx, digits]  # (k, 32)
        cshape = pts.shape[3:]
        one = jnp.asarray(jc._one_cached(isinstance(ops, jc.Fp2Ops)))
        Z = jnp.where(
            inf.reshape(inf.shape + (1,) * len(cshape)),
            jnp.zeros((k, 32) + cshape, jnp.uint32),
            jnp.broadcast_to(one, (k, 32) + cshape),
        )
        return self._tree_sum(ops, pts[:, :, 0], pts[:, :, 1], Z, 32)

    @staticmethod
    def _mul_fori(ops, base, bits):
        """MSB-first double-and-add over a stacked base triple (k, ...);
        bits (256, k) uint32.

        Loop-carried tiny point ops cost ~ms per fori iteration on a
        tunneled chip (kernel-split latency), so the body unrolls 16
        double/add/select steps on TPU (16 iterations total); 8 elsewhere
        (XLA CPU compile is superlinear in body size)."""
        zero = tuple(jnp.zeros_like(t) for t in base)
        unroll = 16 if jax.default_backend() == "tpu" else 8

        def body(i, acc):
            chunk = jax.lax.dynamic_slice_in_dim(bits, i * unroll, unroll, axis=0)
            for j in range(unroll):
                acc = jc.point_double(ops, acc)
                added = jc.point_add(ops, acc, base)
                keep = chunk[j] == 0
                acc = jc.point_select(ops, keep, acc, added)
            return acc

        return jax.lax.fori_loop(0, 256 // unroll, body, zero)

    def _assemble_core_impl(self, a_msm, b1_msm, b2_msm, l_msm, h_msm,
                            dig3, bits_ab):
        """Device-side proof randomization (was 330 ms of host Python EC per
        proof): table-driven fixed-base muls [r,s,rs]*delta1 and s*delta2
        (32 gathers + 5-step tree each), then the Groth16 combination A/B/C.
        dig3 (4, 32): base-256 digits of (r, s, r*s, s-for-G2);
        bits_ab (256, 2): MSB-first bits of (s, r) for the variable-base
        muls s*A, r*B1 (the only sequential-depth piece left)."""
        pk = self.pk
        one = jnp.asarray(_ONE_LIMBS)
        one2 = jnp.asarray(_ONE_LIMBS2)
        T1, I1, T2, I2 = pk._fb_tables

        def stack(ts):
            return tuple(jnp.stack(c, axis=0) for c in zip(*ts))

        def lane(t, i):
            return tuple(c[i] for c in t)

        alpha1 = (jnp.asarray(pk.alpha_g1[0]), jnp.asarray(pk.alpha_g1[1]), one)
        beta1 = (jnp.asarray(pk.beta_g1[0]), jnp.asarray(pk.beta_g1[1]), one)
        beta2 = (jnp.asarray(pk.beta_g2[0]), jnp.asarray(pk.beta_g2[1]), one2)

        # phase 1: fixed-base muls from the windowed tables
        g1m = self._fb_mul(jc.G1, T1, I1, dig3[:3])
        rd1, sd1, rsd1 = (lane(g1m, i) for i in range(3))
        sd2 = lane(self._fb_mul(jc.G2, T2, I2, dig3[3:]), 0)
        # A = alpha1 + A0 + r*delta1 ; B1 = beta1 + B1msm + s*delta1
        t = jc.point_add(jc.G1, stack([alpha1, beta1]), stack([a_msm, b1_msm]))
        t = jc.point_add(jc.G1, t, stack([rd1, sd1]))
        A, B1 = lane(t, 0), lane(t, 1)
        B2 = jc.point_add(jc.G2, jc.point_add(jc.G2, beta2, b2_msm), sd2)
        # phase 2: variable-base muls s*A, r*B1
        sA_rB1 = self._mul_fori(jc.G1, stack([A, B1]), bits_ab)
        # C = L + H + s*A + r*B1 - rs*delta1
        u = jc.point_add(
            jc.G1, stack([l_msm, lane(sA_rB1, 0)]), stack([h_msm, lane(sA_rB1, 1)])
        )
        C = jc.point_add(jc.G1, lane(u, 0), lane(u, 1))
        C = jc.point_add(jc.G1, C, jc.point_neg(jc.G1, rsd1))
        # pack A | B2 | C into ONE (12, 16) array: each device->host
        # transfer costs ~25 ms over the tunnel; nine of them cost ~220 ms
        return jnp.concatenate(
            [
                jnp.stack([A[0], A[1], A[2]]),
                B2[0], B2[1], B2[2],
                jnp.stack([C[0], C[1], C[2]]),
            ],
            axis=0,
        )

    @staticmethod
    def _bits_msb(vals) -> np.ndarray:
        out = np.zeros((256, len(vals)), np.uint32)
        for j, v in enumerate(vals):
            for i in range(256):
                out[i, j] = (v >> (255 - i)) & 1
        return out

    @staticmethod
    def _digits256(vals) -> np.ndarray:
        out = np.zeros((len(vals), 32), np.int32)
        for j, v in enumerate(vals):
            for w in range(32):
                out[j, w] = (v >> (8 * w)) & 0xFF
        return out

    def _assemble(self, a_msm, b1_msm, b2_msm, l_msm, h_msm, rng_seed,
                  d_aff=None, dsig_aff=None, on_host=None,
                  defer_fetch: bool = False) -> Proof:
        if on_host is None:
            on_host = self.assemble_on_host
        if rng_seed is None:
            r = _secrets.randbelow(P_FR)
            s = _secrets.randbelow(P_FR)
        else:
            from .ref_prove import derive_rs

            r, s = derive_rs(rng_seed)

        if on_host:
            from . import ref_prove

            def host(t):
                return jc.limbs_to_g1(tuple(np.asarray(c) for c in t))

            return ref_prove.assemble(
                self.pk,
                host(a_msm), host(b1_msm),
                jc.limbs_to_g2(tuple(np.asarray(c) for c in b2_msm)),
                host(l_msm), host(h_msm), r, s, d_aff, dsig_aff,
            )

        # ONE fused upload for the randomizer digits+bits (host->device
        # crossings cost ~130 ms each over the tunnel)
        fused = np.concatenate(
            [
                self._digits256([r, s, r * s % P_FR, s]).reshape(-1),
                self._bits_msb([s, r]).reshape(-1).astype(np.int32),
            ]
        ).astype(np.int32)
        packed_dev = self._assemble_fused(a_msm, b1_msm, b2_msm, l_msm, h_msm, fused)
        if defer_fetch:
            return packed_dev
        return self._proof_from_packed(np.asarray(packed_dev), d_aff, dsig_aff)

    def prove_device(self, zbits: np.ndarray, rng_seed: bytes | None = None):
        """Pipelined-throughput variant of prove(): the WHOLE dispatch chain
        (witness matvecs -> quotient -> MSMs -> device assembly) is issued
        asynchronously and the (12, 16) packed-proof DEVICE array returned
        un-fetched.  Issue K of these back-to-back and the chip executes
        them with no host sync in between — one fetch per proof at the end
        (finish_proof).  Compile-free once prove(assemble_on_host=False)
        has run (reuses the exact same jitted graphs).  The defer-fetch
        decision is threaded through as a call parameter (not instance
        state), so concurrent prove() calls on the same Prover — which the
        FFI layer allows — cannot observe it (ADVICE r4)."""
        return self.prove(zbits, rng_seed, assemble_on_host=False,
                          _defer_fetch=True)

    @staticmethod
    def finish_proof(packed_dev, d_aff=None, dsig_aff=None) -> Proof:
        return Prover._proof_from_packed(np.asarray(packed_dev), d_aff, dsig_aff)

    @property
    def _assemble_fused(self):
        if getattr(self.pk, "_assemble_fused_jit", None) is None:
            def run(a_msm, b1_msm, b2_msm, l_msm, h_msm, fused):
                dig3 = fused[:128].reshape(4, 32)
                bits_ab = fused[128:].reshape(256, 2).astype(jnp.uint32)
                return self._assemble_core_impl(
                    a_msm, b1_msm, b2_msm, l_msm, h_msm, dig3, bits_ab
                )

            self.pk._assemble_fused_jit = jax.jit(run)
        return self.pk._assemble_fused_jit

    @staticmethod
    def _proof_from_packed(packed: np.ndarray, d_aff=None, dsig_aff=None) -> Proof:
        """(12, 16) packed rows [A.xyz | B2.x0 x1 y0 y1 z0 z1 | C.xyz]."""
        a_aff = ec.G1_CURVE.to_affine(
            jc.limbs_to_g1((packed[0], packed[1], packed[2]))
        )
        b_aff = ec.G2_CURVE.to_affine(
            jc.limbs_to_g2((packed[3:5], packed[5:7], packed[7:9]))
        )
        c_aff = ec.G1_CURVE.to_affine(
            jc.limbs_to_g1((packed[9], packed[10], packed[11]))
        )
        return Proof(
            a=(a_aff[0], a_aff[1]),
            b=((b_aff[0].c0, b_aff[0].c1), (b_aff[1].c0, b_aff[1].c1)),
            c=(c_aff[0], c_aff[1]),
            d=d_aff,
            d_sigma=dsig_aff,
        )

    def prove(self, zbits: np.ndarray, rng_seed: bytes | None = None,
              assemble_on_host: bool | None = None,
              _defer_fetch: bool = False) -> Proof:
        """Bit-witness fast path (ChaChaV3: every wire is 0/1).
        zbits: (num_vars,) uint32 full witness (z[0] = 1 included).
        assemble_on_host overrides the instance default for THIS call only
        (lets bench warm the device-assemble graph from a thread without
        racing other callers on self.assemble_on_host).

        Stages are dispatched WITHOUT intermediate device syncs (the whole
        chain resolves at the final packed-proof transfer); per-stage
        block_until_ready happens only when metrics are enabled, since every
        sync costs a host round trip (~25 ms over a tunneled chip)."""
        from ..utils.metrics import enabled as metrics_on, stage

        sync = jax.block_until_ready if metrics_on() else (lambda x: x)
        assert zbits.shape == (self.cs.num_vars,)
        zpad_j = self._pad_bits(zbits)
        with stage("prove.h_scalars", items=self.n):
            h_digits = sync(self._h_scalars(jnp.asarray(zbits)))
        with stage("prove.msm_witness", items=4 * self.nv_pad):
            if self.mesh is None:
                g1x3 = self._msm_bits_g1x3(self._g1_stack, self._g1_stack_inf, zpad_j)
                a_msm = tuple(t[0] for t in g1x3)
                b1_msm = tuple(t[1] for t in g1x3)
                l_msm = tuple(t[2] for t in g1x3)
                b2_msm = sync(self._msm_bits_g2(*self._dev["b_g2_query"], zpad_j))
            else:
                a_msm = self._msm_bits_g1(*self._dev["a_query"], zpad_j)
                b1_msm = self._msm_bits_g1(*self._dev["b_g1_query"], zpad_j)
                b2_msm = self._msm_bits_g2(*self._dev["b_g2_query"], zpad_j)
                l_msm = sync(self._msm_bits_g1(*self._dev["l_query"], zpad_j))
        with stage("prove.msm_h", items=self.n):
            if self._msm_h_fixed is not None:
                h_msm = sync(self._msm_h_fixed(h_digits))
            elif self.mesh is not None and self._sq is not None:
                # mesh h scalars arrive in 4-step matrix order; use the
                # co-permuted query (see __init__)
                h_msm = sync(self._msm_g1(*self._dev["h_query_perm"], h_digits))
            else:
                h_msm = sync(self._msm_g1(*self._dev["h_query"], h_digits))
        with stage("prove.assemble"):
            return self._assemble(a_msm, b1_msm, b2_msm, l_msm, h_msm, rng_seed,
                                  on_host=assemble_on_host,
                                  defer_fetch=_defer_fetch)

    def _prove_batch_dp(self, zbits_batch, rng_seeds, mesh, axis: str) -> list:
        """One-proof-per-chip data parallelism (VERDICT r4 item 6 — the
        v5e-8 layout the amortized north star assumes): the batch axis is
        sharded over `mesh`, and each chip runs the WHOLE single-proof graph
        (matvecs -> quotient -> MSMs -> packed assemble) on its local
        items with ZERO collectives — only the (B, 12, 16) packed proofs
        gather at the end.  Byte-identical to sequential prove() for the
        same seeds (test_batch_prove mesh case)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharded import shard_map

        bsz, nv = zbits_batch.shape
        nd = mesh.shape[axis]
        assert bsz % nd == 0, f"batch {bsz} must divide over {nd} chips"
        if getattr(self.pk, "_fb_tables", None) is None:
            self.pk._fb_tables = self._build_fb_tables(self.pk)

        if getattr(self, "_dp_jit", None) is None:
            nv_pad = self.nv_pad

            def per_proof(zbits, dig3, bits_ab):
                zpad = jnp.zeros(nv_pad, jnp.uint32).at[:nv].set(zbits)
                h = self._h_scalars_impl(zbits)
                g1x3 = jax.vmap(
                    functools.partial(pp.msm_bits, ops=jc.G1),
                    in_axes=(0, 0, None),
                )(self._g1_stack, self._g1_stack_inf, zpad)
                a_msm = tuple(t[0] for t in g1x3)
                b1_msm = tuple(t[1] for t in g1x3)
                l_msm = tuple(t[2] for t in g1x3)
                b2 = pp.msm_bits(*self._dev["b_g2_query"], zpad, ops=jc.G2)
                h_msm = pp.msm(*self._dev["h_query"], h, ops=jc.G1)
                return self._assemble_core_impl(
                    a_msm, b1_msm, b2, l_msm, h_msm, dig3, bits_ab
                )

            spec = P(axis)
            self._dp_jit = jax.jit(
                shard_map(
                    jax.vmap(per_proof),
                    mesh=mesh,
                    in_specs=(spec, spec, spec),
                    out_specs=spec,
                    check_rep=False,
                )
            )

        rs = [self._derive_rs_seed(seed) for seed in rng_seeds]
        dig3 = jnp.asarray(
            np.stack([self._digits256([r, s, r * s % P_FR, s]) for r, s in rs])
        )
        bits_ab = jnp.asarray(np.stack([self._bits_msb([s, r]) for r, s in rs]))
        packed = np.asarray(self._dp_jit(jnp.asarray(zbits_batch), dig3, bits_ab))
        return [self._proof_from_packed(packed[i]) for i in range(bsz)]

    @staticmethod
    def _derive_rs_seed(seed: bytes):
        r = int.from_bytes(hashlib.sha512(seed + b"r").digest(), "big") % P_FR
        s = int.from_bytes(hashlib.sha512(seed + b"s").digest(), "big") % P_FR
        return r, s

    def prove_batch(self, zbits_batch: np.ndarray, rng_seeds,
                    mesh=None, axis: str = "x") -> list:
        """Data-parallel proving (SURVEY §2.3 DP axis): B independent bit
        witnesses -> B proofs in ONE vmapped dispatch chain per stage.
        Seeded proofs are byte-identical to Prover.prove one-at-a-time.
        mesh: shard the BATCH axis one-proof-per-chip (_prove_batch_dp);
        valid on a single-chip Prover (self.mesh is None)."""
        from ..utils.metrics import stage

        bsz, nv = zbits_batch.shape
        assert nv == self.cs.num_vars and len(rng_seeds) == bsz
        assert self.mesh is None, (
            "prove_batch needs a single-chip Prover (uses _g1_stack); "
            "pass mesh= for one-proof-per-chip DP"
        )
        if mesh is not None:
            return self._prove_batch_dp(zbits_batch, rng_seeds, mesh, axis)
        if getattr(self.pk, "_fb_tables", None) is None:
            # a Prover built with assemble_on_host=True never built the
            # fixed-base tables the batched assemble graph reads (ADVICE r3)
            self.pk._fb_tables = self._build_fb_tables(self.pk)
        if not hasattr(self, "_batched"):
            self._batched = {
                "h": jax.jit(jax.vmap(self._h_scalars_impl)),
                "g1x3": jax.jit(
                    jax.vmap(
                        lambda bits: jax.vmap(
                            functools.partial(pp.msm_bits, ops=jc.G1),
                            in_axes=(0, 0, None),
                        )(self._g1_stack, self._g1_stack_inf, bits)
                    )
                ),
                "g2": jax.jit(
                    jax.vmap(
                        lambda bits: pp.msm_bits(
                            *self._dev["b_g2_query"], bits, ops=jc.G2
                        )
                    )
                ),
                "assemble": jax.jit(jax.vmap(self._assemble_core_impl)),
            }
        zpad = np.zeros((bsz, self.nv_pad), dtype=np.uint32)
        zpad[:, : self.cs.num_vars] = zbits_batch
        zj = jnp.asarray(zpad)
        with stage("prove_batch.h_scalars", items=bsz * self.n):
            h_digits = self._batched["h"](jnp.asarray(zbits_batch))
        with stage("prove_batch.msm_witness", items=4 * bsz * self.nv_pad):
            g1x3 = self._batched["g1x3"](zj)
            b2 = self._batched["g2"](zj)
        with stage("prove_batch.msm_h", items=bsz * self.n):
            h_msm = self._msm_g1.batched(*self._dev["h_query"], h_digits)
        rs = [self._derive_rs_seed(seed) for seed in rng_seeds]
        dig3 = jnp.asarray(
            np.stack([self._digits256([r, s, r * s % P_FR, s]) for r, s in rs])
        )
        bits_ab = jnp.asarray(np.stack([self._bits_msb([s, r]) for r, s in rs]))
        with stage("prove_batch.assemble", items=bsz):
            a_msm = tuple(t[:, 0] for t in g1x3)
            b1_msm = tuple(t[:, 1] for t in g1x3)
            l_msm = tuple(t[:, 2] for t in g1x3)
            packed = np.asarray(
                self._batched["assemble"](
                    a_msm, b1_msm, b2, l_msm, h_msm, dig3, bits_ab
                )
            )  # (B, 12, 16) — one transfer for the whole batch
        return [self._proof_from_packed(packed[i]) for i in range(bsz)]

    @property
    def _msm_h_fixed(self):
        """Lazy FixedBaseMSM for the H query: its device precompute (the
        2^(16w) shift copies) runs at FIRST prove, not service init."""
        if not self._use_h_fixed:
            return None
        if self._msm_h_fixed_inst is None:
            # tail=4096 measured best on v5e (probe_r5d: 310 ms/call,
            # 151 s compile vs 340 ms/316 s at 16384 and ~2x the compile
            # at the module-default 2048)
            tail = int(os.environ.get("ZKTPU_FB_TAIL", "4096"))
            self._msm_h_fixed_inst = pp.FixedBaseMSM(
                self.pk.h_query, self.pk.h_inf, ops=jc.G1, tail=tail
            )
        return self._msm_h_fixed_inst

    # ------------------------------------------------- ternary witness path
    def _ensure_tern(self):
        """Lazily build the ternary-witness graphs (gnark-artifact circuits;
        our own chacha stays on the cheaper pure-bit path)."""
        if hasattr(self, "_tern"):
            return
        self._mat_fused_neg = jnp.asarray(
            _coeffs_r2([P_FR - c for c in self._tern_coeffs_src()])
        )
        self._tern = {
            "h": jax.jit(lambda zt: self._quotient(*self._matvecs_tern(zt))),
            "g1x3": jax.jit(
                jax.vmap(
                    functools.partial(pp.msm_tern, ops=jc.G1), in_axes=(0, 0, None)
                )
            ),
            "g2": jax.jit(functools.partial(pp.msm_tern, ops=jc.G2)),
        }

    def _tern_coeffs_src(self):
        cs = self.cs
        return list(cs.a_coeffs) + list(cs.b_coeffs) + list(cs.c_coeffs)

    def prove_tern(self, zt: np.ndarray, rng_seed: bytes | None = None,
                   assemble_on_host: bool | None = None) -> Proof:
        """Ternary-witness fast path: zt (num_vars,) uint32 in {0,1,2}
        encoding {0,+1,-1}.  Same stage structure and per-stage cost as
        prove() — the sign only flips y coordinates inside the MSM fold."""
        from ..utils.metrics import enabled as metrics_on, stage

        assert self.mesh is None, "ternary path is single-chip for now"
        self._ensure_tern()
        sync = jax.block_until_ready if metrics_on() else (lambda x: x)
        assert zt.shape == (self.cs.num_vars,)
        if not hasattr(self, "_pad_jit"):
            self._pad_bits(np.zeros(self.cs.num_vars, np.uint32))
        zt_j = jnp.asarray(zt)
        ztp = self._pad_jit(zt_j)
        with stage("prove.h_scalars", items=self.n):
            h_digits = sync(self._tern["h"](zt_j))
        with stage("prove.msm_witness", items=4 * self.nv_pad):
            g1x3 = self._tern["g1x3"](self._g1_stack, self._g1_stack_inf, ztp)
            a_msm = tuple(t[0] for t in g1x3)
            b1_msm = tuple(t[1] for t in g1x3)
            l_msm = tuple(t[2] for t in g1x3)
            b2_msm = sync(self._tern["g2"](*self._dev["b_g2_query"], ztp))
        with stage("prove.msm_h", items=self.n):
            if self._msm_h_fixed is not None:
                h_msm = sync(self._msm_h_fixed(h_digits))
            else:
                h_msm = sync(self._msm_g1(*self._dev["h_query"], h_digits))
        with stage("prove.assemble"):
            return self._assemble(a_msm, b1_msm, b2_msm, l_msm, h_msm, rng_seed,
                                  on_host=assemble_on_host)

    # ---------------------------------------------- general/lookup witness
    def commit(self, z_digits: np.ndarray):
        """Pedersen commitment over the committed wires: D = sum z_i CK_i,
        D_sigma = sum z_i (sigma CK_i).  z_digits: (nv_pad, 16) canonical."""
        zj = jnp.asarray(z_digits)
        d = self._msm_g1(*self._dev["ck_query"], zj)
        ds = self._msm_g1(*self._dev["ck_sigma_query"], zj)
        D = jc.limbs_to_g1(tuple(np.asarray(t) for t in d))
        DS = jc.limbs_to_g1(tuple(np.asarray(t) for t in ds))
        d_aff = ec.G1_CURVE.to_affine(D)
        ds_aff = ec.G1_CURVE.to_affine(DS)
        return d_aff, ds_aff

    def prove_general(
        self,
        z_mont: np.ndarray,
        z_digits: np.ndarray,
        rng_seed: bytes | None = None,
        d_aff=None,
        dsig_aff=None,
    ) -> Proof:
        """Full-field witness path (lookup circuits).  z_mont (nv, 16)
        Montgomery; z_digits (nv_pad, 16) canonical (padded with zeros)."""
        assert z_mont.shape == (self.cs.num_vars, NLIMBS)
        zd = jnp.asarray(z_digits)
        h_digits = self._h_scalars_general(jnp.asarray(z_mont))
        a_msm = self._msm_g1(*self._dev["a_query"], zd)
        b1_msm = self._msm_g1(*self._dev["b_g1_query"], zd)
        b2_msm = self._msm_g2(*self._dev["b_g2_query"], zd)
        l_msm = self._msm_g1(*self._dev["l_query"], zd)
        if self._msm_h_fixed is not None:
            h_msm = self._msm_h_fixed(h_digits)
        else:
            h_msm = self._msm_g1(*self._dev["h_query"], h_digits)
        return self._assemble(
            a_msm, b1_msm, b2_msm, l_msm, h_msm, rng_seed, d_aff, dsig_aff
        )


from ..field.params import FP as _FP  # noqa: E402

_ONE_LIMBS = int_to_limbs(_FP.r).astype(np.uint32)  # 1 in Fp Montgomery form
_ONE_LIMBS2 = np.stack([_ONE_LIMBS, np.zeros(NLIMBS, np.uint32)])
