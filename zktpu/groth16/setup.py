"""Groth16 trusted setup over BN254 (offline CPU path).

Re-owns gnark's groth16.Setup (reference call site /root/reference/keygen.go:345,
[dep] go.mod:8): QAP construction from the R1CS, CRS sampling, and proving/
verifying key generation.  Pure Python ints + windowed fixed-base tables —
this runs once per circuit at keygen time, so clarity beats speed; the
TPU-resident artifacts are emitted as limb arrays laid out for HBM residency
(SURVEY.md §5 checkpoint/resume: "sharded proving-key layout").

Notation (Groth16 paper / gnark conventions):
  z = (1, pub..., priv...),  constraints  <A_k,z> * <B_k,z> = <C_k,z>
  u_i / v_i / w_i interpolate columns of A / B / C over the domain H.
  pk: [alpha]1 [beta]1 [delta]1 {[u_i(tau)]1} {[v_i(tau)]1} {[v_i(tau)]2}
      {[(beta u_i + alpha v_i + w_i)/delta]1}_priv {[tau^k Z(tau)/delta]1}
      [beta]2 [delta]2
  vk: [alpha]1 [beta]2 [gamma]2 [delta]2 {[(beta u_i + alpha v_i + w_i)/gamma]1}_pub
"""

from __future__ import annotations

import dataclasses
import hashlib
import secrets as _secrets

import numpy as np

from ..curve import jnp_curve as jc
from ..curve import ref_ec as ec
from ..field.params import FR, P_FR, FR_ROOT_OF_UNITY, FR_TWO_ADICITY
from ..r1cs.builder import CompiledR1CS


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def batch_inverse(vals: list[int]) -> list[int]:
    """Montgomery batch inversion mod r (one modexp for the whole batch)."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % P_FR
    inv_all = pow(prefix[n], -1, P_FR)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % P_FR
        inv_all = inv_all * vals[i] % P_FR
    return out


@dataclasses.dataclass
class ProvingKey:
    """TPU-layout proving key: affine Montgomery limb arrays + inf masks."""

    n_domain: int
    num_vars: int
    num_instance: int  # 1 + num_public
    alpha_g1: np.ndarray  # (2, 16)
    beta_g1: np.ndarray
    delta_g1: np.ndarray
    beta_g2: np.ndarray  # (2, 2, 16)
    delta_g2: np.ndarray
    a_query: np.ndarray  # (num_vars_padded, 2, 16)
    a_inf: np.ndarray
    b_g1_query: np.ndarray
    b_g1_inf: np.ndarray
    b_g2_query: np.ndarray  # (num_vars_padded, 2, 2, 16)
    b_g2_inf: np.ndarray
    l_query: np.ndarray  # (num_vars_padded, 2, 16) — private tail, zero-padded
    l_inf: np.ndarray
    h_query: np.ndarray  # (n_domain, 2, 16) — degree N-1 slot is infinity
    h_inf: np.ndarray
    # Pedersen commitment key for lookup circuits (BSB22-style): gamma-basis
    # points for the committed wires + sigma-shifted copies for the proof of
    # knowledge.  Indexed like l_query (full witness index space, infinity
    # everywhere except committed slots) so the commitment MSM runs over the
    # same padded witness vector.  Empty (shape (0,...)) when no lookups.
    ck_query: np.ndarray = None
    ck_inf: np.ndarray = None
    ck_sigma_query: np.ndarray = None
    ck_sigma_inf: np.ndarray = None
    # sha256 of the serialized r1cs this pk was set up for (uint8 array).
    # The reference pins pk<->r1cs hashes in a registry (prove_impl.go:27-43,
    # dormant there); here the binding travels INSIDE the pk and is enforced
    # at init_algorithm time.
    r1cs_sha256: np.ndarray = None

    def save(self, path: str):
        d = {k: v for k, v in dataclasses.asdict(self).items() if v is not None}
        np.savez_compressed(path, **d)

    def bind_r1cs(self, r1cs_bytes: bytes):
        import hashlib

        self.r1cs_sha256 = np.frombuffer(
            hashlib.sha256(r1cs_bytes).digest(), dtype=np.uint8
        ).copy()

    @classmethod
    def load(cls, path: str) -> "ProvingKey":
        d = np.load(path)
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name in ("n_domain", "num_vars", "num_instance"):
                continue
            kw[f.name] = d[f.name] if f.name in d else None
        return cls(
            n_domain=int(d["n_domain"]),
            num_vars=int(d["num_vars"]),
            num_instance=int(d["num_instance"]),
            **kw,
        )

    @property
    def has_commitment(self) -> bool:
        return self.ck_query is not None and self.ck_query.size > 0


@dataclasses.dataclass
class VerifyingKey:
    """Verifier key (CPU pairing side) as plain ints — tiny, JSON-able."""

    alpha_g1: tuple  # affine (x, y)
    beta_g2: tuple  # affine ((x0,x1),(y0,y1))
    gamma_g2: tuple
    delta_g2: tuple
    ic: list  # [(x, y) or None] per instance slot
    # lookup-commitment extension: [sigma]2 for the PoK pairing check, and the
    # instance positions whose values are derived as H(D, slot) instead of
    # read from the statement.  sigma_g2 is None for pure-R1CS circuits.
    sigma_g2: tuple = None
    challenge_slots: list = dataclasses.field(default_factory=list)
    # gnark-pedersen form of the PoK key (vk.aes* loaded from the reference's
    # binary files, compat.gnark.GnarkVerifyingKey): the check becomes
    # e(D, g_root_sigma_neg) * e(D_sigma, g) == 1 instead of the sigma form.
    pedersen_g: tuple = None  # G2
    pedersen_g_root_sigma_neg: tuple = None  # G2

    def to_json_dict(self) -> dict:
        def g2j(v):
            return [list(c) for c in v] if v else None

        return {
            "alpha_g1": list(self.alpha_g1),
            "beta_g2": [list(c) for c in self.beta_g2],
            "gamma_g2": [list(c) for c in self.gamma_g2],
            "delta_g2": [list(c) for c in self.delta_g2],
            "ic": [list(p) if p is not None else None for p in self.ic],
            "sigma_g2": g2j(self.sigma_g2),
            "challenge_slots": list(map(int, self.challenge_slots)),
            "pedersen_g": g2j(self.pedersen_g),
            "pedersen_g_root_sigma_neg": g2j(self.pedersen_g_root_sigma_neg),
        }

    @classmethod
    def from_json_dict(cls, d: dict) -> "VerifyingKey":
        def g2p(v):
            return tuple(tuple(c) for c in v) if v else None

        return cls(
            alpha_g1=tuple(d["alpha_g1"]),
            beta_g2=tuple(tuple(c) for c in d["beta_g2"]),
            gamma_g2=tuple(tuple(c) for c in d["gamma_g2"]),
            delta_g2=tuple(tuple(c) for c in d["delta_g2"]),
            ic=[tuple(p) if p is not None else None for p in d["ic"]],
            sigma_g2=g2p(d.get("sigma_g2")),
            challenge_slots=list(d.get("challenge_slots", [])),
            pedersen_g=g2p(d.get("pedersen_g")),
            pedersen_g_root_sigma_neg=g2p(d.get("pedersen_g_root_sigma_neg")),
        )


def _g1_aff(p):
    aff = ec.G1_CURVE.to_affine(p)
    return None if aff is None else (aff[0], aff[1])


def _g2_aff(p):
    aff = ec.G2_CURVE.to_affine(p)
    if aff is None:
        return None
    x, y = aff
    return ((x.c0, x.c1), (y.c0, y.c1))


def qap_evaluations(cs: CompiledR1CS, tau: int, n: int):
    """u_i(tau), v_i(tau), w_i(tau) for every variable i, plus Z(tau).

    Lagrange over the size-n roots-of-unity domain:
      L_k(tau) = Z(tau)/n * w^k / (tau - w^k).
    """
    logn = n.bit_length() - 1
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - logn), P_FR)
    z_tau = (pow(tau, n, P_FR) - 1) % P_FR
    assert z_tau != 0, "tau collided with the domain (resample)"
    w_pows = [1] * n
    for k in range(1, n):
        w_pows[k] = w_pows[k - 1] * omega % P_FR
    denoms = [(tau - w_pows[k]) % P_FR for k in range(n)]
    denom_inv = batch_inverse(denoms)
    zn = z_tau * pow(n, -1, P_FR) % P_FR
    lag = [zn * w_pows[k] % P_FR * denom_inv[k] % P_FR for k in range(n)]

    def col_evals(rows, cols, coeffs):
        out = [0] * cs.num_vars
        for r, c, v in zip(rows.tolist(), cols.tolist(), coeffs):
            out[c] = (out[c] + v * lag[r]) % P_FR
        return out

    u = col_evals(cs.a_rows, cs.a_cols, cs.a_coeffs)
    v = col_evals(cs.b_rows, cs.b_cols, cs.b_coeffs)
    w = col_evals(cs.c_rows, cs.c_cols, cs.c_coeffs)
    return u, v, w, z_tau


def setup(cs: CompiledR1CS, seed: bytes | None = None):
    """Run trusted setup; returns (ProvingKey, VerifyingKey).

    `seed` pins the toxic waste for deterministic tests (SURVEY.md §7:
    deterministic distributed-proof oracle); None samples securely."""
    if seed is None:
        rand = lambda: _secrets.randbelow(P_FR - 1) + 1  # noqa: E731
    else:
        ctr = [0]

        def rand():
            ctr[0] += 1
            return (
                int.from_bytes(
                    hashlib.sha512(seed + ctr[0].to_bytes(4, "big")).digest(), "big"
                )
                % (P_FR - 1)
                + 1
            )

    tau, alpha, beta, gamma, delta, sigma = (
        rand(), rand(), rand(), rand(), rand(), rand(),
    )
    n = _next_pow2(cs.num_constraints)
    u, v, w, z_tau = qap_evaluations(cs, tau, n)

    g1 = ec.FixedBaseTable(ec.G1_CURVE, ec.G1_GEN)
    g2 = ec.FixedBaseTable(ec.G2_CURVE, ec.G2_GEN)
    gamma_inv = pow(gamma, -1, P_FR)
    delta_inv = pow(delta, -1, P_FR)

    nv = cs.num_vars
    ni = cs.num_instance
    committed = set(int(i) for i in cs.committed_vars)
    assert all(i >= ni for i in committed), "committed wires must be private"
    a_pts = [g1.mul(u[i]) for i in range(nv)]
    b1_pts = [g1.mul(v[i]) for i in range(nv)]
    b2_pts = [g2.mul(v[i]) for i in range(nv)]
    kappa = [(beta * u[i] + alpha * v[i] + w[i]) % P_FR for i in range(nv)]
    ic_pts = [g1.mul(k * gamma_inv % P_FR) for k in kappa[:ni]]
    # committed wires ride the gamma basis (they fold into vk_x through the
    # commitment D), so they are EXCLUDED from the delta-side L query.
    l_pts = [
        ec.G1_CURVE.infinity()
        if (ni + j) in committed
        else g1.mul(k * delta_inv % P_FR)
        for j, k in enumerate(kappa[ni:])
    ]
    ck_pts = [
        g1.mul(kappa[i] * gamma_inv % P_FR) if i in committed else ec.G1_CURVE.infinity()
        for i in range(nv)
    ]
    ck_sigma_pts = [
        g1.mul(kappa[i] * gamma_inv % P_FR * sigma % P_FR)
        if i in committed
        else ec.G1_CURVE.infinity()
        for i in range(nv)
    ]
    zd = z_tau * delta_inv % P_FR
    h_pts = []
    t_pow = zd
    for _ in range(n - 1):
        h_pts.append(g1.mul(t_pow))
        t_pow = t_pow * tau % P_FR
    # note: h_pts[k] = [tau^k * Z(tau)/delta]1

    nv_pad = _next_pow2(nv)

    def pad_g1(pts, total):
        arr = jc.g1_to_limbs(pts)
        inf = jc.g1_inf_mask(pts)
        pad = total - len(pts)
        if pad:
            arr = np.concatenate([arr, np.zeros((pad, 2, 16), np.uint32)])
            inf = np.concatenate([inf, np.ones(pad, bool)])
        return arr, inf

    def pad_g2(pts, total):
        arr = jc.g2_to_limbs(pts)
        inf = jc.g2_inf_mask(pts)
        pad = total - len(pts)
        if pad:
            arr = np.concatenate([arr, np.zeros((pad, 2, 2, 16), np.uint32)])
            inf = np.concatenate([inf, np.ones(pad, bool)])
        return arr, inf

    a_arr, a_inf = pad_g1(a_pts, nv_pad)
    b1_arr, b1_inf = pad_g1(b1_pts, nv_pad)
    b2_arr, b2_inf = pad_g2(b2_pts, nv_pad)
    # l_query occupies the same index space as the witness tail: pad the head
    # with ni infinities so l_query[i] pairs with witness z[i] directly.
    l_full = [ec.G1_CURVE.infinity()] * ni + l_pts
    l_arr, l_inf = pad_g1(l_full, nv_pad)
    h_arr, h_inf = pad_g1(h_pts, n)
    if committed:
        ck_arr, ck_inf = pad_g1(ck_pts, nv_pad)
        cks_arr, cks_inf = pad_g1(ck_sigma_pts, nv_pad)
    else:
        ck_arr = ck_inf = cks_arr = cks_inf = None

    pk = ProvingKey(
        n_domain=n,
        num_vars=nv,
        num_instance=ni,
        alpha_g1=jc.g1_to_limbs([g1.mul(alpha)])[0],
        beta_g1=jc.g1_to_limbs([g1.mul(beta)])[0],
        delta_g1=jc.g1_to_limbs([g1.mul(delta)])[0],
        beta_g2=jc.g2_to_limbs([g2.mul(beta)])[0],
        delta_g2=jc.g2_to_limbs([g2.mul(delta)])[0],
        a_query=a_arr,
        a_inf=a_inf,
        b_g1_query=b1_arr,
        b_g1_inf=b1_inf,
        b_g2_query=b2_arr,
        b_g2_inf=b2_inf,
        l_query=l_arr,
        l_inf=l_inf,
        h_query=h_arr,
        h_inf=h_inf,
        ck_query=ck_arr,
        ck_inf=ck_inf,
        ck_sigma_query=cks_arr,
        ck_sigma_inf=cks_inf,
    )
    vk = VerifyingKey(
        alpha_g1=_g1_aff(g1.mul(alpha)),
        beta_g2=_g2_aff(g2.mul(beta)),
        gamma_g2=_g2_aff(g2.mul(gamma)),
        delta_g2=_g2_aff(g2.mul(delta)),
        ic=[_g1_aff(p) for p in ic_pts],
        sigma_g2=_g2_aff(g2.mul(sigma)) if committed else None,
        challenge_slots=[int(i) for i in cs.challenge_vars],
    )
    return pk, vk
