"""Radix-2 NTT over BN254 Fr in 16-bit limb lanes (TPU-native).

Re-owns gnark-crypto's radix-2 FFT used by Groth16's quotient-polynomial step
(reference: [dep] go.mod:9; call site SURVEY.md §3.3 hot loop ②).  Design:

  * Iterative Cooley-Tukey DIT after a static bit-reversal gather — the
    permutation is a compile-time constant so XLA emits one gather; every
    butterfly stage is a reshape + one batched Montgomery mul + add/sub over
    (N/2, 16)-limb lanes.  No data-dependent control flow, fully jit-able.
  * Twiddle tables per stage are host-precomputed (Montgomery form) numpy
    constants baked into the jaxpr.
  * Coset evaluation (for H = (AB - C)/Z on the shifted domain, where
    Z(g w^i) = g^N - 1 is constant) via element-wise power-table muls.

Domain sizes are powers of two up to 2^28 (Fr two-adicity, params.py:36-44).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field.jnp_field import JnpField
from ..field.params import (
    FR,
    FR_ROOT_OF_UNITY,
    FR_TWO_ADICITY,
    NLIMBS,
    P_FR,
    int_to_limbs,
)

F = JnpField(FR)


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


@functools.lru_cache(maxsize=None)
class Domain:
    """Evaluation domain of size N (power of two) with precomputed tables."""

    def __init__(self, n: int, coset_gen: int = 5):
        assert n & (n - 1) == 0 and n >= 2
        logn = n.bit_length() - 1
        assert logn <= FR_TWO_ADICITY
        self.n = n
        self.logn = logn
        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - logn), P_FR)
        self.omega_inv = pow(self.omega, -1, P_FR)
        self.n_inv = pow(n, -1, P_FR)
        self.coset_gen = coset_gen
        self.perm = _bit_reverse_perm(n)

        def stage_twiddles(w):
            # stage with half-block m: tw[k] = w^(k * N/(2m)), k < m
            stages = []
            for s in range(logn):
                m = 1 << s
                step = n // (2 * m)
                tws = np.stack(
                    [int_to_limbs(FR.to_mont(pow(w, k * step, P_FR))) for k in range(m)]
                )
                stages.append(tws.astype(np.uint32))
            return stages

        self.tw_fwd = stage_twiddles(self.omega)
        self.tw_inv = stage_twiddles(self.omega_inv)

        def power_table(base):
            out = np.empty((n, NLIMBS), dtype=np.uint32)
            acc = 1
            for i in range(n):
                out[i] = int_to_limbs(FR.to_mont(acc))
                acc = acc * base % P_FR
            return out

        self.coset_pows = power_table(coset_gen)
        self.coset_pows_inv = power_table(pow(coset_gen, -1, P_FR))
        self._scan_cache = {}
        self.n_inv_mont = int_to_limbs(FR.to_mont(self.n_inv)).astype(np.uint32)
        # Z_H(coset point) = g^N - 1, constant across the coset
        z_coset = (pow(coset_gen, n, P_FR) - 1) % P_FR
        self.z_coset_inv = pow(z_coset, -1, P_FR)
        self.z_coset_inv_mont = int_to_limbs(
            FR.to_mont(self.z_coset_inv)
        ).astype(np.uint32)
        self._q_scale_fwd = None
        self._q_scale_inv_plain = None

    def _power_scaled(self, base: int, scale: int, mont: bool) -> np.ndarray:
        out = np.empty((self.n, NLIMBS), dtype=np.uint32)
        acc = scale % P_FR
        for i in range(self.n):
            out[i] = int_to_limbs(FR.to_mont(acc) if mont else acc)
            acc = acc * base % P_FR
        return out

    @property
    def q_scale_fwd(self) -> np.ndarray:
        """Fused iNTT+coset scale (VERDICT r4 item 1, quotient leg): one
        table n_inv * g^k (Montgomery) replaces the separate 1/N and coset
        elementwise passes between the inverse and forward transforms."""
        if self._q_scale_fwd is None:
            self._q_scale_fwd = self._power_scaled(self.coset_gen, self.n_inv, True)
        return self._q_scale_fwd

    @property
    def q_scale_inv_plain(self) -> np.ndarray:
        """Fused final scale n_inv * Z_H(coset)^-1 * g^-k stored in PLAIN
        (non-Montgomery) form: mont_mul(h_mont, plain) = h * c canonical,
        so the 1/N, 1/Z, coset-inverse AND from_mont passes collapse into
        the one table mul (4 full-width passes -> 1)."""
        if self._q_scale_inv_plain is None:
            self._q_scale_inv_plain = self._power_scaled(
                pow(self.coset_gen, -1, P_FR),
                self.n_inv * self.z_coset_inv % P_FR,
                False,
            )
        return self._q_scale_inv_plain


def _scan_tables(domain: "Domain", inverse: bool):
    """Per-stage gather tables for the scan-based core, stacked over stages:
    IU/IV (logn, n/2) butterfly input indices, TW (logn, n/2, 16) twiddles,
    IP (logn, n) output inverse-permutation.  Compile-time constants."""
    key = "inv" if inverse else "fwd"
    if key in domain._scan_cache:
        return domain._scan_cache[key]
    n, logn = domain.n, domain.logn
    stages = domain.tw_inv if inverse else domain.tw_fwd
    IU = np.empty((logn, n // 2), np.int32)
    IV = np.empty((logn, n // 2), np.int32)
    TW = np.empty((logn, n // 2, NLIMBS), np.uint32)
    IP = np.empty((logn, n), np.int32)
    p = np.arange(n // 2)
    for s in range(logn):
        m = 1 << s
        g, k = p // m, p % m
        iu = g * 2 * m + k
        iv = iu + m
        IU[s], IV[s] = iu, iv
        TW[s] = stages[s][k]
        ip = np.empty(n, np.int32)
        ip[iu] = p
        ip[iv] = n // 2 + p
        IP[s] = ip
    out = (IU, IV, TW, IP)
    domain._scan_cache[key] = out
    return out


def _core(x, domain: "Domain", inverse: bool = False):
    """x: (..., N, 16) Montgomery Fr -> NTT along axis -2 (natural in/out).

    lax.scan over the log2(N) butterfly stages keeps ONE butterfly in the
    compiled graph regardless of N — the round-1 unrolled version put 15
    (32768,16)-wide Montgomery muls per NTT x 8 NTTs in the quotient graph
    and took 200+ s of XLA time on the real chip (VERDICT.md weak #1)."""
    import jax

    n = x.shape[-2]
    if n == 2:  # degenerate: single butterfly, no scan machinery
        tws = (domain.tw_inv if inverse else domain.tw_fwd)[0]
        u, t = x[..., 0:1, :], F.mont_mul(x[..., 1:2, :], jnp.asarray(tws))
        return jnp.concatenate([F.add(u, t), F.sub(u, t)], axis=-2)
    x = jnp.take(x, jnp.asarray(domain.perm), axis=-2)
    IU, IV, TW, IP = (jnp.asarray(t) for t in _scan_tables(domain, inverse))

    def body(xc, stage):
        iu, iv, tw, ip = stage
        u = jnp.take(xc, iu, axis=-2)
        t = F.mont_mul(jnp.take(xc, iv, axis=-2), tw)
        y = jnp.concatenate([F.add(u, t), F.sub(u, t)], axis=-2)
        return jnp.take(y, ip, axis=-2), None

    x, _ = jax.lax.scan(body, x, (IU, IV, TW, IP))
    return x


def ntt(x, domain: Domain):
    """Forward NTT: coefficients -> evaluations at {w^i} (natural order)."""
    return _core(x, domain, inverse=False)


def intt(x, domain: Domain):
    """Inverse NTT: evaluations -> coefficients, including the 1/N scale."""
    y = _core(x, domain, inverse=True)
    return F.mont_mul(y, jnp.asarray(domain.n_inv_mont))


def coset_ntt(coeffs, domain: Domain):
    """Evaluate polynomial on the coset g*{w^i}: scale coeff k by g^k, NTT."""
    scaled = F.mont_mul(coeffs, jnp.asarray(domain.coset_pows))
    return ntt(scaled, domain)


def coset_intt(evals, domain: Domain):
    """Interpolate from coset evaluations back to coefficients."""
    coeffs = intt(evals, domain)
    return F.mont_mul(coeffs, jnp.asarray(domain.coset_pows_inv))


def core_raw(x, domain: Domain, inverse: bool = False):
    """Bare butterfly core (no 1/N, no coset scales) — for callers fusing
    the elementwise scale passes themselves (Prover._quotient)."""
    return _core(x, domain, inverse=inverse)
