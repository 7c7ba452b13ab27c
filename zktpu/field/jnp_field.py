"""Vectorized BN254 limb arithmetic in JAX (TPU-native design).

Replaces gnark-crypto's x86-64/arm64 Montgomery assembly kernels
(/root/reference/go.mod:9, SURVEY.md N2) with a formulation that maps onto the
TPU's 32-bit integer vector lanes:

  * A field element is 16 little-endian 16-bit digits stored in a ``uint32``
    array of shape ``(..., 16)``.  Digit products (16x16 -> 32) are exact in
    uint32; column sums are split lo/hi-16 before accumulation so no
    intermediate ever exceeds 32 bits.  TPUs have no 64-bit integer multiplier,
    so this radix-2^16 carry-save schoolbook + per-limb Montgomery REDC is the
    natural "assembly" here.
  * Everything is element-wise over arbitrary leading batch dims: the same code
    runs one element or a million, and XLA fuses the whole chain into a few
    vector loops.

All state-carrying values are kept in Montgomery form (x * 2^256 mod p) except
where explicitly noted.  Host-side conversions live in ``limb.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, NLIMBS, FieldSpec

_U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)
# flattened anti-diagonal index map: product digit (i, j) lands in column i+j
_DIAG_IDX = (np.arange(NLIMBS)[:, None] + np.arange(NLIMBS)[None, :]).reshape(-1)


def _stack_last(parts):
    return jnp.stack(parts, axis=-1)


class JnpField:
    """Batched modular arithmetic over ``spec.modulus`` in 16-bit limbs."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p_limbs = spec.p_limbs  # np.uint32 (16,)
        self.ninv = np.uint32(spec.mont_ninv)
        self.r2_limbs = spec.r2_limbs
        self.one_mont = spec.one_mont_limbs
        self.zero = spec.zero_limbs
        from .params import int_to_limbs

        self.rbar_limbs = int_to_limbs((1 << 256) - spec.modulus)

    # ------------------------------------------------------------------ utils
    def const(self, value: int, mont: bool = True) -> np.ndarray:
        """Host constant as limbs (Montgomery by default)."""
        from .params import int_to_limbs

        v = self.spec.to_mont(value % self.spec.modulus) if mont else value % self.spec.modulus
        return int_to_limbs(v)

    def broadcast_const(self, value: int, batch_shape, mont: bool = True):
        c = jnp.asarray(self.const(value, mont=mont), dtype=_U32)
        return jnp.broadcast_to(c, tuple(batch_shape) + (NLIMBS,))

    # --------------------------------------------------------- carry chains
    def _carry16(self, t):
        """Propagate carries over L digits (< 2^32 each); returns
        (canonical digits, carry-out).

        Packed carry-lookahead: one local pass splits the multi-bit carries
        (u_i = lo_i + hi_{i-1} <= 2^17-2), after which every residual carry
        is binary.  The per-limb generate/propagate bits are PACKED into one
        uint32 lane and resolved with a single integer add — the software
        carry-lookahead-adder trick:

            cin_mask = a | ((pb + a) ^ pb ^ a),  a = gb << 1

        exact because g and p are disjoint (g_i=1 forces lo_i < MASK).
        ~14 wide ops: no 16-step ripple (runtime depth), no moveaxis
        (lax.scan's TPU transpose tax), tiny graph (XLA compile time is
        superlinear in op count; the unrolled ripple was ~100 ops/add)."""
        nl = t.shape[-1]
        lo = t & MASK
        hi = t >> LIMB_BITS
        u = lo.at[..., 1:].add(hi[..., :-1])  # u_i = lo_i + hi_{i-1} (binaryized)
        g = u >> LIMB_BITS  # generate, in {0,1}
        p = ((u & MASK) == MASK).astype(_U32)  # propagate (disjoint from g)
        w = (jnp.uint32(1) << jnp.arange(nl, dtype=_U32))
        gb = jnp.sum(g * w, axis=-1, dtype=_U32)
        pb = jnp.sum(p * w, axis=-1, dtype=_U32)
        a = gb << 1
        cin_mask = a | ((pb + a) ^ pb ^ a)  # carry INTO limb i = bit i
        cin = (cin_mask[..., None] >> jnp.arange(nl, dtype=_U32)) & jnp.uint32(1)
        out = (u + cin) & MASK
        carry = hi[..., -1] + ((cin_mask >> nl) & jnp.uint32(1))
        return out, carry

    def _normalize(self, t):
        """Carry-normalize, dropping overflow (value must fit 256 bits)."""
        return self._carry16(t)[0]

    def _cond_sub_p(self, a):
        """Reduce canonical a < 2p into [0, p): add 2^256 - p, keep the sum
        iff it carried out (single carry chain — no separate compare)."""
        s, cout = self._carry16(a + jnp.asarray(self.rbar_limbs, dtype=_U32))
        return jnp.where((cout > 0)[..., None], s, a)

    # ------------------------------------------------------------ public ops
    def add(self, a, b):
        return self._cond_sub_p(self._normalize(a + b))

    def sub(self, a, b):
        """a - b via a + p + (2^16-complement of b): one chain + cond-sub."""
        t = a + jnp.asarray(self.p_limbs, dtype=_U32) + (MASK - b)
        t = t.at[..., 0].add(np.uint32(1))  # +1 completes the complement
        return self._cond_sub_p(self._normalize(t))

    def neg(self, b):
        p = jnp.asarray(self.p_limbs, dtype=_U32) + jnp.zeros_like(b)
        t = p + (MASK - b)
        t = t.at[..., 0].add(np.uint32(1))
        return self._cond_sub_p(self._normalize(t))

    def double(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond: bool (...,); a, b: (..., 16)."""
        return jnp.where(cond[..., None], a, b)

    # -------------------------------------------------------- multiplication
    def _mul_acc(self, a, b):
        """Column-accumulated 512-bit product; 32 digits, each < 2^21.

        Anti-diagonal sums via 2*NLIMBS STATIC slice-adds: scatter-add over
        a duplicate-index map serializes on TPU (measured as the dominant
        cost of small-lane point ops); static dynamic-update-slices fuse."""
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, shape + (NLIMBS,))
        b = jnp.broadcast_to(b, shape + (NLIMBS,))
        o = a[..., :, None] * b[..., None, :]  # exact: (2^16-1)^2 < 2^32
        lo = o & MASK
        hi = o >> LIMB_BITS
        t = jnp.zeros(shape + (2 * NLIMBS,), dtype=_U32)
        for i in range(NLIMBS):
            t = t.at[..., i : i + NLIMBS].add(lo[..., i, :])
            t = t.at[..., i + 1 : i + 1 + NLIMBS].add(hi[..., i, :])
        return t

    def mont_reduce(self, t):
        """Montgomery REDC of a column-accumulated 32-digit value -> (...,16) canonical.

        Shift-down formulation, UNROLLED: each step clears the lowest digit
        with m*p and shifts the accumulator right one digit (static slices
        throughout).  This used to be a lax.fori_loop to keep the XLA graph
        small, but a 16-iteration while loop inside every mont_mul made
        small-lane point ops latency-bound on TPU (the randomizer muls cost
        ~0.5 ms/point-op); with the packed-CLA carries the unrolled body is
        cheap to compile again."""
        pl = jnp.asarray(self.p_limbs, dtype=_U32)
        acc = t
        for _ in range(NLIMBS):
            m = (acc[..., 0] * self.ninv) & MASK
            mp = m[..., None] * pl
            acc = acc.at[..., :NLIMBS].add(mp & MASK)
            acc = acc.at[..., 1 : NLIMBS + 1].add(mp >> LIMB_BITS)
            carry = acc[..., 0] >> LIMB_BITS
            acc = jnp.concatenate(
                [acc[..., 1:], jnp.zeros_like(acc[..., :1])], axis=-1
            )
            acc = acc.at[..., 0].add(carry)
        res = self._normalize(acc[..., :NLIMBS])
        return self._cond_sub_p(res)

    def mont_mul(self, a, b):
        """(a*R)(b*R) -> a*b*R mod p.  Large batches on TPU route to the
        fused Pallas kernel (zktpu.curve.pallas_ops)."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        n = 1
        for d in shape[:-1]:
            n *= d
        if n > 0 and n % 512 == 0:
            from ..curve.jnp_curve import _pallas_enabled

            if _pallas_enabled():
                from ..curve import pallas_f32

                return pallas_f32.mont_mul(
                    jnp.broadcast_to(a, shape),
                    jnp.broadcast_to(b, shape),
                    field=self.spec.name,
                )
        return self.mont_reduce(self._mul_acc(a, b))

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        """Canonical integer limbs -> Montgomery form."""
        return self.mont_mul(a, jnp.asarray(self.r2_limbs, dtype=_U32))

    def from_mont(self, a):
        """Montgomery form -> canonical integer limbs (REDC by 1)."""
        shape = a.shape[:-1] + (2 * NLIMBS,)
        t = jnp.zeros(shape, dtype=_U32).at[..., :NLIMBS].add(a)
        return self.mont_reduce(t)

    # ----------------------------------------------------------------- power
    def pow_const(self, a, e: int):
        """a^e for a *static* exponent, via lax.scan over the exponent bits."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(self.one_mont, dtype=_U32), a.shape)
        nbits = e.bit_length()
        bits = np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)

        def step(acc, bit):
            acc = self.mont_sqr(acc)
            withmul = self.mont_mul(acc, a)
            return jnp.where(jnp.asarray(bit, dtype=jnp.bool_)[..., None], withmul, acc), None

        init = jnp.broadcast_to(jnp.asarray(self.one_mont, dtype=_U32), a.shape)
        out, _ = jax.lax.scan(step, init, jnp.asarray(bits, dtype=jnp.bool_))
        return out

    def inv(self, a):
        """Batched inversion by Fermat (a^(p-2)); inv(0) = 0."""
        return self.pow_const(a, self.spec.modulus - 2)

    def batch_inv(self, a):
        """Montgomery-trick batch inversion over ALL leading dims of a
        (..., 16) Montgomery array: two log-depth prefix-product scans + ONE
        Fermat inversion instead of one 254-squaring chain per element.
        Zero entries invert to zero."""
        shape = a.shape
        flat = a.reshape(-1, NLIMBS)
        n = flat.shape[0]
        one = jnp.broadcast_to(jnp.asarray(self.one_mont, dtype=_U32), flat.shape)
        is_zero = self.is_zero(flat)
        x = jnp.where(is_zero[:, None], one, flat)
        # inclusive prefix products pp_i = x_0 * ... * x_i
        pp = jax.lax.associative_scan(self.mont_mul, x, axis=0)
        # suffix products sp_i = x_{i+1} * ... * x_{n-1}
        sp = jax.lax.associative_scan(
            self.mont_mul, x[::-1], axis=0
        )[::-1]
        sp = jnp.concatenate([sp[1:], one[:1]], axis=0)
        total_inv = self.inv(pp[-1:])  # single element
        # x_i^{-1} = pp_{i-1} * sp_i * total_inv
        pp_prev = jnp.concatenate([one[:1], pp[:-1]], axis=0)
        inv = self.mont_mul(self.mont_mul(pp_prev, sp), total_inv)
        inv = jnp.where(is_zero[:, None], jnp.zeros_like(inv), inv)
        return inv.reshape(shape)

    # ---------------------------------------------- small-scalar convenience
    def mul_small(self, a, k: int):
        """a * k for tiny static k >= 0 via additions (k <= 4 typical)."""
        if k == 0:
            return jnp.zeros_like(a)
        acc = a
        for _ in range(k - 1):
            acc = self.add(acc, a)
        return acc


@functools.lru_cache(maxsize=None)
def field(spec_name: str) -> JnpField:
    from .params import FP, FR

    return JnpField({"fp": FP, "fr": FR}[spec_name])
