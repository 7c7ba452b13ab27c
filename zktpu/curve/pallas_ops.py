"""Pallas TPU kernels for BN254 limb arithmetic (the speed-of-light path).

The pure-jnp field core (jnp_field.py) keeps its Montgomery REDC in a
fori_loop so XLA graphs stay small — but on TPU that costs ~4KB of HBM
traffic per multiply (the (lanes, 32) accumulator round-trips every loop
iteration).  These kernels unroll the whole schoolbook + REDC chain inside a
single Pallas kernel where the accumulator lives in VMEM/registers, bringing
traffic down to just inputs + outputs.

Layout: limb-major (16, N) uint32 — limb index in sublanes, points in lanes,
so every limb row op is a full-width VPU op.  The jnp orchestration layer
keeps its (N, 16) layout; wrappers transpose at the kernel boundary (cheap
relative to the fused arithmetic saved).

Enabled via ZKTPU_PALLAS=1 (default on TPU backends); CPU tests exercise the
kernels through pallas interpret mode in tests/test_pallas_ops.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..field.params import FP, LIMB_BITS, NLIMBS

MASK = np.uint32(0xFFFF)


class FieldConsts:
    def __init__(self, spec):
        self.p_limbs = spec.p_limbs.astype(np.uint32)
        self.ninv = np.uint32(spec.mont_ninv)
        rbar = (1 << 256) - spec.modulus
        self.rbar_limbs = np.array(
            [(rbar >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32
        )


from ..field.params import FR as _FR  # noqa: E402

FP_C = FieldConsts(FP)
FR_C = FieldConsts(_FR)

TILE = 512


# Field elements inside kernels are PYTHON LISTS of 16 row vectors (each
# (T,) uint32): all updates are plain per-row arithmetic — Mosaic has no
# scatter, and row lists sidestep it entirely while keeping everything
# register/VMEM-resident.


def _carry16(rows):
    """16 rows of digits < 2^32 -> (canonical rows, carry-out row)."""
    out = []
    carry = None
    for k in range(NLIMBS):
        v = rows[k] if carry is None else rows[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _sel_rows(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _cond_sub_p(a, c=None):
    """canonical a < 2p -> a mod p via add (2^256 - p), keep on carry-out."""
    c = c or FP_C
    s, cout = _carry16(
        [a[i] + np.uint32(int(c.rbar_limbs[i])) for i in range(NLIMBS)]
    )
    return _sel_rows(cout > 0, s, a)


def k_add(a, b, c=None):
    return _cond_sub_p(_carry16([x + y for x, y in zip(a, b)])[0], c)


def k_sub(a, b, c=None):
    c2 = c or FP_C
    t = [
        a[i] + np.uint32(int(c2.p_limbs[i])) + (MASK - b[i])
        for i in range(NLIMBS)
    ]
    t[0] = t[0] + np.uint32(1)
    return _cond_sub_p(_carry16(t)[0], c2)


def k_mul(a, b, c=None):
    """Montgomery product, fully unrolled over row lists."""
    c2 = c or FP_C
    zero = jnp.zeros_like(a[0])
    t = [zero] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for k in range(NLIMBS):
            p = a[i] * b[k]  # exact in uint32
            t[i + k] = t[i + k] + (p & MASK)
            t[i + k + 1] = t[i + k + 1] + (p >> LIMB_BITS)
    for i in range(NLIMBS):
        m = (t[i] * c2.ninv) & MASK
        for k in range(NLIMBS):
            mp = m * np.uint32(int(c2.p_limbs[k]))
            t[i + k] = t[i + k] + (mp & MASK)
            t[i + k + 1] = t[i + k + 1] + (mp >> LIMB_BITS)
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    return _cond_sub_p(_carry16(t[NLIMBS : 2 * NLIMBS])[0], c2)


def k_sqr(a, c=None):
    return k_mul(a, a, c)


def _k_is_zero(z):
    acc = z[0]
    for r in z[1:]:
        acc = acc | r
    return acc == 0  # (T,)


def _k_sel(cond, a, b):
    return _sel_rows(cond, a, b)


def _k_double(x, y, z):
    xx = k_sqr(x)
    yy = k_sqr(y)
    yyyy = k_sqr(yy)
    s = k_mul(x, yy)
    s4 = k_add(k_add(s, s), k_add(s, s))
    m = k_add(k_add(xx, xx), xx)
    x3 = k_sub(k_sqr(m), k_add(s4, s4))
    y8 = k_add(k_add(yyyy, yyyy), k_add(yyyy, yyyy))
    y3 = k_sub(k_mul(m, k_sub(s4, x3)), k_add(y8, y8))
    z3 = k_mul(k_add(y, y), z)
    return x3, y3, z3


def _padd_body(x1, y1, z1, x2, y2, z2):
    """Complete Jacobian add, limb-major, branchless."""
    p_inf = _k_is_zero(z1)
    q_inf = _k_is_zero(z2)
    z1z1 = k_sqr(z1)
    z2z2 = k_sqr(z2)
    u1 = k_mul(x1, z2z2)
    u2 = k_mul(x2, z1z1)
    s1 = k_mul(y1, k_mul(z2z2, z2))
    s2 = k_mul(y2, k_mul(z1z1, z1))
    h = k_sub(u2, u1)
    r = k_sub(s2, s1)
    same_x = _k_is_zero(h)
    same_y = _k_is_zero(r)
    i = k_sqr(k_add(h, h))
    j = k_mul(h, i)
    r2 = k_add(r, r)
    v = k_mul(u1, i)
    x3 = k_sub(k_sub(k_sqr(r2), j), k_add(v, v))
    s1j = k_mul(s1, j)
    y3 = k_sub(k_mul(r2, k_sub(v, x3)), k_add(s1j, s1j))
    zz = k_mul(z1, z2)
    z3 = k_mul(k_add(zz, zz), h)
    dx, dy, dz = _k_double(x1, y1, z1)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    is_cancel = same_x & ~same_y & ~p_inf & ~q_inf
    x3 = _k_sel(is_dbl, dx, x3)
    y3 = _k_sel(is_dbl, dy, y3)
    z3 = _k_sel(is_dbl, dz, z3)
    z3 = _k_sel(is_cancel, [jnp.zeros_like(r) for r in z3], z3)
    x3 = _k_sel(p_inf, x2, _k_sel(q_inf, x1, x3))
    y3 = _k_sel(p_inf, y2, _k_sel(q_inf, y1, y3))
    z3 = _k_sel(p_inf, z2, _k_sel(q_inf, z1, z3))
    return x3, y3, z3


def _rows(ref):
    # each limb row reshaped to the native (sublane, lane) vreg tile so every
    # per-row op runs at full VPU width (1-D rows got catastrophic layouts)
    t = ref.shape[-1]
    return [ref[i].reshape(t // 128, 128) for i in range(NLIMBS)]


def _store(ref, rows):
    t = ref.shape[-1]
    ref[:] = jnp.stack([r.reshape(t) for r in rows])


def _padd_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    rx, ry, rz = _padd_body(
        _rows(x1), _rows(y1), _rows(z1), _rows(x2), _rows(y2), _rows(z2)
    )
    _store(ox, rx)
    _store(oy, ry)
    _store(oz, rz)


def _pdbl_kernel(x, y, z, ox, oy, oz):
    rx, ry, rz = _k_double(_rows(x), _rows(y), _rows(z))
    _store(ox, rx)
    _store(oy, ry)
    _store(oz, rz)


def _fp_mul_kernel(a, b, o):
    _store(o, k_mul(_rows(a), _rows(b), FP_C))


def _fr_mul_kernel(a, b, o):
    _store(o, k_mul(_rows(a), _rows(b), FR_C))


def _tile_of(n):
    return min(TILE, n)


@functools.lru_cache(maxsize=None)
def _padd_call(n, interpret):
    tile = _tile_of(n)
    spec = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i))
    return pl.pallas_call(
        _padd_kernel,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)] * 3,
        grid=(n // tile,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 3,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _pdbl_call(n, interpret):
    tile = _tile_of(n)
    spec = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i))
    return pl.pallas_call(
        _pdbl_kernel,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)] * 3,
        grid=(n // tile,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _mul_call(n, interpret, field="fp"):
    tile = _tile_of(n)
    spec = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i))
    return pl.pallas_call(
        _fp_mul_kernel if field == "fp" else _fr_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[spec] * 2,
        out_specs=spec,
        interpret=interpret,
    )


def _flatten(p):
    """(..., 16) -> (16, N) limb-major."""
    flat = p.reshape(-1, NLIMBS)
    return flat.T, p.shape


def _unflatten(t, shape):
    return t.T.reshape(shape)


def _usable(n):
    return n >= 128 and (n % _tile_of(n) == 0)


def point_add(p, q, interpret=False):
    """Drop-in for jnp_curve.point_add(G1, ...) on (..., 16) arrays."""
    x1, shape = _flatten(p[0])
    n = x1.shape[1]
    call = _padd_call(n, interpret)
    rx, ry, rz = call(
        x1, _flatten(p[1])[0], _flatten(p[2])[0],
        _flatten(q[0])[0], _flatten(q[1])[0], _flatten(q[2])[0],
    )
    return _unflatten(rx, shape), _unflatten(ry, shape), _unflatten(rz, shape)


def point_double(p, interpret=False):
    x, shape = _flatten(p[0])
    call = _pdbl_call(x.shape[1], interpret)
    rx, ry, rz = call(x, _flatten(p[1])[0], _flatten(p[2])[0])
    return _unflatten(rx, shape), _unflatten(ry, shape), _unflatten(rz, shape)


def mont_mul(a, b, field="fp", interpret=False):
    """Drop-in for JnpField.mont_mul on (..., 16) arrays (field="fp"|"fr")."""
    af, shape = _flatten(a)
    bf, _ = _flatten(jnp.broadcast_to(b, a.shape))
    return _unflatten(_mul_call(af.shape[1], interpret, field)(af, bf), shape)
