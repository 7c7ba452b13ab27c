"""Batched BN254 point arithmetic in JAX (TPU hot path).

Re-owns gnark-crypto's G1/G2 Jacobian kernels (reference [dep] go.mod:9,
SURVEY.md §2.2 N2) as fully-vectorized, branchless limb arithmetic:

  * A batch of points is an SoA triple (X, Y, Z) of (..., L) uint32 limb
    arrays — Jacobian coordinates, infinity encoded as Z == 0.
  * `add` / `double` / `madd` are complete via masked selects (no
    data-dependent branches, jit/vmap/shard_map-safe) — the TPU way: compute
    both the add and the double path and select, trading ~2x FLOPs for zero
    divergence.
  * The same code serves G1 (coords in Fp) and G2 (coords in Fp2) through a
    minimal field-ops adapter; Fp2 is karatsuba over the 16-limb Fp core.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field.jnp_field import JnpField
from ..field.params import FP, NLIMBS, int_to_limbs

FP_OPS = JnpField(FP)


class Fp2Ops:
    """Fp2 = Fp[u]/(u^2+1) with elements shaped (..., 2, NLIMBS)."""

    def __init__(self):
        self.f = FP_OPS

    def add(self, a, b):
        return self.f.add(a, b)  # component-wise; broadcasting over the 2-axis

    def sub(self, a, b):
        return self.f.sub(a, b)

    def neg(self, a):
        return self.f.neg(a)

    def mul(self, a, b):
        """Karatsuba over Fp with the three products BATCHED into ONE
        Montgomery mul: XLA compile time is superlinear in graph size, so one
        3x-batched mul compiles ~3x faster than three muls (and vectorizes
        better at runtime).  Measured: G2 point_add compile 48s -> ~12s."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        lhs = jnp.stack([a0, a1, self.f.add(a0, a1)], axis=0)
        rhs = jnp.stack([b0, b1, self.f.add(b0, b1)], axis=0)
        t = self.f.mont_mul(lhs, rhs)
        t0, t1, t2 = t[0], t[1], t[2]
        c0 = self.f.sub(t0, t1)
        c1 = self.f.sub(t2, self.f.add(t0, t1))
        return jnp.stack([c0, c1], axis=-2)

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)


class Fp1Ops:
    """Fp with elements shaped (..., NLIMBS)."""

    def __init__(self):
        self.f = FP_OPS

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def neg(self, a):
        return self.f.neg(a)

    def mul(self, a, b):
        return self.f.mont_mul(a, b)

    def sqr(self, a):
        return self.f.mont_mul(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)


G1 = Fp1Ops()
G2 = Fp2Ops()


def _pallas_enabled() -> bool:
    import os

    v = os.environ.get("ZKTPU_PALLAS", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _pallas_n(F, p) -> int:
    """Flattened lane count if the pallas fast path applies, else 0.

    G1 coords are (..., 16); G2 coords (..., 2, 16) — both route to fused
    f32-digit kernels (G2 via in-kernel Karatsuba, pallas_f32.f2_mul)."""
    if not _pallas_enabled():
        return 0
    ndrop = 2 if isinstance(F, Fp2Ops) else 1
    if len(p[0].shape) < ndrop + 1:
        return 0
    n = 1
    for d in p[0].shape[:-ndrop]:
        n *= d
    return n if (n > 0 and n % 512 == 0) else 0


def _bmul(F, pairs):
    """Batch k independent field muls into ONE stacked mul call.

    XLA compile time is superlinear in graph size (measured on CPU: one
    mont_mul 0.6s, a 19-mul point_add 8.3s/48s for G1/G2), so fusing every
    data-independent level of the point formulas into a single stacked mul
    shrinks both compile time and runtime kernel count."""
    shape = jnp.broadcast_shapes(*(a.shape for a, _ in pairs), *(b.shape for _, b in pairs))
    lhs = jnp.stack([jnp.broadcast_to(a, shape) for a, _ in pairs], axis=0)
    rhs = jnp.stack([jnp.broadcast_to(b, shape) for _, b in pairs], axis=0)
    out = F.mul(lhs, rhs)
    return [out[i] for i in range(len(pairs))]


def point_double(F, p):
    """dbl-2009-l, a=0.  p = (x, y, z); infinity (z=0) maps to infinity.

    Independent muls are level-batched (see _bmul): 4 stacked muls."""
    if _pallas_n(F, p):
        from . import pallas_f32

        if isinstance(F, Fp2Ops):
            return pallas_f32.point_double_g2(p)
        return pallas_f32.point_double(p)
    x, y, z = p
    xx, yy = _bmul(F, [(x, x), (y, y)])
    yyyy, s = _bmul(F, [(yy, yy), (x, yy)])
    s4 = F.add(F.add(s, s), F.add(s, s))
    m = F.add(F.add(xx, xx), xx)
    y2 = F.add(y, y)
    mm, z3 = _bmul(F, [(m, m), (y2, z)])
    x3 = F.sub(mm, F.add(s4, s4))
    y8 = F.add(F.add(yyyy, yyyy), F.add(yyyy, yyyy))
    (y3m,) = _bmul(F, [(m, F.sub(s4, x3))])
    y3 = F.sub(y3m, F.add(y8, y8))
    return x3, y3, z3


def point_add(F, p, q):
    """Complete Jacobian + Jacobian addition (add-2007-bl + masked selects).

    The add path AND the doubling fallback share level-batched muls: 7
    stacked mul calls total (was 19 separate muls)."""
    if _pallas_n(F, p) and p[0].shape == q[0].shape:
        from . import pallas_f32

        if isinstance(F, Fp2Ops):
            return pallas_f32.point_add_g2(p, q)
        return pallas_f32.point_add(p, q)
    x1, y1, z1 = p
    x2, y2, z2 = q
    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)
    # L1: squares (+ the doubling path's xx, yy ride along)
    z1z1, z2z2, xx, yy = _bmul(F, [(z1, z1), (z2, z2), (x1, x1), (y1, y1)])
    # L2: cross terms + doubling's yyyy, s, y1*z1
    u1, u2, w1, w2, yyyy, s_, zd = _bmul(
        F,
        [(x1, z2z2), (x2, z1z1), (z2z2, z2), (z1z1, z1), (yy, yy), (x1, yy), (y1, z1)],
    )
    # L3
    s1, s2 = _bmul(F, [(y1, w1), (y2, w2)])
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)
    same_x = F.is_zero(h)
    same_y = F.is_zero(r)
    h2 = F.add(h, h)
    m = F.add(F.add(xx, xx), xx)
    # L4: i = (2h)^2, zz = z1*z2, doubling's m^2
    i, zz, mm = _bmul(F, [(h2, h2), (z1, z2), (m, m)])
    s4 = F.add(F.add(s_, s_), F.add(s_, s_))
    dx = F.sub(mm, F.add(s4, s4))
    # L5: j = h*i, v = u1*i, doubling's m*(s4 - dx)
    j, v, dym = _bmul(F, [(h, i), (u1, i), (m, F.sub(s4, dx))])
    y8 = F.add(F.add(yyyy, yyyy), F.add(yyyy, yyyy))
    dy = F.sub(dym, F.add(y8, y8))
    dz = F.add(zd, zd)
    r2 = F.add(r, r)
    zz2 = F.add(zz, zz)
    # L6: r2^2, s1*j, z3 = 2zz*h
    rr, s1j, z3 = _bmul(F, [(r2, r2), (s1, j), (zz2, h)])
    x3 = F.sub(F.sub(rr, j), F.add(v, v))
    # L7
    (y3r,) = _bmul(F, [(r2, F.sub(v, x3))])
    y3 = F.sub(y3r, F.add(s1j, s1j))
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    is_cancel = same_x & ~same_y & ~p_inf & ~q_inf
    x3 = F.select(is_dbl, dx, x3)
    y3 = F.select(is_dbl, dy, y3)
    z3 = F.select(is_dbl, dz, z3)
    z3 = F.select(is_cancel, F.zeros_like(z3), z3)
    x3 = F.select(p_inf, x2, F.select(q_inf, x1, x3))
    y3 = F.select(p_inf, y2, F.select(q_inf, y1, y3))
    z3 = F.select(p_inf, z2, F.select(q_inf, z1, z3))
    return x3, y3, z3


def point_add_nodbl(F, p, q):
    """Jacobian + Jacobian WITHOUT the doubling fallback (16 muls vs 23).

    Sound only when the operands cannot be the same point — see
    pallas_f32.f_padd_nodbl for the CRS-disjointness argument.  The G1
    pallas kernel takes over on TPU; this jnp version is the CPU/test
    path and the G2 fallback.  Cancellation (p = -q) is branch-free:
    h = 0 zeroes z3."""
    if _pallas_n(F, p) and p[0].shape == q[0].shape and not isinstance(F, Fp2Ops):
        from . import pallas_f32

        return pallas_f32.point_add_nodbl(p, q)
    x1, y1, z1 = p
    x2, y2, z2 = q
    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)
    z1z1, z2z2 = _bmul(F, [(z1, z1), (z2, z2)])
    u1, u2, w1, w2 = _bmul(
        F, [(x1, z2z2), (x2, z1z1), (z2z2, z2), (z1z1, z1)]
    )
    s1, s2 = _bmul(F, [(y1, w1), (y2, w2)])
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)
    h2 = F.add(h, h)
    i, zz = _bmul(F, [(h2, h2), (z1, z2)])
    r2 = F.add(r, r)
    zz2 = F.add(zz, zz)
    j, v, rr, z3 = _bmul(F, [(h, i), (u1, i), (r2, r2), (zz2, h)])
    x3 = F.sub(F.sub(rr, j), F.add(v, v))
    s1j, y3r = _bmul(F, [(s1, j), (r2, F.sub(v, x3))])
    y3 = F.sub(y3r, F.add(s1j, s1j))
    x3 = F.select(p_inf, x2, F.select(q_inf, x1, x3))
    y3 = F.select(p_inf, y2, F.select(q_inf, y1, y3))
    z3 = F.select(p_inf, z2, F.select(q_inf, z1, z3))
    return x3, y3, z3


def point_madd_aff(F, p, q):
    """Affine + affine (Z1, Z2 in {0, 1-mont}) -> Jacobian: 6 muls.

    The fixed-base merge tree's first level; same no-doubling contract as
    point_add_nodbl.  mmadd-2007-bl with Z1 = Z2 = 1: no Z products at
    all, Z3 = 2H."""
    if _pallas_n(F, p) and p[0].shape == q[0].shape and not isinstance(F, Fp2Ops):
        from . import pallas_f32

        return pallas_f32.point_madd_aff(p, q)
    x1, y1, z1 = p
    x2, y2, z2 = q
    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)
    h = F.sub(x2, x1)
    r = F.sub(y2, y1)
    h2 = F.add(h, h)
    (i,) = _bmul(F, [(h2, h2)])
    r2 = F.add(r, r)
    j, v, rr = _bmul(F, [(h, i), (x1, i), (r2, r2)])
    x3 = F.sub(F.sub(rr, j), F.add(v, v))
    y1j, y3r = _bmul(F, [(y1, j), (r2, F.sub(v, x3))])
    y3 = F.sub(y3r, F.add(y1j, y1j))
    z3 = h2
    x3 = F.select(p_inf, x2, F.select(q_inf, x1, x3))
    y3 = F.select(p_inf, y2, F.select(q_inf, y1, y3))
    z3 = F.select(p_inf, z2, F.select(q_inf, z1, z3))
    return x3, y3, z3


def point_madd(F, p, qx, qy, q_inf):
    """Mixed addition: Jacobian p + affine (qx, qy) with explicit inf mask.

    madd-2007-bl; complete via selects (7M + 4S vs 11M + 5S for full add)."""
    x1, y1, z1 = p
    p_inf = F.is_zero(z1)
    z1z1 = F.sqr(z1)
    u2 = F.mul(qx, z1z1)
    s2 = F.mul(qy, F.mul(z1z1, z1))
    h = F.sub(u2, x1)
    r = F.sub(s2, y1)
    same_x = F.is_zero(h)
    same_y = F.is_zero(r)
    hh = F.sqr(h)
    i = F.add(F.add(hh, hh), F.add(hh, hh))
    j = F.mul(h, i)
    r2 = F.add(r, r)
    v = F.mul(x1, i)
    x3 = F.sub(F.sub(F.sqr(r2), j), F.add(v, v))
    y1j = F.mul(y1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(y1j, y1j))
    z3 = F.sub(F.sub(F.sqr(F.add(z1, h)), z1z1), hh)
    dx, dy, dz = point_double(F, p)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    is_cancel = same_x & ~same_y & ~p_inf & ~q_inf
    x3 = F.select(is_dbl, dx, x3)
    y3 = F.select(is_dbl, dy, y3)
    z3 = F.select(is_dbl, dz, z3)
    z3 = F.select(is_cancel, F.zeros_like(z3), z3)
    # q at infinity -> p; p at infinity -> (qx, qy, 1)
    one = jnp.broadcast_to(_one_like(F, z1), z1.shape)
    x3 = F.select(q_inf, x1, F.select(p_inf, qx, x3))
    y3 = F.select(q_inf, y1, F.select(p_inf, qy, y3))
    z3 = F.select(q_inf, z1, F.select(p_inf, F.select(q_inf, z1, one), z3))
    return x3, y3, z3


@functools.lru_cache(maxsize=4)
def _one_cached(is_fp2: bool):
    one = int_to_limbs(FP.r).astype(np.uint32)  # 1 in Montgomery form
    if is_fp2:
        return np.stack([one, np.zeros(NLIMBS, dtype=np.uint32)])
    return one


def _one_like(F, z):
    return jnp.asarray(_one_cached(isinstance(F, Fp2Ops)))


def point_neg(F, p):
    x, y, z = p
    return x, F.neg(y), z  # field neg maps 0 -> 0, so infinity stays valid


def point_select(F, cond, p, q):
    return (
        F.select(cond, p[0], q[0]),
        F.select(cond, p[1], q[1]),
        F.select(cond, p[2], q[2]),
    )


def infinity_like(F, p):
    return p[0], p[1], F.zeros_like(p[2])


# ------------------------------------------------------- host-side codecs


def g1_to_limbs(points) -> np.ndarray:
    """List of ref_ec G1 Points -> (N, 2, NLIMBS) affine Montgomery limbs.

    Infinity encodes as (0, 0) with a separate mask from g1_inf_mask."""
    from .ref_ec import G1_CURVE

    out = np.zeros((len(points), 2, NLIMBS), dtype=np.uint32)
    for i, p in enumerate(points):
        aff = G1_CURVE.to_affine(p)
        if aff is None:
            continue
        out[i, 0] = int_to_limbs(FP.to_mont(aff[0]))
        out[i, 1] = int_to_limbs(FP.to_mont(aff[1]))
    return out


def g1_inf_mask(points) -> np.ndarray:
    from .ref_ec import G1_CURVE

    return np.array([G1_CURVE._is_inf(p) for p in points], dtype=bool)


def g2_to_limbs(points) -> np.ndarray:
    """List of ref_ec G2 Points -> (N, 2, 2, NLIMBS): [coord][fp2 component]."""
    from .ref_ec import G2_CURVE

    out = np.zeros((len(points), 2, 2, NLIMBS), dtype=np.uint32)
    for i, p in enumerate(points):
        aff = G2_CURVE.to_affine(p)
        if aff is None:
            continue
        x, y = aff
        out[i, 0, 0] = int_to_limbs(FP.to_mont(x.c0))
        out[i, 0, 1] = int_to_limbs(FP.to_mont(x.c1))
        out[i, 1, 0] = int_to_limbs(FP.to_mont(y.c0))
        out[i, 1, 1] = int_to_limbs(FP.to_mont(y.c1))
    return out


def g2_inf_mask(points) -> np.ndarray:
    from .ref_ec import G2_CURVE

    return np.array([G2_CURVE._is_inf(p) for p in points], dtype=bool)


def limbs_to_g1(xyz):
    """(X, Y, Z) limb arrays (single point, Jacobian, Montgomery) -> ref_ec Point."""
    from ..field.params import limbs_to_int
    from .ref_ec import G1_CURVE, Point

    x = FP.from_mont(limbs_to_int(np.asarray(xyz[0])))
    y = FP.from_mont(limbs_to_int(np.asarray(xyz[1])))
    z = FP.from_mont(limbs_to_int(np.asarray(xyz[2])))
    return Point(x, y, z, G1_CURVE.b)


def limbs_to_g2(xyz):
    from ..field.params import limbs_to_int
    from .ref_ec import G2_CURVE, Fp2, Point

    def dec(c):
        c = np.asarray(c)
        return Fp2(
            FP.from_mont(limbs_to_int(c[0])), FP.from_mont(limbs_to_int(c[1]))
        )

    return Point(dec(xyz[0]), dec(xyz[1]), dec(xyz[2]), G2_CURVE.b)
