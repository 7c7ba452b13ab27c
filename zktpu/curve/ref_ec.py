"""Pure-Python BN254 curve + pairing reference implementation (cold path).

This re-owns the gnark-crypto curve layer (SURVEY.md §2.2 N2; reference pins
gnark-crypto v0.14.0 at /root/reference/go.mod:9) for the parts that do NOT run
on TPU: Groth16 trusted setup (keygen, offline) and proof verification (a few
pairings, milliseconds-to-seconds, latency-irrelevant server side — reference
analog: libraries/verifier). The TPU hot path (MSM/NTT) lives in
zktpu.curve.jnp_curve / zktpu.msm / zktpu.ntt and is cross-checked against this
module in tests.

Tower: Fp2 = Fp[u]/(u^2+1); Fp6 = Fp2[v]/(v^3 - xi), xi = 9+u;
Fp12 = Fp6[w]/(w^2 - v).  Pairing: optimal ate with per-Q prepared line
coefficients (G2Prepared) evaluated at P with sparse Fp12 muls, and a
Devegili-Scott BN addition-chain final exponentiation (easy part
f^((p^6-1)(p^2+1)) + hard part); a py_ecc-style E(Fp12) Miller loop is kept
as the oracle fallback for degenerate pairs.
"""

from __future__ import annotations

from ..field.params import P_FP as P, P_FR as R_ORDER, BN254_X

# ----------------------------------------------------------------------- Fp2


class Fp2:
    """a0 + a1*u with u^2 = -1, coefficients in Fp."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: int, c1: int = 0):
        self.c0 = c0 % P
        self.c1 = c1 % P

    def __add__(self, o):
        return Fp2(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fp2(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fp2(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fp2(self.c0 * o, self.c1 * o)
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        return Fp2(t0 - t1, (a0 + a1) * (b0 + b1) - t0 - t1)

    __rmul__ = __mul__

    def sqr(self):
        a0, a1 = self.c0, self.c1
        return Fp2((a0 + a1) * (a0 - a1), 2 * a0 * a1)

    def conj(self):
        return Fp2(self.c0, -self.c1)

    def inv(self):
        norm = self.c0 * self.c0 + self.c1 * self.c1
        ninv = pow(norm, -1, P)
        return Fp2(self.c0 * ninv, -self.c1 * ninv)

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash((self.c0, self.c1))

    def __repr__(self):
        return f"Fp2({self.c0},{self.c1})"

    @staticmethod
    def zero():
        return Fp2(0, 0)

    @staticmethod
    def one():
        return Fp2(1, 0)


XI = Fp2(9, 1)  # sextic-twist non-residue

# ----------------------------------------------------------------------- Fp6


class Fp6:
    """c0 + c1*v + c2*v^2 with v^3 = xi, coefficients in Fp2."""

    __slots__ = ("c0", "c1", "c2")

    def __init__(self, c0: Fp2, c1: Fp2, c2: Fp2):
        self.c0, self.c1, self.c2 = c0, c1, c2

    def __add__(self, o):
        return Fp6(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fp6(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fp6(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = t0 + XI * ((a1 + a2) * (b1 + b2) - t1 - t2)
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + XI * t2
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fp6(c0, c1, c2)

    def mul_by_v(self):  # * v
        return Fp6(XI * self.c2, self.c0, self.c1)

    def sqr(self):
        return self * self

    def inv(self):
        a0, a1, a2 = self.c0, self.c1, self.c2
        t0 = a0.sqr() - XI * (a1 * a2)
        t1 = XI * a2.sqr() - a0 * a1
        t2 = a1.sqr() - a0 * a2
        factor = (a0 * t0 + XI * (a2 * t1) + XI * (a1 * t2)).inv()
        return Fp6(t0 * factor, t1 * factor, t2 * factor)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1 and self.c2 == o.c2

    def __hash__(self):
        return hash((self.c0, self.c1, self.c2))

    @staticmethod
    def zero():
        return Fp6(Fp2.zero(), Fp2.zero(), Fp2.zero())

    @staticmethod
    def one():
        return Fp6(Fp2.one(), Fp2.zero(), Fp2.zero())


# ---------------------------------------------------------------------- Fp12


class Fp12:
    """a + b*w with w^2 = v, coefficients in Fp6."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: Fp6, c1: Fp6):
        self.c0, self.c1 = c0, c1

    def __add__(self, o):
        return Fp12(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fp12(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fp12(-self.c0, -self.c1)

    def __mul__(self, o):
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        return Fp12(t0 + t1.mul_by_v(), (a0 + a1) * (b0 + b1) - t0 - t1)

    def sqr(self):
        return self * self

    def inv(self):
        # (a - bw)(a + bw) = a^2 - b^2 v  in Fp6
        factor = (self.c0 * self.c0 - (self.c1 * self.c1).mul_by_v()).inv()
        return Fp12(self.c0 * factor, -(self.c1 * factor))

    def pow(self, e: int):
        if e < 0:
            return self.inv().pow(-e)
        acc = Fp12.one()
        base = self
        while e:
            if e & 1:
                acc = acc * base
            base = base.sqr()
            e >>= 1
        return acc

    def conj(self):  # conjugation over Fp6 (the w -> -w automorphism)
        return Fp12(self.c0, -self.c1)

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash((self.c0, self.c1))

    def is_one(self):
        return self == Fp12.one()

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero()

    @staticmethod
    def zero():
        return Fp12(Fp6.zero(), Fp6.zero())

    @staticmethod
    def one():
        return Fp12(Fp6.one(), Fp6.zero())


def fp12_from_fp(x: int) -> Fp12:
    return Fp12(Fp6(Fp2(x), Fp2.zero(), Fp2.zero()), Fp6.zero())


# ------------------------------------------------------------ generic points
# Jacobian coordinates over a generic field element type F supporting
# +,-,*,sqr,inv,is_zero.  A point is (X, Y, Z); infinity is Z == 0.


class Point:
    __slots__ = ("x", "y", "z", "b")

    def __init__(self, x, y, z, b):
        self.x, self.y, self.z, self.b = x, y, z, b

    def is_inf(self):
        return self.z.is_zero() if hasattr(self.z, "is_zero") else self.z == 0


def _fzero_like(v):
    return v * 0 if isinstance(v, int) else type(v).zero()


def _fone_like(v):
    return v * 0 + 1 if isinstance(v, int) else type(v).one()


class Curve:
    """Short Weierstrass y^2 = x^3 + b over a field given by example element ops."""

    def __init__(self, b, field_one, field_zero):
        self.b = b
        self.one = field_one
        self.zero = field_zero

    def infinity(self) -> Point:
        return Point(self.one, self.one, self.zero, self.b)

    def from_affine(self, x, y) -> Point:
        return Point(x, y, self.one, self.b)

    def to_affine(self, p: Point):
        if self._is_inf(p):
            return None
        zinv = self._inv(p.z)
        zi2 = self._mul(zinv, zinv)
        return self._mul(p.x, zi2), self._mul(p.y, self._mul(zi2, zinv))

    # field-op shims working for both int (mod P) and tower elements
    def _mul(self, a, b):
        return (a * b) % P if isinstance(a, int) else a * b

    def _add(self, a, b):
        return (a + b) % P if isinstance(a, int) else a + b

    def _sub(self, a, b):
        return (a - b) % P if isinstance(a, int) else a - b

    def _inv(self, a):
        return pow(a, -1, P) if isinstance(a, int) else a.inv()

    def _is_zero(self, a):
        return a % P == 0 if isinstance(a, int) else a.is_zero()

    def _is_inf(self, p: Point):
        return self._is_zero(p.z)

    def double(self, p: Point) -> Point:
        # dbl-2009-l formulas (a = 0), generic over int / tower fields
        if self._is_inf(p):
            return p
        m, a, s = self._mul, self._add, self._sub
        xx = m(p.x, p.x)
        yy = m(p.y, p.y)
        yyyy = m(yy, yy)
        s2 = m(p.x, yy)
        s4 = a(a(s2, s2), a(s2, s2))  # 4*x*y^2
        mm = a(a(xx, xx), xx)  # 3*x^2
        x3 = s(m(mm, mm), a(s4, s4))
        y8 = a(a(yyyy, yyyy), a(yyyy, yyyy))
        y3 = s(m(mm, s(s4, x3)), a(y8, y8))
        z3 = m(a(p.y, p.y), p.z)
        return Point(x3, y3, z3, p.b)

    def add(self, p: Point, q: Point) -> Point:
        if self._is_inf(p):
            return q
        if self._is_inf(q):
            return p
        m, s, a = self._mul, self._sub, self._add
        z1z1 = m(p.z, p.z)
        z2z2 = m(q.z, q.z)
        u1 = m(p.x, z2z2)
        u2 = m(q.x, z1z1)
        s1 = m(p.y, m(z2z2, q.z))
        s2 = m(q.y, m(z1z1, p.z))
        if self._is_zero(s(u1, u2)):
            if self._is_zero(s(s1, s2)):
                return self.double(p)
            return self.infinity()
        h = s(u2, u1)
        i = m(a(h, h), a(h, h))
        j = m(h, i)
        r = a(s(s2, s1), s(s2, s1))
        v = m(u1, i)
        x3 = s(s(m(r, r), j), a(v, v))
        y3 = s(m(r, s(v, x3)), a(m(s1, j), m(s1, j)))
        zz = m(p.z, q.z)
        z3 = m(a(zz, zz), h)  # 2*Z1*Z2*H (matches I=(2H)^2, r=2(S2-S1))
        return Point(x3, y3, z3, p.b)

    def neg(self, p: Point) -> Point:
        if isinstance(p.y, int):
            return Point(p.x, (-p.y) % P, p.z, p.b)
        return Point(p.x, -p.y, p.z, p.b)

    def mul(self, p: Point, k: int) -> Point:
        k %= R_ORDER
        acc = self.infinity()
        base = p
        while k:
            if k & 1:
                acc = self.add(acc, base)
            base = self.double(base)
            k >>= 1
        return acc

    def eq(self, p: Point, q: Point) -> bool:
        if self._is_inf(p) or self._is_inf(q):
            return self._is_inf(p) and self._is_inf(q)
        z1z1 = self._mul(p.z, p.z)
        z2z2 = self._mul(q.z, q.z)
        if not self._is_zero(self._sub(self._mul(p.x, z2z2), self._mul(q.x, z1z1))):
            return False
        return self._is_zero(
            self._sub(
                self._mul(p.y, self._mul(z2z2, q.z)), self._mul(q.y, self._mul(z1z1, p.z))
            )
        )

    def is_on_curve(self, p: Point) -> bool:
        if self._is_inf(p):
            return True
        aff = self.to_affine(p)
        x, y = aff
        lhs = self._mul(y, y)
        rhs = self._add(self._mul(x, self._mul(x, x)), self.b)
        return self._is_zero(self._sub(lhs, rhs))


# concrete curves
G1_CURVE = Curve(3, 1, 0)
B2 = XI.inv() * 3  # twist curve coefficient b' = 3/xi
G2_CURVE = Curve(B2, Fp2.one(), Fp2.zero())
B12 = fp12_from_fp(3)
G12_CURVE = Curve(B12, Fp12.one(), Fp12.zero())

G1_GEN = G1_CURVE.from_affine(1, 2)
G2_GEN = G2_CURVE.from_affine(
    Fp2(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    Fp2(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)

# ----------------------------------------------------------------- twist map


def twist_to_fp12(q: Point) -> Point:
    """Lift a G2 (twist) point into E(Fp12): (x', y') -> (x'*w^2, y'*w^3), w^2 = v."""
    aff = G2_CURVE.to_affine(q)
    if aff is None:
        return G12_CURVE.infinity()
    x2, y2 = aff
    x12 = Fp12(Fp6(Fp2.zero(), x2, Fp2.zero()), Fp6.zero())
    y12 = Fp12(Fp6.zero(), Fp6(Fp2.zero(), y2, Fp2.zero()))
    return G12_CURVE.from_affine(x12, y12)


def g1_to_fp12(p: Point) -> Point:
    aff = G1_CURVE.to_affine(p)
    if aff is None:
        return G12_CURVE.infinity()
    return G12_CURVE.from_affine(fp12_from_fp(aff[0]), fp12_from_fp(aff[1]))


# -------------------------------------------------------------------- pairing

ATE_LOOP_COUNT = 6 * BN254_X + 2  # 29793968203157093288, bit_length 65


def _linefunc(p1_aff, p2_aff, t_aff) -> Fp12:
    """Evaluate the line through affine p1, p2 (on E(Fp12)) at affine point t."""
    x1, y1 = p1_aff
    x2, y2 = p2_aff
    xt, yt = t_aff
    if not (x1 - x2).is_zero():
        m = (y2 - y1) * (x2 - x1).inv()
        return m * (xt - x1) - (yt - y1)
    if y1 == y2:
        m = (x1 * x1 + x1 * x1 + x1 * x1) * (y1 + y1).inv()
        return m * (xt - x1) - (yt - y1)
    return xt - x1


def miller_loop(q12: Point, p12: Point) -> Fp12:
    """Optimal ate Miller loop (affine, py_ecc style) + final exponentiation."""
    if G12_CURVE._is_inf(q12) or G12_CURVE._is_inf(p12):
        return Fp12.one()
    q_aff = G12_CURVE.to_affine(q12)
    t_aff = G12_CURVE.to_affine(p12)
    r = q12
    f = Fp12.one()
    nbits = ATE_LOOP_COUNT.bit_length()
    for i in range(nbits - 2, -1, -1):
        r_aff = G12_CURVE.to_affine(r)
        f = f * f * _linefunc(r_aff, r_aff, t_aff)
        r = G12_CURVE.double(r)
        if (ATE_LOOP_COUNT >> i) & 1:
            f = f * _linefunc(G12_CURVE.to_affine(r), q_aff, t_aff)
            r = G12_CURVE.add(r, q12)
    qx, qy = q_aff
    q1 = (qx.pow(P), qy.pow(P))  # Frobenius
    nq2 = (q1[0].pow(P), -(q1[1].pow(P)))
    f = f * _linefunc(G12_CURVE.to_affine(r), q1, t_aff)
    r = G12_CURVE.add(r, G12_CURVE.from_affine(*q1))
    f = f * _linefunc(G12_CURVE.to_affine(r), nq2, t_aff)
    return f


FINAL_EXP = (P**12 - 1) // R_ORDER


# ------------------------------------------------- fast pairing (Fp2 lines)
#
# The Fp12-embedded loop above is the readable oracle; the production
# verifier path below is the standard optimal-ate layout (the one gnark's
# verifier latency comes from, [dep] gnark-crypto bn254 pairing):
#   * Miller loop in AFFINE Fp2 twist coordinates (line slope = one Fp2
#     inversion per step, not an Fp12 to_affine per step);
#   * a line evaluates to the SPARSE element yp + (-lam*xp) w + (lam*X-Y) w^3
#     — multiplied in with a dedicated ~12-Fp2-mul routine;
#   * the per-Q line coefficients depend only on Q: G2Prepared precomputes
#     them once (vk gamma/delta/sigma/G2 are fixed per key);
#   * final exponentiation = easy part + the Devegili-Scott BN hard-part
#     addition chain over 3 exp-by-x (63-bit), not a blind 3000-bit pow.
#     (Pinned against pow(FINAL_EXP) by tests/test_pairing_fast.py.)


def _fp2_pow(a: Fp2, e: int) -> Fp2:
    acc, base = Fp2.one(), a
    while e:
        if e & 1:
            acc = acc * base
        base = base.sqr()
        e >>= 1
    return acc


# gamma[k][i] = xi^(i*(p^k-1)/6): the w^i Frobenius multipliers, k = 1..3
_FROB_GAMMA = {
    k: [_fp2_pow(XI, i * (P**k - 1) // 6) for i in range(6)] for k in (1, 2, 3)
}
# twisted-endomorphism multipliers: (X w^2)^p = conj(X) gamma[1][2] w^2 etc.
_TW_BETA_X = _FROB_GAMMA[1][2]  # xi^((p-1)/3)
_TW_BETA_Y = _FROB_GAMMA[1][3]  # xi^((p-1)/2)


def _fp12_coeffs(f: Fp12):
    """Tower -> w-basis [c_0..c_5] over Fp2 (w^2 = v, w^6 = xi)."""
    return [f.c0.c0, f.c1.c0, f.c0.c1, f.c1.c1, f.c0.c2, f.c1.c2]


def _fp12_from_coeffs(c) -> Fp12:
    return Fp12(Fp6(c[0], c[2], c[4]), Fp6(c[1], c[3], c[5]))


def frobenius(f: Fp12, k: int = 1) -> Fp12:
    g = _FROB_GAMMA[k]
    cs = _fp12_coeffs(f)
    out = []
    for i, c in enumerate(cs):
        cc = c.conj() if k & 1 else c
        out.append(cc if i == 0 else cc * g[i])
    return _fp12_from_coeffs(out)


def fp12_sqr(f: Fp12) -> Fp12:
    """(c0 + c1 w)^2 via complex squaring: 2 Fp6 muls (vs 3 for mul)."""
    c0, c1 = f.c0, f.c1
    t = c0 * c1
    c0p = (c0 + c1) * (c0 + c1.mul_by_v()) - t - t.mul_by_v()
    return Fp12(c0p, t + t)


def _exp_by_x(f: Fp12) -> Fp12:
    acc, base, e = Fp12.one(), f, BN254_X
    while e:
        if e & 1:
            acc = acc * base
        base = fp12_sqr(base)
        e >>= 1
    return acc


def final_exponentiation(f: Fp12) -> Fp12:
    # easy part: f^((p^6-1)(p^2+1))
    f1 = f.conj() * f.inv()
    m = frobenius(f1, 2) * f1
    # hard part (Devegili et al. BN addition chain)
    fx = _exp_by_x(m)
    fx2 = _exp_by_x(fx)
    fx3 = _exp_by_x(fx2)
    y0 = frobenius(m, 1) * frobenius(m, 2) * frobenius(m, 3)
    y1 = m.conj()
    y2 = frobenius(fx2, 2)
    y3 = frobenius(fx, 1).conj()
    y4 = (fx * frobenius(fx2, 1)).conj()
    y5 = fx2.conj()
    y6 = (fx3 * frobenius(fx3, 1)).conj()
    t0 = fp12_sqr(y6) * y4 * y5
    t1 = y3 * y5 * t0
    t0 = t0 * y2
    t1 = fp12_sqr(fp12_sqr(t1) * t0)
    t0 = t1 * y1
    t1 = t1 * y0
    t0 = fp12_sqr(t0)
    return t0 * t1


def _fp6_mul_01(x: Fp6, b0: Fp2, b1: Fp2) -> Fp6:
    """x * (b0 + b1 v)."""
    a0, a1, a2 = x.c0, x.c1, x.c2
    t0 = a0 * b0
    t1 = a1 * b1
    c0 = t0 + XI * (a2 * b1)
    c1 = (a0 + a1) * (b0 + b1) - t0 - t1
    c2 = a2 * b0 + t1
    return Fp6(c0, c1, c2)


def _mul_line(f: Fp12, a: int, b: Fp2, c: Fp2) -> Fp12:
    """f * (a + b w + c w^3) with a in Fp — the Miller line sparsity."""
    f0, f1 = f.c0, f.c1
    t0 = Fp6(f0.c0 * a, f0.c1 * a, f0.c2 * a)
    t1 = _fp6_mul_01(f1, b, c)
    cross = _fp6_mul_01(f0 + f1, Fp2(b.c0 + a, b.c1), c)
    return Fp12(t0 + t1.mul_by_v(), cross - t0 - t1)


class _DegeneratePair(Exception):
    """T = +-Q inside the ate loop — fall back to the Fp12 oracle loop."""


class G2Prepared:
    """Per-Q Miller line coefficients (lam, X_T, Y_T) — Q-only work done
    once; verify-time cost is line EVALUATION at P plus sparse muls.  The
    vk's gamma/delta/sigma/G2 pairs reuse one instance across verifies."""

    def __init__(self, q: Point):
        aff = G2_CURVE.to_affine(q)
        self.inf = aff is None
        self.coeffs: list = []
        if self.inf:
            return
        X, Y = aff
        t = (X, Y)
        for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
            t = self._dbl(t)
            if (ATE_LOOP_COUNT >> i) & 1:
                t = self._add(t, (X, Y))
        q1 = (X.conj() * _TW_BETA_X, Y.conj() * _TW_BETA_Y)
        q2 = (q1[0].conj() * _TW_BETA_X, q1[1].conj() * _TW_BETA_Y)
        nq2 = (q2[0], -q2[1])
        t = self._add(t, q1)
        self._add(t, nq2)

    def _dbl(self, t):
        X, Y = t
        lam = (X.sqr() * 3) * (Y + Y).inv()
        self.coeffs.append((lam, X, Y))
        x3 = lam.sqr() - X - X
        return (x3, lam * (X - x3) - Y)

    def _add(self, t, q):
        x1, y1 = t
        x2, y2 = q
        if (x2 - x1).is_zero():
            raise _DegeneratePair()
        lam = (y2 - y1) * (x2 - x1).inv()
        self.coeffs.append((lam, x1, y1))
        x3 = lam.sqr() - x1 - x2
        return (x3, lam * (x1 - x3) - y1)


def miller_loop_prepared(prep: G2Prepared, p_aff) -> Fp12:
    xp, yp = p_aff
    nxp = P - (xp % P)
    it = iter(prep.coeffs)
    f = Fp12.one()

    def line(f):
        lam, X, Y = next(it)
        return _mul_line(f, yp, lam * nxp, lam * X - Y)

    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = line(fp12_sqr(f))
        if (ATE_LOOP_COUNT >> i) & 1:
            f = line(f)
    f = line(f)
    f = line(f)
    return f


def g2_subgroup_check(q: Point) -> bool:
    """r-subgroup membership for a point on the G2 twist.

    BN254's twist curve has a large cofactor, so on-curve does NOT imply
    order r; gnark's Proof.ReadFrom subgroup-checks every deserialized G2
    point ([dep] go.mod:8) and the verifier must match that safety behavior
    for attacker-controlled proof.B.  Plain [r]Q == O, computed as
    [r-1]Q + Q so Curve.mul's mod-r scalar reduction (which would make a
    direct [r]Q trivially infinity) is bypassed.  G1 needs no counterpart:
    its cofactor is 1, on-curve suffices.
    """
    if G2_CURVE._is_inf(q):
        return True
    return G2_CURVE._is_inf(G2_CURVE.add(G2_CURVE.mul(q, R_ORDER - 1), q))


def pairing(p: Point, q: Point) -> Fp12:
    """e(P in G1, Q in G2) with full final exponentiation."""
    if G1_CURVE._is_inf(p) or G2_CURVE._is_inf(q):
        return Fp12.one()
    try:
        prep = q if isinstance(q, G2Prepared) else G2Prepared(q)
        f = miller_loop_prepared(prep, G1_CURVE.to_affine(p))
    except _DegeneratePair:
        f = miller_loop(twist_to_fp12(q), g1_to_fp12(p))
    return final_exponentiation(f)


def multi_pairing_is_one(pairs) -> bool:
    """prod e(Pi, Qi) == 1, sharing one final exponentiation.

    Qi may be a G2 Point or an already-built G2Prepared."""
    f = Fp12.one()
    for p, q in pairs:
        prep = q if isinstance(q, G2Prepared) else None
        if G1_CURVE._is_inf(p) or (prep.inf if prep else G2_CURVE._is_inf(q)):
            continue
        try:
            if prep is None:
                prep = G2Prepared(q)
            f = f * miller_loop_prepared(prep, G1_CURVE.to_affine(p))
        except _DegeneratePair:
            f = f * miller_loop(twist_to_fp12(q), g1_to_fp12(p))
    return final_exponentiation(f).is_one()


# ----------------------------------------------------- fixed-base multiscalar


class FixedBaseTable:
    """Windowed fixed-base table: 8-bit windows, 32 tables of 255 points.

    Used by keygen to compute tens of thousands of k*G for the same base
    (CRS generation — reference analog: gnark's groth16.Setup MSM precompute,
    SURVEY.md §3.1)."""

    def __init__(self, curve: Curve, base: Point, max_bits: int = 256, wbits: int = 8):
        self.curve = curve
        self.wbits = wbits
        nwin = (max_bits + wbits - 1) // wbits
        self.tables = []
        win_base = base
        for _ in range(nwin):
            row = [curve.infinity()]
            acc = curve.infinity()
            for _ in range((1 << wbits) - 1):
                acc = curve.add(acc, win_base)
                row.append(acc)
            self.tables.append(row)
            for _ in range(wbits):
                win_base = curve.double(win_base)

    def mul(self, k: int) -> Point:
        k %= R_ORDER
        acc = self.curve.infinity()
        w = 0
        mask = (1 << self.wbits) - 1
        while k:
            d = k & mask
            if d:
                acc = self.curve.add(acc, self.tables[w][d])
            k >>= self.wbits
            w += 1
        return acc
