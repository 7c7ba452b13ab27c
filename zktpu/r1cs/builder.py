"""R1CS constraint-system builder (offline circuit synthesis, CPU Python).

Re-owns the gnark frontend/R1CS-builder layer (reference: gnark v0.11.0,
/root/reference/go.mod:8; call path keygen.go:330 -> frontend.Compile ->
Define -> api.Xor/Add/ToBinary).  This is deliberately NOT a general-purpose
frontend: it provides exactly the constraint vocabulary the reference circuits
use (XOR gates, booleanity, binary (de)composition, linear assertions, and —
for aesV2 — log-derivative lookups), producing sparse A/B/C matrices that the
TPU prover consumes as flat COO arrays.

Conventions:
  * Witness vector z has z[0] = 1; then public inputs, then private inputs,
    then auxiliary (internal) variables — allocation order is synthesis order.
  * A linear combination (LC) is a dict {var_index: coeff mod r}; constants
    ride on var 0.
  * A constraint is (A, B, C) meaning <A,z> * <B,z> = <C,z>.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..field.params import P_FR

R = P_FR


def lc_const(c: int) -> dict:
    c %= R
    return {0: c} if c else {}


def lc_var(v: int, coeff: int = 1) -> dict:
    coeff %= R
    return {v: coeff} if coeff else {}


def lc_add(*lcs) -> dict:
    out: dict = {}
    for lc in lcs:
        for v, c in lc.items():
            nc = (out.get(v, 0) + c) % R
            if nc:
                out[v] = nc
            elif v in out:
                del out[v]
    return out


def lc_scale(lc: dict, k: int) -> dict:
    k %= R
    if not k:
        return {}
    return {v: (c * k) % R for v, c in lc.items()}


def lc_sub(a: dict, b: dict) -> dict:
    return lc_add(a, lc_scale(b, R - 1))


def lc_is_const(lc: dict):
    """Return the constant value if lc has no variable terms, else None."""
    for v in lc:
        if v != 0:
            return None
    return lc.get(0, 0)


@dataclasses.dataclass
class CompiledR1CS:
    """Flat sparse representation handed to the prover/setup."""

    num_constraints: int
    num_vars: int  # includes z[0] = 1
    num_public: int  # count of public input vars (excluding z[0])
    # COO triplets per matrix, int64 rows/cols, Python-int coeffs
    a_rows: np.ndarray
    a_cols: np.ndarray
    a_coeffs: list
    b_rows: np.ndarray
    b_cols: np.ndarray
    b_coeffs: list
    c_rows: np.ndarray
    c_cols: np.ndarray
    c_coeffs: list
    # lookup-argument metadata (empty for pure-R1CS circuits).
    # committed_vars: witness indices bound by the Pedersen commitment D;
    # challenge_vars: public-input indices whose values the verifier derives
    # as H(D, i) rather than reading from the statement.
    committed_vars: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int64)
    )
    challenge_vars: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int64)
    )

    @property
    def num_instance(self) -> int:
        """Size of the statement part of z: [1, publics]."""
        return 1 + self.num_public

    @property
    def has_commitment(self) -> bool:
        return len(self.committed_vars) > 0


@dataclasses.dataclass
class LookupTable:
    """Log-derivative lookup table (reference analog: gnark's
    std/lookup/logderivlookup used by circuits/aesV2/common.go:28-39).

    values are circuit constants; queries are (q_lc, out_var) pairs recorded
    during synthesis and discharged by Builder.finalize_lookups()."""

    values: list
    queries: list = dataclasses.field(default_factory=list)


class Builder:
    def __init__(self):
        self.num_vars = 1  # var 0 is the constant 1
        self.num_public = 0
        self._public_sealed = False
        self.constraints: list[tuple[dict, dict, dict]] = []
        self.committed: set[int] = set()
        self.challenge_slots: list[int] = []
        self.tables: list[LookupTable] = []
        # gnark-export metadata (compat/gnark_r1cs_write.export_gnark_r1cs):
        # which aux vars are private INPUTS, and where bit-decomposition
        # hints sit in the constraint stream (gnark solves bits via the
        # std/math/bits.nBits hint, not from the binding constraint)
        self.secret_vars: list[int] = []
        self.hints: list[tuple[int, int, int, dict]] = []
        # ^ (constraint index the hint precedes, first bit var, nbits, input lc)

    # ------------------------------------------------------------ allocation
    def pub(self, n: int = 1) -> list[int]:
        assert not self._public_sealed, "public inputs must be allocated first"
        out = list(range(self.num_vars, self.num_vars + n))
        self.num_vars += n
        self.num_public += n
        return out

    def aux(self, n: int = 1) -> list[int]:
        self._public_sealed = True
        out = list(range(self.num_vars, self.num_vars + n))
        self.num_vars += n
        return out

    # private inputs and internal variables are both "aux": what makes a
    # variable a private *input* is only that the witness generator fills it
    # from request data rather than from computation.  The ids are recorded
    # so the gnark exporter can emit them as the Secret section (gnark wire
    # order [1, public, secret, internal] requires them contiguous there —
    # checked at export, not here).
    def secret(self, n: int = 1) -> list[int]:
        out = self.aux(n)
        self.secret_vars.extend(out)
        return out

    # ----------------------------------------------------------- constraints
    def constrain(self, a: dict, b: dict, c: dict):
        self.constraints.append((a, b, c))

    def mul(self, a: dict, b: dict) -> dict:
        """c = a * b (allocates unless both sides constant)."""
        ca, cb = lc_is_const(a), lc_is_const(b)
        if ca is not None and cb is not None:
            return lc_const(ca * cb)
        if ca is not None:
            return lc_scale(b, ca)
        if cb is not None:
            return lc_scale(a, cb)
        v = self.aux(1)[0]
        self.constrain(a, b, lc_var(v))
        return lc_var(v)

    def xor(self, a: dict, b: dict) -> dict:
        """c = a ^ b for boolean LCs: constraint (2a)*(b) = a + b - c.

        Reference analog: api.Xor in chachaV3 round.go:41-45 (1 constraint)."""
        ca, cb = lc_is_const(a), lc_is_const(b)
        if ca is not None:
            return lc_sub(lc_add(a, b), lc_scale(b, 2 * ca))  # a+b-2ab free
        if cb is not None:
            return lc_sub(lc_add(a, b), lc_scale(a, 2 * cb))
        v = self.aux(1)[0]
        self.constrain(lc_scale(a, 2), b, lc_sub(lc_add(a, b), lc_var(v)))
        return lc_var(v)

    def and_(self, a: dict, b: dict) -> dict:
        return self.mul(a, b)

    def assert_bool(self, lc: dict):
        self.constrain(lc, lc, lc)  # b*b = b

    def assert_eq(self, a: dict, b: dict):
        self.constrain(lc_sub(a, b), lc_const(1), lc_const(0))

    def assert_zero(self, a: dict):
        self.constrain(a, lc_const(1), lc_const(0))

    def to_binary(self, lc: dict, nbits: int) -> list[dict]:
        """Allocate nbits boolean vars b_i, assert sum 2^i b_i == lc.

        Reference analog: bits.ToBinary(api, res, WithNbDigits(33)) in
        chachaV3 round.go:35-39 — nbits booleanity constraints + 1 binding."""
        vs = self.aux(nbits)
        self.hints.append((len(self.constraints), vs[0], nbits, dict(lc)))
        bits = [lc_var(v) for v in vs]
        for b in bits:
            self.assert_bool(b)
        acc = lc_add(*[lc_scale(b, 1 << i) for i, b in enumerate(bits)])
        self.assert_eq(acc, lc)
        return bits

    @staticmethod
    def from_binary(bits: list[dict]) -> dict:
        return lc_add(*[lc_scale(b, 1 << i) for i, b in enumerate(bits)])

    # ------------------------------------------------------------- lookups
    def challenge(self) -> dict:
        """Allocate a public input whose value the VERIFIER derives as
        H(commitment, slot) — the Fiat-Shamir challenge for the lookup
        argument (BSB22-style in-circuit randomness; reference analog: the
        commitment extension gnark's Groth16 uses for logderivlookup [dep])."""
        v = self.pub(1)[0]
        self.challenge_slots.append(v)
        return lc_var(v)

    def mark_committed(self, var: int):
        self.committed.add(var)

    def add_table(self, values: list[int]) -> LookupTable:
        t = LookupTable(values=[v % R for v in values])
        self.tables.append(t)
        return t

    def lookup(self, table: LookupTable, q: dict) -> dict:
        """Record a lookup; returns the output wire (prover fills table[q]).

        The (q, out) pair is bound into the commitment so the challenge is
        sampled after them (soundness of logUp)."""
        qc = lc_is_const(q)
        if qc is None and (len(q) != 1 or 0 in q or next(iter(q.values())) != 1):
            # materialize compound LCs so a single committed var carries q
            v = self.aux(1)[0]
            self.assert_eq(lc_var(v), q)
            q = lc_var(v)
        out = self.aux(1)[0]
        if qc is None:
            self.mark_committed(next(iter(q)))
        self.mark_committed(out)
        table.queries.append((q, out))
        return lc_var(out)

    def finalize_lookups(self, alpha: dict, beta: dict):
        """Emit the logUp constraints:  sum_i 1/(a - (q_i + b*out_i)) ==
        sum_j m_j/(a - (j + b*T_j))  per table, with committed q/out/m."""
        for table in self.tables:
            # f/g sums accumulate IN PLACE: every term is a distinct fresh
            # var with coefficient 1, so one dict insert each (lc_add would
            # copy the accumulator per term — quadratic at 65536-entry
            # tables like chacha_v1's XOR8)
            f_sum: dict = {}
            for q, out_v in table.queries:
                prod = self.mul(beta, lc_var(out_v))  # b*out (1 constraint)
                f = self.aux(1)[0]
                denom = lc_sub(alpha, lc_add(q, prod))
                self.constrain(denom, lc_var(f), lc_const(1))
                f_sum[f] = 1
            g_sum: dict = {}
            for j, tv in enumerate(table.values):
                m = self.aux(1)[0]
                self.mark_committed(m)
                g = self.aux(1)[0]
                # a - j - b*T_j is linear (j, T_j constants)
                denom = lc_sub(alpha, lc_add(lc_const(j), lc_scale(beta, tv)))
                self.constrain(denom, lc_var(g), lc_var(m))
                g_sum[g] = 1
            self.assert_eq(f_sum, g_sum)

    # -------------------------------------------------------------- compile
    def compile(self) -> CompiledR1CS:
        def flat(which):
            rows, cols, coeffs = [], [], []
            for k, con in enumerate(self.constraints):
                for v, c in sorted(con[which].items()):
                    rows.append(k)
                    cols.append(v)
                    coeffs.append(c)
            return (
                np.asarray(rows, dtype=np.int64),
                np.asarray(cols, dtype=np.int64),
                coeffs,
            )

        ar, ac, av = flat(0)
        br, bc, bv = flat(1)
        cr, cc, cv = flat(2)
        return CompiledR1CS(
            num_constraints=len(self.constraints),
            num_vars=self.num_vars,
            num_public=self.num_public,
            a_rows=ar, a_cols=ac, a_coeffs=av,
            b_rows=br, b_cols=bc, b_coeffs=bv,
            c_rows=cr, c_cols=cc, c_coeffs=cv,
            committed_vars=np.asarray(sorted(self.committed), dtype=np.int64),
            challenge_vars=np.asarray(self.challenge_slots, dtype=np.int64),
        )

    # ------------------------------------------------- (slow) witness check
    def check_witness(self, z) -> bool:
        """Evaluate every constraint against a full assignment (test oracle)."""

        def ev(lc):
            return sum(c * int(z[v]) for v, c in lc.items()) % R

        for a, b, c in self.constraints:
            if ev(a) * ev(b) % R != ev(c):
                return False
        return True
