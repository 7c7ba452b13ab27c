"""ChaCha20 byte-level circuit (reference legacy circuit "chacha" / V1).

Re-owns /root/reference/circuits/chacha/{circuit.go,round.go} semantics
(SURVEY.md §2.1 C1): the V1 experiment phrased over gnark's
std/math/uints.U32 gadget, whose byte-oriented ops run on log-derivative
precomputed tables.  The structure here mirrors that design with OUR logUp
machinery (the same Builder tables the production aesV2 circuit uses):

  * a U32 is 4 byte wires, little-endian (uints.U32 layout);
  * Xor: per-byte query into a 65536-entry XOR table, key a + 256*b
    (gnark's logderivprecomp xor table);
  * Add: field-sum of both words, result re-split into 4 range-checked
    bytes + a carry bool (uints.Add's byte decomposition);
  * Lrot 16/8: free byte rewiring; Lrot 12/7: per-byte bit split and
    recombine (round.go:12-28 rot schedule);
  * Serialize = UnpackLSB ∘ PackMSB = byte reversal (round.go:53-57);
  * publics: In[16], Out[16] (circuit.go:14-15) plus the two logUp
    challenges; secrets Key[8], Counter, Nonce[3] (circuit.go:11-13);
  * trailing counter increment per block (circuit.go:57).

Like upstream, V1 is a circuit-tier artifact only (keygen.go never emits
keys for it); the solver is a host-side schedule replay with fixed
challenge values, exercised by tests/test_chacha_legacy.py.
"""

from __future__ import annotations

from ..r1cs.builder import (
    Builder,
    lc_add,
    lc_const,
    lc_scale,
    lc_var,
)
from .chacha_v3 import CHACHA_CONSTS, QR_SCHEDULE

from ..field.params import P_FR

XOR_TABLE = [((j & 0xFF) ^ (j >> 8)) for j in range(65536)]
RANGE_TABLE = list(range(256))


def _qr(b, st, i, j, k, l):
    a_, b_, c_, d_ = st[i], st[j], st[k], st[l]
    a_ = b.add32(a_, b_)
    d_ = b.lrot(b.xor32(d_, a_), 16)
    c_ = b.add32(c_, d_)
    b_ = b.lrot(b.xor32(b_, c_), 12)
    a_ = b.add32(a_, b_)
    d_ = b.lrot(b.xor32(d_, a_), 8)
    c_ = b.add32(c_, d_)
    b_ = b.lrot(b.xor32(b_, c_), 7)
    st[i], st[j], st[k], st[l] = a_, b_, c_, d_


def define(b):
    inp = [b.pub_u32() for _ in range(16)]
    out = [b.pub_u32() for _ in range(16)]
    b.alloc_challenges()
    key = [b.sec_u32() for _ in range(8)]
    counter = b.sec_u32()
    nonce = [b.sec_u32() for _ in range(3)]

    state = [b.const_u32(c) for c in CHACHA_CONSTS] + key + [counter] + nonce
    work = list(state)
    for _ in range(10):
        for idx in QR_SCHEDULE:
            _qr(b, work, *idx)
    state = [b.add32(state[i], work[i]) for i in range(16)]
    keystream = [list(reversed(w)) for w in state]  # Serialize: byte reverse
    ct = [b.xor32(inp[i], keystream[i]) for i in range(16)]
    for i in range(16):
        b.assert_u32_eq(out[i], ct[i])
    b.add32(counter, b.const_u32(1))  # circuit.go:57 counter increment
    b.finalize()


# ------------------------------------------------------------- synth backend


class SynthBackend:
    """U32 = list of 4 byte LCs, little-endian."""

    def __init__(self):
        self.builder = Builder()
        self.t_xor = self.builder.add_table(XOR_TABLE)
        self.t_range = self.builder.add_table(RANGE_TABLE)
        self._eta = None

    def alloc_challenges(self):
        self._eta = (self.builder.challenge(), self.builder.challenge())

    def pub_u32(self):
        return [lc_var(v) for v in self.builder.pub(4)]

    def sec_u32(self):
        return [lc_var(v) for v in self.builder.secret(4)]

    def const_u32(self, u32: int):
        return [lc_const((u32 >> (8 * i)) & 0xFF) for i in range(4)]

    def _xor8(self, a, b):
        q = lc_add(a, lc_scale(b, 256))
        return self.builder.lookup(self.t_xor, q)

    def xor32(self, a, b):
        return [self._xor8(a[i], b[i]) for i in range(4)]

    def add32(self, a, b):
        word = lambda w: lc_add(  # noqa: E731
            lc_add(w[0], lc_scale(w[1], 256)),
            lc_add(lc_scale(w[2], 1 << 16), lc_scale(w[3], 1 << 24)),
        )
        s = lc_add(word(a), word(b))
        carry = lc_var(self.builder.aux(1)[0])
        self.builder.assert_bool(carry)
        rbytes = []
        for _ in range(4):
            r = lc_var(self.builder.aux(1)[0])
            out = self.builder.lookup(self.t_range, r)
            self.builder.assert_eq(out, r)  # logUp membership => 0<=r<256
            rbytes.append(r)
        self.builder.assert_eq(
            lc_add(word(rbytes), lc_scale(carry, 1 << 32)), s
        )
        return rbytes

    def lrot(self, w, l):
        if l % 8 == 0:
            k = l // 8
            return [w[(i - k) % 4] for i in range(4)]
        # split each byte at bit (8 - s) and recombine: rotate left by s
        # within the byte stream (l = 8*k + s)
        k, s = divmod(l, 8)
        bits = []
        for byte in w:
            bits.extend(self.builder.to_binary(byte, 8))
        rot = bits[-(l % 32):] + bits[: -(l % 32)] if l % 32 else bits
        # bit index i of result = bit (i - l) mod 32 of input
        res = []
        for i in range(4):
            acc = lc_const(0)
            for j in range(8):
                acc = lc_add(acc, lc_scale(rot[8 * i + j], 1 << j))
            res.append(acc)
        return res

    def assert_u32_eq(self, a, b):
        for i in range(4):
            self.builder.assert_eq(a[i], b[i])

    def finalize(self):
        self.builder.finalize_lookups(*self._eta)


def synthesize() -> Builder:
    b = SynthBackend()
    define(b)
    return b.builder


# -------------------------------------------------------------- eval backend


class _EvalTable:
    def __init__(self, values):
        self.values = values
        self.queries = []  # (q_val, out_val)


class EvalBackend:
    """Byte values as python ints; replays the synth allocation schedule,
    appending every allocated variable's value to self.vals."""

    def __init__(self, inputs_bytes: list[int], eta1: int, eta2: int):
        # inputs: in(64) ++ out(64) ++ key(32) ++ counter(4) ++ nonce(12)
        self._inputs = list(inputs_bytes)
        self._cursor = 0
        self.vals: list[int] = []
        self.t_xor = _EvalTable(XOR_TABLE)
        self.t_range = _EvalTable(RANGE_TABLE)
        self._eta = (eta1 % P_FR, eta2 % P_FR)

    def alloc_challenges(self):
        self.vals.extend(self._eta)

    def _next_u32(self):
        bs = self._inputs[self._cursor : self._cursor + 4]
        self._cursor += 4
        self.vals.extend(bs)
        return bs

    pub_u32 = _next_u32
    sec_u32 = _next_u32

    def const_u32(self, u32: int):
        return [(u32 >> (8 * i)) & 0xFF for i in range(4)]

    def _xor8(self, a, b):
        q = a + 256 * b
        x = a ^ b
        # builder.lookup materializes the compound q into its own wire,
        # then allocates the out wire
        self.vals.append(q)
        self.vals.append(x)
        self.t_xor.queries.append((q, x))
        return x

    def xor32(self, a, b):
        return [self._xor8(a[i], b[i]) for i in range(4)]

    def add32(self, a, b):
        word = lambda w: sum(w[i] << (8 * i) for i in range(4))  # noqa: E731
        s = word(a) + word(b)
        carry = s >> 32
        self.vals.append(carry)
        rbytes = []
        for i in range(4):
            r = (s >> (8 * i)) & 0xFF
            self.vals.append(r)  # the aux byte
            self.vals.append(r)  # the lookup out wire
            self.t_range.queries.append((r, r))
            rbytes.append(r)
        return rbytes

    def lrot(self, w, l):
        if l % 8 == 0:
            k = l // 8
            return [w[(i - k) % 4] for i in range(4)]
        for byte in w:
            self.vals.extend((byte >> j) & 1 for j in range(8))
        v = sum(w[i] << (8 * i) for i in range(4))
        v = ((v << l) | (v >> (32 - l))) & 0xFFFFFFFF
        return [(v >> (8 * i)) & 0xFF for i in range(4)]

    def assert_u32_eq(self, a, b):
        pass

    def finalize(self):
        eta1, eta2 = self._eta
        for table in (self.t_xor, self.t_range):
            counts = {}
            for q, out in table.queries:
                prod = eta2 * out % P_FR
                self.vals.append(prod)
                denom = (eta1 - (q + prod)) % P_FR
                self.vals.append(pow(denom, -1, P_FR))
                counts[q] = counts.get(q, 0) + 1
            for j, tv in enumerate(table.values):
                m = counts.get(j, 0)
                self.vals.append(m)
                gden = (eta1 - (j + eta2 * tv)) % P_FR
                g = m * pow(gden, -1, P_FR) % P_FR if m else 0
                self.vals.append(g)


def witness(
    key: bytes, counter: int, nonce: bytes, pt: bytes, ct: bytes,
    eta1: int, eta2: int,
) -> list[int]:
    """Full witness as ints.  In/Out carry the pt/ct byte streams BE-packed
    per word (chacha_test.go:92 BytesToUint32BE; a uints.U32 with value
    v stores bytes little-endian, so each 4-byte group appears reversed).
    Key/Counter/Nonce are LE words = plain byte order."""

    def be_groups(bs):
        out = []
        for i in range(0, len(bs), 4):
            out.extend(reversed(bs[i : i + 4]))
        return out

    inputs = (
        be_groups(list(pt)) + be_groups(list(ct)) + list(key)
        + list(counter.to_bytes(4, "little")) + list(nonce)
    )
    eb = EvalBackend(inputs, eta1, eta2)
    define(eb)
    return [1] + eb.vals
