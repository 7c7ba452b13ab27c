"""ChaCha20 word-level circuit (reference legacy circuit "chachaV2").

Re-owns /root/reference/circuits/chachaV2/{circuit.go,round.go} semantics
(SURVEY.md §2.1 C2 — the manual-bit-decomposition experiment that preceded
the production V3):
  * state words are single field variables (circuit.go:10-16);
  * add32 = Add -> ToBinary(33) -> FromBinary(bits[:32]), dropping the
    carry (round.go:35-40);
  * xorRot32 = ToBinary BOTH operands (even when one was just decomposed —
    V2 re-decomposes every time, which is exactly why V3 replaced it),
    per-bit Xor, recombine with rotated weights (round.go:54-66); xor32 is
    the rot=0 case (round.go:42-52);
  * Serialize/repackLSB: byte-swap recombination via bitslice.Partition
    (round.go:89-113) — synthesized here as one ToBinary(32) + a free LC
    byte repack (same value contract, one allocation schedule);
  * publics: In[16], Out[16] ONLY; Key[8], Counter, Nonce[3] are secret
    (circuit.go:9-16 — unlike V3, Counter/Nonce carry no public tag);
  * Blocks = 1, with the trailing counter increment the reference performs
    even for the last block (circuit.go:50).

Like chacha_v3, the circuit body is written once over an abstract backend
and executed twice: SynthBackend emits constraints, EvalBackend replays the
identical allocation schedule over concrete uint words — that replay IS the
witness solver.  Legacy circuit: host-side solver only (no jit path; the
production prover uses V3).
"""

from __future__ import annotations

from ..r1cs.builder import Builder, lc_add, lc_const, lc_scale, lc_var
from .chacha_v3 import CHACHA_CONSTS, QR_SCHEDULE

BITS = 32
MASK = 0xFFFFFFFF


def _qr(b, st, i, j, k, l):
    a_, b_, c_, d_ = st[i], st[j], st[k], st[l]
    a_ = b.add32(a_, b_)
    d_ = b.xor_rot32(d_, a_, 16)
    c_ = b.add32(c_, d_)
    b_ = b.xor_rot32(b_, c_, 12)
    a_ = b.add32(a_, b_)
    d_ = b.xor_rot32(d_, a_, 8)
    c_ = b.add32(c_, d_)
    b_ = b.xor_rot32(b_, c_, 7)
    st[i], st[j], st[k], st[l] = a_, b_, c_, d_


def define(b):
    inp = [b.pub_word() for _ in range(16)]
    out = [b.pub_word() for _ in range(16)]
    key = [b.sec_word() for _ in range(8)]
    counter = b.sec_word()
    nonce = [b.sec_word() for _ in range(3)]

    state = [b.const_word(c) for c in CHACHA_CONSTS] + key + [counter] + nonce
    work = list(state)
    for _ in range(10):
        for idx in QR_SCHEDULE:
            _qr(b, work, *idx)
    # Round's final fold (round.go:82-85)
    state = [b.add32(state[i], work[i]) for i in range(16)]
    keystream = [b.repack_lsb(w) for w in state]
    ct = [b.xor32(inp[i], keystream[i]) for i in range(16)]
    for i in range(16):
        b.assert_words_equal(out[i], ct[i])
    # trailing counter increment, emitted even for the last block
    # (circuit.go:50) — dead wires but part of the reference's shape
    b.add32(counter, b.const_word(1))


# ------------------------------------------------------------- synth backend


class SynthBackend:
    """Words are single LCs over field variables."""

    def __init__(self):
        self.builder = Builder()

    def pub_word(self):
        return lc_var(self.builder.pub(1)[0])

    def sec_word(self):
        return lc_var(self.builder.secret(1)[0])

    def const_word(self, u32: int):
        return lc_const(u32)

    def add32(self, a, b):
        bits = self.builder.to_binary(lc_add(a, b), BITS + 1)
        return Builder.from_binary(bits[:BITS])

    def _xor_bits(self, a, b):
        abits = self.builder.to_binary(a, BITS)
        bbits = self.builder.to_binary(b, BITS)
        return [self.builder.xor(abits[i], bbits[i]) for i in range(BITS)]

    def xor32(self, a, b):
        return Builder.from_binary(self._xor_bits(a, b))

    def xor_rot32(self, a, b, l):
        x = self._xor_bits(a, b)
        acc = lc_const(0)
        for i in range(BITS):
            acc = lc_add(acc, lc_scale(x[i], 1 << ((i + l) % BITS)))
        return acc

    def repack_lsb(self, a):
        bits = self.builder.to_binary(a, BITS)
        acc = lc_const(0)
        for byte in range(4):
            for i in range(8):
                acc = lc_add(
                    acc, lc_scale(bits[byte * 8 + i], 1 << ((3 - byte) * 8 + i))
                )
        return acc

    def assert_words_equal(self, a, b):
        self.builder.assert_eq(a, b)


def synthesize() -> Builder:
    b = SynthBackend()
    define(b)
    return b.builder


# -------------------------------------------------------------- eval backend


class EvalBackend:
    """Words are python ints; replays the synth allocation schedule exactly,
    appending every allocated variable's value to self.vals."""

    def __init__(self, inputs: list[int]):
        self._inputs = list(inputs)  # in(16) ++ out(16) ++ key(8)++ctr++nonce(3)
        self._cursor = 0
        self.vals: list[int] = []

    def _next_input(self):
        w = self._inputs[self._cursor]
        self._cursor += 1
        self.vals.append(w)
        return w

    pub_word = _next_input
    sec_word = _next_input

    def const_word(self, u32: int):
        return u32

    def _push_bits(self, v: int, n: int):
        self.vals.extend((v >> i) & 1 for i in range(n))

    def add32(self, a, b):
        s = a + b
        self._push_bits(s, BITS + 1)
        return s & MASK

    def _xor_bits(self, a, b):
        self._push_bits(a, BITS)
        self._push_bits(b, BITS)
        x = a ^ b
        self._push_bits(x, BITS)
        return x

    def xor32(self, a, b):
        return self._xor_bits(a, b)

    def xor_rot32(self, a, b, l):
        x = self._xor_bits(a, b)
        return ((x << l) | (x >> (BITS - l))) & MASK

    def repack_lsb(self, a):
        self._push_bits(a, BITS)
        return (
            ((a & 0xFF) << 24)
            | ((a & 0xFF00) << 8)
            | ((a >> 8) & 0xFF00)
            | (a >> 24)
        )

    def assert_words_equal(self, a, b):
        pass


def witness(key_words, counter: int, nonce_words, in_words, out_words):
    """Full witness [1, publics..., secrets..., internals...] as ints.

    in/out words are the BE-packed byte-stream words the circuit compares
    (same convention as V3's In/Out; see chacha_v3.bytes_to_words_be)."""
    eb = EvalBackend(
        list(in_words) + list(out_words) + list(key_words) + [counter]
        + list(nonce_words)
    )
    define(eb)
    return [1] + eb.vals
