"""AES-CTR legacy circuit V1 (reference "circuits/aes", SURVEY.md §2.1 C4).

Re-owns /root/reference/circuits/aes/{common.go,aes128.go,aes256.go}
semantics: the legacy pre-lookup AES experiment whose S-box is a naive
256-way IsZero multiplexer (common.go Subw:196-202), with per-bit xor
gadgets and in-circuit key expansion.  Superseded upstream by aesV2
(logderiv lookups — our aes_v2.py); keygen.go never generates keys for V1,
so like upstream it exists as a circuit-tier artifact only.

Shape summary (BLOCKS = 1, aes256.go:14):
  * bytes are single field wires; xor = ToBinary(8) both sides + per-bit
    Xor (common.go VariableXor:185-194);
  * Subw(a) = sum_j IsZero(a - j) * SBOX[j]: 2 constraints per table row
    (common.go:196-202);
  * GF(2^8) doubling for MixColumns: free shifted LC + one conditional
    0x1B fold via the high bit (common.go GaloisMulConst:106-123 — the
    xtime recurrence; our synthesis keeps the constant xor free on bits
    instead of re-decomposing, same values);
  * CTR IV = Nonce(12) || BE(Counter) (common.go createIV:204-210);
    trailing counter increment + 32-bit bound + final
    counter == Counter + BLOCKS binding (aes128.go:50-54);
  * publics: Plaintext, Ciphertext (common.go:9-10); secrets: Key, Nonce,
    Counter.

Witness = schedule replay (EvalBackend), tests/test_aes_legacy.py checks it
against the NIST CTR oracle and R1CS satisfaction.
"""

from __future__ import annotations

from ..field.params import FR
from ..r1cs.builder import Builder, lc_add, lc_const, lc_scale, lc_sub, lc_var
from .aes_v2 import RCON, SBOX

P_FR = FR.modulus

VARIANTS = {
    "aes-128-ctr": {"key_bytes": 16, "rounds": 10},
    "aes-256-ctr": {"key_bytes": 32, "rounds": 14},
}
BLOCKS = 1


# ------------------------------------------------------------- circuit body


def _subw(b, a):
    """S-box via the 256-way IsZero mux (common.go:196-202)."""
    acc = None
    for j in range(256):
        z = b.is_zero(b.sub_const(a, j))
        term = b.scale(z, SBOX[j])
        acc = term if acc is None else b.add(acc, term)
    return acc


def _xor8(b, x, y):
    return b.from_bits(b.xor_bits(b.to_bits(x), b.to_bits(y)))


def _gmul2(b, a):
    """xtime: (a << 1) & 0xFF, ^0x1B when bit7 set (GaloisMulConst idx=2)."""
    bits = b.to_bits(a)
    shifted = b.from_bits([b.const_bit(0)] + bits[:7])
    folded = b.xor_const_bits([b.const_bit(0)] + bits[:7], 0x1B)
    # a + hi*(tmp - a)  (common.go:120)
    return b.add(shifted, b.mul(bits[7], b.sub(b.from_bits(folded), shifted)))


def _gmul3(b, a):
    return _xor8(b, _gmul2(b, a), a)


def _mix_column(b, col):
    s0, s1, s2, s3 = col
    d = [_gmul2(b, s) for s in col]
    t = [_gmul3(b, s) for s in col]
    o0 = _xor8(b, _xor8(b, d[0], t[1]), _xor8(b, s2, s3))
    o1 = _xor8(b, _xor8(b, s0, d[1]), _xor8(b, t[2], s3))
    o2 = _xor8(b, _xor8(b, s0, s1), _xor8(b, d[2], t[3]))
    o3 = _xor8(b, _xor8(b, t[0], s1), _xor8(b, s2, d[3]))
    return [o0, o1, o2, o3]


def _expand_key(b, key, variant):
    nk = VARIANTS[variant]["key_bytes"] // 4
    rounds = VARIANTS[variant]["rounds"]
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_subw(b, v) for v in t]
            t[0] = b.from_bits(b.xor_const_bits(b.to_bits(t[0]), RCON[i // nk]))
        elif nk > 6 and i % nk == 4:
            t = [_subw(b, v) for v in t]
        w.append([_xor8(b, w[i - nk][j], t[j]) for j in range(4)])
    return [v for word in w for v in word]


def _encrypt_block(b, xk, block, rounds):
    # state s[i] = block[i]: column c = s[4c..4c+3], row r = s[r::4]
    s = [_xor8(b, block[i], xk[i]) for i in range(16)]
    for r in range(1, rounds):
        s = [_subw(b, v) for v in s]
        s = [s[(4 * ((i // 4 + i % 4) % 4)) + i % 4] for i in range(16)]  # ShiftRows
        ns = []
        for c in range(4):
            ns.extend(_mix_column(b, s[4 * c : 4 * c + 4]))
        s = [_xor8(b, ns[i], xk[16 * r + i]) for i in range(16)]
    s = [_subw(b, v) for v in s]
    s = [s[(4 * ((i // 4 + i % 4) % 4)) + i % 4] for i in range(16)]
    return [_xor8(b, s[i], xk[16 * rounds + i]) for i in range(16)]


def define(b, variant: str):
    rounds = VARIANTS[variant]["rounds"]
    nkey = VARIANTS[variant]["key_bytes"]
    pt = [b.pub_byte() for _ in range(BLOCKS * 16)]
    ct = [b.pub_byte() for _ in range(BLOCKS * 16)]
    key = [b.sec_byte() for _ in range(nkey)]
    nonce = [b.sec_byte() for _ in range(12)]
    counter = b.sec_word()

    xk = _expand_key(b, key, variant)
    ctr = counter
    for blk in range(BLOCKS):
        iv_tail = b.word_to_be_bytes(ctr)  # createIV: BE counter bytes
        ks = _encrypt_block(b, xk, nonce + iv_tail, rounds)
        for i in range(16):
            b.assert_eq_vals(ct[blk * 16 + i], _xor8(b, ks[i], pt[blk * 16 + i]))
        ctr = b.inc_word_checked(ctr)  # counter+1, bounded to 32 bits
    b.assert_eq_vals(ctr, b.add(counter, b.const_val(BLOCKS)))


# ------------------------------------------------------------- synth backend


class SynthBackend:
    def __init__(self):
        self.builder = Builder()

    def pub_byte(self):
        return lc_var(self.builder.pub(1)[0])

    def sec_byte(self):
        return lc_var(self.builder.secret(1)[0])

    sec_word = sec_byte

    def const_val(self, v):
        return lc_const(v)

    def const_bit(self, v):
        return lc_const(v)

    # free LC algebra
    def add(self, a, b):
        return lc_add(a, b)

    def sub(self, a, b):
        return lc_sub(a, b)

    def sub_const(self, a, c):
        return lc_sub(a, lc_const(c))

    def scale(self, a, c):
        return lc_scale(a, c)

    def from_bits(self, bits):
        acc = lc_const(0)
        for i, bit in enumerate(bits):
            acc = lc_add(acc, lc_scale(bit, 1 << i))
        return acc

    # allocating ops
    def to_bits(self, a, n=8):
        return self.builder.to_binary(a, n)

    def xor_bits(self, x, y):
        return [self.builder.xor(x[i], y[i]) for i in range(len(x))]

    def xor_const_bits(self, bits, c):
        # xor with a constant flips bits for free: b ^ 1 = 1 - b
        return [
            lc_sub(lc_const(1), bit) if (c >> i) & 1 else bit
            for i, bit in enumerate(bits)
        ]

    def mul(self, a, b):
        return self.builder.mul(a, b)

    def is_zero(self, x):
        """gnark api.IsZero: x*xinv = 1 - z ; x*z = 0."""
        xinv = lc_var(self.builder.aux(1)[0])
        z = lc_var(self.builder.aux(1)[0])
        self.builder.constrain(x, xinv, lc_sub(lc_const(1), z))
        self.builder.constrain(x, z, lc_const(0))
        return z

    def word_to_be_bytes(self, w):
        bits = self.builder.to_binary(w, 32)
        return [self.from_bits(bits[8 * (3 - i) : 8 * (3 - i) + 8]) for i in range(4)]

    def inc_word_checked(self, w):
        nxt = lc_add(w, lc_const(1))
        bits = self.builder.to_binary(nxt, 33)
        self.builder.assert_zero(bits[32])  # AssertIsLessOrEqual MaxUint32
        return self.from_bits(bits[:32])

    def assert_eq_vals(self, a, b):
        self.builder.assert_eq(a, b)


def synthesize(variant: str) -> Builder:
    b = SynthBackend()
    define(b, variant)
    return b.builder


# -------------------------------------------------------------- eval backend


class EvalBackend:
    """Byte/word values as python ints (mod p where signed); replays the
    synth allocation schedule, appending allocated values to self.vals."""

    def __init__(self, inputs: list[int]):
        # pt(16) ++ ct(16) ++ key ++ nonce(12) ++ counter(1 word)
        self._inputs = list(inputs)
        self._cursor = 0
        self.vals: list[int] = []

    def _next(self):
        v = self._inputs[self._cursor]
        self._cursor += 1
        self.vals.append(v)
        return v

    pub_byte = _next
    sec_byte = _next
    sec_word = _next

    def const_val(self, v):
        return v % P_FR

    def const_bit(self, v):
        return v

    def add(self, a, b):
        return (a + b) % P_FR

    def sub(self, a, b):
        return (a - b) % P_FR

    def sub_const(self, a, c):
        return (a - c) % P_FR

    def scale(self, a, c):
        return a * c % P_FR

    def from_bits(self, bits):
        return sum(bit << i for i, bit in enumerate(bits)) % P_FR

    def to_bits(self, a, n=8):
        bits = [(a >> i) & 1 for i in range(n)]
        self.vals.extend(bits)
        return bits

    def xor_bits(self, x, y):
        out = [a ^ b for a, b in zip(x, y)]
        self.vals.extend(out)
        return out

    def xor_const_bits(self, bits, c):
        return [bit ^ ((c >> i) & 1) for i, bit in enumerate(bits)]

    def mul(self, a, b):
        v = a * b % P_FR
        self.vals.append(v)
        return v

    def is_zero(self, x):
        xinv = pow(x, -1, P_FR) if x else 0
        z = 0 if x else 1
        self.vals.append(xinv)
        self.vals.append(z)
        return z

    def word_to_be_bytes(self, w):
        bits = self.to_bits(w, 32)
        return [
            sum(bits[8 * (3 - i) + j] << j for j in range(8)) for i in range(4)
        ]

    def inc_word_checked(self, w):
        nxt = w + 1
        self.to_bits(nxt, 33)
        return nxt & 0xFFFFFFFF

    def assert_eq_vals(self, a, b):
        pass


def witness(variant: str, key: bytes, nonce: bytes, counter: int,
            pt: bytes, ct: bytes) -> list[int]:
    inputs = list(pt) + list(ct) + list(key) + list(nonce) + [counter]
    eb = EvalBackend(inputs)
    define(eb, variant)
    return [1] + eb.vals
