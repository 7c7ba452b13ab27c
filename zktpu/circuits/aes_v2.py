"""AES-128/256-CTR lookup-table circuit (reference production circuit "aesV2").

Re-owns /root/reference/circuits/aesV2/{common.go,aes128.go,aes256.go,tables.go}
semantics:

  * byte-valued state; five log-derivative lookup tables: sbox + 4 T-tables
    fusing SubBytes o MixColumns (common.go:28-39); tables here are DERIVED
    from the AES definition (GF(2^8) inverse + affine map), not copied;
  * round = 4x XorSubWords: four T-lookups + 32-bit XOR with the round key
    (common.go:68-98); final round via ShiftSub with the shifted byte order
    (common.go:100-106, tables.go:159);
  * CTR: counterBlock = nonce(12) || BE(counter); per-block counter increment
    with a 32-bit range check; final counter == Counter + BLOCKS
    (aes128.go:41-53, common.go:113-120);
  * key expansion in-circuit with sbox lookups (aes128.go:106-148,
    aes256.go:93-140) — expanded ONCE per proof (the reference re-expands per
    block; same relation, fewer constraints); decomposed bytes keep their bit
    wires cached instead of re-splitting at every XOR (same soundness, fewer
    booleanity rows than the reference's VariableXor);
  * public inputs: Nonce(12) Counter(1) Plaintext(64) Ciphertext(64)
    (common.go:10-16) plus two lookup challenges; secret: Key bytes.

The circuit body runs over two backends (chachaV3 pattern): SynthBackend
emits R1CS + lookup metadata; EvalBackend runs batched jnp and records every
allocated wire in identical order.  Lookup inverse wires need the commitment
challenge, so the eval runs twice (phase 1 with eta=0 to fix the committed
wires, phase 2 with the real challenges).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jnp_field import JnpField
from ..field.params import FR, NLIMBS, P_FR
from ..r1cs.builder import Builder, lc_add, lc_const, lc_sub, lc_var

BLOCKS = 4
F = JnpField(FR)

# --------------------------------------------------------------- AES tables
# Derived from the AES definition: S(x) = affine(x^-1 in GF(2^8)/0x11b).


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _make_sbox():
    inv = [0] * 256
    for x in range(1, 256):
        y = 1
        while _gf_mul(x, y) != 1:
            y += 1
        inv[x] = y
    sbox = []
    for x in range(256):
        i = inv[x]
        s = i
        for k in range(1, 5):
            s ^= ((i << k) | (i >> (8 - k))) & 0xFF
        sbox.append(s ^ 0x63)
    return sbox


SBOX = _make_sbox()
assert SBOX[0x00] == 0x63 and SBOX[0x53] == 0xED and SBOX[0xFF] == 0x16

# T-tables packed LSB-first to match XorSubWords' bit slicing
# (newWord[k] = FromBinary(t[8k:8k+8]), common.go:92-97):
T_TABLES = []
for rot in range(4):
    col = []
    for x in range(256):
        s = SBOX[x]
        row = [_gf_mul(s, 2), s, s, _gf_mul(s, 3)]
        row = row[-rot:] + row[:-rot] if rot else row
        col.append(row[0] | (row[1] << 8) | (row[2] << 16) | (row[3] << 24))
    T_TABLES.append(col)
assert T_TABLES[0][0] == 0xA56363C6  # cross-check against the AES spec packing

RCON = [0x8D, 0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]
BYTE_ORDER = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]

VARIANTS = {
    "aes-128-ctr": dict(key_bytes=16, rounds=10),
    "aes-256-ctr": dict(key_bytes=32, rounds=14),
}


@dataclasses.dataclass
class Val:
    """Circuit value with an optional cached bits handle.  compound=True
    means the handle is a recomposed LC (lookups must materialize it) — a
    structural property, identical across backends."""

    h: object
    bits: object = None
    nbits: int = 8
    compound: bool = False


# ------------------------------------------------------------ synth backend


class SynthBackend:
    def __init__(self):
        self.builder = Builder()
        self.tables = None  # created after public allocation (no constraint)

    def make_tables(self):
        self.tables = [self.builder.add_table(SBOX)] + [
            self.builder.add_table(t) for t in T_TABLES
        ]

    def pub_byte(self):
        return Val(lc_var(self.builder.pub(1)[0]))

    def sec_byte(self):
        return Val(lc_var(self.builder.secret(1)[0]))

    def pub_value(self, nbits):
        return Val(lc_var(self.builder.pub(1)[0]), nbits=nbits)

    def challenge(self):
        return self.builder.challenge()

    def get_bits(self, v: Val):
        if v.bits is None:
            v.bits = self.builder.to_binary(v.h, v.nbits)
        return v.bits

    def xor_bits(self, a_bits, b_bits):
        return [self.builder.xor(a, b) for a, b in zip(a_bits, b_bits)]

    def xor_bits_const(self, bits, const: int):
        return [
            lc_sub(lc_const(1), b) if (const >> i) & 1 else b
            for i, b in enumerate(bits)
        ]

    @staticmethod
    def slice_bits(bits, lo, hi):
        return bits[lo:hi]

    @staticmethod
    def concat_bits(parts):
        out = []
        for p in parts:
            out.extend(p)
        return out

    def from_bits(self, bits) -> Val:
        return Val(Builder.from_binary(bits), bits=bits, nbits=len(bits), compound=True)

    def lookup(self, table_idx: int, v: Val, out_bits: int) -> Val:
        out = self.builder.lookup(self.tables[table_idx], v.h)
        return Val(out, nbits=out_bits)

    def add_const(self, v: Val, k: int) -> Val:
        return Val(lc_add(v.h, lc_const(k)), nbits=v.nbits, compound=True)

    def range_check(self, v: Val, nbits: int) -> Val:
        bits = self.builder.to_binary(v.h, nbits)
        return Val(v.h, bits=bits, nbits=nbits, compound=v.compound)

    def assert_equal(self, a: Val, b: Val):
        self.builder.assert_eq(a.h, b.h)

    def finalize(self, eta1, eta2):
        self.builder.finalize_lookups(eta1, eta2)


# ------------------------------------------------------------- eval backend


def _widen(v):
    """(...,) uint32 -> (..., 16) canonical limbs."""
    out = jnp.zeros(v.shape + (NLIMBS,), jnp.uint32)
    out = out.at[..., 0].set(v & 0xFFFF)
    return out.at[..., 1].set(v >> 16)


def _unpack(v, nbits):
    return (v[:, None] >> jnp.arange(nbits, dtype=jnp.uint32)) & jnp.uint32(1)


class EvalBackend:
    """Value handles: (B,) uint32.  Bits handles: (B, n) 0/1 uint32.
    Witness chunks recorded in allocation order."""

    def __init__(self, pubs, secrets, eta1_can, eta2_can):
        self._pub_queue = list(pubs)
        self._sec_queue = list(secrets)
        self._etas = [eta1_can, eta2_can]  # (B, 16) canonical limbs each
        self.chunks = []  # ("small", (B,k)) | ("field", (B,k,16))
        self.tables_np = [jnp.asarray(np.array(SBOX, np.uint32))] + [
            jnp.asarray(np.array(t, np.uint32)) for t in T_TABLES
        ]
        self.table_vals = [SBOX] + T_TABLES
        self.queries = [[] for _ in range(5)]

    def make_tables(self):
        pass

    def pub_byte(self):
        v = self._pub_queue.pop(0)
        self.chunks.append(("small", v[:, None]))
        return Val(v)

    sec_byte = None  # assigned below

    def _sec_byte(self):
        v = self._sec_queue.pop(0)
        self.chunks.append(("small", v[:, None]))
        return Val(v)

    def pub_value(self, nbits):
        v = self._pub_queue.pop(0)
        self.chunks.append(("small", v[:, None]))
        return Val(v, nbits=nbits)

    def challenge(self):
        eta = self._etas.pop(0)
        self.chunks.append(("field", eta[:, None, :]))
        return eta

    def get_bits(self, v: Val):
        if v.bits is None:
            bits = _unpack(v.h, v.nbits)
            self.chunks.append(("small", bits))
            v.bits = bits
        return v.bits

    def xor_bits(self, a_bits, b_bits):
        x = a_bits ^ b_bits
        self.chunks.append(("small", x))
        return x

    def xor_bits_const(self, bits, const: int):
        mask = jnp.asarray(
            [(const >> i) & 1 for i in range(bits.shape[1])], dtype=jnp.uint32
        )
        return bits ^ mask

    @staticmethod
    def slice_bits(bits, lo, hi):
        return bits[:, lo:hi]

    @staticmethod
    def concat_bits(parts):
        return jnp.concatenate(parts, axis=1)

    def from_bits(self, bits) -> Val:
        n = bits.shape[1]
        weights = (jnp.uint32(1) << jnp.arange(n, dtype=jnp.uint32))[None, :]
        v = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)
        return Val(v, bits=bits, nbits=n, compound=True)

    def lookup(self, table_idx: int, v: Val, out_bits: int) -> Val:
        if v.compound:
            self.chunks.append(("small", v.h[:, None]))  # materialized q wire
        out = jnp.take(self.tables_np[table_idx], v.h, axis=0)
        self.chunks.append(("small", out[:, None]))
        self.queries[table_idx].append((v.h, out))
        return Val(out, nbits=out_bits)

    def add_const(self, v: Val, k: int) -> Val:
        return Val(v.h + jnp.uint32(k), nbits=v.nbits, compound=True)

    def range_check(self, v: Val, nbits: int) -> Val:
        bits = _unpack(v.h, nbits)
        self.chunks.append(("small", bits))
        return Val(v.h, bits=bits, nbits=nbits, compound=v.compound)

    def assert_equal(self, a: Val, b: Val):
        pass

    def finalize(self, eta1_can, eta2_can):
        eta1 = F.to_mont(eta1_can)  # (B, 16)
        eta2 = F.to_mont(eta2_can)
        for tidx in range(5):
            qs = self.queries[tidx]
            if not qs:
                continue
            q = jnp.stack([p[0] for p in qs], axis=1)  # (B, L)
            out = jnp.stack([p[1] for p in qs], axis=1)
            out_m = F.to_mont(_widen(out))
            prod_m = F.mont_mul(eta2[:, None, :], out_m)  # (B, L, 16)
            prod_can = F.from_mont(prod_m)
            denom = F.sub(F.sub(eta1_can[:, None, :], _widen(q)), prod_can)
            f_can = F.from_mont(F.batch_inv(F.to_mont(denom)))
            interleaved = jnp.stack([prod_can, f_can], axis=2)  # (B, L, 2, 16)
            self.chunks.append(
                ("field", interleaved.reshape(q.shape[0], -1, NLIMBS))
            )
            tvals = self.table_vals[tidx]
            nentries = len(tvals)
            m = jnp.sum(
                q[:, :, None] == jnp.arange(nentries, dtype=jnp.uint32)[None, None, :],
                axis=1,
                dtype=jnp.uint32,
            )  # (B, nentries)
            # g_j = m_j / (eta1 - (j + eta2 * T_j))
            tv = _widen(jnp.asarray(np.array(tvals, np.uint32)))  # (n, 16)
            tden = F.sub(
                F.sub(eta1_can[:, None, :], _widen(jnp.arange(nentries, dtype=jnp.uint32))[None]),
                F.from_mont(F.mont_mul(eta2[:, None, :], F.to_mont(tv)[None])),
            )  # (B, n, 16)
            g_m = F.mont_mul(F.batch_inv(F.to_mont(tden)), F.to_mont(_widen(m)))
            g_can = F.from_mont(g_m)
            mg = jnp.stack([_widen(m), g_can], axis=2)  # (B, n, 2, 16)
            self.chunks.append(("field", mg.reshape(q.shape[0], -1, NLIMBS)))

    def witness(self):
        """Assemble (B, nv, 16) canonical-limb witness (z[0]=1 included)."""
        batch = self.chunks[0][1].shape[0]
        parts = [_widen(jnp.ones((batch, 1), jnp.uint32))]
        for kind, arr in self.chunks:
            parts.append(_widen(arr) if kind == "small" else arr)
        return jnp.concatenate(parts, axis=1)


EvalBackend.sec_byte = EvalBackend._sec_byte


# ------------------------------------------------------------- circuit body


def _var_xor(b, x: Val, y: Val) -> Val:
    return b.from_bits(b.xor_bits(b.get_bits(x), b.get_bits(y)))


def _expand_key(b, key, variant):
    nk = VARIANTS[variant]["key_bytes"]
    rounds = VARIANTS[variant]["rounds"]
    total = (rounds + 1) * 16
    expand = list(key)
    i = nk
    while i < total:
        t = expand[i - 4 : i]
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [b.lookup(0, v, 8) for v in t]
            t = [
                b.from_bits(b.xor_bits_const(b.get_bits(t[0]), RCON[i // nk]))
            ] + t[1:]
        elif nk == 32 and i % nk == 16:
            t = [b.lookup(0, v, 8) for v in t]
        for j in range(4):
            expand.append(_var_xor(b, expand[i - nk + j], t[j]))
        i += 4
    return expand


def _xor_sub_words(b, sa, sb, sc, sd, xk4):
    tt = [
        b.lookup(1, sa, 32),
        b.lookup(2, sb, 32),
        b.lookup(3, sc, 32),
        b.lookup(4, sd, 32),
    ]
    bits = [b.get_bits(t) for t in tt]
    kbits = b.concat_bits([b.get_bits(k) for k in xk4])
    t = b.xor_bits(bits[0], bits[1])
    t = b.xor_bits(t, bits[2])
    t = b.xor_bits(t, bits[3])
    t = b.xor_bits(t, kbits)
    return [b.from_bits(b.slice_bits(t, 8 * k, 8 * k + 8)) for k in range(4)]


def _encrypt(b, xk, iv_bytes, variant):
    rounds = VARIANTS[variant]["rounds"]
    state = [_var_xor(b, xk[i], iv_bytes[i]) for i in range(16)]
    for r in range(1, rounds):
        k = r * 16
        cols = [
            _xor_sub_words(b, state[0], state[5], state[10], state[15], xk[k : k + 4]),
            _xor_sub_words(b, state[4], state[9], state[14], state[3], xk[k + 4 : k + 8]),
            _xor_sub_words(b, state[8], state[13], state[2], state[7], xk[k + 8 : k + 12]),
            _xor_sub_words(b, state[12], state[1], state[6], state[11], xk[k + 12 : k + 16]),
        ]
        state = [v for col in cols for v in col]
    sub = [b.lookup(0, state[BYTE_ORDER[i]], 8) for i in range(16)]
    k = rounds * 16
    return [_var_xor(b, sub[i], xk[k + i]) for i in range(16)]


def define(b, variant: str):
    nonce = [b.pub_byte() for _ in range(12)]
    counter = b.pub_value(32)
    pt = [b.pub_byte() for _ in range(BLOCKS * 16)]
    ct = [b.pub_byte() for _ in range(BLOCKS * 16)]
    eta1 = b.challenge()
    eta2 = b.challenge()
    key = [b.sec_byte() for _ in range(VARIANTS[variant]["key_bytes"])]
    b.make_tables()

    xk = _expand_key(b, key, variant)
    ctr = counter
    for blk in range(BLOCKS):
        cbits = b.get_bits(ctr)  # 32 bits of the current counter
        iv = list(nonce)
        for i in range(4):
            iv.append(None)
        for i in range(4):
            # iv[15-i] = FromBinary(counterBits[8i:8i+8]) (common.go:113-120)
            iv[15 - i] = b.from_bits(b.slice_bits(cbits, 8 * i, 8 * i + 8))
        ks = _encrypt(b, xk, iv, variant)
        for i in range(16):
            b.assert_equal(_var_xor(b, ks[i], pt[blk * 16 + i]), ct[blk * 16 + i])
        ctr = b.add_const(ctr, 1)
        ctr = b.range_check(ctr, 32)  # AssertIsLessOrEqual(counter, MaxUint32)
    b.assert_equal(ctr, b.add_const(counter, BLOCKS))
    b.finalize(eta1, eta2)


def synthesize(variant: str) -> Builder:
    b = SynthBackend()
    define(b, variant)
    return b.builder


# --------------------------------------------------- witness generation (jnp)


def witness_canonical(variant, nonce_b, counter, pt_b, ct_b, key_b, eta1_can, eta2_can):
    """Batched witness: nonce_b (B,12), counter (B,), pt_b/ct_b (B,64),
    key_b (B,K) uint32 byte arrays; eta*_can (B,16) canonical limbs.
    Returns (B, nv, 16) canonical limbs."""
    pubs = (
        [nonce_b[:, i] for i in range(12)]
        + [counter]
        + [pt_b[:, i] for i in range(BLOCKS * 16)]
        + [ct_b[:, i] for i in range(BLOCKS * 16)]
    )
    secrets = [key_b[:, i] for i in range(VARIANTS[variant]["key_bytes"])]
    eb = EvalBackend(pubs, secrets, eta1_can, eta2_can)
    define(eb, variant)
    return eb.witness()


# --------------------------------------------------------- python AES oracle


def aes_ctr_encrypt(key: bytes, nonce: bytes, counter: int, pt: bytes) -> bytes:
    """Pure-Python AES-CTR (native-cipher step, reference analog
    provers.go:184-192: crypto/aes + cipher.NewCTR, IV = nonce || BE counter)."""
    nk = len(key) // 4
    rounds = {4: 10, 8: 14}[nk]
    # key expansion (bytes, FIPS-197)
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [SBOX[x] for x in t]
            t[0] ^= RCON[i // nk]
        elif nk > 6 and i % nk == 4:
            t = [SBOX[x] for x in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    xk = [b for word in w for b in word]

    def encrypt_block(block: bytes) -> bytes:
        s = [block[i] ^ xk[i] for i in range(16)]
        for r in range(1, rounds):
            ns = [0] * 16
            for c in range(4):
                a, bb, cc, dd = (
                    s[(4 * c + 0) % 16],
                    s[(4 * c + 5) % 16],
                    s[(4 * c + 10) % 16],
                    s[(4 * c + 15) % 16],
                )
                t = (
                    T_TABLES[0][a]
                    ^ T_TABLES[1][bb]
                    ^ T_TABLES[2][cc]
                    ^ T_TABLES[3][dd]
                )
                for k in range(4):
                    ns[4 * c + k] = ((t >> (8 * k)) & 0xFF) ^ xk[16 * r + 4 * c + k]
            s = ns
        out = [SBOX[s[BYTE_ORDER[i]]] ^ xk[16 * rounds + i] for i in range(16)]
        return bytes(out)

    ks = b""
    for blk in range(-(-len(pt) // 16)):
        iv = nonce + ((counter + blk) & 0xFFFFFFFF).to_bytes(4, "big")
        ks += encrypt_block(iv)
    return bytes(a ^ b for a, b in zip(pt, ks))
