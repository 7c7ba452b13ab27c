"""ChaCha20 bit-level circuit (reference production circuit "chachaV3").

Re-owns /root/reference/circuits/chachaV3/{circuit.go,round.go} semantics:
  * state = 16 words x 32 bits, one variable per bit, LSB first;
  * add32 = FromBinary -> Add -> ToBinary(33) dropping the carry
    (round.go:35-40): 33 booleanity constraints + 1 binding;
  * xor = 1 constraint per bit (round.go:41-45); rotation is free index
    remapping (round.go:54-66); Serialize/repackLSB is free byte rewiring
    (round.go:79-97);
  * public inputs in order Counter, Nonce[3], In[16], Out[16]; secret Key[8]
    (circuit.go:11-17); Blocks = 1 (circuit.go:9).

The circuit is written ONCE over an abstract word-level backend and executed
twice: SynthBackend emits R1CS constraints (offline keygen), EvalBackend runs
the same allocation schedule over batched jnp uint32 words and records every
allocated bit — that IS the witness solver (SURVEY.md §7 Phase 3): a jitted,
vmappable ChaCha20 whose intermediate values land in the exact variable order
the constraints expect.  No generic constraint propagation needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..r1cs.builder import Builder, lc_const, lc_var

CHACHA_CONSTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)

QR_SCHEDULE = (
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
)

BITS = 32


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


def define(b, double_rounds: int = 10, blocks: int = 1):
    """The circuit body, backend-polymorphic (runs for synth AND witness).

    double_rounds: 10 = the production RFC 7539 circuit; smaller values
    give structurally-identical SLICES (used by the multichip dryrun to
    mesh-prove a >=4k-constraint chacha at a compile budget the virtual
    CPU mesh can afford).

    blocks: plaintext length per proof in 64-byte units — the domain analog
    of sequence length (SURVEY.md §5 "long-context"): more blocks = a
    bigger quotient domain and MSMs per proof, the axis the mesh shards.
    The production service keeps the reference's Blocks=1 (circuit.go:9);
    the per-block counter increment the reference leaves commented out
    (circuit.go:62-63) is implemented here because multi-block CTR is
    meaningless without it."""
    counter = b.pub_word()
    nonce = [b.pub_word() for _ in range(3)]
    inp = [b.pub_word() for _ in range(16 * blocks)]
    out = [b.pub_word() for _ in range(16 * blocks)]
    key = [b.sec_word() for _ in range(8)]

    ctr = counter
    for blk in range(blocks):
        state = [b.const_word(c) for c in CHACHA_CONSTS] + key + [ctr] + nonce
        work = list(state)
        for _ in range(double_rounds):
            for idx in QR_SCHEDULE:
                _qr(b, work, *idx)
        final = [b.add32(state[i], work[i]) for i in range(16)]
        keystream = [b.repack_lsb(w) for w in final]
        ct = [b.xor32(inp[16 * blk + i], keystream[i]) for i in range(16)]
        for i in range(16):
            b.assert_words_equal(out[16 * blk + i], ct[i])
        if blk + 1 < blocks:
            ctr = b.add32(ctr, b.const_word(1))


# ------------------------------------------------------------- synth backend


class SynthBackend:
    """Words are lists of 32 LCs (LSB first)."""

    def __init__(self):
        self.builder = Builder()

    def pub_word(self):
        return [lc_var(v) for v in self.builder.pub(BITS)]

    def sec_word(self):
        return [lc_var(v) for v in self.builder.secret(BITS)]

    def const_word(self, u32: int):
        return [lc_const((u32 >> i) & 1) for i in range(BITS)]

    def add32(self, a, b):
        from ..r1cs.builder import lc_add

        val = lc_add(Builder.from_binary(a), Builder.from_binary(b))
        bits = self.builder.to_binary(val, BITS + 1)
        return bits[:BITS]

    def xor32(self, a, b):
        return [self.builder.xor(a[i], b[i]) for i in range(BITS)]

    def xor_rot32(self, a, b, l):
        res = [None] * BITS
        for i in range(BITS):
            res[(i + l) % BITS] = self.builder.xor(a[i], b[i])
        return res

    def repack_lsb(self, a):
        res = [None] * BITS
        for i in range(4):
            for j in range(8):
                res[(3 - i) * 8 + j] = a[i * 8 + j]
        return res

    def assert_words_equal(self, a, b):
        for i in range(BITS):
            self.builder.assert_eq(a[i], b[i])


def synthesize(double_rounds: int = 10, blocks: int = 1):
    b = SynthBackend()
    define(b, double_rounds, blocks)
    return b.builder


# -------------------------------------------------------------- eval backend


def _unpack32(x, nbits=BITS):
    shifts = jnp.arange(nbits, dtype=jnp.uint32)
    return (x[..., None] >> shifts) & jnp.uint32(1)


class EvalBackend:
    """Words are jnp uint32 arrays of shape (batch,).

    Compile-friendly witness recording: instead of unpacking each allocation
    event to bits and concatenating ~700 chunks (a >10k-op trace XLA takes
    minutes on), every event appends ONE word (and add32 additionally one
    carry word).  `witness_bits` then unpacks all words at once and reorders
    into witness-variable order with a single precomputed gather."""

    def __init__(self, counter, nonce, inp, out, key):
        # all uint32 word arrays: counter (B,), nonce (B,3), inp/out (B,16), key (B,8)
        self._inputs = (
            [counter]
            + [nonce[..., i] for i in range(3)]
            + [inp[..., i] for i in range(inp.shape[-1])]
            + [out[..., i] for i in range(out.shape[-1])]
            + [key[..., i] for i in range(8)]
        )
        self._cursor = 0
        self.words = []  # one (B,) uint32 per event
        self.carries = []  # (B,) uint32 in {0,1}, add32 events only
        self.schedule = []  # ("w", event_idx) | ("a", event_idx, carry_idx)

    def _next_input(self):
        w = self._inputs[self._cursor]
        self._cursor += 1
        self.schedule.append(("w", len(self.words)))
        self.words.append(w)
        return w

    pub_word = _next_input
    sec_word = _next_input

    def add32(self, a, b):
        s = a + b  # uint32 wraps mod 2^32
        carry = (s < a).astype(jnp.uint32)
        self.schedule.append(("a", len(self.words), len(self.carries)))
        self.words.append(s)
        self.carries.append(carry)
        return s

    def xor32(self, a, b):
        c = a ^ b
        self.schedule.append(("w", len(self.words)))
        self.words.append(c)
        return c

    def xor_rot32(self, a, b, l):
        x = a ^ b
        self.schedule.append(("w", len(self.words)))
        self.words.append(x)
        return (x << l) | (x >> (BITS - l))

    def repack_lsb(self, a):
        return (
            ((a & 0xFF) << 24)
            | ((a & 0xFF00) << 8)
            | ((a >> 8) & 0xFF00)
            | (a >> 24)
        )

    def assert_words_equal(self, a, b):
        pass


class _ConstLift:
    """Wraps EvalBackend so const_word returns broadcast uint32 arrays,
    keeping `define` fully backend-agnostic."""

    def __init__(self, inner: EvalBackend, batch_shape):
        self._b = inner
        self._shape = batch_shape

    def const_word(self, u32: int):
        return jnp.broadcast_to(jnp.uint32(u32), self._shape)

    def __getattr__(self, name):
        return getattr(self._b, name)


import jax


def _index_map(schedule, n_words: int) -> np.ndarray:
    """Witness position -> flat bit-buffer index.  The bit buffer is
    [all event words unpacked LSB-first (n_words*32)] ++ [all carries]."""
    carry_base = n_words * BITS
    idx = []
    for ev in schedule:
        if ev[0] == "w":
            e = ev[1]
            idx.extend(range(e * BITS, e * BITS + BITS))
        else:  # add32: 32 sum bits then the carry bit (ToBinary(33) order)
            _, e, c = ev
            idx.extend(range(e * BITS, e * BITS + BITS))
            idx.append(carry_base + c)
    return np.asarray(idx, dtype=np.int32)


import functools


@functools.partial(jax.jit, static_argnames=("double_rounds", "blocks"))
def witness_bits(counter, nonce, inp, out, key, double_rounds: int = 10,
                 blocks: int = 1):
    """Run the circuit over batched word inputs; return (batch, num_vars)
    uint32 0/1 witness (z[0]=1 included), in variable-index order."""
    eb = EvalBackend(counter, nonce, inp, out, key)
    b = _ConstLift(eb, counter.shape)
    define(b, double_rounds, blocks)
    W = jnp.stack(eb.words, axis=-1)  # (B, E)
    bits = _unpack32(W).reshape(counter.shape + (len(eb.words) * BITS,))
    flat = jnp.concatenate([bits, jnp.stack(eb.carries, axis=-1)], axis=-1)
    wit = jnp.take(flat, jnp.asarray(_index_map(eb.schedule, len(eb.words))), axis=-1)
    ones = jnp.ones(counter.shape + (1,), dtype=jnp.uint32)
    return jnp.concatenate([ones, wit], axis=-1)


# --------------------------------------------------------------- cipher (jnp)


def chacha_block_words_reduced(key, counter, nonce, double_rounds: int):
    """Reduced-round block function (dryrun slice oracle, host numpy)."""
    import numpy as _np

    def rotl(x, n):
        return ((x << _np.uint64(n)) | (x >> _np.uint64(32 - n))) & _np.uint64(
            0xFFFFFFFF
        )

    st = [_np.uint64(c) for c in CHACHA_CONSTS]
    st += [_np.uint64(k) for k in key] + [_np.uint64(counter)]
    st += [_np.uint64(x) for x in nonce]
    w = list(st)

    def qr(w, a, b, c, d):
        w[a] = (w[a] + w[b]) & _np.uint64(0xFFFFFFFF)
        w[d] = rotl(w[d] ^ w[a], 16)
        w[c] = (w[c] + w[d]) & _np.uint64(0xFFFFFFFF)
        w[b] = rotl(w[b] ^ w[c], 12)
        w[a] = (w[a] + w[b]) & _np.uint64(0xFFFFFFFF)
        w[d] = rotl(w[d] ^ w[a], 8)
        w[c] = (w[c] + w[d]) & _np.uint64(0xFFFFFFFF)
        w[b] = rotl(w[b] ^ w[c], 7)

    for _ in range(double_rounds):
        for idx in QR_SCHEDULE:
            qr(w, *idx)
    return [int((w[i] + st[i]) & _np.uint64(0xFFFFFFFF)) for i in range(16)]


@jax.jit
def chacha20_block_words(key, counter, nonce):
    """Plain jnp ChaCha20 block function over uint32 words (the native-cipher
    step of the prover, reference analog provers.go:93-101).  key (B,8),
    counter (B,), nonce (B,3) -> keystream words (B,16) in LE word order.

    Jitted at module level: un-jitted, its ~800 tiny ops dispatch eagerly —
    ~130-260 ms per op over a tunneled TPU (measured 200-330 s total, which
    single-handedly blew the round-3 bench budget)."""

    def rotl(x, n):
        return (x << n) | (x >> (32 - n))

    consts = [jnp.broadcast_to(jnp.uint32(c), counter.shape) for c in CHACHA_CONSTS]
    st = consts + [key[..., i] for i in range(8)] + [counter] + [nonce[..., i] for i in range(3)]
    w = list(st)

    def qr(w, i, j, k, l):
        a, b, c, d = w[i], w[j], w[k], w[l]
        a = a + b
        d = rotl(d ^ a, 16)
        c = c + d
        b = rotl(b ^ c, 12)
        a = a + b
        d = rotl(d ^ a, 8)
        c = c + d
        b = rotl(b ^ c, 7)
        w[i], w[j], w[k], w[l] = a, b, c, d

    for _ in range(10):
        for idx in QR_SCHEDULE:
            qr(w, *idx)
    return jnp.stack([st[i] + w[i] for i in range(16)], axis=-1)


# ------------------------------------------------------------ byte packing


def bytes_to_words_be(data: bytes) -> np.ndarray:
    """utils/bytes.go:11-21 BytesToUint32BEBits word step (bit expansion is
    LSB-first and happens inside the witness stream)."""
    assert len(data) % 4 == 0
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)


def bytes_to_words_le(data: bytes) -> np.ndarray:
    assert len(data) % 4 == 0
    return np.frombuffer(data, dtype="<u4").astype(np.uint32)


def words_to_bytes_be(words: np.ndarray) -> bytes:
    return np.asarray(words, dtype=np.uint32).astype(">u4").tobytes()


def words_to_bytes_le(words: np.ndarray) -> bytes:
    return np.asarray(words, dtype=np.uint32).astype("<u4").tobytes()
