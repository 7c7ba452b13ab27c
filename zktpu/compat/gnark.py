"""gnark / gnark-crypto byte-format compatibility (SURVEY.md §7 Phase 5).

Re-owns the serialization formats of the reference's artifacts so the TPU
framework can consume the exact files the reference ships and emit proofs its
clients can verify:

  * pk / r1cs are loaded at runtime by the reference prover
    (/root/reference/libraries/prover/impl/prove_impl.go:86-107);
  * vk files are embedded into the reference verifier
    (/root/reference/libraries/verifier/impl/verify_impl.go:24-31);
  * proofs cross the wire via proof.WriteTo bytes inside the JSON payload
    (/root/reference/libraries/prover/impl/provers.go:152-157).

The formats were reverse-engineered from the checked-in artifacts
(/root/reference/circuits/generated/{pk,r1cs}.chacha20,
/root/reference/libraries/verifier/impl/generated/vk.*) and the README example
proof (/root/reference/README.md:44-50); every layout claim below is pinned by
tests/test_gnark_compat.py against those files.

Point encoding (gnark-crypto BN254 marshal conventions):
  * field elements: 32-byte big-endian canonical integers;
  * G1 compressed: X with 2-bit flag in the top bits of byte 0 —
    0b10<<6 = compressed & y is NOT lexicographically largest,
    0b11<<6 = compressed & y IS lexicographically largest,
    0b01<<6 = point at infinity (remaining bytes zero),
    0b00<<6 = uncompressed (64 bytes X || Y);
  * G2: same flags; X serialized as X.A1 || X.A0 (64 bytes compressed);
  * "lexicographically largest" for Fp: y > (p-1)/2; for Fp2: decided by A1
    unless A1 == 0, then by A0.

Verified layouts:

  proof (164 B for pure R1CS, +32 B per commitment):
      Ar G1c | Bs G2c | Krs G1c | u32 nbCommitments | commitments G1c... |
      commitmentPok G1c
  vk:
      alpha G1c | beta G1c | beta G2c | gamma G2c | delta G1c | delta G2c |
      u32 nbK | K[nbK] G1c | u32 nbCommitments |
      per commitment: u32 nbCommitted | u32[...] committed-wire ids |
      if nbCommitments > 0: u32 nbPedersenVks |
      per pedersen vk: G G2c | GRootSigmaNeg G2c
  pk:
      u64 domainCardinality | fr cardinalityInv | fr generator |
      fr generatorInv | fr frMultiplicativeGen | fr frMultiplicativeGenInv |
      u8 withPrecompute-bool |
      G1c alpha | G1c beta | G1c delta |
      u32 lenA  | A[lenA]  G1c      (infinity entries COMPACTED OUT)
      u32 lenB  | B[lenB]  G1c      (compacted)
      u32 lenZ  | Z[lenZ]  G1c      (n-1 points, [tau^k Z(tau)/delta]1)
      u32 lenK  | K[lenK]  G1c      (private-wire delta-basis points)
      G2c beta | G2c delta | u32 lenB2 | B2[lenB2] G2c  (compacted)
      u64 nbWires | u64 nbInfinityA | u64 nbInfinityB |
      bool[nbWires] infinityA | bool[nbWires] infinityB |
      u32 nbCommitmentKeys | per key: G1c basis... (pedersen pk)
"""

from __future__ import annotations

import dataclasses
import struct

from ..curve import ref_ec as ec
from ..field.params import P_FP, P_FR

P = P_FP
_HALF_P = (P - 1) // 2

FLAG_MASK = 0b11 << 6
FLAG_UNCOMPRESSED = 0b00 << 6
FLAG_INFINITY = 0b01 << 6
FLAG_COMPRESSED_SMALLEST = 0b10 << 6
FLAG_COMPRESSED_LARGEST = 0b11 << 6


class GnarkDecodeError(ValueError):
    pass


# ------------------------------------------------------------ field helpers


def _sqrt_fp(a: int):
    """sqrt mod p (p = 3 mod 4); returns None if a is not a QR."""
    a %= P
    r = pow(a, (P + 1) // 4, P)
    return r if r * r % P == a else None


def _sqrt_fp2(a0: int, a1: int):
    """sqrt in Fp2 = Fp[u]/(u^2+1); returns (c0, c1) or None."""
    if a1 == 0:
        r = _sqrt_fp(a0)
        if r is not None:
            return (r, 0)
        # a0 = -(c1^2): sqrt is purely imaginary
        r = _sqrt_fp(-a0 % P)
        return None if r is None else (0, r)
    norm = (a0 * a0 + a1 * a1) % P
    d = _sqrt_fp(norm)
    if d is None:
        return None
    inv2 = pow(2, -1, P)
    t = (a0 + d) * inv2 % P
    x0 = _sqrt_fp(t)
    if x0 is None:
        t = (a0 - d) % P * inv2 % P
        x0 = _sqrt_fp(t)
        if x0 is None:
            return None
    x1 = a1 * pow(2 * x0 % P, -1, P) % P
    return (x0, x1)


def _lex_largest_fp(y: int) -> bool:
    return y > _HALF_P


def _lex_largest_fp2(y0: int, y1: int) -> bool:
    if y1 != 0:
        return _lex_largest_fp(y1)
    return _lex_largest_fp(y0)


# --------------------------------------------------------------- G1 codec


def g1_compress(aff) -> bytes:
    """aff: (x, y) ints or None for infinity -> 32 bytes."""
    if aff is None:
        return bytes([FLAG_INFINITY]) + bytes(31)
    x, y = int(aff[0]) % P, int(aff[1]) % P
    flag = FLAG_COMPRESSED_LARGEST if _lex_largest_fp(y) else FLAG_COMPRESSED_SMALLEST
    b = bytearray(x.to_bytes(32, "big"))
    b[0] |= flag
    return bytes(b)


def g1_decompress(data: bytes):
    """32 bytes -> (x, y) or None (infinity).  Raises GnarkDecodeError."""
    if len(data) != 32:
        raise GnarkDecodeError("G1 compressed point must be 32 bytes")
    flag = data[0] & FLAG_MASK
    b = bytearray(data)
    b[0] &= ~FLAG_MASK & 0xFF
    x = int.from_bytes(bytes(b), "big")
    if flag == FLAG_INFINITY:
        if x != 0:
            raise GnarkDecodeError("nonzero infinity encoding")
        return None
    if flag not in (FLAG_COMPRESSED_SMALLEST, FLAG_COMPRESSED_LARGEST):
        raise GnarkDecodeError(f"unsupported G1 flag {flag:#x}")
    if x >= P:
        raise GnarkDecodeError("G1 x out of range")
    y = _sqrt_fp((x * x % P * x + 3) % P)
    if y is None:
        raise GnarkDecodeError("G1 x not on curve")
    if _lex_largest_fp(y) != (flag == FLAG_COMPRESSED_LARGEST):
        y = P - y
    return (x, y)


# --------------------------------------------------------------- G2 codec


def g2_compress(aff) -> bytes:
    """aff: ((x0,x1),(y0,y1)) or None -> 64 bytes (X.A1 || X.A0 + flags)."""
    if aff is None:
        return bytes([FLAG_INFINITY]) + bytes(63)
    (x0, x1), (y0, y1) = aff
    flag = (
        FLAG_COMPRESSED_LARGEST
        if _lex_largest_fp2(int(y0) % P, int(y1) % P)
        else FLAG_COMPRESSED_SMALLEST
    )
    b = bytearray((int(x1) % P).to_bytes(32, "big") + (int(x0) % P).to_bytes(32, "big"))
    b[0] |= flag
    return bytes(b)


def g2_decompress(data: bytes):
    """64 bytes -> ((x0,x1),(y0,y1)) or None."""
    if len(data) != 64:
        raise GnarkDecodeError("G2 compressed point must be 64 bytes")
    flag = data[0] & FLAG_MASK
    b = bytearray(data)
    b[0] &= ~FLAG_MASK & 0xFF
    x1 = int.from_bytes(bytes(b[:32]), "big")
    x0 = int.from_bytes(bytes(b[32:]), "big")
    if flag == FLAG_INFINITY:
        if x0 or x1:
            raise GnarkDecodeError("nonzero infinity encoding")
        return None
    if flag not in (FLAG_COMPRESSED_SMALLEST, FLAG_COMPRESSED_LARGEST):
        raise GnarkDecodeError(f"unsupported G2 flag {flag:#x}")
    if x0 >= P or x1 >= P:
        raise GnarkDecodeError("G2 x out of range")
    # y^2 = x^3 + b2 in Fp2
    x = ec.Fp2(x0, x1)
    rhs = x * x * x + ec.G2_CURVE.b
    y = _sqrt_fp2(rhs.c0, rhs.c1)
    if y is None:
        raise GnarkDecodeError("G2 x not on curve")
    y0, y1 = y
    if _lex_largest_fp2(y0, y1) != (flag == FLAG_COMPRESSED_LARGEST):
        y0, y1 = (P - y0) % P, (P - y1) % P
    return ((x0, x1), (y0, y1))


# ---------------------------------------------------------------- reader


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.off = 0

    def take(self, n: int) -> bytes:
        if self.off + n > len(self.d):
            raise GnarkDecodeError("truncated input")
        out = self.d[self.off : self.off + n]
        self.off += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def fr(self) -> int:
        v = int.from_bytes(self.take(32), "big")
        if v >= P_FR:
            raise GnarkDecodeError("fr element out of range")
        return v

    def g1(self):
        return g1_decompress(self.take(32))

    def g2(self):
        return g2_decompress(self.take(64))

    def g1_list(self, n: int) -> list:
        return [self.g1() for _ in range(n)]

    def done(self) -> bool:
        return self.off == len(self.d)


# ------------------------------------------------------------------- proof


def proof_to_gnark_bytes(proof) -> bytes:
    """Our groth16.Proof -> gnark proof.WriteTo bytes (provers.go:152-157).

    Layout pinned by the README example (164 B: Ar | Bs | Krs |
    u32 nbCommitments | [commitments] | commitmentPok)."""
    out = [g1_compress(proof.a), g2_compress(proof.b), g1_compress(proof.c)]
    if proof.d is not None:
        out.append(struct.pack(">I", 1))
        out.append(g1_compress(proof.d))
        out.append(g1_compress(proof.d_sigma))
    else:
        out.append(struct.pack(">I", 0))
        out.append(g1_compress(None))  # PoK slot present even with 0 commitments
    return b"".join(out)


def proof_from_gnark_bytes(data: bytes):
    from ..groth16.prove import Proof

    r = _Reader(data)
    a = r.g1()
    b = r.g2()
    c = r.g1()
    ncomm = r.u32()
    comms = [r.g1() for _ in range(ncomm)]
    pok = r.g1()
    if not r.done():
        raise GnarkDecodeError("trailing bytes in proof")
    if a is None or b is None or c is None:
        raise GnarkDecodeError("infinity proof component")
    return Proof(
        a=a,
        b=b,
        c=c,
        d=comms[0] if comms else None,
        d_sigma=pok if comms else None,
    )


# --------------------------------------------------------------------- vk


@dataclasses.dataclass
class GnarkVerifyingKey:
    """Parsed gnark Groth16 BN254 verifying key (verify_impl.go embeds these)."""

    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    ic: list  # K points, len = 1 + nbPublic (+ nbCommitments)
    public_and_commitment_committed: list  # per commitment: [wire ids]
    pedersen_g: tuple = None  # G2
    pedersen_g_root_sigma_neg: tuple = None  # G2


def read_vk(data: bytes) -> GnarkVerifyingKey:
    r = _Reader(data)
    alpha1 = r.g1()
    beta1 = r.g1()
    beta2 = r.g2()
    gamma2 = r.g2()
    delta1 = r.g1()
    delta2 = r.g2()
    nk = r.u32()
    ic = r.g1_list(nk)
    ncomm = r.u32()
    pcc = []
    for _ in range(ncomm):
        nw = r.u32()
        pcc.append([r.u32() for _ in range(nw)])
    g = grsn = None
    npk = r.u32()  # number of pedersen vks (written even when 0)
    if npk > 1:
        raise GnarkDecodeError(f"expected <=1 pedersen vk, got {npk}")
    if npk == 1:
        g = r.g2()
        grsn = r.g2()
    if not r.done():
        raise GnarkDecodeError(f"trailing vk bytes at {r.off}/{len(r.d)}")
    return GnarkVerifyingKey(
        alpha_g1=alpha1,
        beta_g1=beta1,
        beta_g2=beta2,
        gamma_g2=gamma2,
        delta_g1=delta1,
        delta_g2=delta2,
        ic=ic,
        public_and_commitment_committed=pcc,
        pedersen_g=g,
        pedersen_g_root_sigma_neg=grsn,
    )


def write_vk(vk: GnarkVerifyingKey) -> bytes:
    out = [
        g1_compress(vk.alpha_g1),
        g1_compress(vk.beta_g1),
        g2_compress(vk.beta_g2),
        g2_compress(vk.gamma_g2),
        g1_compress(vk.delta_g1),
        g2_compress(vk.delta_g2),
        struct.pack(">I", len(vk.ic)),
    ]
    out += [g1_compress(p) for p in vk.ic]
    out.append(struct.pack(">I", len(vk.public_and_commitment_committed)))
    for wires in vk.public_and_commitment_committed:
        out.append(struct.pack(">I", len(wires)))
        out += [struct.pack(">I", w) for w in wires]
    if vk.pedersen_g is not None:
        out.append(struct.pack(">I", 1))
        out.append(g2_compress(vk.pedersen_g))
        out.append(g2_compress(vk.pedersen_g_root_sigma_neg))
    else:
        out.append(struct.pack(">I", 0))
    return b"".join(out)


# --------------------------------------------------------------------- pk


@dataclasses.dataclass
class GnarkProvingKey:
    """Parsed gnark Groth16 BN254 proving key (prove_impl.go:86-91 loads it).

    The compacted A/B/B2 arrays are re-expanded to nbWires length with None
    at infinity slots, matching our ProvingKey's index space."""

    domain_n: int
    fr_generator: int
    coset_gen: int
    alpha_g1: tuple
    beta_g1: tuple
    delta_g1: tuple
    beta_g2: tuple
    delta_g2: tuple
    a: list  # len nbWires, None = infinity
    b1: list
    b2: list
    z: list  # len n-1: [tau^k Z(tau)/delta]1
    k: list  # len nbPrivate: delta-basis points for private wires
    nb_wires: int
    commitment_basis: list = dataclasses.field(default_factory=list)
    commitment_basis_exp_sigma: list = dataclasses.field(default_factory=list)


def write_pk(pk: GnarkProvingKey) -> bytes:
    """GnarkProvingKey -> gnark pk.WriteTo bytes (inverse of read_pk;
    round-trips the reference's own pk.chacha20 byte-exactly —
    tests/test_gnark_compat.py).  The reader drops the domain's derived
    inverses; they are recomputed here (cardinality/generator/coset
    inverses mod r), and withPrecompute serializes as 1 the way gnark's
    domain WriteTo emits it (no twiddle payload follows either way)."""
    n = pk.domain_n
    out = [
        struct.pack(">Q", n),
        pow(n, -1, P_FR).to_bytes(32, "big"),
        pk.fr_generator.to_bytes(32, "big"),
        pow(pk.fr_generator, -1, P_FR).to_bytes(32, "big"),
        pk.coset_gen.to_bytes(32, "big"),
        pow(pk.coset_gen, -1, P_FR).to_bytes(32, "big"),
        b"\x01",  # withPrecompute
        g1_compress(pk.alpha_g1),
        g1_compress(pk.beta_g1),
        g1_compress(pk.delta_g1),
    ]
    a_comp = [p for p in pk.a if p is not None]
    b_comp = [p for p in pk.b1 if p is not None]
    b2_comp = [p for p in pk.b2 if p is not None]
    for lst in (a_comp, b_comp, pk.z, pk.k):
        out.append(struct.pack(">I", len(lst)))
        out += [g1_compress(p) for p in lst]
    out.append(g2_compress(pk.beta_g2))
    out.append(g2_compress(pk.delta_g2))
    out.append(struct.pack(">I", len(b2_comp)))
    out += [g2_compress(p) for p in b2_comp]
    inf_a = bytes(1 if p is None else 0 for p in pk.a)
    inf_b = bytes(1 if p is None else 0 for p in pk.b1)
    out.append(struct.pack(">Q", pk.nb_wires))
    out.append(struct.pack(">Q", sum(inf_a)))
    out.append(struct.pack(">Q", sum(inf_b)))
    out.append(inf_a)
    out.append(inf_b)
    out.append(struct.pack(">I", len(pk.commitment_basis)))
    for basis, basis_sigma in zip(
        pk.commitment_basis, pk.commitment_basis_exp_sigma
    ):
        out.append(struct.pack(">I", len(basis)))
        out += [g1_compress(p) for p in basis]
        out.append(struct.pack(">I", len(basis_sigma)))
        out += [g1_compress(p) for p in basis_sigma]
    return b"".join(out)


def read_pk(data: bytes) -> GnarkProvingKey:
    r = _Reader(data)
    n = r.u64()
    r.fr()  # cardinalityInv (recomputable)
    gen = r.fr()
    r.fr()  # generatorInv
    coset = r.fr()  # frMultiplicativeGen
    r.fr()  # frMultiplicativeGenInv
    r.u8()  # withPrecompute bool
    alpha1 = r.g1()
    beta1 = r.g1()
    delta1 = r.g1()
    a_comp = r.g1_list(r.u32())
    b_comp = r.g1_list(r.u32())
    z = r.g1_list(r.u32())
    k = r.g1_list(r.u32())
    beta2 = r.g2()
    delta2 = r.g2()
    b2_comp = [r.g2() for _ in range(r.u32())]
    nb_wires = r.u64()
    nb_inf_a = r.u64()
    nb_inf_b = r.u64()
    inf_a = list(r.take(nb_wires))
    inf_b = list(r.take(nb_wires))
    if sum(inf_a) != nb_inf_a or sum(inf_b) != nb_inf_b:
        raise GnarkDecodeError("infinity bitmap/count mismatch")

    def expand(comp, inf):
        out, it = [], iter(comp)
        for flag in inf:
            out.append(None if flag else next(it))
        return out

    ncomm = r.u32()
    basis, basis_sigma = [], []
    for _ in range(ncomm):
        basis.append(r.g1_list(r.u32()))
        basis_sigma.append(r.g1_list(r.u32()))
    if not r.done():
        raise GnarkDecodeError(f"trailing pk bytes at {r.off}/{len(r.d)}")
    return GnarkProvingKey(
        domain_n=n,
        fr_generator=gen,
        coset_gen=coset,
        alpha_g1=alpha1,
        beta_g1=beta1,
        delta_g1=delta1,
        beta_g2=beta2,
        delta_g2=delta2,
        a=expand(a_comp, inf_a),
        b1=expand(b_comp, inf_b),
        b2=expand(b2_comp, inf_b),
        z=z,
        k=k,
        nb_wires=nb_wires,
        commitment_basis=basis,
        commitment_basis_exp_sigma=basis_sigma,
    )
