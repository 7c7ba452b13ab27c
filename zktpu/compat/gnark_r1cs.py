"""gnark v0.11 r1cs artifact reader — metadata layer.

The reference loads compiled constraint systems with gnark's own binary
format (prove_impl.go:102-107).  Reverse-engineered layout of the files in
/root/reference/circuits/generated/ (r1cs.{chacha20,aes128,aes256}):

    [ 0:32)  u64 LE: bodyLen (= file size - 32), ?, 11, ?
    [32:64)  u64 LE x4: byte lengths of the four payload sections
    [64:..)  section 1  — "levels"        (intcomp-compressed uint32 stream)
             section 2  — "instructions"  (intcomp-compressed stream)
             section 3  — "calldata"      (intcomp-compressed uint32 stream)
             section 4  — CBOR map of the constraint-system metadata
    [..:EOF) trailing CBOR (coefficient table et al.)

The CBOR section decodes completely (see read_r1cs_meta) and carries:
GnarkVersion, ScalarField, NbConstraints, NbInternalVariables, the full
Public/Secret symbol lists, blueprint registry tags, hint dependencies
(e.g. "gnark/std/math/bits.nBits"), and CommitmentInfo.

The three compressed sections use a delta+binary-packing scheme (128-value
blocks, one u32 header of four per-32-value bitlens, horizontal LSB-first
packing) with escape blocks we have not fully mapped; decoding them — and
the PackedInstruction/blueprint semantics they encode — is what stands
between this reader and full prove-with-reference-artifacts interop.  The
pk/vk/proof formats (zktpu.compat.gnark) are already byte-exact.
"""

from __future__ import annotations

import dataclasses
import struct


class GnarkR1CSError(ValueError):
    pass


def _cbor_parse(buf: bytes, off: int):
    ib = buf[off]
    off += 1
    mt, ai = ib >> 5, ib & 0x1F
    arg = None
    if ai < 24:
        arg = ai
    elif ai == 24:
        arg = buf[off]
        off += 1
    elif ai == 25:
        arg = int.from_bytes(buf[off : off + 2], "big")
        off += 2
    elif ai == 26:
        arg = int.from_bytes(buf[off : off + 4], "big")
        off += 4
    elif ai == 27:
        arg = int.from_bytes(buf[off : off + 8], "big")
        off += 8
    elif ai == 31:
        pass  # indefinite
    else:
        raise GnarkR1CSError(f"bad CBOR additional info {ai} at {off - 1}")
    if mt == 0:
        return arg, off
    if mt == 1:
        return -1 - arg, off
    if mt == 2:
        return buf[off : off + arg], off + arg
    if mt == 3:
        return buf[off : off + arg].decode("utf8", "replace"), off + arg
    if mt == 4:
        out = []
        if arg is None:
            while buf[off] != 0xFF:
                v, off = _cbor_parse(buf, off)
                out.append(v)
            return out, off + 1
        for _ in range(arg):
            v, off = _cbor_parse(buf, off)
            out.append(v)
        return out, off
    if mt == 5:
        out = {}
        if arg is None:
            while buf[off] != 0xFF:
                k, off = _cbor_parse(buf, off)
                v, off = _cbor_parse(buf, off)
                out[k] = v
            return out, off + 1
        for _ in range(arg):
            k, off = _cbor_parse(buf, off)
            v, off = _cbor_parse(buf, off)
            out[k] = v
        return out, off
    if mt == 6:
        v, off = _cbor_parse(buf, off)
        return ("tag", arg, v), off
    if mt == 7:
        if ai in (20, 21):
            return ai == 21, off
        if ai in (22, 23):
            return None, off
        raise GnarkR1CSError(f"bad CBOR simple value {ai}")
    raise GnarkR1CSError(f"bad CBOR major type {mt}")


@dataclasses.dataclass
class GnarkR1CSMeta:
    gnark_version: str
    scalar_field: int
    nb_constraints: int
    nb_internal: int
    public_names: list  # includes leading "1"
    secret_names: list
    hint_names: dict  # hint id -> import path
    nb_commitments: int
    levels_len: int  # compressed byte sizes (sections 1-3)
    instructions_len: int
    calldata_len: int

    @property
    def nb_public(self) -> int:
        return len(self.public_names) - 1  # "1" is the constant wire

    @property
    def nb_wires(self) -> int:
        return len(self.public_names) + len(self.secret_names) + self.nb_internal


def read_r1cs_meta(data: bytes) -> GnarkR1CSMeta:
    if len(data) < 64:
        raise GnarkR1CSError("truncated r1cs")
    body_len = struct.unpack("<Q", data[:8])[0]
    if body_len != len(data) - 32:
        raise GnarkR1CSError(
            f"bodyLen {body_len} != file size - 32 ({len(data) - 32})"
        )
    s1, s2, s3, s4 = struct.unpack("<4Q", data[32:64])
    cbor_off = 64 + s1 + s2 + s3
    if cbor_off + s4 > len(data):
        raise GnarkR1CSError("section lengths exceed file")
    meta, end = _cbor_parse(data, cbor_off)
    if end != cbor_off + s4:
        raise GnarkR1CSError(f"CBOR section consumed {end - cbor_off}, expected {s4}")
    if not isinstance(meta, dict):
        raise GnarkR1CSError("CBOR section is not a map")
    comm = meta.get("CommitmentInfo")
    ncomm = 0
    if isinstance(comm, tuple) and comm[0] == "tag":
        payload = comm[2]
        ncomm = len(payload) if isinstance(payload, list) else 0
    hints = {
        int(k): v for k, v in (meta.get("MHintsDependencies") or {}).items()
    }
    return GnarkR1CSMeta(
        gnark_version=meta.get("GnarkVersion", ""),
        scalar_field=int(meta.get("ScalarField", "0"), 16),
        nb_constraints=int(meta["NbConstraints"]),
        nb_internal=int(meta["NbInternalVariables"]),
        public_names=list(meta.get("Public") or []),
        secret_names=list(meta.get("Secret") or []),
        hint_names=hints,
        nb_commitments=ncomm,
        levels_len=s1,
        instructions_len=s2,
        calldata_len=s3,
    )
