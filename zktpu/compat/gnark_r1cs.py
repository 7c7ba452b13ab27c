"""gnark v0.11 r1cs artifact reader — FULL decode.

The reference loads compiled constraint systems with gnark's own binary
format (prove_impl.go:102-107).  Reverse-engineered layout of the files in
/root/reference/circuits/generated/ (r1cs.{chacha20,aes128,aes256}):

    [ 0:32)  u64 LE: bodyLen (= file size - 32), 0, 11, 0
    [32:64)  u64 LE x4: byte lengths of the four payload sections
    [64:..)  section 1  — "levels"        (u64 count; per level: u64 word
                          count + intcomp-packed uint32 words)
             section 2  — "instructions"  (four arrays, each u64 word count
                          + packed words: BlueprintID/ConstraintOffset/
                          WireOffset as u32 streams, StartCallData as u64)
             section 3  — "calldata"      (u64 value count + unsigned-LEB128
                          varint byte stream — one varint per uint32 value)
             section 4  — CBOR map of the constraint-system metadata
    [..:EOF) coefficient table: u64 count + count x 32-byte LE Fr elements
             in Montgomery form (coeff[0..4] = 0, 1, 2, -1, -2)

Everything needed to reconstruct the constraint system lives in the
CALLDATA stream alone: it is self-delimiting (each instruction's first
value is its total value count), instructions appear in synthesis order,
hint instructions are identified by their 32-bit hint ID (from the CBOR
MHintsDependencies map), and hint output wire ranges are explicit.  The
intcomp-packed sections 1-2 (solver levels / packed-instruction index) are
therefore NOT needed for proving and are left undecoded; we re-derive
solve order by sequential interpretation.

Instruction payload layouts (gnark constraint/blueprint.go semantics,
empirically pinned against r1cs.chacha20 + the chachaV3 circuit source):

  generic R1C:  [nb, lenL, lenR, lenO, (coeffID, wireID) x (lenL+lenR+lenO)]
                with nb == 4 + 2*(lenL+lenR+lenO)
  generic hint: [nb, hintID, nbInputExprs,
                 per expr: [len, (coeffID, wireID) x len],
                 outRangeStart, outRangeEnd]
                where wireID == 0xFFFFFFFF marks a CONSTANT term whose
                value is coeffs[coeffID].

The witness vector is indexed by wire ID: [0] = 1, [1..nbPublic] = public
inputs (struct declaration order), then secret, then internal wires.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

P_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
_R_INV = pow(1 << 256, -1, P_FR)
CONST_WIRE = 0xFFFFFFFF


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


def read_r1cs_cbor(data: bytes) -> dict:
    """The raw CBOR metadata map (incl. CommitmentInfo payload)."""
    s1, s2, s3, s4 = struct.unpack("<4Q", data[32:64])
    meta, _ = _cbor_parse(data, 64 + s1 + s2 + s3)
    return meta


# ----------------------------------------------------------- full decode


def _decode_varints(buf: bytes) -> list:
    """Unsigned LEB128 stream -> list of ints (one per calldata value)."""
    vals = []
    p, L = 0, len(buf)
    while p < L:
        x = 0
        sh = 0
        while True:
            b = buf[p]
            p += 1
            x |= (b & 0x7F) << sh
            if not (b & 0x80):
                break
            sh += 7
        vals.append(x)
    return vals


def decode_intcomp32_blocks(words):
    """ronanh/intcomp uint32 stream -> the full-block values (reverse-
    engineered; validated bit-exactly against known plaintext for all three
    uint32 instruction arrays of r1cs.chacha20).

    Layout: [nbFullBlockValues, nbBlockWords, initValue, blocks...]; each
    128-value block = one header word (byte k, MSB-first, describes
    subgroup k of 32 values: low 7 bits = bit width, 0x80 = zigzag-coded
    deltas) + width words per subgroup, values packed LSB-first.  The <128
    remaining values use a varint scheme we do not need (instruction tails
    are classifiable from calldata alone) and are NOT decoded here."""
    nfull, _, init = words[0], words[1], words[2]
    out = []
    prev = init
    p = 3
    for _ in range(nfull // 128):
        hdr = words[p]
        p += 1
        for g in range(4):
            byt = (hdr >> (8 * (3 - g))) & 0xFF
            flag = byt & 0x80
            bl = byt & 0x7F
            if bl == 0:
                vals = [0] * 32
            else:
                buf = words[p : p + bl]
                p += bl
                vals = []
                bitpos = 0
                for _i in range(32):
                    wi, bo = bitpos >> 5, bitpos & 31
                    v = buf[wi] >> bo
                    if bo + bl > 32 and wi + 1 < bl:
                        v |= buf[wi + 1] << (32 - bo)
                    vals.append(v & ((1 << bl) - 1))
                    bitpos += bl
            for v in vals:
                if flag:  # zigzag
                    d = ((v >> 1) ^ (0xFFFFFFFF * (v & 1))) & 0xFFFFFFFF
                else:
                    d = v
                prev = (prev + d) & 0xFFFFFFFF
                out.append(prev)
    return out


def _classify_tail_lookup(u, nb, tables, lookup_bp_ids):
    """Classify an instruction in the intcomp <128-value tail (where no
    BlueprintID was decoded) as a lookup unit by calldata shape: the query
    list must walk to exactly nb values AND nbTableEntries must match a
    registered lookup blueprint's table.  Returns that blueprint index or
    None.  Only reached after the R1C/hint shapes failed to match."""
    if nb < 3 or not tables:
        return None
    nq = u[2]
    j = 3
    for _ in range(nq):
        if j >= nb:
            return None
        j += 1 + 2 * u[j]
    if j != nb:
        return None
    for bidx, tid in lookup_bp_ids.items():
        if u[1] == len(tables[tid]):
            return bidx
    return None


def read_blueprint_ids(data: bytes):
    """Per-instruction BlueprintID for the FULL-BLOCK prefix (multiple of
    128); the <128-instruction tail is returned as None entries."""
    s1, s2, s3, s4 = struct.unpack("<4Q", data[32:64])
    ins = data[64 + s1 : 64 + s1 + s2]
    n0 = struct.unpack("<Q", ins[:8])[0]
    arr0 = list(struct.unpack(f"<{n0}I", ins[8 : 8 + 4 * n0]))
    return decode_intcomp32_blocks(arr0)


@dataclasses.dataclass
class HintInst:
    hint_id: int
    exprs: list  # list of [(coeff_id, wire_id)] — wire CONST_WIRE = constant
    out_start: int
    out_end: int


@dataclasses.dataclass
class LookupInst:
    """gnark BlueprintLookupHint instruction (logderivlookup query batch).

    calldata layout (pinned empirically on r1cs.aes128):
      [nbTotal, nbTableEntries, nbQueries, per query: len, (coeffID,
       wireID) x len]
    Output wires are NOT in calldata — they are the next nbQueries
    internal wires at the instruction's position (reconstructed by the
    running wire counter in read_r1cs).  table_id indexes
    GnarkR1CS.lookup_tables (from the blueprint registry's
    EntriesCalldata)."""

    table_id: int
    queries: list  # list of [(coeff_id, wire_id)]
    out_start: int
    out_end: int


@dataclasses.dataclass
class R1CInst:
    l: list  # [(coeff_id, wire_id)]
    r: list
    o: list


@dataclasses.dataclass
class GnarkR1CS:
    meta: GnarkR1CSMeta
    coeffs: list  # canonical Python ints (Montgomery form decoded)
    instructions: list  # HintInst | R1CInst | LookupInst, synthesis order
    commitment_info: list  # raw CBOR payload entries (BSB22), [] if none
    lookup_tables: list = dataclasses.field(default_factory=list)  # [[int]]
    cbor_meta: dict = dataclasses.field(default_factory=dict)  # raw CBOR map
    lookup_bp_index: dict = dataclasses.field(default_factory=dict)
    # ^ table_id -> BlueprintID (index into cbor_meta["Blueprints"]); kept so
    #   gnark_r1cs_write can re-derive the instruction BlueprintID array

    @property
    def nb_public_wires(self) -> int:
        return len(self.meta.public_names)  # includes the "1" wire

    @property
    def nb_wires(self) -> int:
        return self.meta.nb_wires

    @property
    def constraints(self):
        return [i for i in self.instructions if isinstance(i, R1CInst)]

    @property
    def committed_wires(self) -> list:
        """PrivateCommitted wire ids of the (single) BSB22 commitment."""
        if not self.commitment_info:
            return []
        return list(self.commitment_info[0].get("PrivateCommitted", []))

    @property
    def commitment_wire(self):
        if not self.commitment_info:
            return None
        return int(self.commitment_info[0]["CommitmentIndex"])


def read_r1cs(data: bytes) -> GnarkR1CS:
    """Full gnark r1cs decode: metadata + coefficients + instruction list."""
    meta = read_r1cs_meta(data)
    s1, s2, s3, s4 = struct.unpack("<4Q", data[32:64])
    cal = data[64 + s1 + s2 : 64 + s1 + s2 + s3]
    ncal = struct.unpack("<Q", cal[:8])[0]
    vals = _decode_varints(cal[8:])
    if len(vals) != ncal:
        raise GnarkR1CSError(f"calldata decoded {len(vals)} values, want {ncal}")

    # trailing coefficient table: u64 count + 32-byte LE Montgomery Fr
    tr = data[64 + s1 + s2 + s3 + s4 :]
    nco = struct.unpack("<Q", tr[:8])[0]
    if len(tr) != 8 + 32 * nco:
        raise GnarkR1CSError("coefficient table size mismatch")
    coeffs = [
        int.from_bytes(tr[8 + 32 * i : 40 + 32 * i], "little") * _R_INV % P_FR
        for i in range(nco)
    ]

    meta_cbor = read_r1cs_cbor(data)
    comm = meta_cbor.get("CommitmentInfo")
    comm_payload = []
    if isinstance(comm, tuple) and comm[0] == "tag" and isinstance(comm[2], list):
        comm_payload = comm[2]

    # lookup tables from the blueprint registry (BlueprintLookupHint entries
    # carry EntriesCalldata = per-entry linear exprs over constants)
    tables = []
    lookup_bp_ids = {}  # blueprint index -> table index
    for bidx, bp in enumerate(meta_cbor.get("Blueprints") or []):
        payload = bp[2] if isinstance(bp, tuple) and bp[0] == "tag" else bp
        if not (isinstance(payload, dict) and "EntriesCalldata" in payload):
            continue
        ec = payload["EntriesCalldata"]
        tvals = []
        j = 0
        while j < len(ec):
            el = ec[j]
            j += 1
            v = 0
            for _ in range(el):
                cid, wid = ec[j], ec[j + 1]
                j += 2
                if wid != CONST_WIRE:
                    raise GnarkR1CSError("lookup table entry references a wire")
                v += coeffs[cid]
            tvals.append(v % P_FR)
        lookup_bp_ids[bidx] = len(tables)
        tables.append(tvals)

    bpids = read_blueprint_ids(data) if tables else []

    hint_ids = set(meta.hint_names)
    insts = []
    i = 0
    n = len(vals)
    next_wire = len(meta.public_names) + len(meta.secret_names)
    idx = 0
    while i < n:
        nb = vals[i]
        if nb <= 0 or i + nb > n:
            raise GnarkR1CSError(f"bad instruction length {nb} at calldata[{i}]")
        u = vals[i : i + nb]
        ll, lr, lo = (u[1], u[2], u[3]) if nb >= 4 else (0, 0, 0)
        bp = bpids[idx] if idx < len(bpids) else None
        if (
            nb >= 4
            and nb == 4 + 2 * (ll + lr + lo)
            and u[1] not in hint_ids
            and (bp is None or bp == 1)
        ):
            terms = [(u[4 + 2 * k], u[5 + 2 * k]) for k in range(ll + lr + lo)]
            inst = R1CInst(l=terms[:ll], r=terms[ll : ll + lr], o=terms[ll + lr :])
            for _, wid in terms:
                if wid != CONST_WIRE and wid >= next_wire:
                    next_wire = wid + 1
        elif nb >= 2 and u[1] in hint_ids and (bp is None or bp == 0):
            ne = u[2]
            j = 3
            exprs = []
            for _ in range(ne):
                el = u[j]
                j += 1
                exprs.append([(u[j + 2 * k], u[j + 2 * k + 1]) for k in range(el)])
                j += 2 * el
            if j + 2 != nb:
                raise GnarkR1CSError(f"hint unit length mismatch at calldata[{i}]")
            inst = HintInst(
                hint_id=u[1], exprs=exprs, out_start=u[j], out_end=u[j + 1]
            )
            next_wire = max(next_wire, inst.out_end)
        elif (bp is not None and bp in lookup_bp_ids) or (
            bp is None
            and (bp := _classify_tail_lookup(u, nb, tables, lookup_bp_ids))
            is not None
        ):
            # [nbTotal, nbTableEntries, nbQueries, per query: len, pairs]
            # bp may come from the <128-instruction intcomp tail (no decoded
            # BlueprintID): classified by calldata shape instead (ADVICE r4
            # — the shipped AES artifacts happen to end on a full block, but
            # valid gnark files can put lookups in the tail).
            nq = u[2]
            if u[1] != len(tables[lookup_bp_ids[bp]]):
                raise GnarkR1CSError(
                    f"lookup unit table size {u[1]} != blueprint table"
                )
            j = 3
            queries = []
            for _ in range(nq):
                el = u[j]
                j += 1
                queries.append(
                    [(u[j + 2 * k], u[j + 2 * k + 1]) for k in range(el)]
                )
                j += 2 * el
            if j != nb:
                raise GnarkR1CSError(f"lookup unit length mismatch at calldata[{i}]")
            inst = LookupInst(
                table_id=lookup_bp_ids[bp],
                queries=queries,
                out_start=next_wire,
                out_end=next_wire + nq,
            )
            next_wire += nq
        else:
            raise GnarkR1CSError(
                f"unrecognized instruction unit at calldata[{i}] (bp={bp}): {u[:8]}"
            )
        insts.append(inst)
        i += nb
        idx += 1
    nb_r1c = sum(1 for x in insts if isinstance(x, R1CInst))
    if nb_r1c != meta.nb_constraints:
        raise GnarkR1CSError(
            f"decoded {nb_r1c} R1C constraints, metadata says {meta.nb_constraints}"
        )
    if next_wire > meta.nb_wires:
        raise GnarkR1CSError(
            f"wire allocation overran: {next_wire} > {meta.nb_wires}"
        )
    return GnarkR1CS(
        meta=meta,
        coeffs=coeffs,
        instructions=insts,
        commitment_info=comm_payload,
        lookup_tables=tables,
        cbor_meta=meta_cbor,
        lookup_bp_index={tid: bidx for bidx, tid in lookup_bp_ids.items()},
    )


# ------------------------------------------------------- witness solving

# gnark hint import paths (MHintsDependencies values).
_HINT_NBITS = "github.com/consensys/gnark/std/math/bits.nBits"
_HINT_COUNT = "github.com/consensys/gnark/std/internal/logderivarg.countHint"
_HINT_RANDOMIZE = "github.com/consensys/gnark/internal/hints.Randomize"
_HINT_BSB22 = "github.com/consensys/gnark/frontend/cs.Bsb22CommitmentComputePlaceholder"


def solve_witness(
    r1cs: GnarkR1CS,
    public_vals,
    secret_vals,
    p: int = P_FR,
    bsb22_challenge=None,
    randomize_value: int = 0x52414E44,
):
    """Reference witness solver (big-int, sequential) — the oracle path.

    Mirrors gnark's R1CS solver semantics (one unknown wire per R1C, hints
    executed in instruction order; reference call site provers.go:148 via
    groth16.Prove -> r1cs.Solve [dep go.mod:8]).  public_vals/secret_vals:
    ints in wire order (publics WITHOUT the leading 1).  Returns the full
    witness as a list of ints indexed by wire ID.

    Lookup circuits (aesV2): LookupInst outputs are table[index];
    countHint computes logderiv multiplicities; the BSB22 commitment hint
    calls `bsb22_challenge(committed_input_values) -> int` — by instruction
    order its inputs (the committed wires) are already solved, so the
    two-phase commit flow collapses into one callback.  Any challenge value
    satisfies the log-derivative sum identity (it is a rational-function
    identity in the challenge), so satisfaction tests may pass a constant;
    a real prover passes the commitment hash.  `randomize_value` seeds the
    gnark internal Randomize hint (commitment blinding) deterministically."""
    meta = r1cs.meta
    npub = len(meta.public_names)  # includes "1"
    nsec = len(meta.secret_names)
    if len(public_vals) != npub - 1 or len(secret_vals) != nsec:
        raise GnarkR1CSError("assignment length mismatch")
    w = [None] * r1cs.nb_wires
    w[0] = 1
    for k, v in enumerate(public_vals):
        w[1 + k] = v % p
    for k, v in enumerate(secret_vals):
        w[npub + k] = v % p
    coeffs = r1cs.coeffs
    hint_names = meta.hint_names

    def ev(terms):
        """-> (known_sum, unknown_wire, unknown_coeff); at most one unknown."""
        s = 0
        uw = uc = None
        for cid, wid in terms:
            if wid == CONST_WIRE:
                s += coeffs[cid]
            elif w[wid] is None:
                if uw is not None:
                    raise GnarkR1CSError("two unknown wires in one expression")
                uw, uc = wid, coeffs[cid]
            else:
                s += coeffs[cid] * w[wid]
        return s % p, uw, uc

    for idx, inst in enumerate(r1cs.instructions):
        if isinstance(inst, LookupInst):
            table = r1cs.lookup_tables[inst.table_id]
            for k, q in enumerate(inst.queries):
                s, uw, _ = ev(q)
                if uw is not None:
                    raise GnarkR1CSError(f"lookup query with unsolved wire {uw}")
                if s >= len(table):
                    raise GnarkR1CSError(f"lookup index {s} out of range")
                w[inst.out_start + k] = table[s] % p
        elif isinstance(inst, HintInst):
            name = hint_names.get(inst.hint_id, "")
            ins = []
            for e in inst.exprs:
                s, uw, _ = ev(e)
                if uw is not None:
                    raise GnarkR1CSError(f"hint input with unsolved wire {uw}")
                ins.append(s)
            nout = inst.out_end - inst.out_start
            if name == _HINT_NBITS:
                v = ins[0]  # nBits: inputs[0] is the value to decompose
                outs = [(v >> k) & 1 for k in range(nout)]
            elif name == _HINT_COUNT:
                # logderivarg multiplicities.  Input layout (pinned
                # empirically on r1cs.aes128): [nbRows, nbCols,
                # table rows interleaved (col0, col1, ...) x nbRows,
                # query tuples (col0, col1, ...) x Q]; out[i] =
                # multiplicity of table row i among the query tuples.
                nrows, ncols = ins[0], ins[1]
                if nrows != nout:
                    raise GnarkR1CSError(
                        f"countHint nbRows {nrows} != nbOutputs {nout}"
                    )
                body = ins[2:]
                rows = [
                    tuple(body[i * ncols : (i + 1) * ncols])
                    for i in range(nrows)
                ]
                qbody = body[nrows * ncols :]
                if len(qbody) % ncols:
                    raise GnarkR1CSError("countHint query tuples misaligned")
                from collections import Counter

                cnt = Counter(
                    tuple(qbody[i * ncols : (i + 1) * ncols])
                    for i in range(len(qbody) // ncols)
                )
                outs = [cnt.get(r, 0) for r in rows]
            elif name == _HINT_RANDOMIZE:
                outs = [randomize_value % p] * nout
            elif name == _HINT_BSB22:
                if bsb22_challenge is None:
                    raise GnarkR1CSError(
                        "circuit has a BSB22 commitment; pass bsb22_challenge"
                    )
                outs = [int(bsb22_challenge(ins)) % p] * nout
            else:
                raise GnarkR1CSError(f"unimplemented hint {name or inst.hint_id}")
            for k, v in enumerate(outs):
                w[inst.out_start + k] = v % p
        else:
            ls, luw, luc = ev(inst.l)
            rs, ruw, ruc = ev(inst.r)
            os_, ouw, ouc = ev(inst.o)
            unknowns = sum(x is not None for x in (luw, ruw, ouw))
            if unknowns == 0:
                if ls * rs % p != os_:
                    raise GnarkR1CSError(f"unsatisfied constraint at inst {idx}")
            elif ouw is not None and unknowns == 1:
                w[ouw] = (ls * rs - os_) % p * pow(ouc, -1, p) % p
            elif luw is not None and unknowns == 1:
                if rs % p == 0:
                    raise GnarkR1CSError(f"singular solve at inst {idx}")
                w[luw] = (
                    (os_ * pow(rs, -1, p) - ls) % p * pow(luc, -1, p) % p
                )
            elif ruw is not None and unknowns == 1:
                if ls % p == 0:
                    raise GnarkR1CSError(f"singular solve at inst {idx}")
                w[ruw] = (
                    (os_ * pow(ls, -1, p) - rs) % p * pow(ruc, -1, p) % p
                )
            else:
                raise GnarkR1CSError(f"{unknowns} unknowns in constraint {idx}")
    missing = [i for i, v in enumerate(w) if v is None]
    if missing:
        raise GnarkR1CSError(f"{len(missing)} unsolved wires, first {missing[:4]}")
    return w


def check_satisfied(r1cs: GnarkR1CS, w, p: int = P_FR) -> bool:
    """A·w ∘ B·w == C·w for every decoded constraint (oracle for tests)."""
    coeffs = r1cs.coeffs

    def dot(terms):
        s = 0
        for cid, wid in terms:
            s += coeffs[cid] * (1 if wid == CONST_WIRE else w[wid])
        return s % p

    for c in r1cs.constraints:
        if dot(c.l) * dot(c.r) % p != dot(c.o):
            return False
    return True
