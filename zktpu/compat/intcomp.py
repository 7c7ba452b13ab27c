"""ronanh/intcomp codec — the integer-compression format inside gnark r1cs
artifacts (reference load site: prove_impl.go:102-107 via gnark's
ReadFrom; the packed sections are [dep] ronanh/intcomp streams).

Reverse-engineered from the reference's own artifacts and validated
BYTE-EXACTLY both ways (decode->encode == original) on every packed
stream of r1cs.{chacha20,aes128,aes256}: all four instruction arrays and
all 163/441/462 level streams (tests/test_gnark_r1cs_writer.py).

Stream layout (uint32 flavor; uint64 differs only where noted):

  stream   = [block group]? [tail group]? [echo]
  echo     = one word repeating the LAST group's size field (nbw or G)

  block group (count is a multiple of 128; 256 for u64):
    [nfull, nbw, init] + blocks            (u64: [(nbw<<32)|nfull, init])
      nfull = number of values in the group
      nbw   = group's word count incl. this 3-word header (2 for u64)
      init  = the stream's FIRST value (delta chain seed; delta0 = 0)
    each block = 1 header word + 4 subgroups:
      header byte k (MSB-first) describes subgroup k: low 7 bits = bit
      width w, 0x80 = zigzag; subgroup = 32 values (64 for u64) packed
      LSB-first into exactly w words.  Values are wraparound deltas
      v[i]-v[i-1] (mod 2^32/2^64), zigzag-folded iff the flag is set;
      the encoder picks zigzag iff it is STRICTLY narrower.
  tail group (count < block size):
    [ntail, G] + data words + (echo)       (u64: [(G<<32)|ntail] + data)
      G = data words + 2 (u64: + 1) = group size minus the echo word
      data bytes (big-endian within each word): LEB128 of the first
      value RAW, then LEB128 wraparound deltas; 0x80-padded to a word.
"""

from __future__ import annotations

M32 = (1 << 32) - 1
M64 = (1 << 64) - 1


class IntcompError(ValueError):
    pass


def _leb_decode(buf: bytes, p: int):
    x = 0
    sh = 0
    while True:
        b = buf[p]
        p += 1
        x |= (b & 0x7F) << sh
        if not (b & 0x80):
            return x, p
        sh += 7


def _leb_encode(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(d: int, mask: int, signbit: int) -> int:
    """Zigzag of a wraparound delta (top-bit-set deltas are negative)."""
    s = d - (mask + 1) if d & signbit else d
    return ((s << 1) & mask) if s >= 0 else ((((-s) << 1) - 1) & mask)


def _tail_decode(bts: bytes, ntail: int, mask: int):
    vals = []
    v, p = _leb_decode(bts, 0)
    vals.append(v & mask)
    for _ in range(ntail - 1):
        d, p = _leb_decode(bts, p)
        v = (v + d) & mask
        vals.append(v)
    return vals, p


def _tail_bytes(vals, mask: int, align: int) -> bytes:
    bts = bytearray(_leb_encode(vals[0]))
    prev = vals[0]
    for v in vals[1:]:
        bts += _leb_encode((v - prev) & mask)
        prev = v
    while len(bts) % align:
        bts.append(0x80)
    return bytes(bts)


def decode_u32(words) -> list:
    """intcomp uint32 stream (list of u32 words) -> values."""
    out = []
    p, n = 0, len(words) - 1
    last = None
    while p < n:
        w0 = words[p]
        if w0 >= 128 and w0 % 128 == 0 and p + 2 < n:
            nfull, nbw, init = words[p], words[p + 1], words[p + 2]
            prev = init
            q = p + 3
            for _ in range(nfull // 128):
                hdr = words[q]
                q += 1
                for g in range(4):
                    byt = (hdr >> (8 * (3 - g))) & 0xFF
                    flag, bl = byt & 0x80, byt & 0x7F
                    if bl == 0:
                        vs = [0] * 32
                    else:
                        buf = words[q : q + bl]
                        q += bl
                        vs = []
                        bitpos = 0
                        for _i in range(32):
                            wi, bo = bitpos >> 5, bitpos & 31
                            v = buf[wi] >> bo
                            if bo + bl > 32 and wi + 1 < bl:
                                v |= buf[wi + 1] << (32 - bo)
                            vs.append(v & ((1 << bl) - 1))
                            bitpos += bl
                    for v in vs:
                        d = ((v >> 1) ^ (M32 * (v & 1))) & M32 if flag else v
                        prev = (prev + d) & M32
                        out.append(prev)
            if q != p + nbw:
                raise IntcompError(f"block group ended at {q}, want {p + nbw}")
            last, p = nbw, q
        else:
            ntail, G = words[p], words[p + 1]
            ndata = G - 2
            bts = b"".join(
                words[p + 2 + i].to_bytes(4, "big") for i in range(ndata)
            )
            vals, used = _tail_decode(bts, ntail, M32)
            out.extend(vals)
            if any(b != 0x80 for b in bts[used:]):
                raise IntcompError("bad tail padding")
            last, p = G, p + 2 + ndata
    if words and words[n] != last:
        raise IntcompError(f"echo {words[n]} != last group size {last}")
    return out


def decode_u64(words) -> list:
    """intcomp uint64 stream (list of u64 words) -> values."""
    out = []
    p, n = 0, len(words) - 1
    last = None
    while p < n:
        w0 = words[p]
        nfull = w0 & M32
        if nfull >= 256 and nfull % 256 == 0 and (w0 >> 32) >= 2:
            nbw = w0 >> 32
            prev = words[p + 1]
            q = p + 2
            for _ in range(nfull // 256):
                hdr = words[q]
                q += 1
                for g in range(4):
                    byt = (hdr >> (8 * (3 - g))) & 0xFF
                    flag, bl = byt & 0x80, byt & 0x7F
                    if bl == 0:
                        vs = [0] * 64
                    else:
                        buf = words[q : q + bl]
                        q += bl
                        vs = []
                        bitpos = 0
                        for _i in range(64):
                            wi, bo = bitpos >> 6, bitpos & 63
                            v = buf[wi] >> bo
                            if bo + bl > 64 and wi + 1 < bl:
                                v |= buf[wi + 1] << (64 - bo)
                            vs.append(v & ((1 << bl) - 1))
                            bitpos += bl
                    for v in vs:
                        d = ((v >> 1) ^ (M64 * (v & 1))) & M64 if flag else v
                        prev = (prev + d) & M64
                        out.append(prev)
            if q != p + nbw:
                raise IntcompError(f"u64 block group ended {q}, want {p + nbw}")
            last, p = nbw, q
        else:
            ntail, G = w0 & M32, w0 >> 32
            ndata = G - 1
            bts = b"".join(
                words[p + 1 + i].to_bytes(8, "big") for i in range(ndata)
            )
            vals, used = _tail_decode(bts, ntail, M64)
            out.extend(vals)
            if any(b != 0x80 for b in bts[used:]):
                raise IntcompError("bad u64 tail padding")
            last, p = G, p + 1 + ndata
    if words and words[n] != last:
        raise IntcompError(f"u64 echo {words[n]} != last group size {last}")
    return out


def _encode_blocks(vals, nfull, mask, signbit, lanes, wordbits):
    init = vals[0]
    deltas = [0] + [(vals[i] - vals[i - 1]) & mask for i in range(1, nfull)]
    body = []
    per_block = 4 * lanes
    for b in range(nfull // per_block):
        hdr = 0
        sub = []
        for g in range(4):
            ds = deltas[b * per_block + g * lanes : b * per_block + (g + 1) * lanes]
            wp = max(d.bit_length() for d in ds)
            zs = [_zigzag(d, mask, signbit) for d in ds]
            wz = max(z.bit_length() for z in zs)
            if wz < wp:
                use, w, flag = zs, wz, 0x80
            else:
                use, w, flag = ds, wp, 0
            hdr = (hdr << 8) | (flag | w)
            if w:
                buf = [0] * w
                bitpos = 0
                for v in use:
                    wi, bo = bitpos >> (5 if wordbits == 32 else 6), bitpos % wordbits
                    buf[wi] |= (v << bo) & mask
                    if bo + w > wordbits and wi + 1 < w:
                        buf[wi + 1] |= v >> (wordbits - bo)
                    bitpos += w
                sub.extend(buf)
        body.append(hdr)
        body.extend(sub)
    return init, body


def encode_u32(vals) -> list:
    """values -> intcomp uint32 stream (list of u32 words)."""
    n = len(vals)
    if n == 0:
        return []
    nfull = (n // 128) * 128
    words = []
    last = None
    if nfull:
        init, body = _encode_blocks(vals, nfull, M32, 1 << 31, 32, 32)
        nbw = 3 + len(body)
        words += [nfull, nbw, init] + body
        last = nbw
    if n - nfull:
        bts = _tail_bytes(vals[nfull:], M32, 4)
        ndata = len(bts) // 4
        G = ndata + 2
        words += [n - nfull, G] + [
            int.from_bytes(bts[4 * i : 4 * i + 4], "big") for i in range(ndata)
        ]
        last = G
    words.append(last)
    return words


def encode_u64(vals) -> list:
    """values -> intcomp uint64 stream (list of u64 words)."""
    n = len(vals)
    if n == 0:
        return []
    nfull = (n // 256) * 256
    words = []
    last = None
    if nfull:
        init, body = _encode_blocks(vals, nfull, M64, 1 << 63, 64, 64)
        nbw = 2 + len(body)
        words += [(nbw << 32) | nfull, init] + body
        last = nbw
    if n - nfull:
        bts = _tail_bytes(vals[nfull:], M64, 8)
        ndata = len(bts) // 8
        G = ndata + 1
        words += [(G << 32) | (n - nfull)] + [
            int.from_bytes(bts[8 * i : 8 * i + 8], "big") for i in range(ndata)
        ]
        last = G
    words.append(last)
    return words
