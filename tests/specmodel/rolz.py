"""Spec models of the ROLZ (ANS-coded) and ROLZX (CM-coded) transforms.

References:
  - rolzCodec1 (ROLZ)   v2/transform/ROLZCodec.go:204-595 — reduced-offset
        LZ over 64 KiB key contexts (order-2 LE16 key, or a 40-bit mul-hash
        key for minMatch 4/7), 16 match slots (logPosChecks=4), token
        LLLLLMMM streams (literals/tokens/lengths/indexes) entropy-coded
        per 16 MiB chunk with ANS order-litOrder / order-0 into one
        bitstream, 4x32-bit section lengths first, 4 raw tail literals.
  - rolzCodec2 (ROLZX)  v2/transform/ROLZCodec.go:975-1347 — same match
        search with 32 slots (logPosChecks=5), everything coded through an
        embedded binary range coder (rolzEncoder :1360-1460): 9-bit
        flag+byte literals / flag+length matches plus logPosChecks index
        bits, order-1 contexts, 56-bit low/high renormalized 32 bits at a
        time, 8-byte flush.
  - emitLengthROLZ      v2/transform/ROLZCodec.go:924-944.
The dataType byte gating (EXE/DNA/MULTIMEDIA flag bits and delta/minMatch
selection) mirrors Forward's DetectSimpleType fallback.
"""

from __future__ import annotations

from .ans import SpecANSEncoder
from .bits import SpecOBS
from .exe import detect_simple_type, DT_EXE, DT_DNA, DT_MULTIMEDIA

HASH_SIZE = 1 << 16
MIN_MATCH3 = 3
MIN_MATCH4 = 4
MIN_MATCH7 = 7
MAX_MATCH1 = MIN_MATCH3 + 65535
MAX_MATCH2 = MIN_MATCH3 + 255
CHUNK_SIZE = 16 * 1024 * 1024
HASH_MASK = (~(CHUNK_SIZE - 1)) & 0xFFFFFFFF
HASH_SEED = 200002979
PSCALE = 0xFFFF
TOP = 0x00FFFFFFFFFFFFFF
M32 = 0xFFFFFFFF
M64 = (1 << 64) - 1
MATCH_FLAG, LITERAL_FLAG = 0, 1
MATCH_CTX, LITERAL_CTX = 0, 1


class SpecSkip(Exception):
    pass


def _le16(b, i):
    return b[i] | (b[i + 1] << 8)


def _le32(b, i):
    return int.from_bytes(b[i:i + 4], "little")


def _le64(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def _get_key1(b, i):
    return _le16(b, i)


def _get_key2(b, i):
    return ((_le64(b, i) * HASH_SEED & M64) >> 40) & 0xFFFF


def _rolz_hash(b, i):
    return ((_le32(b, i) << 8) & M32) * HASH_SEED & HASH_MASK


def _ctz(x: int) -> int:
    return (x & -x).bit_length() - 1


def _emit_length(buf: bytearray, length: int) -> None:
    if length >= 1 << 7:
        if length >= 1 << 14:
            if length >= 1 << 21:
                buf.append(0x80 | (length >> 21))
            buf.append(0x80 | ((length >> 14) & 0xFF))
        buf.append(0x80 | ((length >> 7) & 0xFF))
    buf.append(length & 0x7F)


def _pick_mode(src: bytes, dt: int | None) -> int:
    if dt is not None:
        return dt
    freqs = [0] * 256
    for b in src:
        freqs[b] += 1
    return detect_simple_type(len(src), freqs)


def rolz1_forward(src: bytes, dst_len: int | None = None,
                  log_pos_checks: int = 4, dt: int | None = None,
                  bs_version: int = 6) -> bytes:
    count = len(src)
    if count < 64:
        raise SpecSkip("block too small")
    if dst_len is None:
        dst_len = count + 64 if count <= 512 else count
    src_end = count - 4
    out = bytearray(count.to_bytes(4, "big"))
    size_chunk = min(count, CHUNK_SIZE)
    counters = [0] * HASH_SIZE
    lit_order = 1 if count >= (1 << 17) else 0
    flags = lit_order
    min_match = MIN_MATCH3
    delta = 2

    dt = _pick_mode(src, dt)
    if bs_version >= 4:
        if dt == DT_EXE:
            delta = 3
            flags |= 8
        elif dt == DT_DNA:
            delta = 8
            min_match = MIN_MATCH7
            flags |= 4
        elif dt == DT_MULTIMEDIA:
            delta = 8
            min_match = MIN_MATCH4
            flags |= 2
    elif bs_version >= 3:
        # v3 flag semantics (ROLZCodec.go:648-655): delta stays 2
        if dt == DT_DNA:
            min_match = MIN_MATCH7
            flags |= 4
        elif dt == DT_MULTIMEDIA:
            min_match = MIN_MATCH4
            flags |= 2
    # pre-v3: MM3/delta 2 only; the flags byte is still present for codec1

    flags |= log_pos_checks << 4
    out.append(flags)
    pos_checks = 1 << log_pos_checks
    mask_checks = pos_checks - 1
    key_fn = _get_key1 if min_match == MIN_MATCH3 else _get_key2

    def find_match(base, chunk_len, pos, hash32, counter, mbase):
        max_match = min(MAX_MATCH1, chunk_len - pos)
        if max_match < min_match:
            return -1, -1
        max_match -= 8
        best_len = 0
        best_idx = -1
        for i in range(counter, counter - pos_checks, -1):
            ref = matches[mbase + (i & mask_checks)]
            if ref & HASH_MASK != hash32:
                continue
            ref &= ~HASH_MASK
            if src[base + ref + best_len] != src[base + pos + best_len]:
                continue
            n = 0
            while n < max_match:
                diff = _le64(src, base + ref + n) ^ _le64(src, base + pos + n)
                if diff:
                    n += _ctz(diff) >> 3
                    break
                n += 8
            if n > best_len:
                best_idx = i
                best_len = n
        if best_len < min_match:
            return -1, -1
        return counter - best_idx, best_len - min_match

    start_chunk = 0
    while start_chunk < src_end:
        matches = [0] * (HASH_SIZE << log_pos_checks)
        end_chunk = start_chunk + size_chunk
        if end_chunk >= src_end:
            end_chunk = src_end
            size_chunk = end_chunk - start_chunk
        base = start_chunk
        lit_buf = bytearray()
        len_buf = bytearray()
        midx_buf = bytearray()
        tk_buf = bytearray()
        n = min(src_end - start_chunk, 2 if bs_version < 3 else 8)
        lit_buf += src[base:base + n]
        src_idx = n
        first_lit = src_idx
        src_inc = 0

        while src_idx < size_chunk:
            key = key_fn(src, base + src_idx - delta)
            mbase = key << log_pos_checks
            hash32 = _rolz_hash(src, base + src_idx)
            match_idx, match_len = find_match(base, size_chunk, src_idx,
                                              hash32, counters[key], mbase)
            counters[key] = (counters[key] + 1) & mask_checks
            matches[mbase + counters[key]] = hash32 | src_idx
            if match_idx < 0:
                src_idx += 1 + (src_inc >> 6)
                src_inc += 1
                continue

            src_idx1 = src_idx + 1
            key = key_fn(src, base + src_idx1 - delta)
            mbase = key << log_pos_checks
            hash32 = _rolz_hash(src, base + src_idx1)
            match_idx1, match_len1 = find_match(base, size_chunk, src_idx1,
                                                hash32, counters[key], mbase)
            if match_idx1 >= 0 and match_len1 > match_len:
                match_idx = match_idx1
                match_len = match_len1
                src_idx = src_idx1
                counters[key] = (counters[key] + 1) & mask_checks
                matches[mbase + counters[key]] = hash32 | src_idx

            lit_len = src_idx - first_lit
            if match_len >= 7:
                token = 7
                _emit_length(len_buf, match_len - 7)
            else:
                token = match_len
            if lit_len > 0:
                if lit_len >= 31:
                    token |= 0xF8
                    _emit_length(len_buf, lit_len - 31)
                else:
                    token |= lit_len << 3
                lit_buf += src[base + first_lit:base + first_lit + lit_len]
            tk_buf.append(token)
            midx_buf.append(match_idx & 0xFF)
            src_idx += match_len + min_match
            first_lit = src_idx
            src_inc = 0

        src_idx = size_chunk
        lit_len = src_idx - first_lit
        if len(tk_buf) != 0:
            tk_buf.append(0xF8 if lit_len >= 31 else lit_len << 3)
        if lit_len > 0:
            if lit_len >= 31:
                _emit_length(len_buf, lit_len - 31)
            lit_buf += src[base + first_lit:base + first_lit + lit_len]

        obs = SpecOBS()
        obs.write_bits(len(lit_buf), 32)
        obs.write_bits(len(tk_buf), 32)
        obs.write_bits(len(len_buf), 32)
        obs.write_bits(len(midx_buf), 32)
        lit_enc = SpecANSEncoder(order=lit_order,
                                 chunk_size=32768 if bs_version < 4 else 16384)
        lit_enc.obs = obs
        lit_enc.write(bytes(lit_buf))
        m_enc = SpecANSEncoder(order=0, chunk_size=32768)
        m_enc.obs = obs
        m_enc.write(bytes(tk_buf))
        m_enc.write(bytes(len_buf))
        m_enc.write(bytes(midx_buf))
        payload = obs.close()
        if len(out) + len(payload) > dst_len:
            raise SpecSkip("destination buffer too small")
        out += payload
        start_chunk = end_chunk

    if len(out) + 4 > dst_len:
        raise SpecSkip("destination buffer too small")
    out += src[src_end:]
    if len(out) >= count:
        raise SpecSkip("no compression")
    return bytes(out)


class _RangeEncoder:
    """rolzEncoder, v2/transform/ROLZCodec.go:1360-1460."""

    def __init__(self, lit_log: int, m_log: int) -> None:
        self.low = 0
        self.high = TOP
        self.logs = [m_log, lit_log]          # [MATCH_CTX, LITERAL_CTX]
        self.probs = [[PSCALE >> 1] * (256 << m_log),
                      [PSCALE >> 1] * (256 << lit_log)]
        self.pidx = LITERAL_CTX
        self.ctx = 0
        self.c1 = 1
        self.out = bytearray()

    def reset(self) -> None:
        for arr in self.probs:
            for i in range(len(arr)):
                arr[i] = PSCALE >> 1

    def set_context(self, n: int, ctx: int) -> None:
        self.pidx = n
        self.ctx = ctx << self.logs[n]

    def _encode_bit(self, bit: int) -> None:
        p = self.probs[self.pidx]
        i = self.ctx + self.c1
        split = (((self.high - self.low) >> 4) * (p[i] >> 4)) >> 8
        if bit:
            self.high = self.low + split
            p[i] -= (p[i] - PSCALE + 32) >> 5
            self.c1 += self.c1 + 1
        else:
            self.low += split + 1
            p[i] -= p[i] >> 5
            self.c1 += self.c1
        while ((self.low ^ self.high) >> 24) == 0:
            self.out += ((self.high >> 32) & M32).to_bytes(4, "big")
            self.low = (self.low << 32) & M64
            self.high = ((self.high << 32) | M32) & M64

    def encode9(self, val: int) -> None:
        self.c1 = 1
        for b in range(8, -1, -1):
            self._encode_bit(val & (1 << b))

    def encode_bits(self, val: int, n: int) -> None:
        self.c1 = 1
        while n:
            n -= 1
            self._encode_bit(val & (1 << n))

    def dispose(self) -> None:
        for _ in range(8):
            self.out.append((self.low >> 56) & 0xFF)
            self.low = (self.low << 8) & M64


def rolz2_forward(src: bytes, dst_len: int | None = None,
                  log_pos_checks: int = 5, dt: int | None = None,
                  bs_version: int = 6) -> bytes:
    count = len(src)
    if count < 64:
        raise SpecSkip("block too small")
    if dst_len is None:
        dst_len = count + 1024 if count <= 16384 else count + count // 32
    src_end = count - 4
    pos_checks = 1 << log_pos_checks
    mask_checks = pos_checks - 1
    counters = [0] * HASH_SIZE
    min_match = MIN_MATCH3
    delta = 2
    flags = 0

    dt = _pick_mode(src, dt)
    if bs_version >= 4:
        if dt == DT_EXE:
            delta = 3
            flags |= 8
        elif dt == DT_DNA:
            # DELIBERATE divergence from the reference encoder (which sets
            # flags=1 with delta=2, ROLZCodec.go:1120-1123): those streams
            # are undecodable by construction — getKey2 reads 8 bytes from
            # pos-2, i.e. six bytes past the decode frontier — and the
            # reference's own v4+ decoder never parses flags==1 anyway. The
            # engine (and this spec) emit the combination the format's
            # decoders define and decode: delta=8, minMatch=7, flags=4
            # (reference Inverse :1234-1239), mirroring codec1's DNA mode.
            min_match = MIN_MATCH7
            delta = 8
            flags = 4
    elif bs_version >= 3:
        # v3 semantics (ROLZCodec.go:1242-1248): flags==1 selects MM7 and
        # the decoder honors it; delta stays 2
        if dt == DT_DNA:
            min_match = MIN_MATCH7
            flags = 1
    # pre-v3: no flags byte at all, MM3/delta 2

    key_fn = _get_key1 if min_match == MIN_MATCH3 else _get_key2
    enc = _RangeEncoder(9, log_pos_checks)
    matches = [0] * (HASH_SIZE << log_pos_checks)

    def find_match(base, chunk_len, pos, key):
        max_match = min(MAX_MATCH2, chunk_len - pos)
        if max_match < min_match:
            return -1, -1            # early out does NOT register
        max_match -= 4
        mbase = key << log_pos_checks
        hash32 = _rolz_hash(src, base + pos)
        counter = counters[key]
        best_len = 0
        best_idx = -1
        for i in range(counter, counter - pos_checks, -1):
            ref = matches[mbase + (i & mask_checks)]
            if ref & HASH_MASK != hash32:
                continue
            ref &= ~HASH_MASK
            if src[base + ref + best_len] != src[base + pos + best_len]:
                continue
            n = 0
            while n < max_match:
                diff = _le32(src, base + ref + n) ^ _le32(src, base + pos + n)
                if diff:
                    n += _ctz(diff) >> 3
                    break
                n += 4
            if n > best_len:
                best_idx = i
                best_len = n
                if best_len == max_match:
                    break
        counters[key] = (counters[key] + 1) & mask_checks
        matches[mbase + counters[key]] = hash32 | pos
        if best_len < min_match:
            return -1, -1
        return counter - best_idx, best_len - min_match

    size_chunk = min(count, CHUNK_SIZE)
    start_chunk = 0
    src_idx = 0
    while start_chunk < src_end:
        for i in range(len(matches)):
            matches[i] = 0
        end_chunk = start_chunk + size_chunk
        if end_chunk >= src_end:
            end_chunk = src_end
        size_chunk = end_chunk - start_chunk
        enc.reset()
        base = start_chunk
        src_idx = 0
        mm = (2 if bs_version < 3 else 8) \
            if start_chunk < src_end else src_end - start_chunk
        enc.set_context(LITERAL_CTX, 0)
        for _ in range(mm):
            enc.encode9((LITERAL_FLAG << 8) | src[base + src_idx])
            src_idx += 1

        while src_idx < size_chunk:
            enc.set_context(LITERAL_CTX, src[base + src_idx - 1])
            key = key_fn(src, base + src_idx - delta)
            match_idx, match_len = find_match(base, size_chunk, src_idx, key)
            if match_idx < 0:
                enc.encode9((LITERAL_FLAG << 8) | src[base + src_idx])
                src_idx += 1
                continue
            enc.encode9((MATCH_FLAG << 8) | match_len)
            enc.set_context(MATCH_CTX, src[base + src_idx - 1])
            enc.encode_bits(match_idx, log_pos_checks)
            src_idx += match_len + min_match
        start_chunk = end_chunk

    src_idx += start_chunk - size_chunk
    for _ in range(4):
        enc.set_context(LITERAL_CTX, src[src_idx - 1])
        enc.encode9((LITERAL_FLAG << 8) | src[src_idx])
        src_idx += 1
    enc.dispose()

    out = count.to_bytes(4, "big") \
        + (b"" if bs_version < 3 else bytes([flags])) + bytes(enc.out)
    if len(out) >= count:
        raise SpecSkip("no compression")
    if len(out) > dst_len:
        raise SpecSkip("destination buffer too small")
    return bytes(out)
