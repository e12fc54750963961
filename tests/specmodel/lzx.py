"""Spec model of the LZX forward transform (LZ=3 and LZX=16 variants).

Reference: v2/transform/LZCodec.go:131-608 — modified-LZ4 with 40-bit
mul-hash (2^16 / 2^19 buckets), two repeat distances, optional +1/+2
position probing (LZX), token = 3-bit litLen | 2-3-bit flag | 2-3-bit mLen,
254/255-escaped lengths, and the 4-section output layout
[13-byte header][literals][tokens][distances][extra match lens] with three
little-endian uint32 section sizes + flags byte at offset 12.
"""

from __future__ import annotations

HASH_SEED = 0x1E35A7BD
MAX_DISTANCE1 = (1 << 16) - 2
MAX_DISTANCE2 = (1 << 24) - 2
MIN_MATCH4 = 4
MIN_MATCH6 = 6
MAX_MATCH = 65535 + 254 + MIN_MATCH4
MIN_BLOCK_LENGTH = 24
M64 = (1 << 64) - 1


class LZXSkip(Exception):
    pass


def _le64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 8].ljust(8, b"\0"), "little")


def _le32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4].ljust(4, b"\0"), "little")


def _emit_length(out: bytearray, length: int) -> None:
    if length < 254:
        out.append(length)
    elif length < 65536 + 254:
        length -= 254
        out.append(254)
        out.append((length >> 8) & 0xFF)
        out.append(length & 0xFF)
    else:
        length -= 255
        out.append(255)
        out.append((length >> 16) & 0xFF)
        out.append((length >> 8) & 0xFF)
        out.append(length & 0xFF)


def _find_match(src: bytes, src_idx: int, ref: int, max_match: int) -> int:
    best = 0
    while best + 8 <= max_match:
        diff = _le64(src, src_idx + best) ^ _le64(src, ref + best)
        if diff != 0:
            ctz = (diff & -diff).bit_length() - 1   # TrailingZeros64
            best += ctz >> 3
            break
        best += 8
    return best


def lzx_forward(src: bytes, extra: bool = False,
                min_match: int = MIN_MATCH4) -> bytes:
    """Returns the transformed bytes, or raises LZXSkip (=> transform skipped,
    exactly like the reference returning an error from Forward)."""
    count = len(src)
    if count < MIN_BLOCK_LENGTH:
        raise LZXSkip("block too small")

    hash_log = 19 if extra else 16
    rshift = 64 - hash_log
    hashes = [0] * (1 << hash_log)

    def hsh(i: int) -> int:
        return (((_le64(src, i) << 24) & M64) * HASH_SEED & M64) >> rshift

    src_end = count - 16 - 2
    max_dist = MAX_DISTANCE2
    flags = 1
    if src_end < 4 * MAX_DISTANCE1:
        max_dist = MAX_DISTANCE1
        flags = 0
    flags |= ((min_match - 2) & 0x07) << 1

    literals = bytearray()          # dst[13:], grows with lit runs + lengths
    tk_buf = bytearray()
    m_buf = bytearray()
    mlen_buf = bytearray()
    src_idx = 0
    anchor = 0
    repd = [count, count]
    repd_idx = 0
    src_inc = 0

    while src_idx < src_end:
        best_len = 0
        h0 = hsh(src_idx)
        ref0 = hashes[h0]
        hashes[h0] = src_idx
        p = _le64(src, src_idx)
        src_idx1 = src_idx + 1
        max_match = min(src_end - src_idx1, MAX_MATCH)
        ref = src_idx1 - repd[repd_idx]
        min_ref = max(src_idx - max_dist, 0)

        if ref > min_ref and ((p >> 8) & 0xFFFFFFFF) == _le32(src, ref):
            best_len = _find_match(src, src_idx1, ref, max_match)
        else:
            ref = src_idx1 - repd[repd_idx ^ 1]
            if ref > min_ref and ((p >> 8) & 0xFFFFFFFF) == _le32(src, ref):
                best_len = _find_match(src, src_idx1, ref, max_match)

        if best_len < min_match:
            ref = ref0
            found = False
            if ref > min_ref and (p & 0xFFFFFFFF) == _le32(src, ref):
                best_len = _find_match(src, src_idx, ref,
                                       min(src_end - src_idx, MAX_MATCH))
                found = best_len >= min_match
            if not found:
                src_idx = src_idx1 + (src_inc >> 6)
                src_inc += 1
                repd_idx = 0
                continue
            # checkNext
            if ref != src_idx - repd[0] and ref != src_idx - repd[1]:
                h1 = hsh(src_idx1)
                ref1 = hashes[h1]
                hashes[h1] = src_idx1
                if ref1 > min_ref + 1 and \
                        _le32(src, src_idx1 + best_len - 3) == _le32(src, ref1 + best_len - 3):
                    best_len1 = _find_match(src, src_idx1, ref1, max_match)
                    if best_len1 >= best_len:
                        ref = ref1
                        best_len = best_len1
                        src_idx = src_idx1
                if extra:
                    src_idx2 = src_idx1 + 1
                    h2 = hsh(src_idx2)
                    ref2 = hashes[h2]
                    hashes[h2] = src_idx2
                    if ref2 > min_ref + 2 and \
                            _le32(src, src_idx2 + best_len - 3) == _le32(src, ref2 + best_len - 3):
                        best_len2 = _find_match(src, src_idx2, ref2,
                                                min(src_end - src_idx2, MAX_MATCH))
                        if best_len2 >= best_len:
                            ref = ref2
                            best_len = best_len2
                            src_idx = src_idx2
            # extend backwards
            while src_idx > anchor and ref > min_ref and \
                    src[src_idx - 1] == src[ref - 1]:
                best_len += 1
                ref -= 1
                src_idx -= 1
            if best_len > MAX_MATCH:
                src_idx += best_len - MAX_MATCH
                ref += best_len - MAX_MATCH
                best_len = MAX_MATCH
        else:
            if src[src_idx] == src[ref - 1] and best_len < MAX_MATCH:
                best_len += 1
                ref -= 1
            else:
                src_idx += 1
                hashes[hsh(src_idx)] = src_idx

        # emit match
        src_inc = 0
        dist = src_idx - ref
        m_len = best_len - min_match
        if dist == repd[0]:
            token, mlen_th = 0x00, 3
        elif dist == repd[1]:
            token, mlen_th = 0x04, 3
        else:
            mlen_th = 7
            if dist >= 256:
                if dist >= 65536:
                    m_buf.append((dist >> 16) & 0xFF)
                    m_buf.append((dist >> 8) & 0xFF)
                    token = 0x18
                else:
                    m_buf.append((dist >> 8) & 0xFF)
                    token = 0x10
            else:
                token = 0x08
            m_buf.append(dist & 0xFF)

        if m_len >= mlen_th:
            token += mlen_th
            _emit_length(mlen_buf, m_len - mlen_th)
        else:
            token += m_len

        repd[1] = repd[0]
        repd[0] = dist
        repd_idx = 1
        lit_len = src_idx - anchor

        if lit_len == 0:
            tk_buf.append(token)
        else:
            if lit_len >= 7:
                if lit_len >= 1 << 24:
                    raise LZXSkip("too many literals")
                tk_buf.append((7 << 5) | token)
                _emit_length(literals, lit_len - 7)
            else:
                tk_buf.append((lit_len << 5) | token)
            literals.extend(src[anchor:anchor + lit_len])

        anchor = src_idx + best_len
        while src_idx + 4 < anchor:
            src_idx += 4
            v = _le64(src, src_idx - 3)
            for k in range(4):
                hv = ((((v >> (8 * k)) << 24) & M64) * HASH_SEED & M64) >> rshift
                hashes[hv] = src_idx - 3 + k
        src_idx += 1
        while src_idx < anchor:
            hashes[hsh(src_idx)] = src_idx
            src_idx += 1

    # last literals
    lit_len = count - anchor
    dst_idx = 13 + len(literals)
    if dst_idx + lit_len + len(tk_buf) + len(m_buf) >= count:
        raise LZXSkip("no compression")
    if lit_len >= 7:
        tk_buf.append(7 << 5)
        _emit_length(literals, lit_len - 7)
    else:
        tk_buf.append(lit_len << 5)
    literals.extend(src[anchor:anchor + lit_len])

    lit_end = 13 + len(literals)
    out = bytearray()
    out += lit_end.to_bytes(4, "little")
    out += len(tk_buf).to_bytes(4, "little")
    out += len(m_buf).to_bytes(4, "little")
    out.append(flags)
    out += literals
    out += tk_buf
    out += m_buf
    out += mlen_buf

    if len(out) > count - count // 100:
        raise LZXSkip("no compression")
    return bytes(out)


# ---------------------------------------------------------------------------
# LZP (v2/transform/LZCodec.go:943-1105): order-4 context hash predicts one
# position; matches >= 64 emit 0xFC + 254-escaped length; literal 0xFC with a
# live prediction is escaped with 0xFF.
# ---------------------------------------------------------------------------

LZP_HASH_SEED = 0x7FEB352D
LZP_HASH_LOG = 16
LZP_MIN_MATCH = 64
LZP_MATCH_FLAG = 0xFC
LZP_MIN_BLOCK = 128
M32 = (1 << 32) - 1


def lzp_forward(src: bytes) -> bytes:
    count = len(src)
    if count < LZP_MIN_BLOCK:
        raise LZXSkip("block too small")
    dst_end = count - (count >> 6)
    hashes = [0] * (1 << LZP_HASH_LOG)
    out = bytearray(src[:4])
    ctx = int.from_bytes(src[0:4], "little")
    i = 4
    while i < count - LZP_MIN_MATCH and len(out) < dst_end:
        h = ((LZP_HASH_SEED * ctx) & M32) >> (32 - LZP_HASH_LOG)
        ref = hashes[h]
        hashes[h] = i
        best = 0
        if ref != 0 and _le64(src, i + LZP_MIN_MATCH - 8) == \
                _le64(src, ref + LZP_MIN_MATCH - 8):
            best = _find_match(src, i, ref, count - i)
        if best < LZP_MIN_MATCH:
            val = src[i]
            ctx = ((ctx << 8) | val) & M32
            out.append(val)
            i += 1
            if ref != 0 and val == LZP_MATCH_FLAG:
                out.append(0xFF)
            continue
        i += best
        ctx = int.from_bytes(src[i - 4:i], "little")
        out.append(LZP_MATCH_FLAG)
        best -= LZP_MIN_MATCH
        while best >= 254:
            best -= 254
            out.append(0xFE)
            if len(out) >= dst_end:
                break
        out.append(best & 0xFF)
    while i < count and len(out) < dst_end:
        h = ((LZP_HASH_SEED * ctx) & M32) >> (32 - LZP_HASH_LOG)
        ref = hashes[h]
        hashes[h] = i
        val = src[i]
        ctx = ((ctx << 8) | val) & M32
        out.append(val)
        i += 1
        if ref != 0 and val == LZP_MATCH_FLAG:
            out.append(0xFF)
    if i != count or len(out) >= dst_end:
        raise LZXSkip("output too small")
    return bytes(out)
