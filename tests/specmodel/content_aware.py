"""Spec models of the UTF and PACK/DNA (alias) transforms.

References:
  - UTFCodec   v2/transform/UTFCodec.go:27-390,393-546 — codepoints packed
               into 22-bit map keys, ranked by frequency, replaced by 1-2
               byte aliases; header = [start][adjust][2-byte count][3
               bytes/symbol map]; statistical + structural UTF validation.
  - AliasCodec v2/transform/AliasCodec.go:27-290 — >=240 absent byte values
               pack 4->1 or 2->1 nibbles; otherwise the top digrams get the
               free 1-byte aliases (3-byte map entries, trailing odd byte
               flag at dst[1]).
DataType gating (MULTIMEDIA/EXE/BIN/UTF8 skips, DetectSimpleType) belongs
to the caller; tests pass data that does not trip it, or set ctx to match.
"""

from __future__ import annotations


class SpecSkip(Exception):
    pass


_UTF_SIZES = ([1] * 128) + ([0] * 66) + ([2] * 30) + ([3] * 16) + \
    ([4] * 5) + ([0] * 11)
assert len(_UTF_SIZES) == 256


def _pack_utf(b: bytes, i: int) -> tuple[int, int]:
    s = _UTF_SIZES[b[i]]
    if s == 1:
        return 1, b[i]
    if s == 2:
        return 2, (1 << 19) | (b[i] << 8) | b[i + 1]
    if s == 3:
        return 3, ((2 << 19) | ((b[i] & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6)
                   | (b[i + 2] & 0x3F))
    if s == 4:
        return 4, ((4 << 19) | ((b[i] & 0x07) << 18) | ((b[i + 1] & 0x3F) << 12)
                   | ((b[i + 2] & 0x3F) << 6) | (b[i + 3] & 0x3F))
    return 0, 0


def _validate_utf(block: bytes) -> bool:
    freqs0 = [0] * 256
    freqs1 = [[0] * 256 for _ in range(256)]
    count = len(block)
    end4 = count & -4
    prv = 0
    for i in range(0, end4, 4):
        c0, c1, c2, c3 = block[i], block[i + 1], block[i + 2], block[i + 3]
        freqs0[c0] += 1
        freqs0[c1] += 1
        freqs0[c2] += 1
        freqs0[c3] += 1
        freqs1[prv][c0] += 1
        freqs1[c0][c1] += 1
        freqs1[c1][c2] += 1
        freqs1[c2][c3] += 1
        prv = c3
        if i & 0x0FFF == 0:
            if freqs0[0xC0] + freqs0[0xC1] + sum(freqs0[0xF5:]) != 0:
                return False
    if end4 != count:
        for i in range(end4, count):
            cur = block[i]
            freqs0[cur] += 1
            freqs1[prv][cur] += 1
            prv = cur
        if freqs0[0xC0] + freqs0[0xC1] + sum(freqs0[0xF5:]) != 0:
            return False

    s = 0
    sum2 = 0
    for i in range(256):
        if i < 0xA0 or i > 0xBF:
            s += freqs1[0xE0][i]
        if i < 0x80 or i > 0x9F:
            s += freqs1[0xED][i]
        if i < 0x90 or i > 0xBF:
            s += freqs1[0xF0][i]
        if i < 0x80 or i > 0x8F:
            s += freqs1[0xF4][i]
        if i < 0x80 or i > 0xBF:
            for j in list(range(0xC2, 0xE0)) + list(range(0xE1, 0xED)) + \
                    [0xF1, 0xF2, 0xF3, 0xEE, 0xEF]:
                s += freqs1[j][i]
        else:
            sum2 += freqs0[i]
        if s != 0:
            return False
    return sum2 >= count // 8


def utf_forward(src: bytes, must_validate: bool = True) -> bytes:
    count = len(src)
    if count < 1024:
        raise SpecSkip("too small")
    start = 0
    if int.from_bytes(src[0:4], "big") & 0x00FFFFFF == 0x00EFBBBF:
        start = 3
    else:
        while start < 4 and _UTF_SIZES[src[start]] == 0:
            start += 1
    if must_validate and not _validate_utf(src[start:count - 4]):
        raise SpecSkip("not UTF")

    alias_map = [0] * (1 << 22)
    syms = []
    i = start
    while i < count - 4:
        s, val = _pack_utf(src, i)
        res = s != 0
        res = res and (s != 3 or (src[i + 2] & 0xC0) == 0x80)
        res = res and (s != 4 or
                       (((src[i + 2] << 8) | src[i + 3]) & 0xC0C0) == 0x8080)
        if alias_map[val] == 0:
            syms.append(val)
            res = res and len(syms) < 32768
        if not res:
            raise SpecSkip("invalid or too complex")
        alias_map[val] += 1
        i += s
    n = len(syms)
    if n == 0:
        raise SpecSkip("not UTF")
    max_target = count - count // 10
    if 3 * n + 6 >= max_target:
        raise SpecSkip("no improvement")

    ranked = sorted(syms, key=lambda v: (alias_map[v], v))
    out = bytearray(2)
    out.append((n >> 8) & 0xFF)
    out.append(n & 0xFF)
    estimate = len(out) + 6
    for i2 in range(n):
        s = ranked[n - 1 - i2]
        out += s.to_bytes(3, "big")
        if i2 < 128:
            estimate += alias_map[s]
            alias_map[s] = i2
        else:
            estimate += 2 * alias_map[s]
            alias_map[s] = 0x10080 | ((i2 << 1) & 0xFF00) | (i2 & 0x7F)
    if estimate >= max_target:
        raise SpecSkip("no improvement")

    out += src[:start]
    i = start
    while i < count - 4:
        s, val = _pack_utf(src, i)
        i += s
        alias = alias_map[val]
        out.append(alias & 0xFF)
        if alias >> 16:
            out.append((alias >> 8) & 0xFF)
    out[0] = start
    out[1] = (i - (count - 4)) & 0xFF
    out += src[i:]
    if len(out) >= max_target:
        raise SpecSkip("no improvement")
    return bytes(out)


def alias_forward(src: bytes) -> bytes:
    """PACK forward (no DNA gating, caller controls data type)."""
    count = len(src)
    if count < 1024:
        raise SpecSkip("too small")
    freqs0 = [0] * 256
    for b in src:
        freqs0[b] += 1
    absent = [i for i in range(256) if freqs0[i] == 0]
    n0 = len(absent)
    if n0 < 16:
        raise SpecSkip("not enough free slots")

    out = bytearray()
    if n0 >= 240:
        out.append(n0)
        if n0 == 255:
            out.append(src[0])
            out += count.to_bytes(4, "little")
        else:
            map8 = [0] * 256
            j = 0
            for i in range(256):
                if freqs0[i]:
                    out.append(i)
                    map8[i] = j
                    j += 1
            if n0 >= 252:                 # <= 4 symbols: pack 4 -> 1
                c3 = count & 3
                out.append(c3)
                out += src[:c3]
                for i in range(c3, count, 4):
                    out.append((map8[src[i]] << 6) | (map8[src[i + 1]] << 4)
                               | (map8[src[i + 2]] << 2) | map8[src[i + 3]])
            else:                         # <= 16 symbols: pack 2 -> 1
                out.append(count & 1)
                i = 0
                if count & 1:
                    out.append(src[0])
                    i = 1
                while i < count:
                    out.append((map8[src[i]] << 4) | map8[src[i + 1]])
                    i += 2
    else:
        # order-1 histogram, no totals (v2/internal/Global.go:305-343)
        from .entropy_utils import compute_histogram
        freqs1 = [0] * 65536
        compute_histogram(src, freqs1, False, False)
        symb = [(i, freqs1[i]) for i in range(65536) if freqs1[i]]
        n1 = len(symb)
        if n0 > n1:
            n0 = n1
            if n0 < 16:
                raise SpecSkip("not enough free slots")
        symb.sort(key=lambda sf: (-sf[1], -sf[0]))
        map16 = [0x100 | (i >> 8) for i in range(65536)]
        savings = 0
        out.append(n0)
        out.append(0)
        for i in range(n0):
            val, freq = symb[i]
            savings += freq
            map16[val] = 0x200 | absent[i]
            out.append((val >> 8) & 0xFF)
            out.append(val & 0xFF)
            out.append(absent[i])
        if savings < count // 20:
            raise SpecSkip("not enough savings")
        i = 0
        src_end = count - 1
        while i < src_end:
            alias = map16[(src[i] << 8) | src[i + 1]]
            out.append(alias & 0xFF)
            i += alias >> 8
        if i != count:
            out[1] = 1
            out.append(src[i])
            i += 1
    if len(out) >= count:
        raise SpecSkip("not enough savings")
    return bytes(out)
