"""Spec models of the byte-scan transforms: ZRLT, RLT, SRT, SBRT.

References:
  - ZRLT  v2/transform/ZRLT.go:58-137  (zero runs as one BIT per byte, MSB
          implied; values >= 0xFE escaped 0xFF)
  - RLT   v2/transform/RLT.go:66-319   (escaped RLE, threshold 3, 224/6944
          run-length break points, least-frequent escape unless a fast
          entropy coder is in use)
  - SRT   v2/transform/SRT.go:49-180,268-283 (sorted-rank transform, 256
          varint frequency header, shell-sorted symbol order)
  - SBRT  v2/transform/SBRT.go:51-175  (sort-by-rank family: MTF/RANK/
          TIMESTAMP via mask1/mask2/shift parametrization)
"""

from __future__ import annotations


class SpecSkip(Exception):
    pass


def zrlt_forward(src: bytes) -> bytes:
    n = len(src)
    out = bytearray()
    dst_end = n                 # do not expand
    i = 0
    while i < n:
        if src[i] == 0:
            run_start = i - 1
            i += 1
            while i + 1 < n and (src[i] | src[i + 1]) == 0:
                i += 2
            while i < n and src[i] == 0:
                i += 1
            run_length = i - run_start
            log2 = run_length.bit_length() - 1
            if len(out) >= dst_end - log2:
                raise SpecSkip("output too small")
            for k in range(log2 - 1, -1, -1):
                out.append((run_length >> k) & 1)
            continue
        if src[i] >= 0xFE:
            if len(out) >= dst_end - 1:
                raise SpecSkip("output too small")
            out.append(0xFF)
            out.append(src[i] - 0xFE)
        else:
            if len(out) >= dst_end:
                raise SpecSkip("output too small")
            out.append(src[i] + 1)
        i += 1
    return bytes(out)


_RLT_ENC1 = 224
_RLT_ENC2 = (255 - _RLT_ENC1) << 8
_RLT_THRESHOLD = 3
_RLT_MAX_RUN = 0xFFFF + _RLT_ENC2 + _RLT_THRESHOLD - 1
_RLT_MAX_RUN4 = _RLT_MAX_RUN - 4


def _rlt_emit_run(out: bytearray, run: int) -> None:
    run -= _RLT_THRESHOLD
    if run < _RLT_ENC1:
        out.append(run)
        return
    if run < _RLT_ENC2:
        run -= _RLT_ENC1
        out.append(_RLT_ENC1 + (run >> 8))
    else:
        run -= _RLT_ENC2
        out.append(0xFF)
        out.append((run >> 8) & 0xFF)
    out.append(run & 0xFF)


def rlt_forward(src: bytes, fast_entropy: bool = False) -> bytes:
    """fast_entropy mirrors ctx entropy in {NONE, ANS0, HUFFMAN, RANGE}:
    escape 0xFB without histogram search. dataType gating is the caller's
    concern (tests pass non-DNA/BASE64/UTF8 data)."""
    n = len(src)
    if n < 16:
        raise SpecSkip("too small")
    if fast_entropy:
        escape = 0xFB
    else:
        freqs = [0] * 256
        for b in src:
            freqs[b] += 1
        min_idx = 0
        if freqs[0] > 0:
            for i, f in enumerate(freqs):
                if f < freqs[min_idx]:
                    min_idx = i
                    if f == 0:
                        break
        escape = min_idx

    out = bytearray()
    src_end4 = n - 4
    i = 0
    run = 0
    prev = src[i]
    i += 1
    out.append(escape)
    out.append(prev)
    if prev == escape:
        out.append(0)

    while True:
        if prev == src[i]:
            if src[i:i + 4] == bytes([prev]) * 4:
                i += 4
                run += 4
                if run < _RLT_MAX_RUN4 and i < src_end4:
                    continue
            else:
                i += 1
                run += 1
                if prev == src[i]:
                    i += 1
                    run += 1
                    if prev == src[i]:
                        i += 1
                        run += 1
                        if run < _RLT_MAX_RUN4 and i < src_end4:
                            continue
        if run > _RLT_THRESHOLD:
            out.append(prev)
            if prev == escape:
                out.append(0)
            out.append(escape)
            _rlt_emit_run(out, run)
        elif prev != escape:
            out.extend(bytes([prev]) * run)
        else:
            out.extend(bytes([escape, 0]) * run)
        prev = src[i]
        i += 1
        run = 1
        if i >= src_end4:
            break

    if prev != escape:
        out.extend(bytes([prev]) * run)
    else:
        out.extend(bytes([escape, 0]) * run)
    while i < n:
        if src[i] == escape:
            out.extend(bytes([escape, 0]))
            i += 1
            continue
        out.append(src[i])
        i += 1
    if len(out) >= i:
        raise SpecSkip("no compression")
    return bytes(out)


def srt_forward(src: bytes) -> bytes:
    count = len(src)
    s2r = [0] * 256
    r2s = [0] * 256
    freqs = [0] * 256
    b = 0
    i = 0
    while i < count:
        c = src[i]
        if freqs[c] == 0:
            r2s[b] = c
            s2r[c] = b
            b += 1
        j = i + 1
        while j < count and src[j] == c:
            j += 1
        freqs[c] += j - i
        i = j

    # shell-sort the present symbols by (freq desc, symbol asc)
    symbols = [i for i in range(256) if freqs[i]]
    nb = len(symbols)
    h = 4
    while h < nb:
        h = h * 3 + 1
    while True:
        h //= 3
        for i in range(h, nb):
            t = symbols[i]
            bj = i - h
            while bj >= 0 and (freqs[symbols[bj]] < freqs[t]
                              or (t < symbols[bj]
                                  and freqs[t] == freqs[symbols[bj]])):
                symbols[bj + h] = symbols[bj]
                bj -= h
            symbols[bj + h] = t
        if h == 1:
            break

    buckets = [0] * 256
    pos = 0
    for c in symbols:
        buckets[c] = pos
        pos += freqs[c]

    header = bytearray()
    for f in freqs:
        while f >= 128:
            header.append(0x80 | (f & 0x7F))
            f >>= 7
        header.append(f)

    body = bytearray(count)
    i = 0
    while i < count:
        c = src[i]
        r = s2r[c]
        p = buckets[c]
        body[p] = r
        p += 1
        if r > 0:
            while True:
                t = r2s[r - 1]
                r2s[r] = t
                s2r[t] = r
                if r == 1:
                    break
                r -= 1
            r2s[0] = c
            s2r[c] = 0
        i += 1
        while i < count and src[i] == c:
            body[p] = 0
            p += 1
            i += 1
        buckets[c] = p
    return bytes(header) + bytes(body)


def sbrt_forward(src: bytes, mode: str) -> bytes:
    """mode in {'MTF', 'RANK', 'TIMESTAMP'}."""
    mask1 = 0 if mode == "TIMESTAMP" else -1
    mask2 = 0 if mode == "MTF" else -1
    shift = 1 if mode == "RANK" else 0
    s2r = list(range(256))
    r2s = list(range(256))
    p = [0] * 256
    q = [0] * 256
    out = bytearray(len(src))
    for i, c in enumerate(src):
        r = s2r[c]
        out[i] = r
        qc = ((i & mask1) + (p[c] & mask2)) >> shift
        p[c] = i
        q[c] = qc
        while r > 0 and q[r2s[r - 1]] <= qc:
            t = r2s[r - 1]
            r2s[r] = t
            s2r[t] = r
            r -= 1
        r2s[r] = c
        s2r[c] = r
    return bytes(out)
