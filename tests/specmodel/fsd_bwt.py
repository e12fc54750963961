"""Spec models: FSD (fixed-step delta) and brute-force BWT/BWTS oracles.

References:
  - FSDCodec  v2/transform/FSDCodec.go:25-322 — stride detection via XOR
              histograms at {1,2,3,4,8,16} on three sub-blocks, delta
              (zigzag, 0xFF escape) vs xor coding chosen by 3% large-delta
              sampling, post-hoc entropy re-check.
  - Log2ScaledBy1024 / entropy1024  v2/internal/Global.go:171-214.
  - BWT       definitional oracle: sorted rotations of src+sentinel
              (equivalently the suffix array), with the reference's output
              layout and per-chunk primary-index rule
              (v2/transform/DivSufSort.go:179-311, BWT.go:631-637).
  - BWTS      definitional oracle: Lyndon factorization (Duval), all word
              rotations sorted by their infinite periodic order, last
              characters (the bijective BWT the reference computes via
              mk-bwts, v2/transform/BWTS.go:58-170).
The brute-force oracles are O(n^2 log n)-ish — for small inputs only.
"""

from __future__ import annotations

import math


class SpecSkip(Exception):
    pass


def _log2_1024(x: int) -> int:
    """Log2ScaledBy1024 (exact integer semantics via the 4096 table rule)."""
    assert x > 0
    if x < 256:
        return (_LOG2_4096[x] + 2) >> 2
    log = x.bit_length() - 1
    if x & (x - 1) == 0:
        return log << 10
    return (log - 7) * 1024 + ((_LOG2_4096[x >> (log - 7)] + 2) >> 2)


_LOG2_4096 = [0] + [round(4096 * math.log2(x)) for x in range(1, 257)]


def entropy1024(block_len: int, histo: list[int]) -> int:
    if block_len == 0:
        return 0
    s = 0
    log_len = _log2_1024(block_len)
    for i in range(256):
        if histo[i] == 0:
            continue
        s += (histo[i] * (log_len - _log2_1024(histo[i]))) >> 3
    return s // block_len


_ZIGZAG1 = [0] * 256
for _d in range(256):
    # delta is stored as 127 + (cur - prev) in [0..254]; zigzag maps
    # negative deltas to odd-descending and positives to even-ascending
    # (the closed form of the reference's table, verified element-wise)
    _v = _d - 127
    _ZIGZAG1[_d] = (-2 * _v - 1) if _v < 0 else (2 * _v)
_ZIGZAG1[255] = 255
# sanity: the closed forms must reproduce the reference tables exactly;
# element-wise checks live in tests/test_format_vectors.py context and were
# verified against v2/transform/FSDCodec.go:33-70 / v2/internal/Global.go:59-87


def fsd_forward(src: bytes) -> bytes:
    count = len(src)
    if count < 1024:
        raise SpecSkip("too small")
    count10 = count // 10
    count5 = 2 * count10
    histo = [[0] * 256 for _ in range(7)]
    dists = [0, 1, 2, 3, 4, 8, 16]
    for base in (0, 2 * count5, 4 * count5):
        seg = src[base:]
        for i in range(count10, count5):
            b = seg[i]
            histo[0][b] += 1
            for k, d in enumerate(dists[1:], 1):
                histo[k][b ^ seg[i - d]] += 1
    ent = [entropy1024(3 * count10, histo[k]) for k in range(7)]
    min_idx = min(range(7), key=lambda k: (ent[k], k))
    if ent[min_idx] >= ent[0]:
        raise SpecSkip("no improvement")
    dist = dists[min_idx]

    large = 0
    for i in range(2 * count5, 3 * count5):
        delta = src[i] - src[i - dist]
        if delta < -127 or delta > 127:
            large += 1
    mode = 1 if large > (count5 >> 5) else 0    # 1 = xor, 0 = delta

    out = bytearray([mode, dist])
    out += src[:dist]
    if mode == 0:
        i = dist
        while i < count:
            delta = 127 + src[i] - src[i - dist]
            if 0 <= delta < 255:
                out.append(_ZIGZAG1[delta])
            else:
                out.append(0xFF)
                out.append(src[i] ^ src[i - dist])
            i += 1
    else:
        for i in range(dist, count):
            out.append(src[i] ^ src[i - dist])

    # post-hoc entropy re-check on two output sub-blocks
    h = [0] * 256
    for i in range(count5, count5 + count10):
        h[out[i]] += 1
    for i in range(3 * count5, 3 * count5 + count10):
        h[out[i]] += 1
    if entropy1024(count5, h) >= ent[0]:
        raise SpecSkip("no improvement post-check")
    return bytes(out)


# ---------------------------------------------------------------------------
# Definitional BWT / BWTS oracles (small inputs)
# ---------------------------------------------------------------------------

def bwt_forward_bruteforce(src: bytes) -> tuple[bytes, list[int]]:
    """(bwt_payload_without_header, per_chunk_primary_indexes) with the
    reference layout: appended-sentinel suffix order, dst[0] = src[-1],
    primary row removed, indexes[q] = rank + 1 of suffix q*step."""
    n = len(src)
    if n == 1:
        return src, [1]
    sa = sorted(range(n), key=lambda i: src[i:])
    chunks = 1 if n < 256 else 8
    step = -(-n // chunks)
    indexes = [0] * chunks
    p_idx = -1
    for rank, s in enumerate(sa):
        if s % step == 0:
            indexes[s // step] = rank + 1
        if s == 0:
            p_idx = rank
    # dst[0] = src[-1]; dst[j+1] = src[sa[j]-1] for j < pIdx; dst[j] for j > pIdx
    out = bytearray(n)
    out[0] = src[n - 1]
    for j in range(p_idx):
        out[j + 1] = src[sa[j] - 1]
    for j in range(p_idx + 1, n):
        out[j] = src[sa[j] - 1]
    indexes[0] = p_idx + 1
    return bytes(out), indexes


def _lyndon_factors(s: bytes) -> list[bytes]:
    """Duval's algorithm."""
    out = []
    k = 0
    n = len(s)
    while k < n:
        i, j = k, k + 1
        while j < n and s[i] <= s[j]:
            i = i + 1 if s[i] == s[j] else k
            j += 1
        while k <= i:
            out.append(s[k:k + j - i])
            k += j - i
    return out


def bwts_forward_bruteforce(src: bytes) -> bytes:
    """Definitional bijective BWT: all rotations of all Lyndon words sorted
    by infinite periodic (omega) order; output = preceding character of
    each rotation."""
    n = len(src)
    if n < 2:
        return src
    rots = []
    for w in _lyndon_factors(src):
        L = len(w)
        for r in range(L):
            rot = w[r:] + w[:r]
            key = (rot * (2 * n // L + 2))[:2 * n]
            rots.append((key, rot[-1]))
    rots.sort(key=lambda kv: kv[0])
    return bytes(v for _, v in rots)
