"""Spec model of the v6 Range encoder (Subbotin/Martin style).

Reference: v2/entropy/RangeCodec.go:28-310 — 32 KiB chunks, logRange 12
(lowered while 2^lr > chunk size), per-chunk normalized frequency header
(alphabet + 3-bit logRange-8 + log-max-packed freqs-1 in chunks of 8/6),
60-bit low/range with 28-bit renormalization, 60-bit low flush per chunk.
"""

from __future__ import annotations

from .bits import SpecOBS
from .entropy_utils import encode_alphabet, normalize_frequencies

TOP_RANGE = 0x0FFFFFFFFFFFFFFF
BOTTOM_RANGE = 0x000000000000FFFF
RANGE_MASK = 0x0FFFFFFF00000000
CHUNK = 1 << 15
LOG_RANGE = 12
M64 = (1 << 64) - 1


def _encode_header(obs: SpecOBS, alphabet: list[int], freqs: list[int],
                   lr: int) -> None:
    encode_alphabet(obs, alphabet)
    n = len(alphabet)
    if n == 0:
        return
    obs.write_bits(lr - 8, 3)
    chk = 6 if n < 64 else 8
    llr = 3
    while (1 << llr) <= lr:
        llr += 1
    i = 1
    while i < n:
        endj = min(i + chk, n)
        mx = max(freqs[alphabet[j]] - 1 for j in range(i, endj))
        log_max = 0
        while (1 << log_max) <= mx:
            log_max += 1
        obs.write_bits(log_max, llr)
        if log_max:
            for j in range(i, endj):
                obs.write_bits(freqs[alphabet[j]] - 1, log_max)
        i += chk


def range_encode(block: bytes) -> tuple[bytes, int]:
    obs = SpecOBS()
    start = 0
    end = len(block)
    while start < end:
        rng = TOP_RANGE
        low = 0
        lr = LOG_RANGE
        end_chunk = min(start + CHUNK, end)
        while lr > 8 and (1 << lr) > end_chunk - start:
            lr -= 1
        buf = block[start:end_chunk]
        freqs = [0] * 256
        for b in buf:
            freqs[b] += 1
        size, alphabet = normalize_frequencies(freqs, 256, len(buf), 1 << lr)
        cum = [0] * 257
        if size > 0:
            for i in range(256):
                cum[i + 1] = cum[i] + freqs[i]
        _encode_header(obs, alphabet, freqs, lr)
        if size <= 1:
            start = end_chunk
            continue
        for b in buf:
            cf = cum[b]
            rng >>= lr
            low = (low + cf * rng) & M64
            rng = (rng * (cum[b + 1] - cf)) & M64
            while True:
                if (low ^ (low + rng)) & RANGE_MASK:
                    if rng > BOTTOM_RANGE:
                        break
                    rng = (-low) & BOTTOM_RANGE
                obs.write_bits((low >> 32) & ((1 << 28) - 1), 28)
                rng = (rng << 28) & M64
                low = (low << 28) & M64
        obs.write_bits(low, 60)
        start = end_chunk
    return obs.close(), obs.written()
