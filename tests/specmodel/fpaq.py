"""Spec model of the v6 FPAQ encoder (fpaq0r-derived, order-0 bitwise).

Reference: v2/entropy/FPAQCodec.go:26-190 — 4 probability tables selected by
the top-2 bits of the previous byte, 256 contexts each (partial-byte prefix),
adapt rate 6, 56-bit arithmetic coder with 32-bit flushes, 4 MiB chunks with
varint byte-count + byte array + 56-bit inter-chunk flush. low/high and the
probability tables are NOT reset across chunks.
"""

from __future__ import annotations

from .bits import SpecOBS
from .entropy_utils import write_varint

PSCALE = 1 << 16
CHUNK = 4 * 1024 * 1024
TOP = 0x00FFFFFFFFFFFFFF
MASK_0_24 = 0x0000000000FFFFFF
MASK_0_32 = 0x00000000FFFFFFFF
M64 = (1 << 64) - 1


def fpaq_encode(block: bytes) -> tuple[bytes, int]:
    obs = SpecOBS()
    low = 0
    high = TOP
    probs = [[PSCALE >> 1] * 256 for _ in range(4)]
    start = 0
    end = len(block)
    while start < end:
        chunk_size = CHUNK if start + CHUNK < end else end - start
        buf = block[start:start + chunk_size]
        out = bytearray()
        p = probs[0]

        def encode_bit(bit: int, tbl: list[int], i: int) -> None:
            nonlocal low, high
            split = (((high - low) >> 8) * tbl[i]) >> 8
            if bit == 0:
                low += split + 1
                tbl[i] -= tbl[i] >> 6
            else:
                high = low + split
                tbl[i] -= (tbl[i] - PSCALE + 64) >> 6
            if (low ^ high) < (1 << 24):
                # flush: 4 bytes of high>>24, big-endian
                out.extend(((high >> 24) & MASK_0_32).to_bytes(4, "big"))
                low = (low << 32) & M64
                high = ((high << 32) | MASK_0_32) & M64

        for val in buf:
            bits = val + 256
            encode_bit(val & 0x80, p, 1)
            encode_bit(val & 0x40, p, bits >> 7)
            encode_bit(val & 0x20, p, bits >> 6)
            encode_bit(val & 0x10, p, bits >> 5)
            encode_bit(val & 0x08, p, bits >> 4)
            encode_bit(val & 0x04, p, bits >> 3)
            encode_bit(val & 0x02, p, bits >> 2)
            encode_bit(val & 0x01, p, bits >> 1)
            p = probs[val >> 6]

        write_varint(obs, len(out))
        obs.write_array(bytes(out), 8 * len(out))
        start += chunk_size
        if start < end:
            obs.write_bits(low | MASK_0_24, 56)

    # Dispose (always called by the container after Write)
    obs.write_bits(low | MASK_0_24, 56)
    return obs.close(), obs.written()
