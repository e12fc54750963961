"""Spec models of the binary arithmetic coder shell and the CM predictor.

References:
  - BinaryEntropyEncoder  v2/entropy/BinaryEntropyCodec.go:25-180 — 56-bit
    coder, split = ((high-low)>>4)*pred >> 8, chunking (<64 -> 64,
    >=64 MiB -> count>>3 or >>4), varint byte count + byte array +
    56-bit inter-chunk flush, Dispose writes a final 56-bit flush.
  - CMPredictor           v2/entropy/CMPredictor.go:20-132 (bsVersion>=4
    semantics) — BCM-style counters: counter1[256][257] (fast rate 2 at
    [256], medium rate 4 at [c1]), counter2[512][17] SSE with run mask,
    prediction (13*(c1[256]+c1[c1])+6*c1[c2])>>5, two-counter
    interpolation (p+p+3*(x1+x2)+64)>>7.
"""

from __future__ import annotations

from .bits import SpecOBS
from .entropy_utils import write_varint

PSCALE = 65536
TOP = 0x00FFFFFFFFFFFFFF
MASK_0_24 = 0x0000000000FFFFFF
MASK_0_32 = 0x00000000FFFFFFFF
M64 = (1 << 64) - 1
MAX_CHUNK = 1 << 26


class SpecCMPredictor:
    def __init__(self) -> None:
        self.c1 = 0
        self.c2 = 0
        self.ctx = 1
        self.run_mask = 0
        self.idx = 0
        self.counter1 = [[PSCALE >> 1] * 257 for _ in range(256)]
        self.counter2 = [([j << 12 for j in range(16)] + [65535])
                         for _ in range(512)]

    def get(self) -> int:
        pc2 = self.counter2[self.ctx | self.run_mask]
        pc1 = self.counter1[self.ctx]
        p = (13 * (pc1[256] + pc1[self.c1]) + 6 * pc1[self.c2]) >> 5
        self.idx = p >> 12
        x1 = pc2[self.idx]
        x2 = pc2[self.idx + 1]
        return (p + p + 3 * (x1 + x2) + 64) >> 7

    def update(self, bit: int) -> None:
        pc2 = self.counter2[self.ctx | self.run_mask]
        pc1 = self.counter1[self.ctx]
        i = self.idx
        if bit == 0:
            pc1[256] -= pc1[256] >> 2
            pc1[self.c1] -= pc1[self.c1] >> 4
            pc2[i] -= pc2[i] >> 6
            pc2[i + 1] -= pc2[i + 1] >> 6
            self.ctx += self.ctx
        else:
            pc1[256] -= (pc1[256] - PSCALE + 16) >> 2
            pc1[self.c1] -= (pc1[self.c1] - PSCALE + 16) >> 4
            pc2[i] -= (pc2[i] - PSCALE + 16) >> 6
            pc2[i + 1] -= (pc2[i + 1] - PSCALE + 16) >> 6
            self.ctx += self.ctx + 1
        if self.ctx > 255:
            self.c2 = self.c1
            self.c1 = self.ctx & 0xFF
            self.ctx = 1
            self.run_mask = 0x100 if self.c1 == self.c2 else 0


def binary_encode(block: bytes, predictor) -> tuple[bytes, int]:
    """Encode through the BinaryEntropyEncoder shell with a given predictor
    (CM or TPAQ spec model: objects with get()/update(bit))."""
    obs = SpecOBS()
    low = 0
    high = TOP
    count = len(block)
    length = count
    if count >= MAX_CHUNK:
        length = count >> 3 if count < 8 * MAX_CHUNK else count >> 4
    elif count < 64:
        length = 64

    start = 0
    while start < count:
        chunk = block[start:start + min(length, count - start)]
        out = bytearray()
        for val in chunk:
            for k in range(7, -1, -1):
                bit = (val >> k) & 1
                pred = predictor.get()
                split = (((high - low) >> 4) * pred) >> 8
                if bit == 0:
                    low += split + 1
                else:
                    high = low + split
                predictor.update(bit)
                if (low ^ high) < (1 << 24):
                    out.extend(((high >> 24) & MASK_0_32).to_bytes(4, "big"))
                    low = (low << 32) & M64
                    high = ((high << 32) | MASK_0_32) & M64
        write_varint(obs, len(out))
        obs.write_array(bytes(out), 8 * len(out))
        start += len(chunk)
        if start < count:
            obs.write_bits(low | MASK_0_24, 56)

    # Dispose
    obs.write_bits(low | MASK_0_24, 56)
    return obs.close(), obs.written()
