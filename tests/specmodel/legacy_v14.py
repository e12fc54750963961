"""Spec models for writing *version 1-4* KANZ streams — decode-test oracles.

Like legacy_v5.py: no Go toolchain and no archived old-format fixtures exist
here, so v1-v4 decoding is tested against streams written by these models,
each derived from the reference's DECODE semantics for that version:

  - v3/v4 file header   v2/io/CompressedStream.go:1461-1474 (6-bit block
                        count + 4-bit checksum over the uninverted fields)
  - v1/v2 file header   v2/io/CompressedStream.go:1475-1479 (6-bit block
                        count + 4 reserved bits, no checksum)
  - FPAQ pre-v4         v2/entropy/FPAQCodec.go:282-306 (8-bit predictions,
                        >>4 interval scale, looped 32-bit refills)
  - CM pre-v4           v2/entropy/CMPredictor.go:55,71-77,126-131
                        (counter2[16]=15<<12, interpolated SSE in get)
  - ANS v1 chunks       v2/entropy/ANSRangeCodec.go:759-843 (two interleaved
                        states order 0 / one state order 1, byte-PAIR
                        renormalization against a 2^15 bound, 32 KiB chunks,
                        odd tail byte raw at the buffer end)
"""

from __future__ import annotations

from .bits import SpecOBS
from .container import write_frame, write_end_marker, block_payload_prefix
from .entropy_utils import normalize_frequencies, write_varint
from . import ans as sans
from . import binary_cm as scm

M32 = (1 << 32) - 1
M64 = (1 << 64) - 1
FPAQ_PSCALE = 1 << 16
MASK_0_24 = 0x0000000000FFFFFF
MASK_0_32 = 0x00000000FFFFFFFF
FPAQ_TOP = 0x00FFFFFFFFFFFFFF


def write_header_legacy(obs: SpecOBS, version: int, entropy_type: int,
                        transform_type: int, block_size: int,
                        checksum: bool = False,
                        nb_input_blocks: int = 0) -> None:
    """v1-v4 file header (one checksum BIT, then the v3+ 4-bit CRC or the
    pre-v3 reserved nibble)."""
    assert 1 <= version <= 4
    obs.write_bits(0x4B414E5A, 32)
    obs.write_bits(version, 4)
    obs.write_bit(1 if checksum else 0)
    obs.write_bits(entropy_type, 5)
    obs.write_bits(transform_type, 48)
    obs.write_bits(block_size >> 4, 28)
    obs.write_bits(nb_input_blocks, 6)
    if version >= 3:
        HASH = 0x1E35A7BD
        c = (HASH * version) % (1 << 32)
        c ^= (HASH * (entropy_type & M32)) % (1 << 32)
        c ^= (HASH * ((transform_type >> 32) & M32)) % (1 << 32)
        c ^= (HASH * (transform_type & M32)) % (1 << 32)
        c ^= (HASH * (block_size & M32)) % (1 << 32)
        c ^= (HASH * (nb_input_blocks & M32)) % (1 << 32)
        obs.write_bits(((c >> 23) ^ (c >> 3)) & 0x0F, 4)
    else:
        obs.write_bits(0, 4)  # reserved


def compress_legacy(data: bytes, version: int, entropy_type: int,
                    payload_fn, block_size: int,
                    transform_type: int = 0) -> bytes:
    """A complete v1-v4 stream: transform NONE, payload_fn(block) ->
    (payload_bytes, bits). The frame format is version-independent."""
    obs = SpecOBS()
    write_header_legacy(obs, version, entropy_type, transform_type,
                        block_size)
    for off in range(0, len(data), block_size):
        block = data[off:off + block_size]
        bobs = SpecOBS()
        copy = len(block) <= 15
        block_payload_prefix(bobs, skip_flags=0x7F, n_transforms=1,
                             post_len=len(block), copy_block=copy)
        if copy:
            bobs.write_array(block, 8 * len(block))
        else:
            payload, bits = payload_fn(block)
            bobs.write_array(payload, bits)
        write_frame(obs, bobs.close(), bobs.written())
    write_end_marker(obs)
    return obs.close()


# ---------------------------------------------------------------------------
# FPAQ, pre-v4 bit split
# ---------------------------------------------------------------------------
def fpaq_encode_v1(block: bytes) -> tuple[bytes, int]:
    """Writes what FPAQDecoder.decodeBitV1 reads: split scaled >>4 from an
    8-bit prediction, refill LOOPED until the top 32 window bits differ."""
    obs = SpecOBS()
    low = 0
    high = FPAQ_TOP
    probs = [[FPAQ_PSCALE >> 1] * 256 for _ in range(4)]
    CHUNK = 4 * 1024 * 1024
    start = 0
    end = len(block)
    while start < end:
        chunk = block[start:start + min(CHUNK, end - start)]
        out = bytearray()
        p = probs[0]

        def encode_bit(bit: int, tbl: list[int], i: int) -> None:
            nonlocal low, high
            split = (((high - low) >> 4) * (tbl[i] >> 4)) >> 8
            if bit == 0:
                low += split + 1
                tbl[i] -= tbl[i] >> 6
            else:
                high = low + split
                tbl[i] -= (tbl[i] - FPAQ_PSCALE + 64) >> 6
            while ((low ^ high) >> 24) == 0:
                out.extend(((high >> 24) & MASK_0_32).to_bytes(4, "big"))
                low = (low << 32) & M64
                high = ((high << 32) | MASK_0_32) & M64

        for val in chunk:
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
        start += len(chunk)
        if start < end:
            obs.write_bits(low | MASK_0_24, 56)
    obs.write_bits(low | MASK_0_24, 56)
    return obs.close(), obs.written()


# ---------------------------------------------------------------------------
# CM, pre-v4 predictor rules
# ---------------------------------------------------------------------------
class SpecCMPredictorV3(scm.SpecCMPredictor):
    def __init__(self) -> None:
        super().__init__()
        for row in self.counter2:
            row[16] = 15 << 12

    def get(self) -> int:
        pc2 = self.counter2[self.ctx | self.run_mask]
        pc1 = self.counter1[self.ctx]
        p = (13 * (pc1[256] + pc1[self.c1]) + 6 * pc1[self.c2]) >> 5
        self.idx = p >> 12
        x1 = pc2[self.idx]
        x2 = pc2[self.idx + 1]
        ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12)
        return (p + 3 * ssep + 32) >> 6


def cm_encode_v3(block: bytes) -> tuple[bytes, int]:
    return scm.binary_encode(block, SpecCMPredictorV3())


# ---------------------------------------------------------------------------
# ANS, bitstream-v1 chunk layout
# ---------------------------------------------------------------------------
class _V1Syms:
    """Per-context (cumFreq, freq) tables from normalized frequencies.
    Mirrors the decoder's DecSymbol semantics: cumFreq from the UNclamped
    running sum, freq clamped to scale-1."""

    def __init__(self, freqs: list[int], lr: int) -> None:
        self.cum = [0] * 257
        self.freq = [min(f, (1 << lr) - 1) for f in freqs]
        for i in range(256):
            self.cum[i + 1] = self.cum[i] + freqs[i]


def ans_encode_v1(block: bytes, order: int) -> tuple[bytes, int]:
    """Writes what ANSRangeDecoder.decodeChunkV1 reads.  Chunks of 32768
    (<<8 for order 1, the pre-v4 default).  Order 0 runs two interleaved
    states (st1 on even positions, st0 on odd), order 1 a single state with
    the previous byte as context; renormalization pushes 16 bits whenever
    the state would leave [2^15, 2^31) and the decoder's byte-pair pulls
    mirror it.  Odd-length order-0 chunks store the final byte raw at the
    end of the renorm buffer."""
    enc = sans.SpecANSEncoder(order=order, chunk_size=32768)
    obs = enc.obs
    lr = enc.log_range
    TOP = sans.ANS_TOP
    if len(block) <= 32:
        obs.write_array(block, 8 * len(block))
        return obs.close(), obs.written()

    start = 0
    end = len(block)
    while start < end:
        chunk = block[start:start + min(enc.chunk_size, end - start)]
        if order == 1:
            # v1 statistics are CONTINUOUS-context pair counts (prv=0 for
            # the first byte), matching the body and the decoder's
            # never-reset prv walk — NOT v6's quartered histograms, which
            # drop quarter-boundary pairs: a boundary pair occurring only
            # there would get frequency 0 and be unencodable (the
            # randomized fuzz hung exactly there on random data).
            for i in range(len(enc.freqs)):
                enc.freqs[i] = 0
            prv = 0
            for b in chunk:
                enc.freqs[257 * prv + b] += 1
                enc.freqs[257 * prv + 256] += 1
                prv = b
            alpha = enc._update_frequencies(lr)
        else:
            alpha = enc._rebuild_statistics(chunk, lr)
        if order == 0 and alpha == 1:
            start += len(chunk)
            continue
        dim = 255 * order + 1
        ctx_syms = []
        for k in range(dim):
            # enc.freqs holds RAW counts (the header writer normalizes its
            # own slice copies); re-run the same normalization here so the
            # body tables match the header exactly
            f = enc.freqs[257 * k:257 * (k + 1)]
            total = f[256]
            f = f[:256]
            if total > 0:
                normalize_frequencies(f, 256, total, 1 << lr)
            ctx_syms.append(_V1Syms(f, lr))

        emitted: list[int] = []  # 16-bit words; reversed = decoder pull order

        def push(st: int, f: int) -> int:
            while st >= (f << (31 - lr)):
                emitted.append(st & 0xFFFF)
                st >>= 16
            return st

        def upd(st: int, k: int, sym: int) -> int:
            t = ctx_syms[k]
            f = t.freq[sym]
            return ((st // f) << lr) + t.cum[sym] + (st % f)

        if order == 0:
            n = len(chunk)
            end2 = (n & ~1) - 1
            st0 = st1 = TOP
            # decode per pair (j, j+1): D1(c[j]); D0(c[j+1]); pull1; pull0 —
            # so the exact reverse is: push0; push1; E0(c[j+1]); E1(c[j]),
            # pairs walked last to first
            t = ctx_syms[0]
            for j in range(end2 - 1, -1, -2):
                st0 = push(st0, t.freq[chunk[j + 1]])
                st1 = push(st1, t.freq[chunk[j]])
                st0 = upd(st0, 0, chunk[j + 1])
                st1 = upd(st1, 0, chunk[j])
            emitted.reverse()
            buf = bytearray()
            for w in emitted:
                buf.append((w >> 8) & 0xFF)
                buf.append(w & 0xFF)
            if n & 1:
                buf.append(chunk[n - 1])
            write_varint(obs, len(buf))
            obs.write_bits(st0 & M32, 32)
            obs.write_bits(st1 & M32, 32)
            obs.write_array(bytes(buf), 8 * len(buf))
        else:
            st0 = TOP
            for i in range(len(chunk) - 1, -1, -1):
                prv = chunk[i - 1] if i > 0 else 0
                st0 = push(st0, ctx_syms[prv].freq[chunk[i]])
                st0 = upd(st0, prv, chunk[i])
            emitted.reverse()
            buf = bytearray()
            for w in emitted:
                buf.append((w >> 8) & 0xFF)
                buf.append(w & 0xFF)
            write_varint(obs, len(buf))
            obs.write_bits(st0 & M32, 32)
            obs.write_array(bytes(buf), 8 * len(buf))
        start += len(chunk)
    return obs.close(), obs.written()
