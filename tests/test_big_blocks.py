"""Preset-size big blocks: the level-7 16 MiB BWT block through the full
container (suffix sort at real block scale, 8-chunk primary indexes,
biPSIv2 inverse, LZP+TEXT+UTF chain, CM entropy, 64-bit checksum). The
rest of the suite tops out around 3 MiB blocks; the bench exercises these
sizes but asserts only roundtrip, not checksum mode."""

import numpy as np
import pytest

import kanzi_tpu


@pytest.mark.slow
def test_level7_native_block_size_roundtrip():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synth_corpus

    data = synth_corpus()[: 20 << 20]  # 2 blocks: 16 MiB + 4 MiB tail
    blob = kanzi_tpu.compress(data, level=7, checksum=64)
    assert kanzi_tpu.decompress(blob) == data
    # corrupting a payload byte must be caught by the 64-bit checksum
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(kanzi_tpu.KanziError):
        kanzi_tpu.decompress(bytes(bad))


def test_bipsiv2_rejects_corrupt_chunk_indexes():
    """A >4 MiB BWT block whose chunk primary indexes are out of range or
    sign-wrapped must raise cleanly, not seed an out-of-bounds LF walk.

    Found by review + ASAN: inverseBiPSIv2 validated only indexes[0]'s
    upper bound, so a crafted chunk-3 index of 0xFFFFFF read far past the
    walk buffers (mergeTPSI, the <= 4 MiB path, already validated all 8).
    Reference layout: v2/transform/BWTBlockCodec.go (mode byte + per-chunk
    4-byte big-endian primary indexes).
    """
    from kanzi_tpu import native

    n = (4 << 20) + 4096  # payload > BWT_THRESHOLD2 -> biPSIv2 path
    mode = bytes([(3 << 2) | (4 - 1)])  # 8 chunks, 4-byte indexes
    good = (1000).to_bytes(4, "big")
    for bad in ((0x00FFFFFF).to_bytes(4, "big"),   # +1 > blockSize
                (0xFFFFFFFE).to_bytes(4, "big")):  # +1 wraps (i32) negative
        buf = mode + good * 3 + bad + good * 4 + bytes(n)
        ctx = {"bsVersion": 6, "blockSize": n, "jobs": 1}
        with pytest.raises(RuntimeError):
            native.transform_inverse(1, np.frombuffer(buf, np.uint8),
                                     ctx, n + 1024)
    # a zero stored index in chunk 0 decodes to pIdx == 1 (valid); the walk
    # must complete without reading out of bounds on all-zero payload
    buf = mode + bytes(4) * 8 + bytes(n)
    ctx = {"bsVersion": 6, "blockSize": n, "jobs": 1}
    out = native.transform_inverse(1, np.frombuffer(buf, np.uint8),
                                   ctx, n + 1024)
    assert len(out) == n
