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


def test_bwt_inverse_threshold_boundary():
    """Blocks at exactly 4 MiB, one below and one above: the inverse
    switches from mergeTPSI to biPSIv2 at BWT_THRESHOLD2 (bwt.cpp), and
    both sides now run on the shared per-thread pooled scratch — the
    boundary must roundtrip on both paths with the pool warm from the
    OTHER path's size."""
    from kanzi_tpu import native

    rng = np.random.default_rng(17)
    text = (b"the boundary of the two inverse walks " * 4096)
    for n in ((4 << 20) - 1, (4 << 20), (4 << 20) + 1):
        data = (text * (n // len(text) + 1))[: n // 2] + rng.integers(
            0, 64, n - n // 2, dtype=np.uint8).tobytes()
        ctx = {"bsVersion": 6, "blockSize": n, "jobs": 1}
        fwd, _ = native.transform_forward(1, np.frombuffer(data, np.uint8),
                                          dict(ctx), n + 33)
        back = native.transform_inverse(1, np.frombuffer(fwd, np.uint8),
                                        dict(ctx), n + 1024)
        assert back == data, n


@pytest.mark.slow
def test_big_block_jobs_identity():
    """jobs=1 vs jobs=3 byte-identity at 20 MiB with 8 MiB blocks (biPSIv2
    decode on worker threads, each with its own pooled scratch)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synth_corpus

    data = synth_corpus()[: 20 << 20]
    b1 = kanzi_tpu.compress(data, level=6, block_size=8 << 20, jobs=1)
    b3 = kanzi_tpu.compress(data, level=6, block_size=8 << 20, jobs=3)
    assert b1 == b3
    assert kanzi_tpu.decompress(b1, jobs=3) == data
    assert kanzi_tpu.decompress(b1, jobs=1) == data
