"""Multi-process block compression (P3 axis): byte-identity with the
single-process Writer and round-trip."""

import numpy as np
import pytest

import kanzi_tpu
from kanzi_tpu import native
from kanzi_tpu.parallel.multiproc import compress_multiproc


@pytest.mark.parametrize("transform,entropy", [
    ("LZ", "HUFFMAN"),
    ("TEXT+UTF+BWT+RANK+ZRLT", "ANS0"),
])
def test_multiproc_byte_identity(transform, entropy):
    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    data = (b"multi process stripe " * 4000 +
            rng.integers(0, 256, 50000, dtype=np.uint8).tobytes())
    single = kanzi_tpu.compress(data, transform=transform, entropy=entropy,
                                block_size=16384, checksum=32)
    multi = compress_multiproc(data, transform=transform, entropy=entropy,
                               block_size=16384, procs=3, checksum=32)
    assert multi == single
    assert kanzi_tpu.decompress(multi) == data


def test_multiproc_edge_sizes():
    if not native.available():
        pytest.skip("native runtime unavailable")
    for n in (0, 1, 16383, 16384, 16385):
        data = bytes(range(256)) * (n // 256) + bytes(range(n % 256))
        single = kanzi_tpu.compress(data, transform="LZ", entropy="NONE",
                                    block_size=16384)
        multi = compress_multiproc(data, transform="LZ", entropy="NONE",
                                   block_size=16384, procs=2)
        assert multi == single, n


def test_multiproc_decompress_roundtrip():
    from kanzi_tpu.parallel import decompress_multiproc
    rng = np.random.default_rng(23)
    data = (b"multi process decode stripes " * 20000 +
            rng.integers(0, 256, 200000, dtype=np.uint8).tobytes())
    for transform, entropy in (("LZ", "HUFFMAN"), ("BWT+MTFT+ZRLT", "ANS0")):
        blob = kanzi_tpu.compress(data, transform=transform, entropy=entropy,
                                  block_size=131072, checksum=32)
        out = decompress_multiproc(blob, procs=3)
        assert out == data
        assert out == kanzi_tpu.decompress(blob)
