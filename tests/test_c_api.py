"""Standalone C API (kz_compress / kz_decompress / kz_stream_info).

The native runtime exposes a complete whole-stream container entry point so
C/C++ consumers need no Python layer (docs/C_API.md). These tests pin the
critical property: for identical parameters the C one-shot emits bytes
IDENTICAL to the Python Writer (kio/compressed_stream.py) — a third
implementation of the format would otherwise be a dual-maintenance hazard;
byte-identity turns it into a cross-check instead (same discipline as
tests/test_dual_path.py).

Reference for the header/frame layout: kanzi-go
v2/io/CompressedStream.go:429-519, :951-976.
"""

import numpy as np
import pytest

import kanzi_tpu
from kanzi_tpu import entropy as E
from kanzi_tpu import native
from kanzi_tpu import transforms as T
from kanzi_tpu.__init__ import LEVEL_PRESETS, block_size_for_level


def _mixed(n, seed=7):
    rng = np.random.default_rng(seed)
    text = (b"the quick brown fox jumps over the lazy dog. " * 64)
    parts = [text * (n // (4 * len(text)) + 1),
             np.cumsum(rng.integers(-2, 3, n // 8, dtype=np.int32))
             .astype("<i4").tobytes(),
             np.zeros(n // 8, dtype=np.uint8).tobytes(),
             rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()]
    return b"".join(parts)[:n]


def _params(level):
    tr, en = LEVEL_PRESETS[level]
    chain = T.get_type(tr or "NONE")
    etype = E.get_type(en or "NONE")
    return chain, etype


CTX6 = {"bsVersion": 6, "jobs": 1}


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("checksum", [0, 32])
def test_c_compress_matches_writer(level, checksum):
    data = _mixed(300_000, seed=level * 10 + checksum)
    bs = 64 << 10  # several blocks
    chain, etype = _params(level)
    tr, en = LEVEL_PRESETS[level]
    py = kanzi_tpu.compress(data, transform=tr or "NONE", entropy=en or "NONE",
                            block_size=bs, checksum=checksum)
    cc = native.c_compress(data, bs, chain, etype,
                           dict(CTX6, blockSize=bs, entropy=en or "NONE"),
                           checksum_bits=checksum)
    assert cc == py, f"C one-shot diverges from Writer at level {level}"
    # and both decoders accept it
    assert kanzi_tpu.decompress(cc) == data
    back = native.c_decompress(cc, len(data) + 1024, dict(CTX6))
    assert back == data


@pytest.mark.parametrize("level", [1, 5])
def test_c_compress_headerless(level):
    data = _mixed(120_000, seed=level)
    bs = 32 << 10
    chain, etype = _params(level)
    tr, en = LEVEL_PRESETS[level]
    py = kanzi_tpu.compress(data, transform=tr, entropy=en or "NONE",
                            block_size=bs, headerless=True)
    cc = native.c_compress(data, bs, chain, etype,
                           dict(CTX6, blockSize=bs, entropy=en or "NONE"),
                           headerless=True)
    assert cc == py
    back = native.c_decompress(cc, len(data) + 1024, dict(CTX6),
                               headerless=True, chain=chain, etype=etype,
                               block_size=bs)
    assert back == data


def test_c_compress_checksum64_and_tpaq():
    data = _mixed(80_000, seed=42)
    bs = 16 << 10
    chain, etype = _params(8)  # TPAQ level
    tr, en = LEVEL_PRESETS[8]
    py = kanzi_tpu.compress(data, transform=tr, entropy=en, block_size=bs,
                            checksum=64)
    cc = native.c_compress(data, bs, chain, etype,
                           dict(CTX6, blockSize=bs, entropy=en),
                           checksum_bits=64)
    assert cc == py
    assert native.c_decompress(cc, len(data) + 1024, dict(CTX6)) == data


def test_c_compress_empty_and_tiny():
    chain, etype = _params(5)
    for data in (b"", b"x", b"tiny block" * 1):
        py = kanzi_tpu.compress(data, level=5)
        cc = native.c_compress(data, block_size_for_level(5), chain, etype,
                               dict(CTX6, blockSize=block_size_for_level(5),
                                    entropy="ANS0"))
        assert cc == py
        assert native.c_decompress(cc, len(data) + 1024, dict(CTX6)) == data


def test_c_stream_info():
    data = _mixed(100_000)
    blob = kanzi_tpu.compress(data, level=5, checksum=32)
    info = native.c_stream_info(blob)
    chain, etype = _params(5)
    assert info["entropy_type"] == etype
    assert info["transform_chain"] == chain
    assert info["checksum_bits"] == 32
    assert info["block_size"] == block_size_for_level(5)
    assert info["orig_size"] == len(data)
    assert info["header_bits"] % 8 == 0


def test_c_decompress_rejects_garbage():
    data = _mixed(50_000)
    blob = bytearray(kanzi_tpu.compress(data, level=1, checksum=32))
    # bad magic
    bad = bytes([0x00]) + bytes(blob[1:])
    with pytest.raises(RuntimeError):
        native.c_decompress(bad, len(data) + 1024, dict(CTX6))
    # header CRC flip
    bad = bytearray(blob)
    bad[8] ^= 0x40  # inside blockSize field -> CRC mismatch
    with pytest.raises(RuntimeError):
        native.c_decompress(bytes(bad), len(data) + 1024, dict(CTX6))
    # corrupt payload -> checksum mismatch (typed)
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x04
    with pytest.raises((native.ChecksumMismatch, RuntimeError)):
        native.c_decompress(bytes(bad), len(data) + 1024, dict(CTX6))


def test_c_decompress_rejects_legacy_version():
    data = _mixed(30_000)
    blob = bytearray(kanzi_tpu.compress(data, level=1))
    # the version nibble sits in bits 32..35 (top nibble of byte 4)
    blob[4] = (blob[4] & 0x0F) | (5 << 4)
    with pytest.raises(RuntimeError):
        native.c_decompress(bytes(blob), len(data) + 1024, dict(CTX6))


def test_c_compress_unknown_orig_size():
    data = _mixed(60_000)
    chain, etype = _params(1)
    cc = native.c_compress(data, 32 << 10, chain, etype,
                           dict(CTX6, blockSize=32 << 10, entropy="NONE"),
                           orig_size=-1)
    info = native.c_stream_info(cc)
    assert info["orig_size"] is None
    assert native.c_decompress(cc, len(data) + 1024, dict(CTX6)) == data
    # the Python reader accepts it too
    assert kanzi_tpu.decompress(cc) == data
