"""Dual-path invariant guard (VERDICT r3, weak #5 / next #2).

The container implements the block payload spec twice: the C++ one-shot
path (native/src/container.cpp kz_block_encode/decode, used when no
listeners are attached) and the Python slow path
(kio/compressed_stream.py compress_block_payload, used whenever a
listener is registered). Both mirror the single spec at reference
v2/io/CompressedStream.go:718-728,871-887 and MUST stay byte-identical:
attaching a listener must never change the bitstream.

This matrix drives every level 0-9 x checksum {0,32,64} x
{headered, headerless} (+ a useDevice config and a jobs=4 config)
through BOTH paths and asserts identical bytes on encode and identical
output on decode. A deliberate 1-line divergence in either path fails it.
"""

import io
import os

import pytest

import kanzi_tpu
from kanzi_tpu.kio.compressed_stream import Reader, Writer

CORPUS = open(os.path.join(os.path.dirname(__file__), "fixtures",
                           "golden_corpus.bin"), "rb").read()[:96 << 10]


class _NoopListener:
    """Minimal listener: registers interest (forcing the Python path)
    without observable side effects."""

    def process_event(self, evt):
        pass


def _compress_listener_path(data: bytes, transform: str, entropy: str,
                            block_size: int, checksum: int, headerless: bool,
                            jobs: int = 1) -> bytes:
    out = io.BytesIO()
    w = Writer(out, transform=transform, entropy=entropy,
               block_size=block_size, jobs=jobs, checksum=checksum,
               file_size=len(data), headerless=headerless)
    assert w.add_listener(_NoopListener())
    w.write(data)
    w.close()
    return out.getvalue()


def _decompress_listener_path(blob: bytes, headerless: bool,
                              ctx: dict | None = None) -> bytes:
    r = Reader(blob, headerless=headerless, ctx=ctx)
    r.add_listener(_NoopListener())
    try:
        return r.read_all()
    finally:
        r.close()


def _headerless_ctx(transform: str, entropy: str, block_size: int,
                    checksum: int, n: int) -> dict:
    return {"entropy": entropy, "transform": transform,
            "blockSize": block_size, "checksum": checksum,
            "outputSize": n, "bsVersion": 6}


@pytest.mark.parametrize("checksum", [0, 32, 64])
@pytest.mark.parametrize("level", list(range(10)))
def test_listener_path_bytes_match_native(level, checksum):
    data = CORPUS
    transform, entropy = kanzi_tpu.LEVEL_PRESETS[level]
    for headerless in (False, True):
        native_blob = kanzi_tpu.compress(
            data, transform=transform, entropy=entropy, block_size=65536,
            checksum=checksum, headerless=headerless)
        listener_blob = _compress_listener_path(
            data, transform, entropy, 65536, checksum, headerless)
        assert listener_blob == native_blob, (
            f"listener (Python) path diverged from native path: level={level} "
            f"checksum={checksum} headerless={headerless}")
        ctx = _headerless_ctx(transform, entropy, 65536, checksum,
                              len(data)) if headerless else None
        assert kanzi_tpu.decompress(native_blob, headerless=headerless,
                                    ctx=dict(ctx) if ctx else None) == data
        assert _decompress_listener_path(
            native_blob, headerless, dict(ctx) if ctx else None) == data


def test_listener_path_matches_device_engine():
    """Triangulates all three encode engines: the device engine (useDevice,
    no listener), the C++ one-shot path, and the Python listener path must
    emit the same bytes."""
    data = CORPUS
    native_blob = kanzi_tpu.compress(data, transform="NONE",
                                     entropy="HUFFMAN", block_size=65536,
                                     checksum=32)
    out = io.BytesIO()
    w = Writer(out, transform="NONE", entropy="HUFFMAN", block_size=65536,
               checksum=32, file_size=len(data), ctx={"useDevice": True})
    w.write(data)
    w.close()
    device_blob = out.getvalue()
    listener_blob = _compress_listener_path(data, "NONE", "HUFFMAN", 65536,
                                            32, False)
    assert device_blob == native_blob
    assert listener_blob == native_blob


def test_listener_path_jobs4_ordered_splice():
    """With a thread pool, the Python path's ordered frame splice must also
    be byte-identical to the native path (and to jobs=1)."""
    data = CORPUS
    native_blob = kanzi_tpu.compress(data, transform="LZ", entropy="ANS1",
                                     block_size=16384, checksum=32)
    listener_blob = _compress_listener_path(data, "LZ", "ANS1", 16384, 32,
                                            False, jobs=4)
    assert listener_blob == native_blob
