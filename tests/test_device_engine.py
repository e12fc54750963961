"""Device-engine Writer path: the TPU entropy stage must produce streams
byte-identical to the host C++ engine (they implement the same 4-lane chunk
layout, reference v2/entropy/HuffmanCodec.go:435-511).

Runs on the CPU mesh (conftest forces JAX_PLATFORMS=cpu with 8 virtual
devices), which validates the kernel + splice logic without TPU hardware.
"""

import numpy as np
import pytest

import kanzi_tpu
from kanzi_tpu.kio import Writer
from kanzi_tpu import native


def _mixed_corpus(n: int) -> bytes:
    rng = np.random.default_rng(42)
    text = (b"the quick brown fox jumps over the lazy dog 0123456789 " * 64)
    parts = [text * (n // (2 * len(text))),
             rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes(),
             np.zeros(n // 8, dtype=np.uint8).tobytes(),
             rng.integers(0, 4, n // 8, dtype=np.uint8).tobytes()]
    return b"".join(parts)[:n]


@pytest.mark.parametrize("transform,block_size", [
    ("NONE", 1 << 20),
    ("DNA+LZ", 1 << 18),
    ("TEXT+UTF+PACK+MM+LZX", 1 << 20),
])
def test_device_engine_stream_identity(transform, block_size):
    if not native.available():
        pytest.skip("native library unavailable")
    data = _mixed_corpus(3 * block_size + 12345)  # multi-block + partial
    host = kanzi_tpu.compress(data, transform=transform, entropy="HUFFMAN",
                              block_size=block_size, checksum=32)
    w = Writer(None, transform=transform, entropy="HUFFMAN",
               block_size=block_size, checksum=32, file_size=len(data),
               ctx={"useDevice": True})
    assert w._dev_engine is not None
    w.write(data)
    w.close()
    dev = w.getvalue()
    assert dev == host
    assert kanzi_tpu.decompress(dev) == data


def test_device_engine_small_and_copy_blocks():
    if not native.available():
        pytest.skip("native library unavailable")
    # tiny input -> copy mode; incompressible -> copy via skipBlocks
    rng = np.random.default_rng(3)
    rand = rng.integers(0, 256, 300000, dtype=np.uint8).tobytes()
    for data in (b"tiny", rand):
        w = Writer(None, transform="LZ", entropy="HUFFMAN",
                   block_size=65536, file_size=len(data),
                   ctx={"useDevice": True, "skipBlocks": True})
        w.write(data)
        w.close()
        blob = w.getvalue()
        assert kanzi_tpu.decompress(blob) == data
        # must match the host path under the same ctx
        w2 = Writer(None, transform="LZ", entropy="HUFFMAN",
                    block_size=65536, file_size=len(data),
                    ctx={"skipBlocks": True})
        w2.write(data)
        w2.close()
        assert blob == w2.getvalue()


@pytest.mark.parametrize("entropy,transform,block_size", [
    ("ANS0", "NONE", 1 << 18),
    ("ANS0", "TEXT+UTF+BWT+RANK+ZRLT", 1 << 18),   # level-5 chain
    ("ANS1", "NONE", 1 << 18),
    ("ANS1", "DNA+LZ", 1 << 20),
])
def test_device_ans_engine_stream_identity(entropy, transform, block_size):
    if not native.available():
        pytest.skip("native library unavailable")
    data = _mixed_corpus(2 * block_size + 7777)
    host = kanzi_tpu.compress(data, transform=transform, entropy=entropy,
                              block_size=block_size, checksum=32)
    w = Writer(None, transform=transform, entropy=entropy,
               block_size=block_size, checksum=32, file_size=len(data),
               ctx={"useDevice": True})
    assert w._dev_engine is not None
    w.write(data)
    w.close()
    dev = w.getvalue()
    assert dev == host
    assert kanzi_tpu.decompress(dev) == data


def test_device_reader_decode_identity():
    """Reader ctx useDevice routes entropy decode through the device
    kernels; output must match host decode exactly."""
    import io
    from kanzi_tpu.kio import Reader
    data = _mixed_corpus(500000)
    for entropy in ("HUFFMAN", "ANS0", "ANS1"):
        blob = kanzi_tpu.compress(data, transform="LZ", entropy=entropy,
                                  block_size=131072, checksum=32)
        r = Reader(io.BytesIO(blob), ctx={"useDevice": True})
        out = bytearray()
        while True:
            c = r.read(1 << 20)
            if not c:
                break
            out += c
        assert bytes(out) == data, entropy


def test_mesh_decompress_identity():
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    from kanzi_tpu import parallel
    mesh = parallel.device_mesh(4)
    data = _mixed_corpus(400000)
    for entropy in ("HUFFMAN", "ANS0"):
        blob = kanzi_tpu.compress(data, transform="LZ", entropy=entropy,
                                  block_size=65536, checksum=32)
        assert parallel.decompress_multichip(blob, mesh) == data


def test_mesh_readers_are_reentrant():
    """Two mesh Readers decoding interleaved in one process must not
    interfere: the decode hooks are per-Reader ctx state, not module
    globals (VERDICT r2 weak #6)."""
    import io
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    from kanzi_tpu import parallel
    from kanzi_tpu.kio import Reader
    mesh = parallel.device_mesh(4)
    hooks = parallel.mesh_decode_hooks(mesh)
    d1 = _mixed_corpus(300000)
    d2 = bytes(reversed(_mixed_corpus(250000)))
    b1 = kanzi_tpu.compress(d1, transform="LZ", entropy="ANS0",
                            block_size=65536, checksum=32)
    b2 = kanzi_tpu.compress(d2, transform="NONE", entropy="HUFFMAN",
                            block_size=65536, checksum=32)
    r1 = Reader(io.BytesIO(b1),
                ctx={"useDevice": True, "deviceDecodeHooks": hooks})
    r2 = Reader(io.BytesIO(b2),
                ctx={"useDevice": True,
                     "deviceDecodeHooks": parallel.mesh_decode_hooks(mesh)})
    o1, o2 = bytearray(), bytearray()
    while True:
        c1 = r1.read(70000)
        c2 = r2.read(50000)
        o1 += c1
        o2 += c2
        if not c1 and not c2:
            break
    assert bytes(o1) == d1
    assert bytes(o2) == d2


def test_jobs_parallel_with_device_engines():
    """jobs>1 and the device entropy engines must compose: the threaded
    block scheduler with device dispatch produces the exact host stream
    for every device-capable codec."""
    from kanzi_tpu.kio import Writer
    data = (_mixed_corpus(220000))
    for entropy in ("RANGE", "ANS0", "HUFFMAN"):
        host = kanzi_tpu.compress(data, transform="LZ", entropy=entropy,
                                  block_size=32768, checksum=32, jobs=1)
        w = Writer(None, transform="LZ", entropy=entropy, block_size=32768,
                   checksum=32, ctx={"useDevice": True}, jobs=4,
                   file_size=len(data))
        w.write(data)
        w.close()
        assert w.getvalue() == host, entropy
