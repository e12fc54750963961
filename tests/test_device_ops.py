"""Device kernel tests: byte-equality with the host engines and the
sharded multi-chip path (virtual CPU mesh, see conftest.py)."""

import os
import random

import numpy as np
import pytest

from kanzi_tpu import native
from kanzi_tpu.entropy.huffman_device import huffman_encode_device


def _cases():
    rng = random.Random(4)
    return {
        "text": open("/root/repo/SURVEY.md", "rb").read()[:40000],
        "random": os.urandom(20000),
        "narrow": bytes(rng.randrange(8) for _ in range(40000)),
        "const": b"z" * 30000,
        "small": os.urandom(100),
        "chunk_edge": os.urandom(16384 + 33),
        "n31": os.urandom(31),
    }


def test_device_huffman_matches_host():
    for name, data in _cases().items():
        host, hbits = native.entropy_encode(
            1, np.frombuffer(data, np.uint8), {"bsVersion": 6})
        dev, dbits = huffman_encode_device(data)
        assert dbits == hbits, f"{name}: bit count mismatch"
        assert dev == host, f"{name}: payload mismatch"


def test_device_histograms():
    from kanzi_tpu.ops.histogram import histograms_u8
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, (4, 4096), dtype=np.uint8)
    h = np.asarray(histograms_u8(blocks))
    for i in range(4):
        np.testing.assert_array_equal(h[i], np.bincount(blocks[i], minlength=256))


def test_dryrun_multichip_8():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from kanzi_tpu import parallel
    parallel.dryrun_multichip(8)


def test_sharded_pack_matches_single_device():
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    from kanzi_tpu import parallel
    from kanzi_tpu.ops import huffman as oh
    rng = np.random.default_rng(5)
    L = 8
    syms = rng.integers(0, 256, (L, 512), dtype=np.int32)
    lane_len = np.full(L, 512, dtype=np.int32)
    tidx = np.zeros(L, dtype=np.int32)
    tables = ((8 << 12) | np.arange(256, dtype=np.int32))[None, :]
    mesh = parallel.device_mesh(4)
    sharded = parallel.shard_pack_lanes(mesh)
    w1, n1 = sharded(syms, lane_len, tidx, tables)
    w2, n2 = oh.pack_lanes(syms, lane_len, tidx, tables)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_device_ans_matches_host():
    from kanzi_tpu.entropy.ans_device import ans_encode_device
    for order, et in ((0, 5), (1, 8)):
        for name, data in _cases().items():
            host, hbits = native.entropy_encode(
                et, np.frombuffer(data, np.uint8), {"bsVersion": 6})
            dev, dbits = ans_encode_device(data, order)
            assert dbits == hbits, f"ANS{order} {name}: bit count mismatch"
            assert dev == host, f"ANS{order} {name}: payload mismatch"


def test_device_huffman_decode_matches_input():
    from kanzi_tpu.entropy.huffman_device import huffman_decode_device
    for name, data in _cases().items():
        payload, bits = native.entropy_encode(
            1, np.frombuffer(data, np.uint8), {"bsVersion": 6})
        dev = huffman_decode_device(payload, len(data))
        host = native.entropy_decode(1, payload, len(data), {"bsVersion": 6})
        assert host == data, f"{name}: host decode broken"
        assert dev == data, f"{name}: device decode mismatch"


@pytest.mark.slow
def test_batched_fpaq_device_byte_identity():
    """The batched-scalar binary-coder prototype (SURVEY §7.0's hard
    thesis): B independent FPAQ streams in lockstep, exact u64 limb
    arithmetic. Byte-identical to the host coder; the measured throughput
    on the real chip (docs/ARCHITECTURE.md) retired the thesis."""
    import random
    from kanzi_tpu.ops.fpaq_batch import fpaq_encode_device_batch
    rng = random.Random(2)
    blocks = [
        open("/root/repo/SURVEY.md", "rb").read()[:2000],
        os.urandom(1000),
        bytes(rng.randrange(8) for _ in range(1500)),
        b"\x55" * 500,
        os.urandom(64),
    ]
    outs = fpaq_encode_device_batch(blocks)
    for b, (payload, bits) in zip(blocks, outs):
        host, hbits = native.entropy_encode(
            2, np.frombuffer(b, np.uint8), {"bsVersion": 6})
        assert payload == host and bits == hbits, len(b)


@pytest.mark.slow
def test_device_ans_decode_matches_input():
    """Device 4-state forward rANS decode (ops.ans.decode_chunks). Cases
    share one shape so the scan compiles once per order."""
    from kanzi_tpu.entropy.ans_device import ans_decode_device
    rng = random.Random(9)
    cases = [
        bytes(rng.randrange(8) for _ in range(12000)),
        bytes(rng.choice(b"aaaabbbccd") for _ in range(12000)),
        os.urandom(12000),
    ]
    for order, et in ((0, 5), (1, 8)):
        for data in cases:
            payload, _ = native.entropy_encode(
                et, np.frombuffer(data, np.uint8), {"bsVersion": 6})
            assert ans_decode_device(payload, len(data), order) == data


def test_device_suffix_sort_bwt_identity():
    """Prefix-doubling suffix sort on device (ops/suffix_sort.py) produces
    the identical BWT block payload to the native SA-IS engine — the
    suffix array is unique, so any correct algorithm must agree."""
    import random
    from kanzi_tpu.ops.suffix_sort import bwt_forward_device, \
        suffix_array_device
    from kanzi_tpu import native
    rng = random.Random(3)
    cases = [
        bytes(rng.choice(b"ab") for _ in range(40)),
        bytes(rng.choice(b"abracadabra") for _ in range(255)),
        bytes(rng.choice(b"mississippi river basin") for _ in range(5000)),
        b"aaaaabbbbb" * 600,
        bytes(rng.randrange(256) for _ in range(6000)),
    ]
    for data in cases:
        ref, _ = native.transform_forward(
            1, np.frombuffer(data, np.uint8), {"blockSize": len(data)},
            2 * len(data) + 64)
        assert bwt_forward_device(data) == bytes(ref), len(data)
    sa = suffix_array_device(b"banana")
    assert list(sa) == [5, 3, 1, 0, 4, 2]


def test_device_suffix_sort_edges():
    from kanzi_tpu.ops.suffix_sort import bwt_forward_device, \
        suffix_array_device
    from kanzi_tpu import native
    import pytest as _pytest
    assert len(suffix_array_device(b"")) == 0
    assert list(suffix_array_device(b"z")) == [0]
    with _pytest.raises(ValueError):
        bwt_forward_device(b"x")        # native skips n<2 too
    with _pytest.raises(native.NativeSkip):
        native.transform_forward(1, np.frombuffer(b"x", np.uint8),
                                 {"blockSize": 1}, 64)
    # exactly at the 1-chunk/8-chunk boundary
    for n in (2, 255, 256, 257):
        data = (b"abcab" * 80)[:n]
        ref, _ = native.transform_forward(
            1, np.frombuffer(data, np.uint8), {"blockSize": n}, 2 * n + 64)
        assert bwt_forward_device(data) == bytes(ref), n


def test_device_range_encode_matches_host():
    """Device range encode (ops/range.py encode_chunks via the engine
    split) must be byte-identical to the host coder on the device-ops
    matrix plus range-specific shapes (32 KiB chunk edges, reduced
    logRange on small final chunks)."""
    from kanzi_tpu.entropy.range_device import range_encode_device
    cases = dict(_cases())
    cases["chunk32k_edge"] = os.urandom((1 << 15) + 97)
    cases["two_chunks_text"] = (open("/root/repo/SURVEY.md", "rb").read()
                                * 3)[: (1 << 16) + 1234]
    for name, data in cases.items():
        host, hbits = native.entropy_encode(
            4, np.frombuffer(data, np.uint8), {"bsVersion": 6})
        dev, dbits = range_encode_device(data)
        assert dbits == hbits, f"{name}: bit count mismatch"
        assert dev == host, f"{name}: payload mismatch"


def test_device_range_decode_matches_input():
    from kanzi_tpu.entropy.range_device import range_decode_device
    cases = dict(_cases())
    cases["chunk32k_edge"] = os.urandom((1 << 15) + 97)
    for name, data in cases.items():
        payload, _ = native.entropy_encode(
            4, np.frombuffer(data, np.uint8), {"bsVersion": 6})
        out = range_decode_device(payload, len(data))
        assert out == data, f"{name}: decode mismatch"


def test_device_range_writer_reader_identity():
    """Writer ctx useDevice with entropy=RANGE must produce the exact host
    stream; Reader ctx useDevice must decode it through the device path."""
    import io
    import kanzi_tpu
    from kanzi_tpu.kio import Reader, Writer
    rng = np.random.default_rng(11)
    data = (open("/root/repo/SURVEY.md", "rb").read() * 3)[:120000] \
        + rng.integers(0, 256, 40000, dtype=np.uint8).tobytes()
    host = kanzi_tpu.compress(data, transform="LZ", entropy="RANGE",
                              block_size=65536, checksum=32)
    w = Writer(None, transform="LZ", entropy="RANGE", block_size=65536,
               checksum=32, ctx={"useDevice": True}, file_size=len(data))
    assert w._dev_engine is not None
    w.write(data)
    w.close()
    assert w.getvalue() == host
    r = Reader(io.BytesIO(host), ctx={"useDevice": True})
    out = bytearray()
    while True:
        c = r.read(1 << 20)
        if not c:
            break
        out += c
    assert bytes(out) == data


def test_range_degenerate_chunk_repaired():
    """kanzi-go's NormalizeFrequencies can leave sum(freqs) > scale on
    small near-uniform chunks (all scaled freqs <= 2); the reference then
    emits a stream its own decoder rejects (RangeCodec.go:461) — compress
    succeeds, decompress fails. Round 3 reproduced that bit-for-bit; the
    round-4 container fuzz showed it loses user data through the public
    API, so the normalization now repairs the header deterministically
    (docs/PARITY.md). Both host and device decode the repaired stream."""
    from kanzi_tpu.entropy.range_device import range_decode_device
    data = np.random.default_rng(99).integers(0, 200, 500, dtype=np.uint8)
    payload, _ = native.entropy_encode(4, data, {"bsVersion": 6})
    out = native.entropy_decode(4, np.frombuffer(payload, np.uint8),
                                len(data), {"bsVersion": 6})
    assert out == data.tobytes()
    assert range_decode_device(payload, len(data)) == data.tobytes()
