"""Entropy codec round-trip tests.

Mirrors the reference test strategy (v2/entropy/Entropy_test.go): constant
runs, ASCII-like data, alternating symbols, tiny inputs, narrow-alphabet
random data — through the container so framing is exercised too.
"""

import random

import pytest

import kanzi_tpu

# codecs are added here as they are implemented
CODECS = ["NONE", "HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ", "CM", "TPAQ", "TPAQX"]


def _cases():
    rng = random.Random(1234)
    cases = {
        "empty": b"",
        "one": b"A",
        "two": b"AB",
        "constant": b"\x07" * 80000,
        "alternating": bytes(i & 1 for i in range(10000)),
        "ascii": bytes(rng.randrange(32, 127) for _ in range(50000)),
        "narrow5": bytes(rng.randrange(5) for _ in range(30000)),
        "narrow2_256": bytes(rng.randrange(256) if i % 7 else 0
                             for i in range(256)),
        "random": bytes(rng.randrange(256) for _ in range(65536)),
        "text": (b"it was the best of times, it was the worst of times " * 800),
        "chunk_boundary": bytes(rng.randrange(64) for _ in range(16384 + 17)),
        "small31": bytes(rng.randrange(256) for _ in range(31)),
        "small32": bytes(rng.randrange(256) for _ in range(32)),
    }
    return cases


@pytest.mark.parametrize("codec", CODECS)
def test_entropy_roundtrip(codec):
    from kanzi_tpu import entropy as em
    try:
        etype = em.get_type(codec)
        em.encode(etype, b"probe" * 20, {"bsVersion": 6, "blockSize": 1024,
                                         "size": 100})
    except (RuntimeError, NotImplementedError):
        pytest.skip(f"{codec} not implemented yet")
    for name, data in _cases().items():
        blob = kanzi_tpu.compress(data, transform="NONE", entropy=codec,
                                  block_size=1024 * 64, checksum=32)
        out = kanzi_tpu.decompress(blob)
        assert out == data, f"{codec} roundtrip failed on case '{name}'"


def test_huffman_beats_raw_on_text():
    data = open("/root/repo/SURVEY.md", "rb").read()
    blob = kanzi_tpu.compress(data, transform="NONE", entropy="HUFFMAN")
    assert len(blob) < 0.75 * len(data)


def test_huffman_random_incompressible_overhead_small():
    import os
    data = os.urandom(100000)
    blob = kanzi_tpu.compress(data, transform="NONE", entropy="HUFFMAN")
    assert len(blob) < 1.01 * len(data) + 256


def test_ans1_tiny_tail_chunk_raises_cleanly():
    """An order-1 chunk of 2-3 bytes (block length = 4 MiB + 2/3) indexes
    block[-1] in the reference encoder (a panic there); both our host and
    device paths must raise a clean error, never read out of bounds."""
    import numpy as np
    from kanzi_tpu import native
    data = np.zeros((4 << 20) + 2, dtype=np.uint8)
    with pytest.raises(RuntimeError):
        native.entropy_encode(8, data, {"bsVersion": 6})
    from kanzi_tpu.entropy.ans_device import ans_encode_device
    with pytest.raises(RuntimeError):
        ans_encode_device(data.tobytes(), 1)
