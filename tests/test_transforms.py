"""Per-transform forward+inverse round-trip tests.

Mirrors the reference strategy (v2/transform/Transforms_test.go): curated
inputs — empty, 1-2 bytes, all 256 values, runs, long constant, random with
bounded alphabet — exercised through the container (which also covers the
skip-flags path when a transform vetoes)."""

import random

import pytest

import kanzi_tpu

TRANSFORMS = ["NONE", "BWT", "BWTS", "LZ", "LZX", "LZP", "ROLZ", "ROLZX",
              "RLT", "ZRLT", "MTFT", "RANK", "SRT", "TEXT", "UTF", "EXE",
              "MM", "PACK", "DNA"]


def _cases():
    rng = random.Random(777)
    cases = {
        "empty": b"",
        "one": b"A",
        "two": b"BC",
        "all256": bytes(range(256)) * 8,
        "runs": b"".join(bytes([i & 0xFF]) * (i % 17 + 1) for i in range(300)),
        "constant80k": b"\x55" * 80000,
        "rng5": bytes(rng.randrange(5) for _ in range(2048)),
        "rng64": bytes(rng.randrange(64) for _ in range(1024)),
        "rng256": bytes(rng.randrange(256) for _ in range(512)),
        "text": open("/root/repo/SURVEY.md", "rb").read()[:30000],
        "zeros": b"\x00" * 4096,
    }
    for p in (9, 10, 11):
        cases[f"rng8_{1 << p}"] = bytes(rng.randrange(8) for _ in range(1 << p))
    return cases


@pytest.mark.parametrize("transform", TRANSFORMS)
def test_transform_roundtrip(transform):
    for name, data in _cases().items():
        blob = kanzi_tpu.compress(data, transform=transform, entropy="NONE",
                                  block_size=65536, checksum=32)
        out = kanzi_tpu.decompress(blob)
        assert out == data, f"{transform} failed on case '{name}'"


def test_chained_transforms():
    data = open("/root/repo/SURVEY.md", "rb").read()
    chains = ["RLT+ZRLT", "BWT+MTFT+ZRLT", "LZP+TEXT+UTF+BWT+LZP",
              "EXE+RLT+TEXT+UTF+DNA", "TEXT+UTF+PACK+MM+LZX",
              "BWT+RANK+ZRLT", "LZ+LZ+LZ+LZ+LZ"]
    for chain in chains:
        blob = kanzi_tpu.compress(data, transform=chain, entropy="HUFFMAN",
                                  checksum=32)
        assert kanzi_tpu.decompress(blob) == data, f"chain '{chain}' failed"


def test_eight_transform_chain_uses_transforms_mask():
    # > 4 transforms forces the separate skip-flags byte in the mode header
    data = open("/root/repo/SURVEY.md", "rb").read()[:20000]
    chain = "RLT+ZRLT+MTFT+RANK+SRT+LZ+LZP+BWT"
    blob = kanzi_tpu.compress(data, transform=chain, entropy="NONE")
    assert kanzi_tpu.decompress(blob) == data
