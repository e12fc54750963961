"""End-to-end level matrix tests over varied corpora.

Mirrors the reference container integration strategy
(v2/io/CompressedStream_test.go): varied compressibility, random jobs and
block sizes, checksum-verified round-trips.
"""

import os
import random

import pytest

import kanzi_tpu

TEXT = open("/root/repo/SURVEY.md", "rb").read()


def _corpora():
    rng = random.Random(99)
    return {
        "text": TEXT,
        "repetitive": TEXT[:5000] * 20,
        "random": os.urandom(80000),
        "dna": bytes(rng.choice(b"ACGT") for _ in range(80000)),
        "zeros": b"\x00" * 60000,
        "mixed": TEXT[:60000] + os.urandom(30000) + b"\x00" * 20000,
        "tiny": b"hi",
        "empty": b"",
    }


IMPLEMENTED_LEVELS = list(range(10))


@pytest.mark.parametrize("level", IMPLEMENTED_LEVELS)
def test_level_roundtrip(level):
    for name, data in _corpora().items():
        blob = kanzi_tpu.compress(data, level=level, checksum=32,
                                  block_size=65536)
        out = kanzi_tpu.decompress(blob)
        assert out == data, f"level {level} failed on corpus '{name}'"


def test_level5_compresses_text():
    blob = kanzi_tpu.compress(TEXT, level=5)
    assert len(blob) < 0.45 * len(TEXT)


def test_level7_beats_level1_on_text():
    b1 = kanzi_tpu.compress(TEXT, level=1)
    b7 = kanzi_tpu.compress(TEXT, level=7)
    assert len(b7) < len(b1)


def test_block_sizes_and_jobs_matrix():
    rng = random.Random(3)
    data = TEXT[:150000]
    blobs = set()
    for jobs in (1, 3):
        for bs in (16384, 65536):
            blob = kanzi_tpu.compress(data, level=5, jobs=jobs, block_size=bs,
                                      checksum=32)
            assert kanzi_tpu.decompress(blob, jobs=jobs) == data
            blobs.add((bs, blob))
    # same block size => identical bytes regardless of jobs
    by_bs = {}
    for bs, blob in blobs:
        by_bs.setdefault(bs, set()).add(blob)
    for bs, s in by_bs.items():
        assert len(s) == 1, f"non-deterministic output for block size {bs}"


def test_bwt_thresholds():
    # exercise the 1-chunk (<256) and 8-chunk (>=256) BWT paths and the
    # mergeTPSI/biPSIv2 boundary at 4 MiB
    rng = random.Random(17)
    for n in (250, 255, 256, 257, 4096):
        data = bytes(rng.randrange(64) for _ in range(n))
        blob = kanzi_tpu.compress(data, transform="BWT", entropy="ANS0",
                                  checksum=32)
        assert kanzi_tpu.decompress(blob) == data


@pytest.mark.slow
def test_bwt_bipsi_large_block():
    # > 4 MiB block exercises the biPSIv2 inverse
    data = (TEXT * 120)[: 5 * 1024 * 1024]
    blob = kanzi_tpu.compress(data, transform="BWT", entropy="ANS0",
                              block_size=8 * 1024 * 1024, checksum=32)
    assert kanzi_tpu.decompress(blob) == data
