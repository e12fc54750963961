"""Multi-host (rank-striped) compression — byte-identity with the
single-process Writer (reference P3, v2/app/BlockCompressor.go:543-618;
SURVEY §2.8 / §7.1-9)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import kanzi_tpu
from kanzi_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(n: int) -> bytes:
    rng = np.random.default_rng(0x4057)
    text = open(os.path.join(REPO, "tests", "fixtures",
                             "golden_corpus.bin"), "rb").read()
    data = (text * (n // len(text) + 1))[:n]
    arr = bytearray(data)
    idx = rng.integers(0, n, n // 200)
    for i in idx:
        arr[i] = int(rng.integers(0, 256))
    return bytes(arr)


def test_stripe_range_partitions_exactly():
    for total in (0, 1, 65536, 65536 * 7 + 1, 65536 * 8, 65536 * 11 + 12345):
        for world in (1, 2, 3, 4, 8):
            spans = [multihost.stripe_range(total, 65536, r, world)
                     for r in range(world)]
            # contiguous cover of [0, total), block-aligned starts
            pos = 0
            for s, e in spans:
                assert s == pos
                assert e == s or s % 65536 == 0  # non-empty: block-aligned
                pos = e
            assert pos == total
            # balanced: block counts differ by at most 1
            counts = [(e - s + 65535) // 65536 for s, e in spans]
            assert max(counts) - min(counts) <= 1


@pytest.mark.parametrize("world", [2, 4, 8])
@pytest.mark.parametrize("cfg", [
    dict(transform="LZ", entropy="HUFFMAN", checksum=32),
    dict(transform="TEXT+UTF+BWT+RANK+ZRLT", entropy="ANS0", checksum=0),
    dict(transform="ROLZ", entropy="CM", checksum=64),
])
def test_multihost_byte_identity(world, cfg):
    # 11 blocks: non-divisible by 2, 4 and 8
    block_size = 65536
    data = _corpus(block_size * 10 + 12345)
    single = kanzi_tpu.compress(data, block_size=block_size, **cfg)
    striped = multihost.compress_multihost(data, world=world,
                                           block_size=block_size, **cfg)
    assert striped == single
    assert kanzi_tpu.decompress(striped) == data


def test_multihost_world_larger_than_blocks():
    data = _corpus(65536 * 2 + 7)  # 3 blocks, 8 ranks -> 5 idle ranks
    single = kanzi_tpu.compress(data, transform="LZ", entropy="ANS1",
                                block_size=65536, checksum=32)
    striped = multihost.compress_multihost(data, world=8, transform="LZ",
                                           entropy="ANS1", block_size=65536,
                                           checksum=32)
    assert striped == single


def test_stripe_pack_roundtrip():
    frames = [(b"\x01\x02\x03", 24), (b"", 0), (b"\xff" * 100, 799)]
    got_frames, cfg = multihost.unpack_stripe(
        multihost.pack_stripe(frames, "LZ", "HUFFMAN", 65536, 32))
    assert got_frames == frames
    assert cfg == {"transform": "LZ", "entropy": "HUFFMAN",
                   "blockSize": 65536, "checksum": 32}
    with pytest.raises(ValueError):
        multihost.unpack_stripe(b"XXXX\x00\x00\x00\x00")


def test_assemble_rejects_config_mismatch():
    """A worker/assembler config mismatch must be a hard error, not a
    silently wrong stream."""
    data = _corpus(65536 * 2)
    frames = multihost.encode_stripe(data, "LZ", "HUFFMAN", 65536, 32)
    stripe = multihost.pack_stripe(frames, "LZ", "HUFFMAN", 65536, 32)
    with pytest.raises(ValueError, match="assemble invoked"):
        multihost.assemble([stripe], "LZ", "NONE", 65536, len(data), 32)
    with pytest.raises(ValueError, match="assemble invoked"):
        multihost.assemble([stripe], "LZ", "HUFFMAN", 16384, len(data), 32)


@pytest.mark.parametrize("world", [2, 4, 8])
def test_multihost_decode_byte_identity(world):
    block_size = 65536
    data = _corpus(block_size * 10 + 12345)  # 11 blocks, non-divisible
    blob = kanzi_tpu.compress(data, transform="TEXT+UTF+BWT+RANK+ZRLT",
                              entropy="ANS0", block_size=block_size,
                              checksum=32)
    striped = multihost.decompress_multihost(blob, world=world)
    assert striped == data
    # per-rank stripes are contiguous and cover exactly once
    parts = [multihost.decode_stripe(blob, r, world) for r in range(world)]
    assert b"".join(parts) == data


def test_multihost_decode_launcher_cli(tmp_path):
    block_size = 65536
    data = _corpus(block_size * 4 + 999)
    blob = kanzi_tpu.compress(data, transform="LZ", entropy="HUFFMAN",
                              block_size=block_size, checksum=32)
    knz, out = tmp_path / "in.knz", tmp_path / "out.bin"
    knz.write_bytes(blob)
    args = [sys.executable, "-m", "kanzi_tpu.parallel.multihost", "-d",
            "-i", str(knz), "-o", str(out)]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(args, env=dict(env, KANZI_RANK=str(r),
                                             KANZI_WORLD="3"), cwd=REPO)
             for r in range(3)]
    assert [p.wait() for p in procs] == [0, 0, 0]
    assert subprocess.run(args + ["--assemble", "--world", "3"], env=env,
                          cwd=REPO).returncode == 0
    assert out.read_bytes() == data


def test_multihost_launcher_cli(tmp_path):
    """Worker-mode subprocesses per rank + assemble: the real launcher
    protocol end-to-end (env-var rank discovery included)."""
    block_size = 65536
    data = _corpus(block_size * 4 + 999)  # 5 blocks over 2 ranks
    single = kanzi_tpu.compress(data, transform="LZ", entropy="HUFFMAN",
                                block_size=block_size, checksum=32)
    inp, out = tmp_path / "in.bin", tmp_path / "out.knz"
    inp.write_bytes(data)
    args = [sys.executable, "-m", "kanzi_tpu.parallel.multihost",
            "-i", str(inp), "-o", str(out), "--transform", "LZ",
            "--entropy", "HUFFMAN", "--block-size", str(block_size),
            "--checksum", "32"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(args, env=dict(env, KANZI_RANK=str(r),
                                             KANZI_WORLD="2"), cwd=REPO)
             for r in range(2)]
    assert [p.wait() for p in procs] == [0, 0]
    assert subprocess.run(args + ["--assemble", "--world", "2"], env=env,
                          cwd=REPO).returncode == 0
    assert out.read_bytes() == single
