"""ROLZ/ROLZX multi-chunk blocks (> 16 MiB ROLZ_CHUNK_SIZE in ONE block).

The chunk loop clears the match tables per chunk but the counters persist
(reference ROLZCodec.go) — the encoder/decoder registration sequences are
offset by the encoder's unregistered near-chunk-end tail positions, which
is harmless only because match indexing is RELATIVE to the counter
(shift-invariant). These tests pin that analysis with real cross-chunk
blocks, including the round-4 DNA mode (flags=4/delta=8) across chunks."""

import numpy as np
import pytest

import kanzi_tpu


def _words(rng, n):
    words = [bytes(rng.integers(97, 123, rng.integers(3, 9),
                                dtype=np.uint8)) for _ in range(300)]
    buf = bytearray()
    while len(buf) < n:
        buf += words[int(rng.integers(0, 300))] + b" "
    return bytes(buf[:n])


@pytest.mark.slow
@pytest.mark.parametrize("transform", ["ROLZ", "ROLZX"])
def test_rolz_multichunk_text(transform):
    rng = np.random.default_rng(4242)
    data = _words(rng, 20 << 20)  # one 20 MiB block = 2 chunks
    blob = kanzi_tpu.compress(data, transform=transform, entropy="NONE",
                              block_size=24 << 20, checksum=32)
    assert kanzi_tpu.decompress(blob) == data


@pytest.mark.slow
@pytest.mark.parametrize("extra", [1, 4, 5, 11])
def test_rolzx_degenerate_tail_chunks(extra):
    """count % CHUNK in 1..4 used to EMIT an undecodable stream (decoder
    chunk count differs from the encoder's — the reference pair breaks
    identically); 5..11 used to read past the block before skipping. Both
    corners must now skip cleanly and roundtrip via the copy path."""
    rng = np.random.default_rng(1)
    data = _words(rng, (16 << 20) + extra)
    blob = kanzi_tpu.compress(data, transform="ROLZX", entropy="NONE",
                              block_size=24 << 20, checksum=32)
    assert kanzi_tpu.decompress(blob) == data


@pytest.mark.slow
def test_rolzx_multichunk_dna():
    rng = np.random.default_rng(77)
    data = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, 18 << 20)].tobytes()
    blob = kanzi_tpu.compress(data, transform="ROLZX", entropy="NONE",
                              block_size=24 << 20, checksum=32)
    assert kanzi_tpu.decompress(blob) == data
