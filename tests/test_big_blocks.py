"""Preset-size big blocks: the level-7 16 MiB BWT block through the full
container (suffix sort at real block scale, 8-chunk primary indexes,
biPSIv2 inverse, LZP+TEXT+UTF chain, CM entropy, 64-bit checksum). The
rest of the suite tops out around 3 MiB blocks; the bench exercises these
sizes but asserts only roundtrip, not checksum mode."""

import numpy as np
import pytest

import kanzi_tpu


@pytest.mark.slow
def test_level7_native_block_size_roundtrip():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synth_corpus

    data = synth_corpus()[: 20 << 20]  # 2 blocks: 16 MiB + 4 MiB tail
    blob = kanzi_tpu.compress(data, level=7, checksum=64)
    assert kanzi_tpu.decompress(blob) == data
    # corrupting a payload byte must be caught by the 64-bit checksum
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(kanzi_tpu.KanziError):
        kanzi_tpu.decompress(bytes(bad))
