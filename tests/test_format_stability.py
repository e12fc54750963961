"""Format-stability regression fixtures.

The KANZ bitstream is a fixed external format: the bytes produced for a
given input and configuration must never change. These fixtures pin the
sha256 of compressed outputs for a deterministic corpus across every level
and a set of explicit chains; any diff means an accidental format change.

Regenerate (only after an intentional, verified format fix):
    python tests/test_format_stability.py --regen
"""

import hashlib
import json
import os
import sys

import kanzi_tpu

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_hashes.json")
CORPUS_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                           "golden_corpus.bin")
# The corpus bytes are committed (generated once from a text+dna+binary+
# zeros+noise mix) so that editing any living document cannot silently
# invalidate the golden hashes. sha256 pinned here as a second lock.
CORPUS_SHA256 = "0046072ba797ce68cf9e21be51ba9cb8f9addb473074cb3c44ce02ff6c0341a1"


def _corpus() -> bytes:
    data = open(CORPUS_PATH, "rb").read()
    assert hashlib.sha256(data).hexdigest() == CORPUS_SHA256, (
        "golden corpus file changed — the format fixtures are meaningless "
        "against a different corpus; restore tests/fixtures/golden_corpus.bin")
    return data


def _configs():
    cfgs = {}
    for level in range(10):
        cfgs[f"level{level}"] = dict(level=level, block_size=65536, checksum=32)
    cfgs["bwts_chain"] = dict(transform="BWTS+MTFT+ZRLT", entropy="ANS1",
                              block_size=65536)
    cfgs["range_chain"] = dict(transform="RLT+LZ", entropy="RANGE",
                               block_size=65536)
    cfgs["big_chain"] = dict(transform="RLT+ZRLT+MTFT+RANK+SRT+LZ+LZP+BWT",
                             entropy="HUFFMAN", block_size=65536)
    cfgs["rolzx_chain"] = dict(transform="ROLZX", entropy="TPAQ",
                               block_size=65536)
    cfgs["exe_fsd_chain"] = dict(transform="EXE+MM+PACK", entropy="FPAQ",
                                 block_size=65536)
    # listener attached -> Python compress_block_payload path; pins the slow
    # path's bytes in the golden file alongside the native path's (the
    # dual-path invariant, tests/test_dual_path.py)
    cfgs["level5_listener_path"] = dict(level=5, block_size=65536,
                                        checksum=32, listener=True)
    return cfgs


def _compress_listener(data: bytes, level: int, block_size: int,
                       checksum: int) -> bytes:
    import io

    from kanzi_tpu.kio.compressed_stream import Writer

    class _Noop:
        def process_event(self, evt):
            pass

    transform, entropy = kanzi_tpu.LEVEL_PRESETS[level]
    out = io.BytesIO()
    w = Writer(out, transform=transform, entropy=entropy,
               block_size=block_size, checksum=checksum, file_size=len(data))
    w.add_listener(_Noop())
    w.write(data)
    w.close()
    return out.getvalue()


def _compute():
    data = _corpus()
    out = {}
    for name, cfg in _configs().items():
        cfg = dict(cfg)
        if cfg.pop("listener", False):
            blob = _compress_listener(data, **cfg)
        else:
            blob = kanzi_tpu.compress(data, **cfg)
        assert kanzi_tpu.decompress(blob) == data, f"{name} roundtrip failed"
        out[name] = {"sha256": hashlib.sha256(blob).hexdigest(),
                     "size": len(blob)}
    return out


def test_compressed_output_stable():
    if not os.path.exists(GOLDEN_PATH):
        import pytest
        pytest.skip("no golden fixture recorded yet")
    golden = json.load(open(GOLDEN_PATH))
    current = _compute()
    for name, want in golden.items():
        got = current.get(name)
        assert got is not None, f"missing config {name}"
        assert got == want, (
            f"FORMAT DRIFT in {name}: {want} -> {got}. The compressed output "
            f"changed for identical input+config; this breaks stream "
            f"compatibility with previously written files.")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        json.dump(_compute(), open(GOLDEN_PATH, "w"), indent=1)
        print(f"wrote {GOLDEN_PATH}")
