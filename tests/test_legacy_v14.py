"""Legacy bitstream version 1-4 decode.

The reference accepts any bsVersion <= 6 (CompressedStream.go:1348); these
tests certify our decoder against spec-model v1-v4 WRITERS (there is no Go
toolchain and no archived old-format fixtures in this environment — the
writers in specmodel/legacy_v14.py are derived from the reference's decode
semantics, the same approach test_legacy_v5.py uses for v5).

Per-version distinctive features covered:
  v4: v3/v4 container header (6-bit block count + 4-bit uninverted CRC)
  v3: ANS 32 KiB default chunks, FPAQ old bit split, CM old predictor
      rules, UTF packUTF0 aliases, LZP 96-byte min match, ROLZ/ROLZX v3
      flag semantics (MM7 at delta 2)
  v2: pre-v3 header (no CRC), EXE old format, ROLZX without a flags byte,
      ROLZ first-literal count 2
  v1: ANS 2-state (order 0) / 1-state (order 1) byte-pair chunk layout
"""

import os
import sys

import numpy as np
import pytest

import kanzi_tpu
from kanzi_tpu import native
from kanzi_tpu import transforms as T

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from specmodel import ans as sans               # noqa: E402
from specmodel import legacy_v14 as l14         # noqa: E402
from specmodel import rolz as srolz             # noqa: E402
import specmodel.lzx as slzx                    # noqa: E402
from specmodel import content_aware as sca      # noqa: E402


def _corpus(n=80000):
    rng = np.random.default_rng(3)
    return (open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md"),
                 "rb").read()[:n - 30000]
            + rng.integers(0, 40, 30000, dtype=np.uint8).tobytes())


def _ans_chunked_32k(b, order=0):
    enc = sans.SpecANSEncoder(order=order, chunk_size=32768)
    enc.write(b)
    return enc.finish()


def test_v4_stream_decodes():
    data = _corpus()
    blob = l14.compress_legacy(data, 4, 5,
                               lambda b: sans.ans_encode(b, 0), 65536)
    assert kanzi_tpu.decompress(blob) == data


def test_v3_ans_32k_chunks():
    data = _corpus()
    blob = l14.compress_legacy(data, 3, 5, _ans_chunked_32k, 65536)
    assert kanzi_tpu.decompress(blob) == data


def test_v2_header_no_crc():
    data = _corpus()
    blob = l14.compress_legacy(data, 2, 5, _ans_chunked_32k, 65536)
    assert kanzi_tpu.decompress(blob) == data


def test_v1_ans_two_state_layout():
    data = _corpus()
    blob = l14.compress_legacy(data, 1, 5,
                               lambda b: l14.ans_encode_v1(b, 0), 65536)
    assert kanzi_tpu.decompress(blob) == data
    blob = l14.compress_legacy(data, 1, 8,
                               lambda b: l14.ans_encode_v1(b, 1), 65536)
    assert kanzi_tpu.decompress(blob) == data
    # odd-length chunk: trailing byte raw at the buffer end
    d2 = data[:32769 + 17]
    blob = l14.compress_legacy(d2, 1, 5,
                               lambda b: l14.ans_encode_v1(b, 0), 1 << 20)
    assert kanzi_tpu.decompress(blob) == d2


def test_v3_fpaq_old_split():
    data = _corpus()
    blob = l14.compress_legacy(data, 3, 2, l14.fpaq_encode_v1, 65536)
    assert kanzi_tpu.decompress(blob) == data


def test_v3_cm_old_predictor():
    data = _corpus(50000)
    blob = l14.compress_legacy(data, 3, 6, l14.cm_encode_v3, 65536)
    assert kanzi_tpu.decompress(blob) == data


def test_v3_lzp_min_match_96():
    data = (open(os.path.join(os.path.dirname(__file__), "..",
                              "SURVEY.md"), "rb").read()[:20000]) * 4
    orig = slzx.LZP_MIN_MATCH
    slzx.LZP_MIN_MATCH = 96
    try:
        enc = slzx.lzp_forward(data)
    finally:
        slzx.LZP_MIN_MATCH = orig
    out = native.transform_inverse(T.LZP_TYPE, np.frombuffer(enc, np.uint8),
                                   {"bsVersion": 3}, len(data))
    assert bytes(out) == data
    # the same stream must MIS-decode as v6 (the gate is load-bearing)
    try:
        out6 = native.transform_inverse(T.LZP_TYPE,
                                        np.frombuffer(enc, np.uint8),
                                        {"bsVersion": 6}, len(data))
        assert bytes(out6) != data
    except Exception:
        pass


def _repack_utf_v0(p6: bytes) -> bytes:
    """Rewrites a v6 UTF forward payload's alias table into the pre-v4
    packUTF0 layout (length-1 in bits 21+, no size-3 gap)."""
    n = (p6[2] << 8) | p6[3]
    out = bytearray(p6[:4])

    def unpack1(v):
        sz = v >> 19
        if sz == 0:
            return bytes([v & 0xFF])
        if sz == 1:
            return bytes([(v >> 8) & 0xFF, v & 0xFF])
        if sz == 2:
            return bytes([((v >> 12) & 0x0F) | 0xE0,
                          ((v >> 6) & 0x3F) | 0x80, (v & 0x3F) | 0x80])
        return bytes([((v >> 18) & 0x07) | 0xF0, ((v >> 12) & 0x3F) | 0x80,
                      ((v >> 6) & 0x3F) | 0x80, (v & 0x3F) | 0x80])

    def pack0(b):
        s = len(b)
        if s == 1:
            v = b[0]
        elif s == 2:
            v = (b[0] << 8) | b[1]
        elif s == 3:
            v = ((b[0] & 0x0F) << 12) | ((b[1] & 0x3F) << 6) | (b[2] & 0x3F)
        else:
            v = ((b[0] & 0x07) << 18) | ((b[1] & 0x3F) << 12) \
                | ((b[2] & 0x3F) << 6) | (b[3] & 0x3F)
        return ((s - 1) << 21) | v

    for i in range(n):
        v = int.from_bytes(p6[4 + 3 * i:7 + 3 * i], "big")
        out += pack0(unpack1(v)).to_bytes(3, "big")
    return bytes(out) + p6[4 + 3 * n:]


def test_v3_utf_old_alias_packing():
    src = ("λögic ünïcode ωords — " * 3000).encode("utf-8")
    p3 = _repack_utf_v0(sca.utf_forward(src, must_validate=False))
    out = native.transform_inverse(T.UTF_TYPE, np.frombuffer(p3, np.uint8),
                                   {"bsVersion": 3}, len(src))
    assert bytes(out) == src


def test_legacy_rolz_variants():
    text = (open(os.path.join(os.path.dirname(__file__), "..",
                              "SURVEY.md"), "rb").read()[:30000]) * 2
    dna = bytes(np.random.default_rng(1).choice(list(b"ACGT"), 40000))
    for name, data in (("text", text), ("dna", dna)):
        enc = srolz.rolz1_forward(data, bs_version=3)
        out = native.transform_inverse(
            T.ROLZ_TYPE, np.frombuffer(enc, np.uint8),
            {"bsVersion": 3}, len(data))
        assert bytes(out) == data, f"ROLZ v3 {name}"
    enc = srolz.rolz1_forward(text, bs_version=2)
    out = native.transform_inverse(T.ROLZ_TYPE, np.frombuffer(enc, np.uint8),
                                   {"bsVersion": 2}, len(text))
    assert bytes(out) == text
    enc = srolz.rolz2_forward(text, bs_version=3)
    out = native.transform_inverse(T.ROLZX_TYPE, np.frombuffer(enc, np.uint8),
                                   {"bsVersion": 3}, len(text))
    assert bytes(out) == text
    enc = srolz.rolz2_forward(text, bs_version=2)
    out = native.transform_inverse(T.ROLZX_TYPE, np.frombuffer(enc, np.uint8),
                                   {"bsVersion": 2}, len(text))
    assert bytes(out) == text


def _exe_inverse_v2_spec(src: bytes) -> bytes:
    """Independent transcription of EXECodec.go:451-505 (old format)."""
    count = len(src)
    dst = bytearray(count)
    si = di = 0
    end = count - 8
    while si < end:
        dst[di] = src[si]
        di += 1
        si += 1
        if (src[si - 1] & 0xFE) != 0xE8:
            continue
        if src[si] == 0xF5:
            si += 1
            continue
        sgn = (src[si] - 1) & 0xFF
        if sgn != 0 and sgn != 0xFF:
            continue
        addr = ((0xD5 ^ src[si + 3]) | ((0xD5 ^ src[si + 2]) << 8)
                | ((0xD5 ^ src[si + 1]) << 16) | (sgn << 24))
        addr = (addr - di) & 0xFFFFFFFF
        dst[di] = addr & 0xFF
        dst[di + 1] = (addr >> 8) & 0xFF
        dst[di + 2] = (addr >> 16) & 0xFF
        dst[di + 3] = sgn
        si += 4
        di += 4
    while si < count:
        dst[di] = src[si]
        di += 1
        si += 1
    return bytes(dst[:di])


def test_v2_exe_old_format():
    """Differential: the native pre-v3 EXE inverse must match an
    independent transcription on crafted jump-rich inputs."""
    rng = np.random.default_rng(9)
    for trial in range(6):
        body = bytearray(rng.integers(0, 256, 4000, dtype=np.uint8).tobytes())
        # plant jump opcodes followed by each branch shape
        for k in range(40):
            p = 50 + k * 90
            body[p] = 0xE8 if k % 2 else 0xE9
            body[p + 1] = [0x00, 0x01, 0xF5, 0x77][k % 4]
        src = bytes(body)
        exp = _exe_inverse_v2_spec(src)
        out = native.transform_inverse(T.EXE_TYPE,
                                       np.frombuffer(src, np.uint8),
                                       {"bsVersion": 2}, 2 * len(src))
        assert bytes(out) == exp, f"trial {trial}"


def test_v5_streams_still_decode():
    """The v5 path must be unaffected by the v1-v4 work."""
    from specmodel import legacy_v5 as l5
    data = _corpus(40000)
    blob = l5.compress_v5_huffman(data, 32768)
    assert kanzi_tpu.decompress(blob) == data


def test_legacy_stream_from_to_ranges():
    """--from/--to block ranges must work on legacy streams (the frame
    format is version-independent, but the ctx wiring goes through the
    legacy header parse)."""
    import io
    from kanzi_tpu.kio import Reader
    data = _corpus()
    blob = l14.compress_legacy(data, 3, 5, _ans_chunked_32k, 32768)
    # block numbering is 1-based (reference --from/--to): blocks [2, 4)
    r = Reader(io.BytesIO(blob), ctx={"from": 2, "to": 4})
    out = bytearray()
    while True:
        c = r.read(1 << 20)
        if not c:
            break
        out += c
    assert bytes(out) == data[32768:3 * 32768]


def test_legacy_stream_info_mode(tmp_path):
    """-y on a v3 stream must report the legacy header fields."""
    import subprocess
    import sys as _s
    data = _corpus(40000)
    blob = l14.compress_legacy(data, 3, 5, _ans_chunked_32k, 65536)
    p = tmp_path / "legacy.knz"
    p.write_bytes(blob)
    res = subprocess.run([_s.executable, "-m", "kanzi_tpu.app",
                          "-y", "-i", str(p), "-v", "4"],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    # reference INFO table row: Ver column shows the legacy version and the
    # v>=4 columns carry the entropy name
    assert "|  3|" in res.stdout
    assert "ANS0" in res.stdout
