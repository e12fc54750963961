"""InfoPrinter output-parity fixtures.

Pins our listener output to the reference's documented formats
(v2/app/InfoPrinter.go:150-309 block lines, :311-407 the -y INFO table):
field order, widths, integer-percent ratio, hash suffix, pending-map
ordered emission, and the v>=3 raw-text header block.
"""

import io
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from kanzi_tpu.core import Event, EventType, HashType, HeaderInfo  # noqa: E402
from kanzi_tpu.app.infoprinter import (  # noqa: E402
    COMPRESSION, DECOMPRESSION, INFO, InfoPrinter)

BLOCK_LINE = re.compile(
    r"^Block (\d+): (\d+) => (\d+) \[(\d+) ms\] => (\d+) \[(\d+) ms\]"
    r"( \((\d+)%\))?(  \[([0-9a-f]+)\])?$")


def _feed_block(p, bid, s0, s1, s2, t0=1.0, hash_=0,
                hash_type=HashType.NONE):
    # binary-exact offsets so the ms math is deterministic
    th = p.thresholds
    p.process_event(Event(th[1], bid, s0, time_=t0))
    p.process_event(Event(th[2], bid, s1, time_=t0 + 0.5))
    p.process_event(Event(th[3], bid, s1, time_=t0 + 0.75))
    p.process_event(Event(th[4], bid, s2, hash_, hash_type,
                          time_=t0 + 1.0))


def test_v4_compression_block_line_format():
    out = io.StringIO()
    p = InfoPrinter(4, COMPRESSION, out=out)
    _feed_block(p, 1, 100000, 60000, 40000, hash_=0x3BC33F8D,
                hash_type=HashType.SIZE_32)
    line = out.getvalue().strip()
    m = BLOCK_LINE.match(line)
    assert m, line
    # reference: "Block %d: %d => %d [%d ms] => %d [%d ms] (%d%%)  [%x]"
    assert line == ("Block 1: 100000 => 60000 [500 ms] => 40000 [250 ms] "
                    "(40%)  [3bc33f8d]")


def test_v4_decompression_line_has_no_ratio():
    out = io.StringIO()
    p = InfoPrinter(4, DECOMPRESSION, out=out)
    _feed_block(p, 1, 40000, 60000, 100000)
    line = out.getvalue().strip()
    m = BLOCK_LINE.match(line)
    assert m and m.group(7) is None, line  # ratio is compression-only


def test_integer_percent_truncates():
    out = io.StringIO()
    p = InfoPrinter(4, COMPRESSION, out=out)
    _feed_block(p, 1, 3, 2, 2)  # 2*100/3 = 66.67 -> 66
    assert "(66%)" in out.getvalue()


def test_ordered_phase_pending_map():
    """The ordered phase (AFTER_ENTROPY when compressing) arriving out of
    block order must be emitted strictly in id order — reference
    processOrderedPhase semantics (InfoPrinter.go:123-148)."""
    out = io.StringIO()
    p = InfoPrinter(4, COMPRESSION, out=out)
    th = p.thresholds
    for bid in (1, 2, 3):
        p.process_event(Event(th[1], bid, 1000, time_=1.0))
        p.process_event(Event(th[2], bid, 900, time_=1.001))
        p.process_event(Event(th[3], bid, 900, time_=1.002))
    # final (ordered) phase arrives 3, 2, 1: nothing may print until 1 lands
    p.process_event(Event(th[4], 3, 500, time_=1.01))
    p.process_event(Event(th[4], 2, 500, time_=1.01))
    assert out.getvalue() == ""
    p.process_event(Event(th[4], 1, 500, time_=1.01))
    ids = [int(m.group(1)) for m in
           (BLOCK_LINE.match(ln) for ln in out.getvalue().splitlines()) if m]
    assert ids == [1, 2, 3]


def test_header_decoding_raw_text_block():
    out = io.StringIO()
    p = InfoPrinter(4, DECOMPRESSION, out=out)
    p.process_event(Event(
        EventType.AFTER_HEADER_DECODING, 0, 0, time_=1.0,
        info=HeaderInfo(bs_version=6, checksum_size=32, block_size=4194304,
                        entropy_type="ANS0",
                        transform_type="TEXT+UTF+BWT+RANK+ZRLT",
                        original_size=49567)))
    # reference raw-text shape (InfoPrinter.go:246-305)
    assert out.getvalue() == (
        "\nBitstream version: 6\n"
        "Block checksum: 32 bits\n"
        "Block size: 4194304 bytes\n"
        "Using ANS0 entropy codec (stage 1)\n"
        "Using TEXT+UTF+BWT+RANK+ZRLT transform (stage 2)\n"
        "Original size: 49567 byte(s)\n\n")


def test_info_table_format():
    out = io.StringIO()
    p = InfoPrinter(4, INFO, out=out)
    for name, fsize in (("a.knz", 19000), ("bb.knz", 8427)):
        p.process_event(Event(
            EventType.AFTER_HEADER_DECODING, 0, 0, time_=1.0,
            info=HeaderInfo(bs_version=6, checksum_size=32,
                            block_size=4194304, entropy_type="ANS0",
                            transform_type="TEXT+UTF+BWT+RANK+ZRLT",
                            original_size=49567, file_size=fsize,
                            input_name="/tmp/" + name)))
    lines = out.getvalue().splitlines()
    # header row once, exact reference column titles (InfoPrinter.go:324-341)
    assert lines[0] == ""
    assert lines[1] == ("|     File Name      |Ver|Check|Block Size"
                        "|  File Size | Orig. Size | Ratio "
                        "| Entropy|        Transforms        |")
    assert lines[2] == ("|a.knz               |  6|   32|   4194304"
                        "|   18.55 KiB|   48.41 KiB| 0.383 "
                        "|    ANS0|    TEXT+UTF+BWT+RANK+ZRLT|")
    assert lines[3].startswith("|bb.knz              |")
    assert len(lines) == 4  # no second title row


def test_cli_v4_and_y_surface(tmp_path):
    src = os.path.join(REPO, "SURVEY.md")
    knz = str(tmp_path / "s.knz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "kanzi_tpu.app", "-c", "-i", src, "-o", knz,
         "-l", "5", "-f", "-x32", "-v", "4"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert any(BLOCK_LINE.match(ln) and "(" in ln
               for ln in r.stderr.splitlines()), r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "kanzi_tpu.app", "-y", "-i", knz, "-v", "4"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "|     File Name      |Ver|Check|Block Size" in r.stdout
    assert "|s.knz               |  6|   32|" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "kanzi_tpu.app", "-d", "-i", knz, "-o",
         "NONE", "-f", "-v", "4"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "Bitstream version: 6" in r.stderr
    assert "Using ANS0 entropy codec (stage 1)" in r.stderr


def test_v5_event_stream_with_stage_durations():
    """v>=5 prints every event; threshold events 2-4 carry a ' [d ms]'
    suffix computed from the correlated stage timestamps
    (InfoPrinter.go:164-225)."""
    out = io.StringIO()
    p = InfoPrinter(5, COMPRESSION, out=out)
    _feed_block(p, 1, 1000, 800, 600)
    lines = [ln for ln in out.getvalue().splitlines() if ln]
    # BEFORE_TRANSFORM: bare event; AFTER_TRANSFORM: [500 ms];
    # BEFORE_ENTROPY: [250 ms]; AFTER_ENTROPY: [250 ms]; then the v>=4 line
    assert '"type":"BEFORE_TRANSFORM"' in lines[0] and "ms]" not in lines[0]
    assert '"type":"AFTER_TRANSFORM"' in lines[1] and lines[1].endswith("[500 ms]")
    assert '"type":"BEFORE_ENTROPY"' in lines[2] and lines[2].endswith("[250 ms]")
    assert '"type":"AFTER_ENTROPY"' in lines[3] and lines[3].endswith("[250 ms]")
    assert lines[4].startswith("Block 1:")
    # non-threshold events also print at v>=5
    p.process_event(Event(EventType.COMPRESSION_END, -1, 123, time_=9.0))
    assert '"type":"COMPRESSION_END"' in out.getvalue().splitlines()[-1]
