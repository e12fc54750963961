import random

import pytest

from kanzi_tpu.bitstream import BitReader, BitWriter
from kanzi_tpu.core import KanziError


def test_write_read_bits_roundtrip():
    rng = random.Random(42)
    ops = []
    bw = BitWriter()
    for _ in range(500):
        n = rng.randint(1, 64)
        v = rng.getrandbits(n)
        ops.append((v, n))
        bw.write_bits(v, n)
    bw.close()
    br = BitReader(bw.getvalue())
    for v, n in ops:
        assert br.read_bits(n) == v


def test_msb_first_semantics():
    bw = BitWriter()
    bw.write_bits(0b101, 3)
    bw.write_bits(0b01, 2)
    bw.write_bits(0b110, 3)
    bw.close()
    # bit string: 101 01 110 -> byte 0b10101110
    assert bw.getvalue() == bytes([0b10101110])


def test_close_pads_low_zeros():
    bw = BitWriter()
    bw.write_bits(0b11, 2)
    bw.close()
    assert bw.getvalue() == bytes([0b11000000])


def test_write_array_aligned():
    bw = BitWriter()
    payload = bytes(range(256))
    bw.write_array(payload, len(payload) * 8)
    bw.close()
    assert bw.getvalue() == payload


def test_write_array_unaligned():
    rng = random.Random(7)
    for shift in range(1, 8):
        payload = bytes(rng.randrange(256) for _ in range(1000))
        nbits = rng.choice([len(payload) * 8, len(payload) * 8 - 3])
        bw = BitWriter()
        bw.write_bits(rng.getrandbits(shift), shift)
        bw.write_array(payload, nbits)
        bw.close()
        br = BitReader(bw.getvalue())
        br.read_bits(shift)
        got = br.read_array(nbits)
        want = bytearray(payload[: (nbits + 7) // 8])
        if nbits % 8:
            want[-1] &= (0xFF << (8 - nbits % 8)) & 0xFF
        assert got == bytes(want)


def test_read_array_various_alignments():
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(64))
    for skip in range(0, 16):
        bw = BitWriter()
        if skip:
            bw.write_bits(rng.getrandbits(skip), skip)
        bw.write_array(data, len(data) * 8)
        bw.close()
        br = BitReader(bw.getvalue())
        if skip:
            br.read_bits(skip)
        assert br.read_array(len(data) * 8) == data


def test_written_counts_bits_exactly():
    bw = BitWriter()
    bw.write_bits(1, 5)
    assert bw.written == 5
    bw.write_array(b"\xff" * 10, 77)
    assert bw.written == 82


def test_reader_overrun_raises():
    br = BitReader(b"\x00")
    br.read_bits(8)
    with pytest.raises(KanziError):
        br.read_bits(1)


def test_interleaved_arrays_and_bits():
    rng = random.Random(11)
    bw = BitWriter()
    recorded = []
    for _ in range(50):
        if rng.random() < 0.5:
            n = rng.randint(1, 64)
            v = rng.getrandbits(n)
            bw.write_bits(v, n)
            recorded.append(("bits", v, n))
        else:
            ln = rng.randint(1, 200)
            payload = bytes(rng.randrange(256) for _ in range(ln))
            nbits = rng.randint(1, ln * 8)
            bw.write_array(payload, nbits)
            recorded.append(("array", payload, nbits))
    bw.close()
    br = BitReader(bw.getvalue())
    for kind, v, n in recorded:
        if kind == "bits":
            assert br.read_bits(n) == v
        else:
            got = br.read_array(n)
            want = bytearray(v[: (n + 7) // 8])
            if n % 8:
                want[-1] &= (0xFF << (8 - n % 8)) & 0xFF
            assert got == bytes(want)


def test_custom_bitstream_injection_container():
    """Custom bitstream objects injectable into the container (reference
    NewWriterWithCtx2/NewReaderWithCtx2, v2/io/CompressedStream.go:254,
    1098): a DebugBitWriter-wrapped stream must receive every container
    bit and produce a byte-identical stream; a DebugBitReader wrapper must
    observe every read of a full decode."""
    import io

    import kanzi_tpu
    from kanzi_tpu.bitstream import BitWriter, DebugBitWriter, DebugBitReader
    from kanzi_tpu.kio import Reader, Writer

    data = (b"custom bitstream injection " * 400)[:9000]
    ref = kanzi_tpu.compress(data, transform="LZ", entropy="HUFFMAN",
                             block_size=4096, checksum=32)

    log = io.StringIO()
    obs = DebugBitWriter(BitWriter(), out=log, hexa=True)
    w = Writer(None, transform="LZ", entropy="HUFFMAN", block_size=4096,
               checksum=32, file_size=len(data), obs=obs)
    w.write(data)
    w.close()
    assert obs.getvalue() == ref
    assert len(log.getvalue()) > 100  # the wrapper saw the bits

    rlog = io.StringIO()
    r = Reader(ref, ibs=lambda br: DebugBitReader(br, out=rlog, hexa=True))
    out = bytearray()
    while True:
        c = r.read(1 << 16)
        if not c:
            break
        out += c
    assert bytes(out) == data
    assert len(rlog.getvalue()) > 100
