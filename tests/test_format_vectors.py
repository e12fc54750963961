"""Format verification that does NOT trust the encoder under test.

Two layers of independent evidence that the emitted bitstream is the KANZ v6
format and not a self-consistent dialect:

1. Hand-pinned literal vectors: expected bytes/bits derived by hand from the
   reference algorithm (derivations in comments, Go file:line cited), pinned
   as literals.
2. Differential vectors: the pure-Python spec models in tests/specmodel/
   (independent transcriptions of the Go algorithms — no kanzi_tpu imports)
   must produce byte-identical output to the C++ engine across an input
   matrix covering chunk boundaries, alphabet shapes, and both ANS orders.

A divergence from the reference format would have to be introduced twice,
identically, in two languages, to pass this file.
"""

import os
import random

import numpy as np
import pytest

import kanzi_tpu
from kanzi_tpu import entropy as ke

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from specmodel.bits import SpecOBS
from specmodel import entropy_utils as su
from specmodel import huffman as shuf
from specmodel import ans as sans
from specmodel import container as scont


# ---------------------------------------------------------------------------
# 1. Hand-pinned literal vectors
# ---------------------------------------------------------------------------

def test_varint_hand_vectors():
    """v2/entropy/EntropyUtils.go:264-275: 7-bit groups, low group first,
    0x80 continuation on all but the last byte."""
    cases = {
        0: b"\x00",
        1: b"\x01",
        127: b"\x7f",
        128: b"\x80\x01",            # 128 = 0b1000_0000 -> low7=0(|0x80), rest=1
        300: b"\xac\x02",            # 300 = 0b1_0010_1100 -> 0x2C|0x80, 0x02
        16384: b"\x80\x80\x01",      # 2^14 -> 0,0,1 (low groups first)
        0xFFFFFFFF: b"\xff\xff\xff\xff\x0f",
    }
    for value, expected in cases.items():
        obs = SpecOBS()
        su.write_varint(obs, value)
        assert obs.close() == expected, value


def test_expgolomb_hand_vectors():
    """Spot values from the precomputed cache in v2/entropy/ExpGolombCodec.go
    (entry = (len<<9)|bits). cache[1]=2052, cache[128]=8451, cache[255]=2053,
    cache[2]=2054 in the signed table; 0 encodes as a single 1-bit."""
    def enc(v):
        obs = SpecOBS()
        su.expgolomb_encode_byte(obs, v, signed=True)
        return obs.written(), int.from_bytes(obs.close(), "big") >> ((-obs.written()) % 8)

    assert enc(0) == (1, 0b1)
    assert enc(1) == (4, 2052 & 0x1FF)          # len 4, bits 0b0100
    assert enc(2) == (4, 2054 & 0x1FF)          # len 4, bits 0b0110
    assert enc(128) == (16, 8451 & 0x1FF)       # len 16, bits 259
    assert enc(255) == (4, 2053 & 0x1FF)        # len 4, bits 0b0101


def test_alphabet_hand_vectors():
    """v2/entropy/EntropyUtils.go:38-66."""
    # full alphabet: bits '00' -> one byte 0b00000000
    obs = SpecOBS()
    su.encode_alphabet(obs, list(range(256)))
    assert (obs.written(), obs.close()) == (2, b"\x00")
    # empty alphabet: bits '01'
    obs = SpecOBS()
    su.encode_alphabet(obs, [])
    assert (obs.written(), obs.close()) == (2, b"\x40")
    # partial {65, 66} ('A','B'): bit '1', lastMask=66>>3=8 in 5 bits
    # ('01000'), then 9 mask bytes; byte 8 has bits 65&7=1 and 66&7=2 set
    # -> 0b00000110. Stream bits: 1 01000 | 8 zero bytes | 00000110
    obs = SpecOBS()
    su.encode_alphabet(obs, [65, 66])
    assert obs.written() == 1 + 5 + 72
    expected_bits = (0b101000 << 72) | 0b00000110
    assert int.from_bytes(obs.close(), "big") >> ((-78) % 8) == expected_bits


def test_normalize_frequencies_hand_vectors():
    """Worked by hand from v2/entropy/EntropyUtils.go:123-260."""
    # Two symbols 3:1, scale 256: scaled = round(3*256/4)=192, round(256/4)=64
    # sum=256=scale -> done.
    f = [0] * 256
    f[10], f[20] = 3, 1
    size, alpha = su.normalize_frequencies(f, 256, 4, 256)
    assert (size, alpha, f[10], f[20]) == (2, [10, 20], 192, 64)

    # Single symbol always gets the full scale.
    f = [0] * 256
    f[7] = 123
    size, alpha = su.normalize_frequencies(f, 256, 123, 1 << 12)
    assert (size, f[7]) == (1, 4096)

    # totalFreq == scale shortcut: frequencies unchanged.
    f = [0] * 256
    f[1], f[2] = 100, 156
    size, alpha = su.normalize_frequencies(f, 256, 256, 256)
    assert (size, f[1], f[2]) == (2, 100, 156)

    # Fast path: 3 symbols {100, 100, 56}, scale 256:
    # scaled: round(100*256/256)=100, 100, 56 -> sum 256 OK (still exact).
    # Now force rounding error: {5,5,6}, total 16, scale 256:
    # scaled: 5*256/16=80, 80, 96 -> sum 256. Exact again (power of two).
    # Use total 10, freqs {3,3,4}, scale 256: 3*256/10=76.8->round 77,
    # 77, 4*256/10=102.4 -> 102; sum=256. Exact.
    # Use freqs {1,1,1}, total 3, scale 256: each (256+1)/3 = 85 (Go:
    # (sf + total>>1)/total = (256+1)/3 = 85); sum 255, delta=-1,
    # errThr=85>>4=5, |delta|<=errThr -> freqs[idxMax] -= -1 -> 86.
    # idxMax: first symbol with scaled > previous stays 0 (85 !> 85).
    f = [0] * 256
    f[0], f[1], f[2] = 1, 1, 1
    size, alpha = su.normalize_frequencies(f, 256, 3, 256)
    assert (size, f[0], f[1], f[2]) == (3, 86, 85, 85)


def test_file_header_hand_vector():
    """v2/io/CompressedStream.go:429-519, worked by hand for
    entropy=NONE(0), transform=NONE chain (48-bit 0), blockSize=4 MiB,
    no checksum, no input size.

    Bit layout: 'KANZ'(32) | 6(4) | 0(2) | 0(5) | 0(48) | 0x40000(28) |
    0(2) | 0(15) | cksum(24) = 160 bits = 20 bytes.

    Checksum (uint32 wraparound):
      seed  = 0x01030507 * 6               = 0x0612_1E2A
      HASH  = 0x1E35A7BD
      c     = HASH*seed                    (mod 2^32)
      c    ^= HASH*0xFFFFFFFF  (ckSize=0  -> ~0)
      c    ^= HASH*0xFFFFFFFF  (entropy=0 -> ~0)
      c    ^= HASH*0xFFFFFFFF  (transform>>32)
      c    ^= HASH*0xFFFFFFFF  (transform low)
      c    ^= HASH*(~0x400000)
      c     = (c>>23) ^ (c>>3); low 24 bits
    """
    M = 1 << 32
    HASH = 0x1E35A7BD
    seed = (0x01030507 * 6) % M
    c = (HASH * seed) % M
    for v in (0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
              (~(4 << 20)) % M):
        c ^= (HASH * v) % M
    c = ((c >> 23) ^ (c >> 3)) & 0xFFFFFF

    obs = SpecOBS()
    scont.write_header(obs, entropy_type=0, transform_type=0,
                       block_size=4 << 20)
    raw = obs.close()
    assert len(raw) == 20
    assert raw[:4] == b"KANZ"
    # version 6 in the top nibble of byte 4; ck(2)=0, entropy top 2 bits = 0
    assert raw[4] == 0x60
    # 24-bit checksum is the last 3 bytes (..15 bits padding before it
    # ends at bit 136; 136+24=160, byte-aligned)
    assert int.from_bytes(raw[17:20], "big") == c

    # And the implementation under test emits exactly these bytes.
    blob = kanzi_tpu.compress(b"", transform="NONE", entropy="NONE",
                              block_size=4 << 20)
    assert blob[:20] == raw


# ---------------------------------------------------------------------------
# 2. Differential: spec model vs C++ engine
# ---------------------------------------------------------------------------

def _cases():
    rng = random.Random(0xC0FFEE)
    yield "empty", b""
    yield "one", b"K"
    yield "len31", bytes(rng.randrange(256) for _ in range(31))
    yield "len32", bytes(rng.randrange(256) for _ in range(32))
    yield "len33", bytes(rng.randrange(256) for _ in range(33))
    yield "constant", b"\x55" * 5000
    yield "two-sym", bytes(rng.choice(b"AB") for _ in range(4096))
    yield "ascii", bytes(rng.randrange(32, 127) for _ in range(50000))
    yield "narrow5", bytes(rng.randrange(5) for _ in range(30000))
    yield "skewed", bytes(
        rng.choice(b"aaaaaaaaaaaaaaaabbbbccde") for _ in range(20000))
    yield "random", bytes(rng.randrange(256) for _ in range(70000))
    yield "chunk-edge", bytes(rng.randrange(64) for _ in range(16384))
    yield "chunk-edge+1", bytes(rng.randrange(64) for _ in range(16385))
    yield "chunk-edge-1", bytes(rng.randrange(64) for _ in range(16383))
    yield "sparse-alpha", bytes(rng.choice(b"\x00\x80\xff") for _ in range(9000))
    yield "text", (b"the quick brown fox jumps over the lazy dog. " * 700)
    # deep-skew stresses the Huffman length limiter (12-bit cap)
    pool = (b"a" * 8192 + b"b" * 4096 + b"c" * 2048 + b"d" * 1024 +
            b"e" * 512 + b"f" * 256 + b"g" * 128 + b"h" * 64 + b"i" * 32 +
            b"j" * 16 + b"k" * 8 + b"l" * 4 + b"m" * 2 + b"n" + b"o" + b"p")
    yield "huff-limit", bytes(rng.choice(pool) for _ in range(16384))


@pytest.mark.parametrize("name,data", list(_cases()))
def test_huffman_bytes_match_spec(name, data):
    spec_bytes, spec_bits = shuf.huffman_encode(data)
    got_bytes, got_bits = ke.encode(ke.HUFFMAN_TYPE, data, {})
    assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("name,data", list(_cases()))
def test_ans_bytes_match_spec(order, name, data):
    spec_bytes, spec_bits = sans.ans_encode(data, order)
    etype = ke.ANS0_TYPE if order == 0 else ke.ANS1_TYPE
    got_bytes, got_bits = ke.encode(etype, data, {})
    assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name


def test_range_bytes_match_spec():
    from specmodel.range_codec import range_encode
    for name, data in _cases():
        spec_bytes, spec_bits = range_encode(data)
        got_bytes, got_bits = ke.encode(ke.RANGE_TYPE, data, {})
        assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name


def test_fpaq_bytes_match_spec():
    from specmodel.fpaq import fpaq_encode
    for name, data in _cases():
        spec_bytes, spec_bits = fpaq_encode(data)
        got_bytes, got_bits = ke.encode(ke.FPAQ_TYPE, data, {})
        assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name


def test_cm_bytes_match_spec():
    from specmodel.binary_cm import binary_encode, SpecCMPredictor
    for name, data in _cases():
        spec_bytes, spec_bits = binary_encode(data, SpecCMPredictor())
        got_bytes, got_bits = ke.encode(ke.CM_TYPE, data, {})
        assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name


@pytest.mark.parametrize("extra", [False, True])
def test_tpaq_bytes_match_spec(extra):
    """The full TPAQ/TPAQX predictor chain: FSM bit histories, NN mixer,
    match model, APM/SSE stages. The 'binaryish' case exercises the
    binCount >= pos>>2 SSE branch where round 1's C++ diverged from the
    reference (sse1 must apply in BOTH sub-branches)."""
    from specmodel.binary_cm import binary_encode
    from specmodel.tpaq import SpecTPAQPredictor
    rng = random.Random(42)
    cases = {
        "sixteen": bytes(range(16)),
        "text": b"she sells sea shells by the sea shore " * 250,
        "binaryish": bytes(rng.randrange(256) for _ in range(16000)),
        "narrow": bytes(rng.randrange(4) for _ in range(24000)),
        "match-heavy": b"0123456789ABCDEF" * 800,
    }
    etype = ke.TPAQX_TYPE if extra else ke.TPAQ_TYPE
    for name, data in cases.items():
        ctx = {"blockSize": 65536, "size": len(data)}
        pred = SpecTPAQPredictor(block_size=65536, size=len(data), extra=extra)
        spec_bytes, spec_bits = binary_encode(data, pred)
        got_bytes, got_bits = ke.encode(etype, data, ctx)
        assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name


@pytest.mark.parametrize("variant", [3, 16])  # LZ / LZX
def test_lzx_sections_match_spec(variant):
    """The 4-section LZX layout, token stream, rep-distances and escaped
    lengths (v2/transform/LZCodec.go:193-608)."""
    from specmodel.lzx import lzx_forward, LZXSkip
    from kanzi_tpu.transforms.lz import LZCodec
    from kanzi_tpu.transforms.base import TransformSkip
    rng = random.Random(17)
    words = [bytes(rng.randrange(97, 122) for _ in range(rng.randrange(3, 9)))
             for _ in range(40)]
    cases = {
        "crafted": (b"abcdefgh" * 10 + b"XYZT" + b"abcdefgh" * 5 +
                    b"0123456789" * 30 + b"abcdefgh" * 12),
        "words": b" ".join(rng.choice(words) for _ in range(4000)),
        "longrun": b"A" * 70000 + b"B" * 3 + b"A" * 500,
        "survey": open("/root/repo/SURVEY.md", "rb").read()[:60000],
        "fardist": (b"Q" * 5 + bytes(rng.randrange(256) for _ in range(70000))
                    + b"kanzi-spec-far-match-pattern" * 4
                    + bytes(rng.randrange(256) for _ in range(200))
                    + b"kanzi-spec-far-match-pattern" * 4),
        "incompressible": bytes(rng.randrange(256) for _ in range(5000)),
        "tiny": b"too small block!!!",
    }
    for name, data in cases.items():
        try:
            expected = lzx_forward(data, extra=(variant == 16))
        except LZXSkip:
            expected = None
        codec = LZCodec({"lz": variant})
        try:
            got = bytes(codec.forward(np.frombuffer(data, np.uint8)))
        except TransformSkip:
            got = None
        assert got == expected, name


def test_lzx_hand_vector():
    """Fully hand-worked LZX stream (v2/transform/LZCodec.go:427-584).

    Input = 'ABCDEFGH'x30 + 16 tail bytes, 256 bytes. srcEnd = 238.
    Hash refs at position 0 are unusable (ref > minRef=0 fails), so the
    first match lands at srcIdx=9 vs ref=1 (bestLen from findMatch's 8-wide
    steps: 224 of maxMatch 229). The +1 probe (srcIdx=10 vs ref=2, 224 >=
    224) wins the tie, then backward extension walks to srcIdx=8/ref=0,
    bestLen=226. dist=8, mLen=226-4=222 -> escaped (222-7=215); litLen=8 ->
    escaped (8-7=1); anchor=234, last literals = 22 -> escaped (15).
    Sections: literals = [1]+'ABCDEFGH'+[15]+src[234:], tokens =
    [(7<<5)|0x08|7, 7<<5], dists = [8], mlens = [215].
    """
    from specmodel.lzx import lzx_forward
    from kanzi_tpu.transforms.lz import LZCodec
    data = b"ABCDEFGH" * 30 + b"0123456789abcdef"
    expected = (b"\x2d\x00\x00\x00"     # litEnd = 13+9+23 = 45
                b"\x02\x00\x00\x00"     # 2 tokens
                b"\x01\x00\x00\x00"     # 1 distance byte
                b"\x04"                 # flags: maxDist1, minMatch 4
                b"\x01" + b"ABCDEFGH" + b"\x0f" + data[234:] +
                bytes([(7 << 5) | 0x08 | 7, 7 << 5]) +
                b"\x08" +               # distance
                bytes([215]))           # escaped match length
    assert lzx_forward(data) == expected
    got = bytes(LZCodec({"lz": 3}).forward(np.frombuffer(data, np.uint8)))
    assert got == expected


@pytest.mark.slow
def test_ans1_multi_chunk_matches_spec():
    """ANS1 chunks are 4 MiB: cross one boundary (slow-ish, 5 MiB)."""
    rng = random.Random(99)
    data = bytes(rng.choice(b"aabbbbcccccccdefgh") for _ in range((4 << 20) + 5000))
    spec_bytes, spec_bits = sans.ans_encode(data, 1)
    got_bytes, got_bits = ke.encode(ke.ANS1_TYPE, data, {})
    assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes)


# ---------------------------------------------------------------------------
# 3. Whole-stream differential: container composed from spec parts
# ---------------------------------------------------------------------------

def _spec_stream_none_none(data: bytes, block_size: int,
                           checksum_bits: int = 0) -> bytes:
    """Compose a full KANZ stream for transform=NONE, entropy=NONE from the
    spec models only (v2/io/CompressedStream.go:429-519,718-728,951-976)."""
    from kanzi_tpu.xxhash import xxhash32, xxhash64  # hash of ORIGINAL block
    obs = SpecOBS()
    ck_size = {0: 0, 32: 1, 64: 2}[checksum_bits]
    scont.write_header(obs, entropy_type=0, transform_type=0,
                       block_size=block_size, input_size=len(data),
                       ck_size=ck_size)
    for off in range(0, len(data), block_size):
        block = data[off:off + block_size]
        bobs = SpecOBS()
        if checksum_bits == 32:
            ck = xxhash32(block, 0x4B414E5A)
        elif checksum_bits == 64:
            ck = xxhash64(block, 0x4B414E5A)
        else:
            ck = None
        # A 1-transform NONE sequence that ran leaves skipFlags = 0x7F:
        # Forward seeds 0xFF and clears only bit 7 (Sequence.go:66,107).
        # <= 15 bytes => copy mode (v2/io/CompressedStream.go:51,764-770),
        # but the NONE forward still runs, so the flags are the same.
        copy = len(block) <= 15
        scont.block_payload_prefix(bobs, skip_flags=0x7F,
                                   n_transforms=1, post_len=len(block),
                                   copy_block=copy, checksum=ck,
                                   checksum_bits=checksum_bits)
        bobs.write_array(block, 8 * len(block))
        payload_bits = bobs.written()
        scont.write_frame(obs, bobs.close(), payload_bits)
    scont.write_end_marker(obs)
    return obs.close()


@pytest.mark.parametrize("n,bs,ck", [
    (0, 1 << 20, 0),
    (16, 1 << 20, 0),
    (100, 1 << 20, 0),
    (100, 1 << 20, 32),
    (100, 1 << 20, 64),
    (300000, 65536, 0),    # multi-block
    (300000, 65536, 32),
])
def test_container_stream_matches_spec(n, bs, ck):
    rng = random.Random(n + bs + ck)
    data = bytes(rng.randrange(256) for _ in range(n))
    expected = _spec_stream_none_none(data, bs, ck)
    got = kanzi_tpu.compress(data, transform="NONE", entropy="NONE",
                             block_size=bs, checksum=ck)
    assert got == expected
    assert kanzi_tpu.decompress(got) == data


@pytest.mark.slow
def test_fpaq_multi_chunk_matches_spec():
    """FPAQ chunks are 4 MiB: cross one boundary and check the inter-chunk
    56-bit flush against the spec model (low/high/tables persist across
    chunks — v2/entropy/FPAQCodec.go:120-170)."""
    from specmodel.fpaq import fpaq_encode
    rng = random.Random(77)
    data = bytes(rng.choice(b"aaaabbbccd") for _ in range((4 << 20) + 4096))
    spec_bytes, spec_bits = fpaq_encode(data)
    got_bytes, got_bits = ke.encode(ke.FPAQ_TYPE, data, {})
    assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes)


@pytest.mark.slow
def test_binary_entropy_64mib_chunk_resync():
    """The CM/TPAQ shell splits blocks >= 64 MiB into chunks with varint
    byte counts and 56-bit flushes between them
    (v2/entropy/BinaryEntropyCodec.go:105-155). The spec model is too slow
    at this size, so this is an implementation round-trip of the resync
    path; byte-level shell equivalence is covered at small sizes."""
    rng = np.random.default_rng(5)
    n = (1 << 26) + 12345   # crosses the 64 MiB chunk threshold
    data = rng.integers(0, 16, n, dtype=np.uint8).tobytes()
    payload, bits = ke.encode(ke.CM_TYPE, data, {})
    out = ke.decode(ke.CM_TYPE, bytes(payload), n, {})
    assert out == data


def test_scan_transforms_match_spec():
    """ZRLT/RLT/SRT/SBRT byte-level formats vs independent spec models
    (specmodel/scans.py). RLT cases avoid DNA/BASE64/UTF8-detected data:
    the type gate (v2/transform/RLT.go:88-136) is modeled by the caller."""
    from specmodel.scans import (zrlt_forward, rlt_forward, srt_forward,
                                 sbrt_forward, SpecSkip)
    from kanzi_tpu import native
    rng = random.Random(31)
    cases = {
        "zeros": bytes(4096),
        "post-bwt": bytes(rng.choice(b"\x00\x00\x00\x01\x01\x02\x03\x07")
                          for _ in range(30000)),
        "runs": b"".join(bytes([rng.randrange(256)]) * rng.randrange(1, 40)
                         for _ in range(800)),
        "mixed": bytes(rng.randrange(256) for _ in range(5000)),
        "hi-vals": bytes(rng.choice(b"\xfd\xfe\xff\x00\x01")
                         for _ in range(8000)),
        "tiny": b"aaaaaaa\x01bbbbbbbbcc",
        "long-zero-run": bytes(70000) + b"x" + bytes(3000),
        "max-run": b"\x05" * 70000 + b"qr\x07st",
    }

    def impl_fwd(ttype, data, ctx):
        try:
            out, _ = native.transform_forward(
                ttype, np.frombuffer(data, np.uint8), ctx,
                3 * len(data) + 65536)
            return bytes(out)
        except native.NativeSkip:
            return None

    for name, data in cases.items():
        try:
            spec = zrlt_forward(data)
        except SpecSkip:
            spec = None
        assert spec == impl_fwd(6, data, {}), f"ZRLT {name}"
        assert srt_forward(data) == impl_fwd(13, data, {}), f"SRT {name}"
        assert sbrt_forward(data, "MTF") == impl_fwd(7, data, {}), f"MTFT {name}"
        assert sbrt_forward(data, "RANK") == impl_fwd(8, data, {}), f"RANK {name}"
        try:
            spec = rlt_forward(data, fast_entropy=False)
        except SpecSkip:
            spec = None
        assert spec == impl_fwd(5, data, {"entropy": "TPAQ"}), f"RLT {name}"
        try:
            spec = rlt_forward(data, fast_entropy=True)
        except SpecSkip:
            spec = None
        assert spec == impl_fwd(5, data, {"entropy": "HUFFMAN"}), f"RLT-fast {name}"


def test_lzp_matches_spec():
    """LZP hash-predict scan (v2/transform/LZCodec.go:943-1105): flag/escape
    bytes, 254-escaped lengths, and the skip decision itself."""
    from specmodel.lzx import lzp_forward, LZXSkip
    from kanzi_tpu import native
    from kanzi_tpu.transforms.base import TransformSkip  # noqa: F401
    rng = random.Random(8)
    base = open("/root/repo/SURVEY.md", "rb").read()[:60000]
    cases = {
        "text": base,
        "rep": (b"pattern-abcdefgh" * 64 + b"\xfc" * 10 + base[:5000]) * 3,
        "flag-heavy": bytes(rng.choice(b"\xfc\xfcqrs") for _ in range(20000)),
        "random": bytes(rng.randrange(256) for _ in range(9000)),
        "long-match": base[:200] + base[:5000] * 4,
        "tiny": b"z" * 127,
    }
    for name, data in cases.items():
        try:
            spec = lzp_forward(data)
        except LZXSkip:
            spec = None
        try:
            out, _ = native.transform_forward(
                14, np.frombuffer(data, np.uint8), {}, 3 * len(data) + 65536)
            got = bytes(out)
        except native.NativeSkip:
            got = None
        assert spec == got, name


def test_utf_and_pack_match_spec():
    """UTF codepoint aliasing (1- and 2-byte alias paths, BOM, truncated
    starts, the validation gate) and PACK nibble/digram packing vs the
    independent spec models (specmodel/content_aware.py)."""
    from specmodel.content_aware import (utf_forward, alias_forward,
                                         SpecSkip)
    from kanzi_tpu import native
    rng = random.Random(12)

    def impl_fwd(ttype, data):
        try:
            out, _ = native.transform_forward(
                ttype, np.frombuffer(data, np.uint8), {},
                3 * len(data) + 65536)
            return bytes(out)
        except native.NativeSkip:
            return None

    pool2 = [chr(rng.randrange(0x80, 0x7FF)) for _ in range(60)]
    pool3 = [chr(rng.randrange(0x800, 0x3000)) for _ in range(40)]
    pool4 = [chr(rng.randrange(0x10000, 0x2FFFF)) for _ in range(150)]
    text = "".join(rng.choice(pool2 + pool3 + ["e", "t", "a", " "])
                   for _ in range(12000))
    rich = "".join(rng.choice(pool2 + pool3 + pool4) for _ in range(9000))
    utf_cases = {
        "pooled": text.encode(),
        "rich-200+": rich.encode(),       # > 128 distinct: 2-byte aliases
        "bom": b"\xef\xbb\xbf" + text.encode(),
        "trunc": text.encode()[1:],
        "not-utf": bytes(rng.randrange(256) for _ in range(5000)),
        "too-diverse": "".join(
            chr(rng.randrange(0x80, 0x3000)) for _ in range(9000)).encode(),
    }
    for name, data in utf_cases.items():
        try:
            spec = utf_forward(data)
        except SpecSkip:
            spec = None
        assert spec == impl_fwd(17, data), f"UTF {name}"

    pack_cases = {
        "alpha4": bytes(rng.choice(b"WXYZ") for _ in range(5000)),
        "alpha16": bytes(rng.choice(b"qwertyuiopasdfgh") for _ in range(5001)),
        "alpha1": b"\x99" * 3000,
        "digram": b"".join(rng.choice([b"th", b"he", b"in", b"er", b"an"])
                           for _ in range(4000)) + b"\x01",
        "full-alpha": bytes(rng.randrange(256) for _ in range(5000)),
    }
    for name, data in pack_cases.items():
        try:
            spec = alias_forward(data)
        except SpecSkip:
            spec = None
        assert spec == impl_fwd(18, data), f"PACK {name}"


def test_text_codec_matches_spec():
    """The TEXT codec, both variants: static + dynamic dictionary replay,
    case-flip lookups, escape/index emission, CRLF folding, the strict vs
    relaxed text gates, and the variant-specific hash sizing
    (specmodel/text.py)."""
    from specmodel.text import text_forward, SpecSkip
    from kanzi_tpu import native
    rng = random.Random(21)
    survey = open("/root/repo/SURVEY.md", "rb").read()
    words = ["the", "while", "Compression", "standard", "of", "data",
             "Entropy", "block", "transform", "codec", "Because", "escape",
             "banana"]
    gen = " ".join(rng.choice(words) for _ in range(8000))
    cases = {
        "survey": survey[:60000],
        "big-survey": survey * 3,
        "gen-words": gen.encode(),
        "crlf": ("line one\r\nline two\r\n" * 2000).encode(),
        "xml": ("<a>&amp;value</a> <b>&lt;x&gt;</b> " * 1500).encode(),
        "esc-tokens": b"some text \x0f with \x0e escapes " * 800,
        "not-text": bytes(rng.randrange(256) for _ in range(9000)),
        "caps": " ".join(w.capitalize() for w in
                         (rng.choice(words) for _ in range(6000))).encode(),
        "many-words": " ".join("w%dx%s" % (i % 9000, "abc"[i % 3])
                               for i in range(30000)).encode(),
    }
    matrix = [(1, "TPAQ"), (1, "TPAQX"), (2, "HUFFMAN")]
    for variant, entropy in matrix:
        for name, data in cases.items():
            try:
                spec = text_forward(data, variant, block_size=4 << 20,
                                    entropy=entropy)
            except SpecSkip:
                spec = None
            ctx = {"textcodec": variant, "entropy": entropy,
                   "blockSize": 4 << 20}
            try:
                out, _ = native.transform_forward(
                    10, np.frombuffer(data, np.uint8), ctx,
                    3 * len(data) + 65536)
                got = bytes(out)
            except native.NativeSkip:
                got = None
            assert spec == got, f"TEXT{variant}/{entropy} {name}"


def test_fsd_matches_spec():
    """FSD stride detection, zigzag/escape delta vs xor coding, and the
    entropy gates (specmodel/fsd_bwt.py; zigzag + LOG2_4096 closed forms
    are verified against the reference tables in the module)."""
    from specmodel.fsd_bwt import fsd_forward, SpecSkip
    from kanzi_tpu import native
    rng = random.Random(14)

    def wave(stride, n):
        v = [128] * stride
        out = bytearray()
        for i in range(n):
            v[i % stride] = (v[i % stride] + rng.randrange(-3, 4)) & 0xFF
            out.append(v[i % stride])
        return bytes(out)

    cases = {
        "stride1": wave(1, 20000),
        "stride4": wave(4, 20000),
        "stride16": wave(16, 20000),
        "random": bytes(rng.randrange(256) for _ in range(8000)),
        "bigjumps": bytes((i * 37) & 0xFF for i in range(9000)),
    }
    for name, data in cases.items():
        try:
            spec = fsd_forward(data)
        except SpecSkip:
            spec = None
        try:
            out, _ = native.transform_forward(
                15, np.frombuffer(data, np.uint8), {}, 3 * len(data) + 65536)
            got = bytes(out)
        except native.NativeSkip:
            got = None
        assert spec == got, name


def test_bwt_bwts_match_definitional_oracles():
    """The BWT payload + per-chunk primary indexes against a sorted-suffix
    oracle, and BWTS against the Lyndon-rotation omega-order definition —
    independent of the SA-IS implementation entirely."""
    from specmodel.fsd_bwt import (bwt_forward_bruteforce,
                                   bwts_forward_bruteforce)
    from kanzi_tpu import native
    rng = random.Random(14)
    for n in (2, 17, 255, 256, 1000, 4096):
        data = bytes(rng.choice(b"abracadabra") for _ in range(n))
        payload, _ = native.transform_forward(
            1, np.frombuffer(data, np.uint8), {"blockSize": n}, 2 * n + 64)
        payload = bytes(payload)
        mode = payload[0]
        pis = (mode & 3) + 1
        chunks = 1 << ((mode >> 2) & 7)
        hdr = 1 + chunks * pis
        got_idx = [int.from_bytes(payload[1 + i * pis:1 + (i + 1) * pis],
                                  "big") + 1 for i in range(chunks)]
        spec_bwt, spec_idx = bwt_forward_bruteforce(data)
        assert payload[hdr:] == spec_bwt and got_idx == spec_idx, n
    for n in (2, 13, 100, 1000, 3000):
        data = bytes(rng.choice(b"mississippi") for _ in range(n))
        out, _ = native.transform_forward(
            2, np.frombuffer(data, np.uint8), {}, 2 * n + 64)
        assert bytes(out) == bwts_forward_bruteforce(data), n


def _exe_x86_corpus(rng, count=8192, jumps=120, bad_sgn=0, escapes=0):
    """Synthetic 'executable': zero runs + 0xFF sprinkles + E8/E9 rel32
    sites, shaped to pass the opcode-density heuristic (DT_BIN, histo
    gates) in v2/transform/EXECodec.go:781-808."""
    buf = bytearray(rng.randrange(256) for _ in range(count))
    buf[:256] = bytes(range(256))                   # all values present
    for _ in range(count // 8):                     # histo[0] >= count/10
        p = rng.randrange(256, count - 8)
        buf[p] = 0
    for _ in range(count // 50):                    # histo[255] >= count/100
        buf[rng.randrange(256, count - 8)] = 0xFF
    for _ in range(jumps):
        p = rng.randrange(300, count - 16)
        buf[p] = rng.choice((0xE8, 0xE9))
        buf[p + 1:p + 4] = bytes(rng.randrange(256) for _ in range(3))
        buf[p + 4] = rng.choice((0x00, 0xFF))
    for _ in range(bad_sgn):
        p = rng.randrange(300, count - 16)
        buf[p] = 0xE8
        buf[p + 4] = 0x55                           # escape-forcing sign
    for _ in range(escapes):
        buf[rng.randrange(300, count - 8)] = 0x9B
    return bytes(buf)


def test_exe_codec_matches_spec():
    """EXE forward (type 9) against the spec model: heuristic detection,
    X86 and ARM64 rewriting, escapes, and the skip gates."""
    from specmodel.exe import exe_forward, SpecSkip
    from kanzi_tpu import native
    rng = random.Random(14)

    cases = {
        "x86": _exe_x86_corpus(rng),
        "x86_escapes": _exe_x86_corpus(rng, bad_sgn=30, escapes=40),
        "x86_fewjumps": _exe_x86_corpus(rng, jumps=10),
        "x86_jcc": None,        # built below
        "not_bin": bytes(rng.randrange(1, 200) for _ in range(8192)),
        "tiny": b"\xe8" * 2048,
    }
    jcc = bytearray(_exe_x86_corpus(rng, jumps=60))
    for _ in range(80):         # 0x0F 0x8x rel32 conditional jumps
        p = rng.randrange(300, len(jcc) - 16)
        jcc[p] = 0x0F
        jcc[p + 1] = 0x80 | rng.randrange(16)
        jcc[p + 5] = rng.choice((0x00, 0xFF))
    cases["x86_jcc"] = bytes(jcc)

    arm = bytearray(_exe_x86_corpus(rng, count=8192, jumps=0))
    for k in range(0, 4096, 4):  # low half: dense B/BL words
        off = rng.randrange(1, 1 << 12)
        instr = (0x14000000 if k & 4 else 0x94000000) | off
        arm[k:k + 4] = instr.to_bytes(4, "little")
    cases["arm64"] = bytes(arm)

    for name, data in cases.items():
        try:
            spec = exe_forward(data, dst_len=4 * len(data))
        except SpecSkip:
            spec = None
        try:
            out, _ = native.transform_forward(
                9, np.frombuffer(data, np.uint8), {}, 4 * len(data))
            got = bytes(out)
        except native.NativeSkip:
            got = None
        assert spec == got, (name, None if spec is None else len(spec),
                             None if got is None else len(got))


def test_exe_codec_elf_header_and_roundtrip():
    """A synthetic little-endian ELF64 drives the header-parse path
    (codeStart/codeEnd from section table); plus inverse identity."""
    from specmodel.exe import exe_forward, SpecSkip
    from kanzi_tpu import native
    rng = random.Random(15)
    body = bytearray(_exe_x86_corpus(rng, count=8192))
    # ELF64-LE header: e_ident, machine=0x3E, shoff=64, shentsize=64, shnum=2
    hdr = bytearray(64)
    hdr[0:4] = b"\x7fELF"
    hdr[4] = 2                     # 64-bit
    hdr[5] = 1                     # little-endian
    hdr[18:20] = (0x3E).to_bytes(2, "little")
    hdr[0x28:0x30] = (64).to_bytes(8, "little")     # section table offset
    hdr[0x3A:0x3C] = (64).to_bytes(2, "little")     # entry size
    hdr[0x3C:0x3E] = (2).to_bytes(2, "little")      # entries
    sects = bytearray(128)
    sects[4:8] = (1).to_bytes(4, "little")           # SHT_PROGBITS
    code_off = 64 + 128
    sects[0x18:0x20] = code_off.to_bytes(8, "little")
    sects[0x20:0x28] = (4096).to_bytes(8, "little")  # section length
    data = bytes(hdr + sects + body)

    try:
        spec = exe_forward(data, dst_len=4 * len(data))
    except SpecSkip:
        spec = None
    try:
        out, _ = native.transform_forward(
            9, np.frombuffer(data, np.uint8), {}, 4 * len(data))
        got = bytes(out)
    except native.NativeSkip:
        got = None
    assert spec is not None, "ELF case must not skip"
    assert spec == got
    # codeStart in the frame header must reflect the parsed section offset
    assert int.from_bytes(spec[1:5], "little") == code_off
    back = native.transform_inverse(9, np.frombuffer(got, np.uint8),
                                    {}, len(data))
    assert bytes(back) == data


def test_rolz_rolzx_match_spec():
    """ROLZ (type 11) and ROLZX (type 12) against independent spec models:
    match search, token/section layout, embedded ANS and range coders, the
    dataType mode flags, and the skip gates."""
    from specmodel.rolz import rolz1_forward, rolz2_forward, SpecSkip
    from kanzi_tpu import native
    rng = random.Random(14)

    text = open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:40000]
    dna = bytearray()
    while len(dna) < 12000:
        dna += rng.choice([b"ACGTACGGTTCA", b"GGCATTACGTAA",
                           b"TTACGGACGTCA"]) * rng.randrange(1, 5)
    cases = {
        "text": (text, None),
        "dna": (bytes(dna), None),            # minMatch7 / getKey2 path
        "exe_ctx": (text, 3),                 # delta=3 via ctx dataType
        "random": (bytes(rng.randrange(256) for _ in range(9000)), None),
        "tiny": (b"x" * 50, None),
    }
    for name, (data, dtype) in cases.items():
        cap = len(data) + len(data) // 4 + 64
        for label, fn, tt in (("rolz", rolz1_forward, 11),
                              ("rolzx", rolz2_forward, 12)):
            try:
                spec = fn(data, dst_len=max(cap, len(data), 1024), dt=dtype)
            except SpecSkip:
                spec = None
            ctx = {} if dtype is None else {"dataType": dtype}
            try:
                out, _ = native.transform_forward(
                    tt, np.frombuffer(data, np.uint8), ctx, cap)
                got = bytes(out)
            except native.NativeSkip:
                got = None
            assert spec == got, (name, label)
            if got is not None and name != "exe_ctx":
                back = native.transform_inverse(
                    tt, np.frombuffer(got, np.uint8), {}, len(data))
                assert bytes(back) == data, (name, label, "inverse")


@pytest.mark.slow
def test_rolz_order1_literals_match_spec():
    """Blocks >= 128 KiB switch the ROLZ literal stream to order-1 ANS
    (ROLZCodec.go:322-326)."""
    from specmodel.rolz import rolz1_forward, SpecSkip
    from kanzi_tpu import native
    data = bytearray()
    for fname in ("SURVEY.md", "README.md", "BASELINE.md"):
        data += open(os.path.join(_REPO, fname), "rb").read()
    data = bytes(data * (1 + (1 << 17) // len(data) + 1))[:200000]
    assert len(data) >= 1 << 17
    cap = len(data) + len(data) // 4
    spec = rolz1_forward(data, dst_len=max(cap, len(data)))
    assert (spec[4] & 1) == 1, "order-1 literal flag expected"
    out, _ = native.transform_forward(
        11, np.frombuffer(data, np.uint8), {}, cap)
    assert bytes(out) == spec
    back = native.transform_inverse(11, np.frombuffer(bytes(out), np.uint8),
                                    {}, len(data))
    assert bytes(back) == data


def test_tpaq_hash_cap_unreachable():
    """The 1 GiB TPAQ hash cap (TPAQPredictor.go:322-324) applies only when
    bsVersion > 5.  With the v2.5.1 constants it can never bind: hashSize
    starts at min(16M, mxsz) <= 16M entries and the TPAQX shift doubles it
    twice to at most 64M < 1G.  Sweep every reachable sizing input and pin
    that fact — it is what makes v5 and v6 TPAQ payloads byte-identical
    (docs/PARITY.md), so the version gate in tpaq.cpp cannot change output.
    """
    HASH_SIZE = 16 * 1024 * 1024
    CAP = 1024 * 1024 * 1024
    worst = 0
    sizes = [0, 1, 1 << 10, (1 << 26) - 1, 1 << 26, 1 << 28, 1 << 30,
             (1 << 31) - 1, 1 << 31, (1 << 32) - 1]
    for absz in sizes:
        for extra in (0, 1):
            mxsz = (1 << 30) if absz >= (1 << 26) else absz * 16
            hash_size = min(HASH_SIZE, mxsz) << (2 * extra)
            worst = max(worst, hash_size)
            assert hash_size < CAP
    assert worst == 64 * 1024 * 1024


# ---------------------------------------------------------------------------
# Round-5 hand-derived vectors (VERDICT r4, next #7): worked out on paper
# from the Go sources, independently of tests/specmodel/.
# ---------------------------------------------------------------------------

def test_rolz_chunk_hand_decoded():
    """A complete ROLZ (type 11) chunk decoded BY HAND, byte for byte.

    Input: 300 x 'A'. Every output byte below is derived from
    v2/transform/ROLZCodec.go (forward :306-555, findMatch :246-297,
    emitLengthROLZ :924-944) and v2/entropy/ANSRangeCodec.go (Write :273-
    283: blocks <= 32 bytes are written RAW, no ANS header), with no code
    executed — the derivation:

    - dst[0:4]  = 0x0000012C: source count 300, big-endian (dst[0..3]).
    - dst[4]    = 0x44: flags = logPosChecks(4)<<4 | DNA(0x04). All-'A'
      input classifies as DT_DNA (DetectSimpleType), so minMatch =
      _ROLZ_MIN_MATCH7 = 7 and delta = 8 (ROLZCodec.go:350-355).
    - per-chunk bitstream, 4 x 32-bit section lengths (ROLZCodec.go:521-524):
      litIdx=16, tkIdx=2, lenIdx=2, mIdx=1. Why:
        * srcEnd = 300-4 = 296 (ROLZCodec.go:306; last 4 bytes bypass the
          chunk and are appended raw at the end).
        * the first min(n,8)=8 bytes are copied to the literal buffer
          (ROLZCodec.go:389-394), srcIdx=8.
        * srcIdx=8: key from buf[0:8], match table empty -> no match;
          position 8 registered; srcIdx=9.
        * srcIdx=9: candidate at 8 matches. findMatch: maxMatch =
          min(3+65535, 296-9) - 8 = 279; the 8-wise u64 compare loop
          runs while n < 279 and advances by 8, so it exits at n=280
          with all bytes equal -> bestLen=280, matchLen = 280 -
          minMatch = 273, matchIdx = counter(1) - bestIdx(1) = 0.
          The next-position probe (srcIdx=10) yields the same biased
          length (maxMatch one smaller, same n=280 exit is not reached:
          278 -> 280), not strictly greater, so the first match stands.
        * token1 = litLen(1)<<3 | 7 = 0x0F (matchLen>=7 escapes to the
          length buffer: emitLengthROLZ(273-7=266) = [0x80|(266>>7),
          266&0x7F] = [0x82, 0x0A]).
        * srcIdx = 9 + 273 + 7 = 289; final literals = 296-289 = 7,
          token2 = 7<<3 = 0x38.
        * literals total = 8 + 1 + 7 = 16.
    - the four sections follow, each <= 32 bytes so the embedded ANS
      encoder writes them RAW (ANSRangeCodec.go Write: len <= 32 ->
      WriteArray): 16 x 0x41, then tokens 0F 38, lengths 82 0A, match
      index 00.
    - the 4-byte source tail 'AAAA' is appended verbatim.
    """
    from kanzi_tpu import native

    data = b"A" * 300
    expected = (
        b"\x00\x00\x01\x2c"            # count 300 BE
        b"\x44"                        # flags: lpc 4<<4 | DNA 4
        b"\x00\x00\x00\x10"            # litIdx 16
        b"\x00\x00\x00\x02"            # tkIdx 2
        b"\x00\x00\x00\x02"            # lenIdx 2
        b"\x00\x00\x00\x01"            # mIdx 1
        + b"A" * 16                    # literal section (raw, <=32)
        + b"\x0f\x38"                  # tokens: lit1+match, final lit 7
        + b"\x82\x0a"                  # emitLength(266) -> matchLen 273
        + b"\x00"                      # matchIdx 0
        + b"AAAA")                     # raw source tail (srcEnd = n-4)
    out, _ = native.transform_forward(
        11, np.frombuffer(data, np.uint8), {}, 1024)
    assert bytes(out) == expected
    back = native.transform_inverse(
        11, np.frombuffer(expected, np.uint8), {}, len(data))
    assert bytes(back) == data


def test_tpaq_first_bits_hand_derived():
    """TPAQ/TPAQX first coded-bit probabilities derived BY HAND from
    v2/entropy/TPAQPredictor.go + internal/Global.go, asserted against the
    spec-model predictor probe (which the engine is pinned byte-equal to).

    Derivation (every constant read off the Go tables on paper):

    Bit 1: pr initialised to 2048 (TPAQPredictor.go:333) -> p=2048.

    Bit 2, previous bit b:
    - mixer.update(b): learnRate starts 60<<7=7680; err =
      ((b<<12)-2048)*7680 >> 10 = +/-15360; weights unchanged (mixer
      inputs still 0), skew = err, learnRate -> 7679.
    - state transitions: cp0/cp1 point at smallStatesMap[0] (state 0);
      cp2..cp5 ALL alias bigStatesMap[0], so the four writes chain
      through _TPAQ_STATE_TRANSITIONS[b]: b=0: 0->1->3->4->5;
      b=1: 0->2->169->199->200. None of this affects bit 2's reads:
    - c0 = 2+b; all six new context slots are untouched (state 0), so
      p0..p5 = _TPAQ_STATE_MAP[0] = -31; the match model contributes 0.
    - mixer.get: dot = 6*32768*(-31) + skew + 65536, shifted >>17
      (arithmetic):
        b=0: (-6094848 - 15360 + 65536)>>17 = -6044672>>17 = -47
        b=1: (-6094848 + 15360 + 65536)>>17 = -6013952>>17 = -46
    - Squash (Global.go:134-144, table :110-116 built from _INV_EXP):
        Squash(-47): w=(-47)&127=81, y=(-47>>7)+16=15 ->
          (24127*47 + 32768*81)>>11 = 3788177>>11 = 1849
        Squash(-46): w=82 -> (24127*46 + 32768*82)>>11 = 3796818>>11
          = 1853
    - TPAQ (extra=false): the SSE gate `binCount < pos>>3` is 0<0 ->
      false, so no SSE for the whole first byte; final
      pr = p + (1 if p<2048): b=0 -> 1850, b=1 -> 1854.
    - TPAQX (extra=true): a 7th input p6=-31 joins the mix
      (cp6 also aliases bigStatesMap[0]):
        b=1: (7*32768*(-31) + 15360 + 65536)>>17 = -7029760>>17 = -54
        Squash(-54) = (24127*54 + 32768*74)>>11 = 3727690>>11 = 1820
      then BOTH SSE stages run at pos=0 (binCount >= pos>>2 holds):
        sse0 = APM(LOGISTIC,256,6).Get(1, 1820, c0=3): the update step
        touches slots 0/1 only; STRETCH[1820] = -54 (Squash(-54)=1820,
        Squash(-55)=1815); index = ((-54+2048)>>7)+33*3 = 114;
        interpolation (data[115]*74 + data[114]*54)>>11 with the init
        table data[114]=Squash(-128)<<4=24112, data[115]=Squash(0)<<4
        =32768 -> 1819; p = (3*1819+1820)>>2 = 1819.
        sse1 = APM(LOGISTIC,65536,7).Get(1, 1819, 3): STRETCH[1819] =
        -54 -> same cell -> 1819; p = (3*1819+1819)>>2 = 1819.
      final pr = 1819 + 1 = 1820.
    """
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from specmodel.tpaq import SpecTPAQPredictor

    def probe(extra, first_byte, nbits):
        pred = SpecTPAQPredictor(block_size=65536, size=4096, extra=extra)
        ps = []
        for i in range(nbits):
            ps.append(pred.get())
            pred.update((first_byte >> (7 - i)) & 1)
        return ps

    assert probe(False, 0x00, 2) == [2048, 1850]
    assert probe(False, 0xFF, 2) == [2048, 1854]
    assert probe(True, 0xFF, 2) == [2048, 1820]


def test_cm_first_bits_hand_derived():
    """CM predictor first probabilities derived BY HAND from
    v2/entropy/CMPredictor.go (bsVersion>=4 semantics), asserted against the
    spec-model probe (which the engine is pinned byte-equal to by
    test_cm_bytes_match_spec). Derivation, constants read off the Go source:

    Initial state (NewCMPredictor): ctx=1, runMask=0, c1=c2=0,
    counter1[*][*]=PSCALE>>1=32768, counter2[*][j]=j<<12 (j<16), [16]=65535.

    Bit 1: p = (13*(32768+32768) + 6*32768)>>5 = 1048576>>5 = 32768;
    idx=8, x1=8<<12=32768, x2=9<<12=36864;
    pred = (2*32768 + 3*(32768+36864) + 64)>>7 = 274496>>7 = **2144**.
    Note pred != 2048: the SSE pair (x1,x2) straddles p asymmetrically.

    Bits 2..8: each update moves ctx to a fresh power of two (1->2->4->...),
    and both counter tables are indexed by ctx, so every first-byte bit sees
    untouched counters: pred = **2144** eight times, for any byte value.

    Byte 2 bit 1, first byte 0x00: the eight bit-0 updates set
    counter1[2^k][256] = 32768-(32768>>2) = 24576 and counter1[2^k][0] =
    32768-(32768>>4) = 30720; after the 8th, ctx=256>255 so c2=old c1=0,
    c1=byte(256)=0, runMask=0x100 (c1==c2). Then pc1=counter1[1],
    pc2=counter2[1|0x100=257] (fresh):
    p = (13*(24576+30720) + 6*30720)>>5 = 903168>>5 = 28224; idx=6,
    x1=6<<12=24576, x2=28672;
    pred = (2*28224 + 3*(24576+28672) + 64)>>7 = 216256>>7 = **1689**.

    Byte 2 bit 1, first byte 0xFF: bit-1 updates use arithmetic shifts of
    (x - PSCALE + 16): counter1[1][256] = 32768-((-32752)>>2) = 32768+8188
    = 40956; counter1[1][0] = 32768+2047 = 34815; counter2[1][8] =
    32768+512 = 33280; counter2[1][9] = 36864+448 = 37312. After the 8th
    one-bit, ctx=511>255: c2=0, c1=byte(511)=255, runMask=0 (255!=0).
    p = (13*(40956+32768) + 6*34815)>>5 = 1167302>>5 = 36478; idx=8,
    x1=33280, x2=37312 (the updated counter2[1] slots);
    pred = (2*36478 + 3*(33280+37312) + 64)>>7 = 284796>>7 = **2224**.
    """
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from specmodel.binary_cm import SpecCMPredictor

    def probe(data, nbits):
        pred = SpecCMPredictor()
        bits = [(b >> (7 - k)) & 1 for b in data for k in range(8)]
        ps = []
        for i in range(nbits):
            ps.append(pred.get())
            pred.update(bits[i])
        return ps

    assert probe(b"\x00\x00", 9) == [2144] * 8 + [1689]
    assert probe(b"\xff\xff", 9) == [2144] * 8 + [2224]
    assert probe(b"\x5a\x5a", 8) == [2144] * 8  # any byte: fresh contexts


def test_fpaq_single_byte_hand_derived():
    """Complete FPAQ payloads for one-byte blocks derived BY HAND from
    v2/entropy/FPAQCodec.go:100-170 — engine bytes asserted against the
    derivation directly (independent of specmodel/fpaq.py).

    Setup: probs[*][*] = PSCALE>>1 = 32768; low=0, high=2^56-1. For byte v
    the 8 bits index p[1], p[(256+v)>>7], ..., p[(256+v)>>1] — all DISTINCT
    slots for any v, so every first-byte bit sees p=32768. encodeBit:
    split = ((high-low)>>8 * 32768)>>8; bit==0: low += split+1;
    bit==1: high = low+split. (low^high) never drops below 2^24 within 8
    bits, so the chunk body is empty: payload = varint(0) byte + the
    Dispose flush WriteBits(low|MASK_0_24, 56).

    v=0xFF: all bits take the high branch, low stays 0 for all 8 steps;
    flush = 0x0000000000FFFFFF -> payload 00 00 00 00 00 00 FF FF FF with
    the varint first = hex 0000000000ffffff prefixed by 00.

    v=0x00: iterating low += split+1 (worked by hand, full table):
      bit0: split=0x7fffffffffff80, low->0x7fffffffffff81
      bit1: split=0x40000000000000, low->0xbfffffffffff82
      bit2: split=0x20000000000000, low->0xdfffffffffff83
      bit3: split=0x10000000000000, low->0xefffffffffff84
      bit4: split=0x08000000000000, low->0xf7ffffffffff85
      bit5: split=0x04000000000000, low->0xfbffffffffff86
      bit6: split=0x02000000000000, low->0xfdffffffffff87
      bit7: split=0x01000000000000, low->0xfeffffffffff88
    flush = low|0xFFFFFF = 0xfeffffffffffff -> payload 00 fe ff ff ff ff
    ff ff.
    """
    for data, want in ((b"\x00", "00feffffffffffff"),
                       (b"\xff", "0000000000ffffff")):
        got_bytes, got_bits = ke.encode(ke.FPAQ_TYPE, data, {})
        assert (got_bits, bytes(got_bytes).hex()) == (64, want)


def test_tpaq_crafted_4k_payload_pinned():
    """TPAQ and TPAQX payload bytes over a crafted 4 KiB input: the engine
    must equal the independent spec model bit-for-bit, and the result is
    frozen by sha256 so any future drift (in either) is loud. The input
    mixes the regimes that exercise every predictor path: text (SSE gate
    opens once pos grows), a high-entropy segment (binary-mode contexts),
    runs (match model), and an exact repeat (long matchLen)."""
    import hashlib
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from specmodel.binary_cm import binary_encode
    from specmodel.tpaq import SpecTPAQPredictor

    rng = np.random.default_rng(0x7A90)
    seg = (b"the paq lineage mixes contexts. " * 40)[:1024]
    data = (seg + rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
            + bytes(np.repeat(rng.integers(0, 8, 64, dtype=np.uint8), 16))
            + seg)[:4096]
    pins = {
        False: "bda3441ef2c8c83af229c9b38d0293707b2ed598231034645aebb46c12234292",
        True: "62d9f384ddf9a144e806606dc178f5207055ab769e1835aad3eab254c5a23b84",
    }
    ctx = {"blockSize": 65536, "size": len(data)}
    for extra in (False, True):
        name = "TPAQX" if extra else "TPAQ"
        pred = SpecTPAQPredictor(block_size=65536, size=len(data),
                                 extra=extra)
        spec_bytes, spec_bits = binary_encode(data, pred)
        got_bytes, got_bits = ke.encode(ke.get_type(name), data, dict(ctx))
        assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), name
        digest = hashlib.sha256(bytes(got_bytes)).hexdigest()
        assert digest == pins[extra], f"{name}: {digest}"
