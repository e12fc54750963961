"""Spec models for writing *version 5* KANZ streams — decode-test oracles.

There is no Go toolchain in this environment and no archived v5 fixtures, so
v5 decoding is tested against streams written by these models, which are
derived from the reference's v5 DECODE semantics:

  - v5 file header     v2/io/CompressedStream.go:1355-1459 (1-bit checksum
                       flag, no padding, 16-bit CRC with seed = bsVersion)
  - v5 Huffman chunks  v2/entropy/HuffmanCodec.go:978-1055 (single stream:
                       2 zero bits + varint bit size + one code stream;
                       no sub-32-byte raw chunks, v2:718-760)
  - v5 BWT headers     v2/transform/BWTBlockCodec.go:193-221 (per-chunk
                       mode byte embedding the primary index width and top
                       bits; index stored WITHOUT the v6 -1 bias)
"""

from __future__ import annotations

from .bits import SpecOBS
from .container import write_frame, write_end_marker, block_payload_prefix
from .entropy_utils import write_varint
from . import huffman as shuf


def write_header_v5(obs: SpecOBS, entropy_type: int, transform_type: int,
                    block_size: int, input_size: int = 0,
                    checksum: bool = False) -> None:
    obs.write_bits(0x4B414E5A, 32)
    obs.write_bits(5, 4)
    obs.write_bit(1 if checksum else 0)
    obs.write_bits(entropy_type, 5)
    obs.write_bits(transform_type, 48)
    obs.write_bits(block_size >> 4, 28)
    if input_size == 0 or input_size >= (1 << 48):
        szm = 0
    elif input_size >= (1 << 32):
        szm = 3
    elif input_size >= (1 << 16):
        szm = 2
    else:
        szm = 1
    obs.write_bits(szm, 2)
    if szm:
        obs.write_bits(input_size, 16 * szm)
    M = 1 << 32
    HASH = 0x1E35A7BD
    c = (HASH * 5) % M
    c ^= (HASH * ((~entropy_type) % M)) % M
    c ^= (HASH * (((~transform_type) % (1 << 64)) >> 32)) % M
    c ^= (HASH * ((~transform_type) % M)) % M
    c ^= (HASH * ((~block_size) % M)) % M
    if szm:
        c ^= (HASH * (((~input_size) % (1 << 64)) >> 32)) % M
        c ^= (HASH * ((~input_size) % M)) % M
    c = ((c >> 23) ^ (c >> 3)) & 0xFFFF
    obs.write_bits(c, 16)


def huffman_encode_v5(block: bytes) -> tuple[bytes, int]:
    """v5 Huffman payload: same table headers as v6, single-stream chunks."""
    obs = SpecOBS()
    start = 0
    end = len(block)
    while start < end:
        size = min(shuf.MAX_CHUNK_SIZE, end - start)
        chunk = block[start:start + size]
        freqs = [0] * 256
        for b in chunk:
            freqs[b] += 1
        codes = [0] * 256
        count = shuf.update_frequencies(obs, freqs, codes)
        if count > 1:
            acc = 0
            nbits = 0
            for b in chunk:
                code = codes[b]
                ln = code >> 12
                acc = (acc << ln) | (code & 0x0FFF)
                nbits += ln
            obs.write_bits(0, 2)           # stream count marker: 1 stream
            write_varint(obs, nbits)
            buf = (acc << ((-nbits) % 8)).to_bytes((nbits + 7) // 8, "big") \
                if nbits else b""
            obs.write_array(buf, nbits)
        start += size
    return obs.close(), obs.written()


def compress_v5_huffman(data: bytes, block_size: int) -> bytes:
    """A complete v5 stream: transform NONE, entropy HUFFMAN."""
    obs = SpecOBS()
    write_header_v5(obs, entropy_type=1, transform_type=0,
                    block_size=block_size, input_size=len(data))
    for off in range(0, len(data), block_size):
        block = data[off:off + block_size]
        bobs = SpecOBS()
        copy = len(block) <= 15
        block_payload_prefix(bobs, skip_flags=0x7F, n_transforms=1,
                             post_len=len(block), copy_block=copy)
        if copy:
            bobs.write_array(block, 8 * len(block))
        else:
            payload, bits = huffman_encode_v5(block)
            bobs.write_array(payload, bits)
        write_frame(obs, bobs.close(), bobs.written())
    write_end_marker(obs)
    return obs.close()


def bwt_header_to_v5(v6_payload: bytes) -> bytes:
    """Rewrites a v6 BWTBlockCodec forward output into the v5 per-chunk
    header layout (4-byte indexes, mode byte carrying the top 6 bits).
    v6 stores index-1; v5 stores the index directly."""
    mode = v6_payload[0]
    log_nb_chunks = (mode >> 2) & 0x07
    p_index_size = (mode & 0x03) + 1
    chunks = 1 << log_nb_chunks
    hdr = 1
    out = bytearray()
    for i in range(chunks):
        stored = int.from_bytes(v6_payload[hdr:hdr + p_index_size], "big")
        idx = stored + 1            # v5 stores the unbiased value
        out.append(0xC0 | ((idx >> 24) & 0x3F))   # 4-byte width marker
        out += ((idx & 0xFFFFFF)).to_bytes(3, "big")
        hdr += p_index_size
    out += v6_payload[hdr:]
    return bytes(out)
