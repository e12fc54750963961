"""Spec model of the KANZ v6 container: file header and block frames.

Reference: v2/io/CompressedStream.go —
  - writeHeader      :429-519 (field layout + 24-bit folded checksum)
  - frame emit       :951-976 (5-bit lw-3 + lw-bit payload bit length)
  - payload layout   :718-728 comment, :871-887 (mode byte, skip flags,
                      post-transform length, optional checksum)
  - end marker       :592-594 (zero-length block = WriteBits(0, 5) with lw=3)
"""

from __future__ import annotations

from .bits import SpecOBS

BITSTREAM_TYPE = 0x4B414E5A  # "KANZ"
FORMAT_VERSION = 6


def _u32(x: int) -> int:
    return x & 0xFFFFFFFF


def header_checksum(ck_size: int, entropy_type: int, transform_type: int,
                    block_size: int, input_size: int, sz_mask: int) -> int:
    seed = _u32(0x01030507 * FORMAT_VERSION)
    HASH = 0x1E35A7BD
    cksum = _u32(HASH * seed)
    cksum ^= _u32(HASH * _u32(~ck_size))
    cksum ^= _u32(HASH * _u32(~entropy_type))
    cksum ^= _u32(HASH * _u32((~transform_type & 0xFFFFFFFFFFFFFFFF) >> 32))
    cksum ^= _u32(HASH * _u32(~transform_type))
    cksum ^= _u32(HASH * _u32(~block_size))
    if sz_mask > 0:
        cksum ^= _u32(HASH * _u32((~input_size & 0xFFFFFFFFFFFFFFFF) >> 32))
        cksum ^= _u32(HASH * _u32(~input_size))
    cksum = (cksum >> 23) ^ (cksum >> 3)
    return cksum & 0xFFFFFF


def size_mask(input_size: int) -> int:
    if input_size == 0 or input_size >= (1 << 48):
        return 0
    if input_size >= (1 << 32):
        return 3
    if input_size >= (1 << 16):
        return 2
    return 1


def write_header(obs: SpecOBS, entropy_type: int, transform_type: int,
                 block_size: int, input_size: int = 0,
                 ck_size: int = 0) -> None:
    """ck_size: 0 = none, 1 = 32-bit, 2 = 64-bit."""
    obs.write_bits(BITSTREAM_TYPE, 32)
    obs.write_bits(FORMAT_VERSION, 4)
    obs.write_bits(ck_size, 2)
    obs.write_bits(entropy_type, 5)
    obs.write_bits(transform_type, 48)
    obs.write_bits(block_size >> 4, 28)
    szm = size_mask(input_size)
    obs.write_bits(szm, 2)
    if szm > 0:
        obs.write_bits(input_size, 16 * szm)
    obs.write_bits(0, 15)
    obs.write_bits(header_checksum(ck_size, entropy_type, transform_type,
                                   block_size, input_size, szm), 24)


def log2_nocheck(x: int) -> int:
    assert x > 0
    return x.bit_length() - 1


def write_frame(obs: SpecOBS, payload: bytes, payload_bits: int) -> None:
    """Emit one block frame: 5 bits (lw-3) + lw bits of bit length + payload."""
    lw = 3
    if payload_bits >= 8:
        lw = log2_nocheck(payload_bits >> 3) + 4
    obs.write_bits(lw - 3, 5)
    obs.write_bits(payload_bits, lw)
    obs.write_array(payload, payload_bits)


def write_end_marker(obs: SpecOBS) -> None:
    obs.write_bits(0, 5)   # lw-3 = 0
    obs.write_bits(0, 3)   # zero bit length in lw=3 bits


def block_payload_prefix(obs: SpecOBS, skip_flags: int, n_transforms: int,
                         post_len: int, copy_block: bool = False,
                         checksum: int | None = None,
                         checksum_bits: int = 0) -> None:
    """The in-payload block header (written through the block's own OBS)."""
    data_size = 1
    if post_len >= 256:
        data_size = (log2_nocheck(post_len) >> 3) + 1
        assert data_size <= 4
    mode = ((data_size - 1) & 3) << 5
    if copy_block:
        mode |= 0x80
    if not copy_block and n_transforms > 4:
        mode |= 0x10
        obs.write_bits(mode, 8)
        obs.write_bits(skip_flags, 8)
    else:
        mode |= skip_flags >> 4
        obs.write_bits(mode, 8)
    obs.write_bits(post_len, 8 * data_size)
    if checksum is not None:
        obs.write_bits(checksum, checksum_bits)
