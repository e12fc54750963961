"""Device-engine Huffman encoder.

Heterogeneous pipeline: the host (C++) builds per-chunk code tables and the
encoded table headers (kz_huffman_prepare); the TPU packs the 4 interleaved
lane bit-streams for all chunks in one batched kernel
(kanzi_tpu.ops.huffman.pack_lanes); the host splices headers, per-lane varint
sizes, lane payloads and trailing bytes into the final payload.

Output is byte-identical to the host C++ encoder (asserted in tests), so
either engine can feed the KANZ container.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..bitstream import BitWriter

_CHUNK = 16384
_FRAG = 4096


def _write_varint(bw: BitWriter, value: int) -> None:
    while value >= 128:
        bw.write_bits(0x80 | (value & 0x7F), 8)
        value >>= 7
    bw.write_bits(value, 8)


def huffman_encode_device(buf, jit_fn=None) -> tuple[bytes, int]:
    """Encode a block with the device pipeline. Returns (payload, bits)."""
    from ..ops import huffman as ops_huffman

    src = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    n = len(src)
    if n == 0:
        return b"", 0
    tables, hdr, hdr_bits, flags = native.huffman_prepare(src)
    nchunks = len(flags)

    # build lane batch for chunks that carry data (flag == 0)
    lane_syms = []
    lane_len = []
    lane_tidx = []
    lane_of_chunk = {}
    for c in range(nchunks):
        if flags[c] != 0:
            continue
        start = c * _CHUNK
        size = min(_CHUNK, n - start)
        frag = size // 4
        lane_of_chunk[c] = len(lane_syms)
        for j in range(4):
            s = src[start + j * frag: start + (j + 1) * frag].astype(np.int32)
            if frag < _FRAG:
                s = np.pad(s, (0, _FRAG - frag))
            lane_syms.append(s)
            lane_len.append(frag)
            lane_tidx.append(c)

    if lane_syms:
        syms = np.stack(lane_syms)
        lens = np.asarray(lane_len, dtype=np.int32)
        tidx = np.asarray(lane_tidx, dtype=np.int32)
        tabs = tables.astype(np.int32)
        fn = jit_fn or ops_huffman.pack_lanes
        words, nbits = fn(syms, lens, tidx, tabs)
        words = np.asarray(words)
        nbits = np.asarray(nbits)
        lane_bytes = words.astype(">u4").reshape(len(lens), -1).view(np.uint8)
    else:
        nbits = np.zeros(0, dtype=np.int32)
        lane_bytes = np.zeros((0, 4), dtype=np.uint8)

    # splice payload
    bw = BitWriter()
    for c in range(nchunks):
        start = c * _CHUNK
        size = min(_CHUNK, n - start)
        if flags[c] == 1:  # small chunk: raw
            bw.write_array(src[start:start + size], 8 * size)
            continue
        bw.write_array(hdr[c], int(hdr_bits[c]))
        if flags[c] == 2:  # single symbol: header only
            continue
        li = lane_of_chunk[c]
        for j in range(4):
            _write_varint(bw, int(nbits[li + j]))
        frag = size // 4
        for j in range(4):
            nb = int(nbits[li + j])
            bw.write_array(lane_bytes[li + j][: (nb + 7) // 8], nb)
        for i in range(start + 4 * frag, start + size):
            bw.write_bits(int(src[i]), 8)

    payload = bw.getvalue()
    return payload, bw.written
