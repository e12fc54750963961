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


class DeviceHuffmanEngine:
    """Production device-engine entropy stage with async overlap.

    dispatch() builds the lane batch on host (C++ table/header prep, numpy
    lane reshape) and launches the TPU pack kernel without blocking; the
    device packs lanes while the host transforms the next block. collect()
    materializes the packed lanes and splices the payload in C++
    (kz_huffman_assemble), byte-identical to the host encoder.
    """

    def __init__(self):
        import jax
        from ..ops import huffman as ops_huffman
        self._pack = jax.jit(ops_huffman.pack_lanes)
        self._jax = jax

    def _build_lanes(self, post: np.ndarray, flags: np.ndarray):
        """(syms, lens, tidx) lane arrays for one block, or (None,)*3."""
        n = len(post)
        nchunks = len(flags)
        nfull = n // _CHUNK
        rows, tidx, lens = [], [], []
        # vectorized lane build: full chunks reshape directly to (4, FRAG)
        if nfull:
            full = post[: nfull * _CHUNK].reshape(nfull, 4, _FRAG)
            keep = flags[:nfull] == 0
            if keep.any():
                kept_chunks = np.nonzero(keep)[0]
                rows.append(full[kept_chunks].reshape(-1, _FRAG))
                tidx.append(np.repeat(kept_chunks, 4))
                lens.append(np.full(4 * len(kept_chunks), _FRAG, np.int32))
        if nchunks > nfull and flags[nfull] == 0:  # partial last chunk
            start = nfull * _CHUNK
            size = n - start
            frag = size // 4
            tail = np.zeros((4, _FRAG), dtype=np.uint8)
            for j in range(4):
                tail[j, :frag] = post[start + j * frag: start + (j + 1) * frag]
            rows.append(tail)
            tidx.append(np.full(4, nfull, np.int32))
            lens.append(np.full(4, frag, np.int32))
        if not rows:
            return None, None, None
        return (np.concatenate(rows),
                np.concatenate(lens).astype(np.int32),
                np.concatenate(tidx).astype(np.int32))

    def dispatch(self, post: np.ndarray):
        """Start packing one block's lanes. Returns an opaque handle."""
        return self.dispatch_many([post])[0]

    def dispatch_many(self, posts):
        """Pack every block's lanes in ONE device call — per-dispatch cost
        (transfer + round-trip) amortizes across the whole Writer batch.
        Returns one opaque handle per block, same contract as dispatch()."""
        preps = []
        all_syms, all_lens, all_tidx, all_tables = [], [], [], []
        lane_base = 0
        table_base = 0
        for post in posts:
            tables, hdr, hdr_bits, flags = native.huffman_prepare(post)
            syms, lens, tidx = self._build_lanes(post, flags)
            nl = 0 if syms is None else len(syms)
            preps.append((post, hdr, hdr_bits, flags, lane_base, nl))
            if nl:
                all_syms.append(syms)
                all_lens.append(lens)
                all_tidx.append(tidx + table_base)
                lane_base += nl
            all_tables.append(tables.astype(np.int32))
            table_base += len(tables)
        if lane_base:
            syms = np.concatenate(all_syms)
            lens = np.concatenate(all_lens)
            tidx = np.concatenate(all_tidx)
            # round the lane count up to a multiple of 64 so batch-size
            # jitter reuses compiled programs (bounded zero padding)
            L = len(syms)
            bucket = -(-L // 64) * 64
            if bucket != L:
                syms = np.concatenate(
                    [syms, np.zeros((bucket - L, syms.shape[1]), syms.dtype)])
                lens = np.concatenate(
                    [lens, np.zeros(bucket - L, lens.dtype)])
                tidx = np.concatenate(
                    [tidx, np.zeros(bucket - L, tidx.dtype)])
            tables = np.concatenate(all_tables)
            tpad = -(-len(tables) // 16) * 16 - len(tables)
            if tpad:
                tables = np.concatenate(
                    [tables, np.zeros((tpad, 256), tables.dtype)])
            out = self._pack(syms, lens, tidx, tables)
            holder = _DeviceResult(out)
        else:
            holder = None
        # posts must stay alive until collect(): copy is the caller's concern
        return [(post, hdr, hdr_bits, flags, holder, lo, nl)
                for post, hdr, hdr_bits, flags, lo, nl in preps]

    def collect(self, handle, dst: np.ndarray, dst_off: int) -> int:
        """Block on the device result and splice the payload into dst."""
        post, hdr, hdr_bits, flags, holder, lo, nl = handle
        if holder is not None and nl:
            words, nbits = holder.get()
            words = words[lo:lo + nl]
            nbits = np.ascontiguousarray(nbits[lo:lo + nl].astype(np.int32))
            lane_bytes = np.ascontiguousarray(
                words.astype(">u4")).reshape(words.shape[0], -1).view(np.uint8)
        else:
            nbits = np.zeros(0, dtype=np.int32)
            lane_bytes = np.zeros((0, 4), dtype=np.uint8)
        return native.huffman_assemble(post, hdr, hdr_bits, flags,
                                       lane_bytes, nbits, dst, dst_off)


class _DeviceResult:
    """Materialize a device result once, on first use."""

    __slots__ = ("_out", "_np")

    def __init__(self, out):
        self._out = out
        self._np = None

    def get(self):
        if self._np is None:
            self._np = tuple(np.asarray(o) for o in self._out)
            self._out = None
        return self._np


# Legacy module-level override (used when no per-call hook is supplied).
# Library callers should pass `decode_fn` (threaded from the Reader ctx's
# "deviceDecodeHooks") instead: module state would make two concurrent mesh
# Readers in one process clobber each other.
decode_lanes_override = None


def huffman_decode_device(payload, out_len: int, decode_fn=None) -> bytes:
    """Decode a Huffman entropy payload with the device pipeline: the host
    parses chunk headers and builds the 4096-entry decode tables
    (kz_huffman_dec_prepare); the TPU runs the table-driven symbol decode
    for all lanes in one batched kernel (ops.huffman.decode_lanes); the host
    reassembles fragments/tails. Byte-identical to the host decoder."""
    from ..ops import huffman as ops_huffman

    if out_len == 0:
        return b""
    src = np.frombuffer(payload, dtype=np.uint8) \
        if not isinstance(payload, np.ndarray) else payload
    dtables, lanes, flags, aux = native.huffman_dec_prepare(src, out_len)
    if len(lanes):
        dev_chunks = np.nonzero(flags == 0)[0].astype(np.int32)
        table_idx = np.repeat(dev_chunks, 4)
        decode = decode_fn or decode_lanes_override or ops_huffman.decode_lanes
        syms = np.asarray(decode(lanes, table_idx, dtables))
    else:
        syms = None
    out = np.empty(out_len, dtype=np.uint8)
    lane = 0
    for c in range(len(flags)):
        start = c * _CHUNK
        size = min(_CHUNK, out_len - start)
        if flags[c] == 1:          # raw small chunk
            out[start:start + size] = aux[c, :size]
        elif flags[c] == 2:        # single symbol
            out[start:start + size] = aux[c, 0]
        else:
            frag = size // 4
            out[start:start + 4 * frag] = \
                syms[lane:lane + 4, :frag].reshape(-1)
            tail = size & 3
            if tail:
                out[start + 4 * frag:start + size] = aux[c, :tail]
            lane += 4
    return out.tobytes()


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
