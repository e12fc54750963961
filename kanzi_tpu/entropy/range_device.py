"""Device-engine range codec (Subbotin, order 0).

Same heterogeneous split as the Huffman/ANS engines: the host (C++) builds
per-chunk normalized tables + encoded headers (kz_range_prepare), the TPU
runs the 60-bit coder scan for all chunks in one batched kernel
(kanzi_tpu.ops.range), and the host splices headers, 28-bit renorm words
and the final 60-bit low per chunk (kz_range_assemble) — byte-identical to
the host encoder (tested).

Decode differs from Huffman/ANS: the range format has no per-chunk stream
length (a chunk's header begins where the previous chunk's last renorm
read ended — RangeCodec.go interleaves reads with decoding), so chunks of
one payload MUST be walked sequentially: parse header on host, device-scan
the chunk, advance the bit cursor by 60 + 28*nreads.  Chunks from
different blocks batch freely — the Reader's per-block decode calls are
the batching axis in a mesh deployment.
"""

from __future__ import annotations

import numpy as np

from .. import native

_CHUNK = 1 << 15


class DeviceRangeEngine:
    """dispatch()/collect() pair with async device overlap (same contract
    as DeviceHuffmanEngine / DeviceANSEngine)."""

    def __init__(self):
        import jax
        from ..ops import range as ops_range
        self._encode = jax.jit(ops_range.encode_chunks)
        self._jax = jax

    def dispatch(self, post: np.ndarray):
        return self.dispatch_many([post])[0]

    def dispatch_many(self, posts):
        """Encode every block's chunks in ONE device call."""
        preps = []
        all_syms, all_nvalid, all_tables, all_shifts = [], [], [], []
        row_base = 0
        for post in posts:
            tables, hdr, hdr_bits, flags, shifts = native.range_prepare(post)
            C = len(flags)
            dev_rows = np.nonzero(flags == 0)[0]
            preps.append((post, hdr, hdr_bits, flags, row_base, len(dev_rows),
                          dev_rows))
            if len(dev_rows):
                n = len(post)
                syms = np.zeros((len(dev_rows), _CHUNK), np.int32)
                nvalid = np.zeros(len(dev_rows), np.int32)
                for r, c in enumerate(dev_rows):
                    chunk = post[c * _CHUNK:(c + 1) * _CHUNK]
                    syms[r, :len(chunk)] = chunk
                    nvalid[r] = len(chunk)
                all_syms.append(syms)
                all_nvalid.append(nvalid)
                all_tables.append(tables[dev_rows])
                all_shifts.append(shifts[dev_rows])
                row_base += len(dev_rows)
        if row_base:
            syms = np.concatenate(all_syms)
            nvalid = np.concatenate(all_nvalid)
            tables = np.concatenate(all_tables)
            shifts = np.concatenate(all_shifts).astype(np.uint32)
            out = self._encode(syms, nvalid, tables, shifts)
            holder = _DeviceResult(out)
        else:
            holder = None
        return [(post, hdr, hdr_bits, flags, holder, lo, nr, rows)
                for post, hdr, hdr_bits, flags, lo, nr, rows in preps]

    def collect(self, handle, dst: np.ndarray, dst_off: int) -> int:
        post, hdr, hdr_bits, flags, holder, lo, nr, rows = handle
        C = len(flags)
        words = np.zeros((C, 1), np.uint32)
        nwords = np.zeros(C, np.int32)
        lows = np.zeros((C, 2), np.uint32)
        if holder is not None and nr:
            w, nw, lw = holder.get()
            w = np.asarray(w[lo:lo + nr], dtype=np.uint32)
            nw = np.asarray(nw[lo:lo + nr], dtype=np.int32)
            lw = np.ascontiguousarray(lw[lo:lo + nr].astype(np.uint32))
            # the assembler reads only w[c][:nwords[c]], so header-only rows
            # can stay uninitialized — np.empty avoids zeroing ~C*256 KiB of
            # fresh pages per block (first-touch costs ~6 ms/MB here)
            words = np.empty((C, w.shape[1]), np.uint32)
            for r, c in enumerate(rows):
                words[c, :nw[r]] = w[r, :nw[r]]
                nwords[c] = nw[r]
                lows[c] = lw[r]
        return native.range_assemble(post, hdr, hdr_bits, flags,
                                     words, nwords,
                                     np.ascontiguousarray(lows),
                                     dst, dst_off)


class _DeviceResult:
    __slots__ = ("_out", "_np")

    def __init__(self, out):
        self._out = out
        self._np = None

    def get(self):
        if self._np is None:
            self._np = tuple(np.asarray(o) for o in self._out)
            self._out = None
        return self._np


def range_encode_device(buf) -> tuple[bytes, int]:
    """One-shot device encode of a block. Returns (payload, bits)."""
    src = np.frombuffer(buf, dtype=np.uint8) \
        if not isinstance(buf, np.ndarray) else buf
    n = len(src)
    if n == 0:
        return b"", 0
    eng = DeviceRangeEngine()
    handle = eng.dispatch(src)
    dst = np.zeros(2 * n + 8192, np.uint8)
    bits = eng.collect(handle, dst, 0)
    return dst[:(bits + 7) // 8].tobytes(), bits


def range_decode_device(payload, out_len: int) -> bytes:
    """Decode a range entropy payload with the device pipeline: sequential
    host header walk (the format forces it — see module docstring), one
    batched device scan per chunk.  Byte-identical to the host decoder;
    invalid headers raise (the caller falls back to the host decoder,
    which owns the error contract)."""
    from ..ops import range as ops_range

    if out_len == 0:
        return b""
    src = np.frombuffer(payload, dtype=np.uint8) \
        if not isinstance(payload, np.ndarray) else payload
    out = np.empty(out_len, dtype=np.uint8)
    bit_pos = 0
    buf_cap = 2 * _CHUNK + 8192
    start = 0
    while start < out_len:
        size = min(_CHUNK, out_len - start)
        bit_pos, dtab, f2s, shift, flag, aux, buf = \
            native.range_dec_chunk(src, bit_pos, buf_cap)
        if flag == 2:
            out[start:start + size] = aux
        else:
            syms, nreads = ops_range.decode_chunks(
                buf[None], dtab[None], f2s[None],
                np.array([shift], np.uint32),
                np.array([size], np.int32), glen=size)
            out[start:start + size] = np.asarray(syms)[0, :size]
            bit_pos += 60 + 28 * int(np.asarray(nreads)[0])
        start += size
    return out.tobytes()
