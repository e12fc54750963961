"""Device-engine rANS encoder (ANS0/ANS1).

Heterogeneous pipeline mirroring the Huffman device engine: the host (C++)
normalizes per-chunk frequencies and emits table headers (kz_ans_prepare);
the TPU runs the 4-state reverse-order encode scan for all chunks in one
batched kernel (kanzi_tpu.ops.ans.encode_chunks); the host splices headers,
varint sizes, final states, renorm pair streams and raw tails into the final
payload (kz_ans_assemble). Output is byte-identical to the host C++ encoder
(asserted in tests).
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..ops import ans as ops_ans
from .huffman_device import _DeviceResult


def _build_batch(post: np.ndarray, order: int, flags: np.ndarray):
    """Symbol matrices for all device chunks, padded to a common G."""
    chunk = native.ANS1_CHUNK if order == 1 else native.ANS0_CHUNK
    mats = []
    for c in range(len(flags)):
        if flags[c] != 0:
            mats.append(None)
            continue
        piece = post[c * chunk:(c + 1) * chunk]
        mats.append(ops_ans.build_syms_order1(piece) if order == 1
                    else ops_ans.build_syms_order0(piece))
    rows = [m for m in mats if m is not None]
    if not rows:
        return None, None, []
    gmax = max((len(m) for m in rows), default=0)
    if gmax == 0:
        return None, None, [i for i, m in enumerate(mats) if m is not None]
    dev_chunks = [i for i, m in enumerate(mats) if m is not None]
    syms = np.zeros((len(dev_chunks), gmax, 4), dtype=np.int32)
    ngroups = np.zeros(len(dev_chunks), dtype=np.int32)
    for row, c in enumerate(dev_chunks):
        m = mats[c]
        syms[row, :len(m)] = m
        ngroups[row] = len(m)
    return syms, ngroups, dev_chunks


class DeviceANSEngine:
    """dispatch()/collect() pair with async device overlap (same contract as
    DeviceHuffmanEngine): dispatch launches the batched encode scan without
    blocking; collect materializes pairs/states and splices in C++."""

    def __init__(self, order: int):
        import jax
        self.order = order
        self._encode = jax.jit(ops_ans.encode_chunks)

    def dispatch(self, post: np.ndarray):
        return self.dispatch_many([post])[0]

    def dispatch_many(self, posts):
        """Encode every block's chunks in ONE device call (per-dispatch
        transfer + round-trip amortizes across the Writer batch)."""
        preps = []
        all_syms, all_ngroups, all_tables = [], [], []
        row_base = 0
        for post in posts:
            n = len(post)
            if n <= 32:   # raw small-block path stays on host
                preps.append((post, None, None, None, None, 0, 0))
                continue
            try:
                tables, hdr, hdr_bits, flags = native.ans_prepare(
                    post, self.order)
            except RuntimeError:
                # e.g. an order-1 chunk the reference cannot encode either
                # (2-3 byte tail) — let the host encoder raise its typed
                # error, or encode when it can
                preps.append((post, "host", None, None, None, 0, 0))
                continue
            syms, ngroups, dev_chunks = _build_batch(post, self.order, flags)
            nrows = 0 if syms is None else len(syms)
            preps.append((post, hdr, hdr_bits, flags, dev_chunks, row_base,
                          nrows))
            if nrows:
                all_syms.append(syms)
                all_ngroups.append(ngroups)
                all_tables.append(tables[dev_chunks])
                row_base += nrows
        if row_base:
            gmax = max(s.shape[1] for s in all_syms)
            # round both dims up to small multiples: bounded zero-padding
            # (a few %) while collapsing most batch shapes onto shared
            # compiled programs (power-of-two padding would transfer up to
            # 2x zeros through the tunnel for big order-1 chunks)
            rb = -(-row_base // 4) * 4
            gb = -(-gmax // 256) * 256
            syms = np.zeros((rb, gb, 4), dtype=np.int32)
            r = 0
            for s in all_syms:
                syms[r:r + len(s), :s.shape[1]] = s
                r += len(s)
            ngroups = np.zeros(rb, dtype=np.int32)
            ngroups[:row_base] = np.concatenate(all_ngroups)
            tables = np.concatenate(all_tables)
            if rb != row_base:
                tables = np.concatenate(
                    [tables, np.zeros((rb - row_base,) + tables.shape[1:],
                                      tables.dtype)])
            out = self._encode(syms, ngroups, tables)
            holder = _DeviceResult(out)
        else:
            holder = None
        handles = []
        for post, hdr, hdr_bits, flags, dev_chunks, lo, nrows in preps:
            handles.append((post, hdr, hdr_bits, flags, dev_chunks,
                            holder if nrows else None, lo, nrows))
        return handles

    def collect(self, handle, dst: np.ndarray, dst_off: int) -> int:
        post, hdr, hdr_bits, flags, dev_chunks, holder, lo, nrows = handle
        if isinstance(hdr, str) and hdr == "host":
            payload, bits = native.entropy_encode(
                5 if self.order == 0 else 8, post, {"bsVersion": 6})
            nb = (bits + 7) >> 3
            dst[dst_off:dst_off + nb] = np.frombuffer(payload, np.uint8)
            return bits
        if hdr is None:   # raw small block
            nb = len(post)
            dst[dst_off:dst_off + nb] = post
            return 8 * nb
        nchunks = len(flags)
        pair_counts = np.zeros(nchunks, dtype=np.int32)
        states = np.full((nchunks, 4), ops_ans.ANS_TOP, dtype=np.int32)
        if holder is not None and nrows:
            pairs_a, npairs_a, states_a = holder.get()
            pairs_h = np.ascontiguousarray(pairs_a[lo:lo + nrows])
            npairs_h = npairs_a[lo:lo + nrows]
            states_h = states_a[lo:lo + nrows]
            maxp = int(npairs_h.max()) if npairs_h.size else 0
            pair_bytes = np.ascontiguousarray(
                pairs_h[:, :maxp].astype(">u2")).view(np.uint8)
            rows = {c: r for r, c in enumerate(dev_chunks)}
        else:
            pair_bytes = np.zeros((nchunks, 2), dtype=np.uint8)
            rows = {}
        full_pairs = np.zeros((nchunks, pair_bytes.shape[1]), dtype=np.uint8)
        for c in range(nchunks):
            r = rows.get(c)
            if r is not None:
                full_pairs[c] = pair_bytes[r]
                pair_counts[c] = npairs_h[r]
                states[c] = states_h[r].astype(np.int32)
        return native.ans_assemble(post, self.order, hdr, hdr_bits, flags,
                                   full_pairs, pair_counts, states,
                                   dst, dst_off)


# Legacy module-level override (used when no per-call hook is supplied).
# Library callers should pass `decode_fn` (threaded from the Reader ctx's
# "deviceDecodeHooks") instead: module state would make two concurrent mesh
# Readers in one process clobber each other.
decode_chunks_override = None


def ans_decode_device(payload, out_len: int, order: int,
                      decode_fn=None) -> bytes:
    """Decode an ANS payload with the device pipeline: host parses headers
    into freq->symbol maps and (cumFreq,freq) tables (kz_ans_dec_prepare);
    the TPU runs the 4-state forward decode for all chunks in one batched
    scan (ops.ans.decode_chunks); the host reassembles positions and tails.
    Byte-identical to the host decoder (tested)."""
    if out_len == 0:
        return b""
    src = np.frombuffer(payload, dtype=np.uint8) \
        if not isinstance(payload, np.ndarray) else payload
    if out_len <= 32:   # raw small block
        return src[:out_len].tobytes()
    dtabs, f2s, states, bufs, flags, aux = \
        native.ans_dec_prepare(src, out_len, order)
    chunk = native.ANS1_CHUNK if order == 1 else native.ANS0_CHUNK
    lr = 11 if order == 1 else 12
    dev = np.nonzero(flags == 0)[0]
    out = np.empty(out_len, dtype=np.uint8)
    if len(dev):
        sizes = np.minimum(chunk, out_len - dev * chunk)
        end4 = sizes & ~3
        ngroups = (end4 // 4).astype(np.int32)
        glen = int(ngroups.max())
        decode = decode_fn or decode_chunks_override or ops_ans.decode_chunks
        syms, nread = decode(bufs[dev], states[dev], f2s[dev], dtabs[dev],
                             ngroups, order, lr, glen)
        syms = np.asarray(syms)
        nread = np.asarray(nread)
        for r, c in enumerate(dev):
            start = int(c) * chunk
            size = int(sizes[r])
            e4 = size & ~3
            g = e4 // 4
            if order == 0:
                # group g -> block[4g..4g+3] = states 3,2,1,0
                out[start:start + e4] = \
                    syms[r, :g, ::-1].reshape(-1)
            else:
                q = e4 >> 2
                for j in range(4):
                    out[start + j * q:start + (j + 1) * q] = syms[r, :q, j]
            tail = size - e4
            if tail:
                nf = int(nread[r])
                out[start + e4:start + size] = bufs[dev[r], nf:nf + tail]
    for c in range(len(flags)):
        if flags[c] == 2:
            start = c * chunk
            size = min(chunk, out_len - start)
            out[start:start + size] = aux[c]
    return out.tobytes()


def ans_encode_device(buf, order: int) -> tuple[bytes, int]:
    """Encode one block with the device pipeline. Returns (payload, bits)."""
    src = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    eng = DeviceANSEngine(order)
    handle = eng.dispatch(src)
    dst = np.zeros(2 * len(src) + (1 << 18), dtype=np.uint8)
    bits = eng.collect(handle, dst, 0)
    return dst[:(bits + 7) // 8].tobytes(), bits
