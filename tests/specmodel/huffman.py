"""Spec model of the v6 canonical Huffman encoder.

Reference: v2/entropy/HuffmanCodec.go —
  - Write/chunking            :395-443  (16 KiB chunks, <32-byte raw chunks,
                                         single-symbol chunks emit header only)
  - updateFrequencies         :128-211  (alphabet + code lengths + signed
                                         Exp-Golomb deltas, prevSize=2)
  - computeCodeLengths        :300-324  (ranks sorted by (freq<<8)|sym)
  - Moffat-Katajainen         :326-385  (in-place phase 1/2)
  - limitCodeLengths          :216-297  (bit-debt repayment, 6 level queues,
                                         normalize-to-2KiB fallback)
  - generateCanonicalCodes    :37-76    (sort by (len-1)<<8|sym, code<<=delta)
  - encodeChunk               :445-511  (4 lanes of chunk/4 symbols, varint
                                         per-lane bit sizes, remainder bytes
                                         raw after the lanes)
"""

from __future__ import annotations

from .bits import SpecOBS
from .entropy_utils import (encode_alphabet, normalize_frequencies,
                            write_varint, expgolomb_encode_byte)

MAX_SYMBOL_SIZE = 12
MAX_CHUNK_SIZE = 1 << 14


def _phase1(data: list[int]) -> None:
    n = len(data)
    s = r = 0
    for t in range(n - 1):
        total = 0
        for _ in range(2):
            if s >= n or (r < t and data[r] < data[s]):
                total += data[r]
                data[r] = t
                r += 1
            else:
                total += data[s]
                if s > t:
                    data[s] = 0
                s += 1
        data[t] = total


def _phase2(data: list[int]) -> int:
    if len(data) < 2:
        return 0
    level_top = len(data) - 2
    depth = 1
    i = len(data)
    total_nodes = 2
    while i > 0:
        k = level_top
        while k > 0 and data[k - 1] >= level_top:
            k -= 1
        internal = level_top - k
        leaves = total_nodes - internal
        for _ in range(leaves):
            i -= 1
            data[i] = depth
        total_nodes = internal << 1
        level_top = k
        depth += 1
    return depth - 1


def compute_code_lengths(sizes: list[int], ranks: list[int]) -> int:
    """ranks entries are (freq<<8)|symbol; sorted in place. sizes is 256-long."""
    ranks.sort()
    freqs = [r >> 8 for r in ranks]
    for i in range(len(ranks)):
        ranks[i] &= 0xFF
        assert freqs[i] != 0
    _phase1(freqs)
    max_len = _phase2(freqs)
    for i, r in enumerate(ranks):
        sizes[r] = freqs[i]
    return max_len


def limit_code_lengths(symbols: list[int], freqs: list[int],
                       sizes: list[int], ranks: list[int]) -> int:
    n = 0
    debt = 0
    count = len(ranks)
    while sizes[ranks[n]] >= MAX_SYMBOL_SIZE:
        debt += sizes[ranks[n]] - MAX_SYMBOL_SIZE
        sizes[ranks[n]] = MAX_SYMBOL_SIZE
        n += 1
    q: list[list[int]] = [[] for _ in range(6)]
    while n < count:
        idx = MAX_SYMBOL_SIZE - 1 - sizes[ranks[n]]
        if idx > 5 or debt < (1 << idx):
            break
        q[idx].append(ranks[n])
        n += 1
    idx = 5
    while debt > 0 and idx >= 0:
        if not q[idx] or debt < (1 << idx):
            idx -= 1
            continue
        r = q[idx].pop(0)
        sizes[r] += 1
        debt -= 1 << idx
    idx = 0
    while debt > 0 and idx < 6:
        if not q[idx]:
            idx += 1
            continue
        r = q[idx].pop(0)
        sizes[r] += 1
        debt -= 1 << idx
    if debt > 0:
        # Slow path: renormalize to scale 2048 and recompute
        f = [freqs[s] for s in symbols]
        total = sum(f)
        f += [0] * (256 - len(f))
        normalize_frequencies(f, count, total, MAX_CHUNK_SIZE >> 3)
        for i in range(count):
            freqs[symbols[i]] = f[i]
            ranks[i] = (f[i] << 8) | symbols[i]
        return compute_code_lengths(sizes, ranks)
    return MAX_SYMBOL_SIZE


def generate_canonical_codes(sizes: list[int], codes: list[int],
                             symbols: list[int]) -> None:
    """symbols is modified in place: re-ordered by (size, symbol)."""
    if len(symbols) > 1:
        for s in symbols:
            assert sizes[s] <= MAX_SYMBOL_SIZE
        symbols.sort(key=lambda s: ((sizes[s] - 1) << 8) | s)
    code = 0
    cur_len = sizes[symbols[0]]
    for s in symbols:
        code <<= sizes[s] - cur_len
        cur_len = sizes[s]
        codes[s] = code & 0xFFFF
        code += 1


def update_frequencies(obs: SpecOBS, freqs: list[int], codes: list[int]) -> int:
    count = 0
    sizes = [0] * 256
    alphabet = []
    for i in range(256):
        codes[i] = 0
        if freqs[i] > 0:
            alphabet.append(i)
            count += 1
    symbols = list(alphabet)
    encode_alphabet(obs, symbols)
    if count == 0:
        return 0
    if count == 1:
        codes[symbols[0]] = 1 << 12
        sizes[symbols[0]] = 1
    else:
        ranks = [(freqs[s] << 8) | s for s in symbols]
        max_len = compute_code_lengths(sizes, ranks)
        if max_len > MAX_SYMBOL_SIZE:
            max_len = limit_code_lengths(symbols, freqs, sizes, ranks)
        if max_len > MAX_SYMBOL_SIZE:
            for i, s in enumerate(alphabet):
                codes[s] = i
                sizes[s] = 8
        else:
            generate_canonical_codes(sizes, codes, ranks)
    prev_size = 2
    for s in symbols:
        cur = sizes[s]
        codes[s] |= cur << 12
        expgolomb_encode_byte(obs, (cur - prev_size) & 0xFF, signed=True)
        prev_size = cur
    return count


def encode_chunk(obs: SpecOBS, block: bytes, codes: list[int]) -> None:
    count = len(block)
    sz_frag = count // 4
    lanes = []
    for j in range(4):
        src = block[j * sz_frag:(j + 1) * sz_frag]
        acc = 0
        nbits = 0
        for b in src:
            code = codes[b]
            ln = code >> 12
            acc = (acc << ln) | (code & 0x0FFF)
            nbits += ln
        buf = (acc << ((-nbits) % 8)).to_bytes((nbits + 7) // 8, "big") \
            if nbits else b""
        lanes.append((buf, nbits))
    for _, nbits in lanes:
        write_varint(obs, nbits)
    for buf, nbits in lanes:
        obs.write_array(buf, nbits)
    for i in range(4 * sz_frag, count):
        obs.write_bits(block[i], 8)


def huffman_encode(block: bytes) -> tuple[bytes, int]:
    """Full v6 Huffman entropy-stage payload: returns (bytes, bit_length)."""
    obs = SpecOBS()
    start = 0
    end = len(block)
    while start < end:
        size = min(MAX_CHUNK_SIZE, end - start)
        chunk = block[start:start + size]
        if size < 32:
            obs.write_array(chunk, 8 * size)
        else:
            freqs = [0] * 256
            for b in chunk:
                freqs[b] += 1
            codes = [0] * 256
            count = update_frequencies(obs, freqs, codes)
            if count > 1:
                encode_chunk(obs, chunk, codes)
        start += size
    return obs.close(), obs.written()
