"""Spec model of the v6 rANS encoder, order 0 and order 1.

Reference: v2/entropy/ANSRangeCodec.go —
  - constructor defaults      :58-114   (order 0: chunk 16 KiB, logRange 12;
                                         order 1: chunk<<8 = 4 MiB, logRange
                                         max(12-1, 8) = 11)
  - Write/chunking            :270-305  (<=32-byte blocks raw, per-chunk
                                         statistics rebuild)
  - rebuildStatistics         :407-426  (order-0/1 histogram with totals)
  - updateFrequencies         :171-205  (3-bit logRange-8 + per-context
                                         normalize + header)
  - encodeHeader              :208-268  (alphabet + log-max-packed freqs-1 in
                                         chunks of 8/6, first freq skipped)
  - encSymbol.reset           :446-468  (reciprocal division constants)
  - encodeSymbol/encodeChunk  :307-405  (4 interleaved states, reverse byte
                                         order, 2-byte renorm, varint chunk
                                         size + 4x32-bit final states)
"""

from __future__ import annotations

from .bits import SpecOBS
from .entropy_utils import (encode_alphabet, normalize_frequencies,
                            write_varint, compute_histogram)

ANS_TOP = 1 << 15
DEFAULT_CHUNK = 16384
DEFAULT_LOG_RANGE = 12


class _EncSymbol:
    __slots__ = ("x_max", "bias", "cmpl_freq", "inv_shift", "inv_freq")

    def reset(self, cum_freq: int, freq: int, log_range: int) -> None:
        freq = min(freq, (1 << log_range) - 1)
        self.x_max = ((ANS_TOP >> log_range) << 16) * freq
        self.cmpl_freq = (1 << log_range) - freq
        if freq < 2:
            self.inv_freq = 0xFFFFFFFF
            self.inv_shift = 32
            self.bias = cum_freq + (1 << log_range) - 1
        else:
            shift = 0
            while freq > (1 << shift):
                shift += 1
            self.inv_freq = (((1 << (shift + 31)) + freq - 1) // freq) & 0xFFFFFFFF
            self.inv_shift = 32 + shift - 1
            self.bias = cum_freq


class SpecANSEncoder:
    def __init__(self, order: int = 0,
                 chunk_size: int = DEFAULT_CHUNK,
                 log_range: int = DEFAULT_LOG_RANGE) -> None:
        assert order in (0, 1)
        self.order = order
        if order == 1:
            chunk_size = min(chunk_size << 8, 1 << 27)
        self.chunk_size = chunk_size
        self.log_range = max(log_range - order, 8)
        dim = 255 * order + 1
        self.freqs = [0] * (dim * 257)
        self.symbols = [_EncSymbol() for _ in range(dim * 256)]
        self.obs = SpecOBS()

    # --- header ---

    def _encode_header(self, alphabet: list[int], freqs: list[int],
                       lr: int) -> None:
        encode_alphabet(self.obs, alphabet)
        n = len(alphabet)
        if n <= 1:
            return
        chk = 6 if n < 64 else 8
        llr = 3
        while (1 << llr) <= lr:
            llr += 1
        i = 1
        while i < n:
            endj = min(i + chk, n)
            mx = max(freqs[alphabet[j]] - 1 for j in range(i, endj))
            log_max = 0
            while (1 << log_max) <= mx:
                log_max += 1
            self.obs.write_bits(log_max, llr)
            if log_max:
                for j in range(i, endj):
                    self.obs.write_bits(freqs[alphabet[j]] - 1, log_max)
            i += chk

    def _update_frequencies(self, lr: int) -> int:
        res = 0
        endk = 255 * self.order + 1
        self.obs.write_bits(lr - 8, 3)
        for k in range(endk):
            f = self.freqs[257 * k:257 * (k + 1)]
            size, alphabet = normalize_frequencies(f, 256, f[256], 1 << lr)
            if size > 0:
                total = 0
                cnt = 0
                for i in range(256):
                    if f[i] == 0:
                        continue
                    self.symbols[(k << 8) | i].reset(total, f[i], lr)
                    total += f[i]
                    cnt += 1
                    if cnt >= size:
                        break
            self._encode_header(alphabet, f, lr)
            res += size
        return res

    def _rebuild_statistics(self, chunk: bytes, lr: int) -> int:
        for i in range(len(self.freqs)):
            self.freqs[i] = 0
        if self.order == 0:
            compute_histogram(chunk, self.freqs, True, True)
        else:
            quarter = len(chunk) >> 2
            if quarter == 0:
                compute_histogram(chunk, self.freqs, False, True)
            else:
                for q in range(4):
                    compute_histogram(chunk[q * quarter:(q + 1) * quarter],
                                      self.freqs, False, True)
        return self._update_frequencies(lr)

    # --- chunk body ---

    def _encode_symbol(self, buf: bytearray, n: int, st: int,
                       sym: _EncSymbol) -> tuple[int, int]:
        x = 1 if st >= sym.x_max else 0
        buf[n] = st & 0xFF
        n -= x
        buf[n] = (st >> 8) & 0xFF
        n -= x
        st >>= (-x & 16) & 0x3F
        q = (st * sym.inv_freq) >> sym.inv_shift
        return n, st + sym.bias + q * sym.cmpl_freq

    def _encode_chunk(self, block: bytes, buf_len: int) -> None:
        buf = bytearray(buf_len)
        st = [ANS_TOP] * 4
        n = buf_len - 1
        end4 = len(block) & -4
        for i in range(len(block) - 1, end4 - 1, -1):
            buf[n] = block[i]
            n -= 1
        if self.order == 0:
            i = end4 - 1
            while i > 0:
                n, st[0] = self._encode_symbol(buf, n, st[0], self.symbols[block[i]])
                n, st[1] = self._encode_symbol(buf, n, st[1], self.symbols[block[i - 1]])
                n, st[2] = self._encode_symbol(buf, n, st[2], self.symbols[block[i - 2]])
                n, st[3] = self._encode_symbol(buf, n, st[3], self.symbols[block[i - 3]])
                i -= 4
        elif len(block) > 1:
            quarter = end4 >> 2
            idx = [1 * quarter - 2, 2 * quarter - 2, 3 * quarter - 2, end4 - 2]
            prv = [block[idx[j] + 1] for j in range(4)]
            while idx[0] >= 0:
                for j in range(4):
                    cur = block[idx[j]]
                    n, st[j] = self._encode_symbol(
                        buf, n, st[j], self.symbols[(cur << 8) | prv[j]])
                    prv[j] = cur
                    idx[j] -= 1
            for j in range(4):
                n, st[j] = self._encode_symbol(buf, n, st[j], self.symbols[prv[j]])
        n += 1
        write_varint(self.obs, buf_len - n)
        for j in range(4):
            self.obs.write_bits(st[j], 32)
        if buf_len != n:
            self.obs.write_array(bytes(buf[n:]), 8 * (buf_len - n))

    def write(self, block: bytes) -> None:
        if len(block) <= 32:
            self.obs.write_array(block, 8 * len(block))
            return
        size = min(2 * len(block), self.chunk_size + (self.chunk_size >> 3))
        size = max(size, 65536)
        start = 0
        end = len(block)
        while start < end:
            end_chunk = min(start + self.chunk_size, end)
            alpha = self._rebuild_statistics(block[start:end_chunk],
                                             self.log_range)
            if self.order == 1 or alpha > 1:
                self._encode_chunk(block[start:end_chunk], size)
            start = end_chunk

    def finish(self) -> tuple[bytes, int]:
        return self.obs.close(), self.obs.written()


def ans_encode(block: bytes, order: int) -> tuple[bytes, int]:
    enc = SpecANSEncoder(order=order)
    enc.write(block)
    return enc.finish()
