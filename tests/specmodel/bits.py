"""Spec model of the KANZ output bitstream semantics.

Reference: v2/bitstream/DefaultOutputBitStream.go — values are written
MSB-first; WriteBits(v, n) emits the n low bits of v, most significant of
those n first; arrays are bit-packed with no alignment; Close() zero-pads
the final partial byte (pad bits are the low bits of the last byte).

This model keeps the whole stream as a list of (value, nbits) and renders it
at the end — O(n) and obviously correct, which is all an oracle needs.
"""

from __future__ import annotations


class SpecOBS:
    def __init__(self) -> None:
        self._acc = 0          # all bits so far, MSB-first (big integer)
        self._nbits = 0

    def write_bit(self, bit: int) -> None:
        self.write_bits(bit & 1, 1)

    def write_bits(self, value: int, nbits: int) -> None:
        assert 0 <= nbits <= 64
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits

    def write_array(self, data: bytes, nbits: int) -> None:
        """Write nbits bits taken MSB-first from data."""
        assert nbits <= 8 * len(data)
        nbytes = nbits >> 3
        for b in data[:nbytes]:
            self.write_bits(b, 8)
        rem = nbits & 7
        if rem:
            self.write_bits(data[nbytes] >> (8 - rem), rem)

    def written(self) -> int:
        return self._nbits

    def close(self) -> bytes:
        pad = (-self._nbits) % 8
        return ((self._acc << pad)).to_bytes((self._nbits + pad) // 8, "big") \
            if self._nbits else b""
