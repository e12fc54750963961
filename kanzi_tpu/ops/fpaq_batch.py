"""Batched-scalar device FPAQ encoder — SURVEY §7.0's hard thesis, measured.

The binary arithmetic coders (FPAQ/CM/TPAQ) are bit-serial within a block:
every bit's interval split depends on the adapted probability state left by
the previous bit. The only device-shaped parallelism is ACROSS blocks: run B
independent streams in lockstep, one lax.scan step per byte (8 unrolled bit
sub-steps), carrying each stream's 56-bit coder window and its 4x256
probability tables.

All arithmetic is exact uint64 emulated on 16-bit limbs in uint32 lanes
(low/high are full u64 with wraparound; split = ((high-low)>>8)*p >> 8 is a
48x16-bit product). Flush emissions (4 bytes when the top 32 bits agree)
are recorded as scan outputs and compacted after the scan. Byte-identical
to the host C++ encoder (tested); bench.py records the measured throughput
on the real chip — win or lose, the thesis gets a number.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PSCALE = 1 << 16
MASK_0_32 = 0x00000000FFFFFFFF


def _to_limbs(x: int) -> tuple[int, int, int, int]:
    return tuple((x >> (16 * k)) & 0xFFFF for k in range(4))


def _add64(a, b):
    """a + b mod 2^64 on 4x16-bit limb tuples of uint32 arrays."""
    out = []
    carry = 0
    for k in range(4):
        s = a[k] + b[k] + carry
        out.append(s & 0xFFFF)
        carry = s >> 16
    return tuple(out)


def _sub64(a, b):
    """a - b mod 2^64 (a >= b in coder use, but wraps correctly anyway)."""
    out = []
    borrow = 0
    for k in range(4):
        d = a[k] - b[k] - borrow
        out.append(d & 0xFFFF)
        borrow = (d >> 16) & 1
    return tuple(out)


def _shr8(a):
    return tuple(((a[k] >> 8) | ((a[k + 1] & 0xFF) << 8)) if k < 3
                 else (a[3] >> 8) for k in range(4))


def _mul64_16(a, p):
    """(a * p) mod 2^64, a as limbs, p < 2^16 (uint32 array)."""
    out = []
    carry = 0
    for k in range(4):
        s = a[k] * p + carry
        out.append(s & 0xFFFF)
        carry = s >> 16
    return tuple(out)


def _xor_lt_2_24(a, b):
    """(a ^ b) < 2^24 on limb tuples."""
    return ((a[1] ^ b[1]) >> 8 == 0) & (a[2] == b[2]) & (a[3] == b[3])


def _shl32(a):
    return (jnp.zeros_like(a[0]), jnp.zeros_like(a[0]), a[0], a[1])


@functools.partial(jax.jit, static_argnames=())
def encode_blocks(data: jax.Array, nbytes: jax.Array
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encodes B independent FPAQ streams in lockstep.

    data:   (B, T) uint8  block bytes (padded with 0)
    nbytes: (B,)   int32  valid bytes per block

    Returns (words (B, T) uint32 flush words in emission order (big-endian
    serialization gives the byte stream), nwords (B,) int32, low (B, 4)
    uint32 final low limbs for the host's closing 56-bit flush).
    """
    B, T = data.shape
    u32 = jnp.uint32

    def step(carry, inp):
        low, high, probs, tbl = carry
        val, valid = inp                      # (B,) int32, (B,) bool
        bits = val + 256

        def substep(k, st):
            low, high, probs, flags, words = st
            idx = jnp.where(k == 0, jnp.ones_like(bits), bits >> (8 - k))
            flat = (tbl * 256 + idx)[:, None]
            p = jnp.take_along_axis(probs, flat, axis=1)[:, 0].astype(u32)
            bit = (val >> (7 - k)) & 1
            diff = _sub64(high, low)
            split = _shr8(_mul64_16(_shr8(diff), p))
            bit0 = (bit == 0)
            one = (jnp.ones(B, u32),) + (jnp.zeros(B, u32),) * 3
            low_if0 = _add64(low, _add64(split, one))
            high_if1 = _add64(low, split)
            low = tuple(jnp.where(bit0 & valid, l0, l)
                        for l0, l in zip(low_if0, low))
            high = tuple(jnp.where((~bit0) & valid, h1, h)
                         for h1, h in zip(high_if1, high))
            p_new = jnp.where(bit0, p - (p >> 6),
                              p - (((p - PSCALE + 64).astype(jnp.int32) >> 6)
                                   .astype(u32)))
            store = jnp.where(valid, p_new, p).astype(jnp.int32)
            probs = probs.at[jnp.arange(B), flat[:, 0]].set(store)
            do_flush = _xor_lt_2_24(low, high) & valid
            # word = uint32(high >> 24)
            word = ((high[1] >> 8) | (high[2] << 8) | ((high[3] & 0xFF) << 24))
            flags = flags.at[:, k].set(do_flush)
            words = words.at[:, k].set(word.astype(u32))
            low_fl = _shl32(low)
            high_fl = _shl32(high)
            high_fl = (jnp.full(B, 0xFFFF, u32), jnp.full(B, 0xFFFF, u32),
                       high_fl[2], high_fl[3])
            low = tuple(jnp.where(do_flush, f, l) for f, l in zip(low_fl, low))
            high = tuple(jnp.where(do_flush, f, h)
                         for f, h in zip(high_fl, high))
            return low, high, probs, flags, words

        flags0 = jnp.zeros((B, 8), bool)
        words0 = jnp.zeros((B, 8), u32)
        low, high, probs, flags, words = jax.lax.fori_loop(
            0, 8, substep, (low, high, probs, flags0, words0))
        tbl = jnp.where(valid, val >> 6, tbl)
        return (low, high, probs, tbl), (flags, words)

    low0 = tuple(jnp.zeros(B, u32) for _ in range(4))
    top = _to_limbs(0x00FFFFFFFFFFFFFF)
    high0 = tuple(jnp.full(B, t, u32) for t in top)
    probs0 = jnp.full((B, 1024), PSCALE >> 1, jnp.int32)
    tbl0 = jnp.zeros(B, jnp.int32)

    valid = (jnp.arange(T, dtype=jnp.int32)[:, None]
             < nbytes[None, :])               # (T, B)
    xs = (jnp.swapaxes(data, 0, 1).astype(jnp.int32), valid)
    (low, high, probs, tbl), (flags, words) = jax.lax.scan(
        step, (low0, high0, probs0, tbl0), xs)

    flags = jnp.swapaxes(flags, 0, 1).reshape(B, T * 8)
    words = jnp.swapaxes(words, 0, 1).reshape(B, T * 8)
    f32 = flags.astype(jnp.int32)
    incl = jnp.cumsum(f32, axis=1)
    total = incl[:, -1]
    dest = jnp.where(flags, incl - 1, T * 8)

    def scatter_row(dest_row, word_row):
        out = jnp.zeros(T * 8 + 1, u32)
        return out.at[dest_row].set(word_row, mode="drop")

    out = jax.vmap(scatter_row)(dest, words)[:, :T]
    low_limbs = jnp.stack(low, axis=1)        # (B, 4) u32 16-bit limbs
    return out, total, low_limbs


def fpaq_encode_device_batch(blocks: list[bytes]) -> list[tuple[bytes, int]]:
    """Host wrapper: encode a batch of blocks (each <= 4 MiB, single FPAQ
    chunk), returning per-block (payload, bits) — byte-identical to the
    host encoder. Prototype: used by tests and the bench measurement."""
    from ..bitstream import BitWriter

    B = len(blocks)
    T = max(len(b) for b in blocks)
    data = np.zeros((B, T), dtype=np.uint8)
    nb = np.zeros(B, dtype=np.int32)
    for i, b in enumerate(blocks):
        data[i, :len(b)] = np.frombuffer(b, np.uint8)
        nb[i] = len(b)
    words, nwords, low = jax.device_get(encode_blocks(data, nb))
    outs = []
    for i in range(B):
        n = int(nwords[i])
        body = np.ascontiguousarray(words[i, :n].astype(">u4")).tobytes()
        lo = sum(int(low[i, k]) << (16 * k) for k in range(4))
        bw = BitWriter()
        v = len(body)
        while v >= 128:
            bw.write_bits(0x80 | (v & 0x7F), 8)
            v >>= 7
        bw.write_bits(v, 8)
        bw.write_array(body, 8 * len(body))
        bw.write_bits((lo | 0xFFFFFF) & ((1 << 56) - 1), 56)
        outs.append((bw.getvalue(), bw.written))
    return outs
