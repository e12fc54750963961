"""Device kernels for the Subbotin range codec (order 0, 64-bit, 28-bit
renormalization).

Reference behavior: v2/entropy/RangeCodec.go (encodeByte :281-305,
decodeByte :500-530).  The coder state (low, range, code) is 60 bits wide
with all observable outputs taken from bits 0..59, so it is represented
here as two uint32 limbs (lo = bits 0..31, hi = bits 32..59 masked to 28
bits); carries past bit 59 are unobservable in the reference's u64
arithmetic too, so limb arithmetic mod 2^60 is exact.

Batch axes:
- encode_chunks: chunks are the batch dimension (the host knows the input
  chunk boundaries up front), one lax.scan step per input byte with the
  renormalization loop unrolled to its provable 2-emission bound.
- decode_chunks: also batched over rows, but the FORMAT serializes chunks
  within one payload (no per-chunk length prefix — a chunk's header begins
  where the previous chunk's last renorm read ended), so rows of one block
  must be fed sequentially; rows from different blocks batch freely.  The
  k-th renorm read of a chunk sits at bit offset 60 + 28k of its coder
  stream, so reads are position-computable gathers.

Unlike the 4-state rANS kernel there is a single coder state per chunk —
the scan is as long as the chunk (32 KiB steps).  That makes per-dispatch
throughput scan-latency-bound on a real chip (see docs/ARCHITECTURE.md);
the kernels exist for completeness of the device entropy stage and for
mesh/batched deployments, and are byte-identical to the host engine
(tested in tests/test_device_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TOP_RANGE_HI = jnp.uint32(0x0FFFFFFF)       # TOP_RANGE = 2^60 - 1
TOP_RANGE_LO = jnp.uint32(0xFFFFFFFF)
BOTTOM = jnp.uint32(0xFFFF)
HI_MASK = jnp.uint32(0x0FFFFFFF)


def _mulhi32(a, b):
    """Exact (a * b) >> 32 for uint32 via 16-bit limbs."""
    a_lo = a & 0xFFFF
    a_hi = a >> 16
    b_lo = b & 0xFFFF
    b_hi = b >> 16
    lo = a_lo * b_lo
    mid1 = a_hi * b_lo
    mid2 = a_lo * b_hi
    carry = (lo >> 16) + (mid1 & 0xFFFF) + (mid2 & 0xFFFF)
    return a_hi * b_hi + (mid1 >> 16) + (mid2 >> 16) + (carry >> 16)


def _mul_small(lo, hi, c):
    """(60-bit value) * c mod 2^60 for c < 2^32 (freqs/cumFreqs <= 2^12)."""
    p_lo = lo * c
    carry = _mulhi32(lo, c)
    p_hi = (hi * c + carry) & HI_MASK
    return p_lo, p_hi


def _add60(a_lo, a_hi, b_lo, b_hi):
    s_lo = a_lo + b_lo
    cy = (s_lo < a_lo).astype(jnp.uint32)
    s_hi = (a_hi + b_hi + cy) & HI_MASK
    return s_lo, s_hi


def _sub60(a_lo, a_hi, b_lo, b_hi):
    d_lo = a_lo - b_lo
    br = (a_lo < b_lo).astype(jnp.uint32)
    d_hi = (a_hi - b_hi - br) & HI_MASK
    return d_lo, d_hi


def _le60(a_lo, a_hi, b_lo, b_hi):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo <= b_lo))


def _shr(lo, hi, s):
    """>> s for 8 <= s < 32 (the per-chunk logRange shift)."""
    return (lo >> s) | (hi << (jnp.uint32(32) - s)), hi >> s


def _shl28(lo, hi):
    """(value << 28) mod 2^60."""
    return (lo & 0xF) << 28, (lo >> 4) & HI_MASK


def _renorm(low_lo, low_hi, rng_lo, rng_hi, active):
    """One unrolled iteration of the renormalization loop head: returns
    (emit, clamped rng, still-active) — the caller performs the emission
    side effects and the <<28 shifts under `emit`."""
    s_lo, s_hi = _add60(low_lo, low_hi, rng_lo, rng_hi)
    diff = ((low_hi ^ s_hi) & HI_MASK) != 0
    rng_big = (rng_hi > 0) | (rng_lo > BOTTOM)
    brk = diff & rng_big
    clamp = active & diff & ~rng_big
    rng_lo = jnp.where(clamp, (jnp.uint32(0) - low_lo) & BOTTOM, rng_lo)
    rng_hi = jnp.where(clamp, jnp.uint32(0), rng_hi)
    emit = active & ~brk
    return emit, rng_lo, rng_hi, active & ~brk


@functools.partial(jax.jit, static_argnames=())
def encode_chunks(syms: jax.Array, nvalid: jax.Array, tables: jax.Array,
                  shifts: jax.Array):
    """Range-encode a batch of chunks.

    syms:   (B, N) int32  byte values (padded rows ignored)
    nvalid: (B,)   int32  valid bytes per chunk
    tables: (B, 2, 256) int32  planes: cumFreq, freq (normalized to 2^lr)
    shifts: (B,)   uint32 per-chunk logRange

    Returns (words (B, 2N) uint32 emitted 28-bit values in stream order,
    nwords (B,) int32, low (B, 2) uint32 final state limbs (lo, hi) — the
    host writes each valid emission as 28 bits then the final low as 60).

    The renorm loop emits at most twice per byte: after one emission
    rng >= 2^28 (so the underflow clamp cannot re-trigger), and after two
    rng >= 2^56, which forces the top-28 bits of low and low+range apart.
    """
    B, N = syms.shape
    cum_t = tables[:, 0].astype(jnp.uint32)
    freq_t = tables[:, 1].astype(jnp.uint32)
    shifts32 = shifts.astype(jnp.uint32)

    def step(carry, inp):
        low_lo, low_hi, rng_lo, rng_hi = carry
        sym, valid = inp
        cum = jnp.take_along_axis(cum_t, sym[:, None], axis=1)[:, 0]
        f = jnp.take_along_axis(freq_t, sym[:, None], axis=1)[:, 0]
        rng_lo2, rng_hi2 = _shr(rng_lo, rng_hi, shifts32)
        p_lo, p_hi = _mul_small(rng_lo2, rng_hi2, cum)
        nlow_lo, nlow_hi = _add60(low_lo, low_hi, p_lo, p_hi)
        nrng_lo, nrng_hi = _mul_small(rng_lo2, rng_hi2, f)

        flags = []
        vals = []
        active = valid
        for _ in range(2):
            emit, nrng_lo, nrng_hi, active = _renorm(
                nlow_lo, nlow_hi, nrng_lo, nrng_hi, active)
            vals.append(jnp.where(emit, nlow_hi, jnp.uint32(0)))
            flags.append(emit)
            sl_lo, sl_hi = _shl28(nlow_lo, nlow_hi)
            nlow_lo = jnp.where(emit, sl_lo, nlow_lo)
            nlow_hi = jnp.where(emit, sl_hi, nlow_hi)
            sr_lo, sr_hi = _shl28(nrng_lo, nrng_hi)
            nrng_lo = jnp.where(emit, sr_lo, nrng_lo)
            nrng_hi = jnp.where(emit, sr_hi, nrng_hi)

        low_lo = jnp.where(valid, nlow_lo, low_lo)
        low_hi = jnp.where(valid, nlow_hi, low_hi)
        rng_lo = jnp.where(valid, nrng_lo, rng_lo)
        rng_hi = jnp.where(valid, nrng_hi, rng_hi)
        out = (jnp.stack(flags, axis=1), jnp.stack(vals, axis=1))  # (B, 2)
        return (low_lo, low_hi, rng_lo, rng_hi), out

    init = (jnp.zeros(B, jnp.uint32), jnp.zeros(B, jnp.uint32),
            jnp.full(B, TOP_RANGE_LO), jnp.full(B, TOP_RANGE_HI))
    valid = (jnp.arange(N, dtype=jnp.int32)[:, None] < nvalid[None, :])
    (low_lo, low_hi, _, _), (flags, vals) = jax.lax.scan(
        step, init, (jnp.swapaxes(syms, 0, 1), valid))

    # compaction: emission order is (step, slot)
    flags = jnp.swapaxes(flags, 0, 1).reshape(B, N * 2)
    vals = jnp.swapaxes(vals, 0, 1).reshape(B, N * 2)
    f32 = flags.astype(jnp.int32)
    incl = jnp.cumsum(f32, axis=1)
    total = incl[:, -1]
    dest = jnp.where(flags, incl - 1, N * 2)

    def scatter_row(dest_row, val_row):
        out = jnp.zeros(N * 2 + 1, jnp.uint32)
        return out.at[dest_row].set(val_row, mode="drop")

    words = jax.vmap(scatter_row)(dest, vals)[:, :N * 2]
    return words, total, jnp.stack([low_lo, low_hi], axis=1)


@functools.partial(jax.jit, static_argnames=("glen",))
def decode_chunks(bufs: jax.Array, tables: jax.Array, f2s: jax.Array,
                  shifts: jax.Array, nvalid: jax.Array, glen: int):
    """Range-decode a batch of chunk coder streams.

    bufs:   (B, S) uint8  byte-aligned coder streams (the host bit-shifts
            each chunk's stream to byte alignment; >= 8 zero guard bytes)
    tables: (B, 2, 256) int32  planes: cumFreq, freq
    f2s:    (B, 4096) uint8    freq-slot -> symbol map
    shifts: (B,)  uint32       per-chunk logRange
    nvalid: (B,)  int32        bytes to decode per row
    glen:   scan length (max of nvalid)

    Returns (syms (B, glen) uint8, nreads (B,) int32 — the number of 28-bit
    renorm reads consumed; the row's stream occupies 60 + 28*nreads bits).
    """
    B, _ = bufs.shape
    bufs32 = bufs.astype(jnp.uint32)
    cum_t = tables[:, 0].astype(jnp.uint32)
    freq_t = tables[:, 1].astype(jnp.uint32)
    f2s32 = f2s.astype(jnp.int32)
    shifts32 = shifts.astype(jnp.uint32)

    def read28(k):
        """28 bits at bit offset 60 + 28k of each row's stream."""
        off = jnp.uint32(60) + jnp.uint32(28) * k.astype(jnp.uint32)
        byte = (off >> 3).astype(jnp.int32)
        sh = off & 7
        b = [jnp.take_along_axis(bufs32, (byte + j)[:, None], axis=1)[:, 0]
             for j in range(5)]
        v = (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]
        win = (v << sh) | jnp.where(sh > 0, b[4] >> (jnp.uint32(8) - sh),
                                    jnp.uint32(0))
        return win >> 4

    # initial code: first 60 bits = read28-style assembly at offsets 0/28/56
    def read_head():
        b = [bufs32[:, j] for j in range(8)]
        hi = ((b[0] << 20) | (b[1] << 12) | (b[2] << 4) | (b[3] >> 4)) & HI_MASK
        lo = ((b[3] & 0xF) << 28) | (b[4] << 20) | (b[5] << 12) \
            | (b[6] << 4) | (b[7] >> 4)
        return lo, hi

    code_lo0, code_hi0 = read_head()

    def step(carry, valid):
        low_lo, low_hi, rng_lo, rng_hi, code_lo, code_hi, nread = carry
        rng_lo2, rng_hi2 = _shr(rng_lo, rng_hi, shifts32)
        d_lo, d_hi = _sub60(code_lo, code_hi, low_lo, low_hi)
        # count = d / rng, quotient < 2^12: binary search, branch-free.
        # Trial products t*rng for t ABOVE the true quotient can exceed 2^60
        # (the real coder updates never do — freq <= scale keeps rng <= TOP —
        # but the search probes larger t), so the compare must detect
        # overflow explicitly: an overflowed product is > d by definition.
        q = jnp.zeros(B, jnp.uint32)
        for bit in range(11, -1, -1):
            t = q | (jnp.uint32(1) << bit)
            p_lo = rng_lo2 * t
            carry = _mulhi32(rng_lo2, t)
            ph_wrap = rng_hi2 * t
            ph_over = _mulhi32(rng_hi2, t)
            s = ph_wrap + carry
            cy = (s < carry)
            ovf = (ph_over > 0) | cy | (s > HI_MASK)
            le = (~ovf) & _le60(p_lo, s & HI_MASK, d_lo, d_hi)
            q = jnp.where(le, t, q)
        sym = jnp.take_along_axis(f2s32, q.astype(jnp.int32)[:, None],
                                  axis=1)[:, 0]
        cum = jnp.take_along_axis(cum_t, sym[:, None], axis=1)[:, 0]
        f = jnp.take_along_axis(freq_t, sym[:, None], axis=1)[:, 0]
        p_lo, p_hi = _mul_small(rng_lo2, rng_hi2, cum)
        nlow_lo, nlow_hi = _add60(low_lo, low_hi, p_lo, p_hi)
        nrng_lo, nrng_hi = _mul_small(rng_lo2, rng_hi2, f)
        ncode_lo, ncode_hi = code_lo, code_hi
        nr = nread
        active = valid
        for _ in range(2):
            emit, nrng_lo, nrng_hi, active = _renorm(
                nlow_lo, nlow_hi, nrng_lo, nrng_hi, active)
            v28 = read28(nr)
            sc_lo, sc_hi = _shl28(ncode_lo, ncode_hi)
            ncode_lo = jnp.where(emit, sc_lo | v28, ncode_lo)
            ncode_hi = jnp.where(emit, sc_hi, ncode_hi)
            sl_lo, sl_hi = _shl28(nlow_lo, nlow_hi)
            nlow_lo = jnp.where(emit, sl_lo, nlow_lo)
            nlow_hi = jnp.where(emit, sl_hi, nlow_hi)
            sr_lo, sr_hi = _shl28(nrng_lo, nrng_hi)
            nrng_lo = jnp.where(emit, sr_lo, nrng_lo)
            nrng_hi = jnp.where(emit, sr_hi, nrng_hi)
            nr = nr + emit.astype(jnp.int32)

        low_lo = jnp.where(valid, nlow_lo, low_lo)
        low_hi = jnp.where(valid, nlow_hi, low_hi)
        rng_lo = jnp.where(valid, nrng_lo, rng_lo)
        rng_hi = jnp.where(valid, nrng_hi, rng_hi)
        code_lo = jnp.where(valid, ncode_lo, code_lo)
        code_hi = jnp.where(valid, ncode_hi, code_hi)
        nread = jnp.where(valid, nr, nread)
        out = jnp.where(valid, sym, 0).astype(jnp.uint8)
        return (low_lo, low_hi, rng_lo, rng_hi, code_lo, code_hi, nread), out

    valid = (jnp.arange(glen, dtype=jnp.int32)[:, None] < nvalid[None, :])
    init = (jnp.zeros(B, jnp.uint32), jnp.zeros(B, jnp.uint32),
            jnp.full(B, TOP_RANGE_LO), jnp.full(B, TOP_RANGE_HI),
            code_lo0, code_hi0, jnp.zeros(B, jnp.int32))
    (_, _, _, _, _, _, nread), syms = jax.lax.scan(step, init, valid)
    return jnp.swapaxes(syms, 0, 1), nread
