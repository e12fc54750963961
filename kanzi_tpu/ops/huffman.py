"""Device Huffman bit-packing kernel.

The reference encoder packs each 16 KiB chunk as 4 independent interleaved
sub-streams (v2/entropy/HuffmanCodec.go:435-511) — already a SIMD layout.
Here every (chunk, lane) pair becomes one row of a batched device kernel:

  gather code+length per symbol -> exclusive cumsum of lengths -> place each
  code's bits into two 32-bit big-endian words -> scatter-add (bit-disjoint,
  so add == or) -> packed words + exact bit counts.

The packed bytes are byte-identical to the host C++ encoder's lane payloads
(tests assert it); the host splices them into the KANZ frame with the
per-chunk table headers built by kz_huffman_prepare.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FRAG = 4096  # symbols per lane (16 KiB chunk / 4)
# max lane bits = FRAG * 12; +2 words slack for the split scatter
WORDS = (FRAG * 12 + 31) // 32 + 2


@functools.partial(jax.jit, static_argnames=())
def pack_lanes(syms: jax.Array, lane_len: jax.Array, table_idx: jax.Array,
               tables: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Packs Huffman codes for a batch of lanes.

    syms:      (L, FRAG) uint8/int32  symbols (padded with 0); uint8 is
               preferred — it quarters the host->device transfer, which
               dominates when the chip sits behind a network tunnel
    lane_len:  (L,)      int32  valid symbols per lane
    table_idx: (L,)      int32  chunk/table index per lane
    tables:    (C, 256)  int32  (len<<12)|code entries

    Returns (words (L, nwords) uint32 big-endian bit stream, nbits (L,)
    int32) where nwords = (frag*12+31)//32 + 2.
    """
    frag = syms.shape[1]
    syms = syms.astype(jnp.int32)
    nwords = (frag * 12 + 31) // 32 + 2
    ctab = tables[table_idx]                              # (L, 256)
    codes = jnp.take_along_axis(ctab, syms, axis=1)       # (L, frag)
    pos = jnp.arange(frag, dtype=jnp.int32)[None, :]
    valid = pos < lane_len[:, None]
    lens = jnp.where(valid, codes >> 12, 0).astype(jnp.int32)
    vals = jnp.where(valid, codes & 0xFFF, 0).astype(jnp.uint32)

    ends = jnp.cumsum(lens, axis=1, dtype=jnp.int32)      # inclusive
    offs = ends - lens                                    # exclusive
    nbits = ends[:, -1]

    word1 = offs >> 5
    b = offs & 31
    s1 = 32 - b - lens                                    # may be negative
    hi = jnp.where(s1 >= 0,
                   vals << jnp.maximum(s1, 0).astype(jnp.uint32),
                   vals >> jnp.minimum(-s1, 31).astype(jnp.uint32))
    lo = jnp.where(s1 >= 0,
                   jnp.uint32(0),
                   (vals << jnp.maximum(32 + s1, 0).astype(jnp.uint32)))
    hi = jnp.where(valid, hi, 0)
    lo = jnp.where(valid, lo, 0)

    def scatter_one(w1, hi_row, lo_row):
        w = jnp.zeros(nwords, jnp.uint32)
        w = w.at[w1].add(hi_row)
        w = w.at[w1 + 1].add(lo_row)
        return w

    words = jax.vmap(scatter_one)(word1, hi, lo)
    return words, nbits


def words_to_bytes(words) -> bytes:
    """Big-endian byte view of packed words (numpy, host side)."""
    import numpy as np
    return np.asarray(words).astype(">u4").tobytes()


@functools.partial(jax.jit, static_argnames=())
def decode_lanes(lanes: jax.Array, table_idx: jax.Array,
                 dtables: jax.Array) -> jax.Array:
    """Batched table-driven Huffman decode (the device side of the 4-lane
    refill loop, reference v2/entropy/HuffmanCodec.go:807-976).

    Each lane decodes sequentially — peek 12 bits at the bit cursor, look up
    (symbol, length) in the chunk's 4096-entry table, advance — expressed as
    a lax.scan over symbol slots, fully vectorized across lanes. Lanes must
    be zero-padded (like the reference's cleared refill slack) so peeks past
    the payload end are deterministic.

    lanes:     (L, S) uint8   lane byte streams, zero-padded; S >= FRAG*12/8+4
    table_idx: (L,)   int32   chunk/table index per lane
    dtables:   (C, 4096) uint16  code -> (symbol<<8)|length

    Returns symbols (L, FRAG) uint8 (garbage beyond each lane's true
    fragment size; the host slices per chunk).
    """
    L = lanes.shape[0]
    lanes32 = lanes.astype(jnp.int32)
    flat = dtables.reshape(-1).astype(jnp.int32)
    base = table_idx.astype(jnp.int32) * 4096

    def step(bitpos, _):
        byte_idx = bitpos >> 3
        rem = bitpos & 7
        b0 = jnp.take_along_axis(lanes32, byte_idx[:, None], axis=1)[:, 0]
        b1 = jnp.take_along_axis(lanes32, byte_idx[:, None] + 1, axis=1)[:, 0]
        b2 = jnp.take_along_axis(lanes32, byte_idx[:, None] + 2, axis=1)[:, 0]
        w = (b0 << 16) | (b1 << 8) | b2
        code = (w >> (12 - rem)) & 0xFFF
        val = flat[base + code]
        sym = (val >> 8).astype(jnp.uint8)
        return bitpos + (val & 0xFF), sym

    init = jnp.zeros(L, jnp.int32)
    _, syms = jax.lax.scan(step, init, None, length=FRAG)
    return jnp.swapaxes(syms, 0, 1)
