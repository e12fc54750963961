"""Device rANS encode kernel (4 interleaved states, reverse symbol order).

The reference encoder walks each chunk backwards with 4 independent rANS
states, interleaving their renormalization bytes into one back-to-front
buffer (v2/entropy/ANSRangeCodec.go:313-405). Device mapping:

  - the 4 states are a vector lane dim; chunks batch on a second dim
  - the sequential dependency (state g+1 depends on state g) becomes a
    lax.scan over symbol groups; every step is fully vectorized over
    (chunks, 4 states)
  - the reciprocal division (st * invFreq) >> invShift is exact u32 mulhi,
    emulated with 16-bit limbs (no 64-bit ints needed on device)
  - byte emissions (0 or 2 per state per step) are recorded as scan outputs
    and compacted into each chunk's stream-ordered byte sequence with one
    vectorized scatter after the scan: emission k with renorm flag gets
    pair slot P-1-p_k (the buffer is written back-to-front, so the last
    pair emitted is first in the stream)

The packed pairs are byte-identical to the host C++ encoder's chunk bodies
(tests assert it); kz_ans_assemble splices headers, varints, final states,
pairs, and raw tails into the KANZ payload.

Symbol index matrices come from the host (numpy reshapes of the chunk):
  order 0: S[g, j] = chunk[end4-1-4g-j]
  order 1: S[g, j] = (cur << 8) | prv per quarter-lane walk, plus one final
           group of context-0 symbols (the first byte of each quarter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ANS_TOP = 1 << 15


def _mulhi32(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact (a * b) >> 32 for uint32 a, b via 16-bit limbs."""
    a_lo = a & 0xFFFF
    a_hi = a >> 16
    b_lo = b & 0xFFFF
    b_hi = b >> 16
    lo = a_lo * b_lo
    mid1 = a_hi * b_lo
    mid2 = a_lo * b_hi
    carry = (lo >> 16) + (mid1 & 0xFFFF) + (mid2 & 0xFFFF)
    return a_hi * b_hi + (mid1 >> 16) + (mid2 >> 16) + (carry >> 16)


@functools.partial(jax.jit, static_argnames=())
def encode_chunks(syms: jax.Array, ngroups: jax.Array,
                  tables: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Runs the 4-state rANS encode for a batch of chunks.

    syms:    (B, G, 4) int32  symbol-table indices in emission order
             (row g, then state j=0..3); padded rows are ignored
    ngroups: (B,)      int32  valid rows per chunk
    tables:  (B, 5, S) int32  planes: xMax, bias, cmplFreq, invShift,
             invFreq (u32 bits); S = 256 (order 0) or 65536 (order 1)

    Returns (pairs (B, G*4) uint16 stream-ordered renorm pairs (big-endian
    serialization gives the exact byte stream), npairs (B,) int32,
    states (B, 4) uint32 final states in j order).
    """
    B, G, _ = syms.shape
    x_max = tables[:, 0].astype(jnp.uint32)      # (B, S) — xMax < 2^31
    bias = tables[:, 1]
    cmpl = tables[:, 2].astype(jnp.uint32)
    inv_shift = tables[:, 3].astype(jnp.uint32)
    inv_freq = tables[:, 4].astype(jnp.uint32)

    def step(states, inp):
        sym, valid = inp                          # (B,4) int32, (B,1) bool
        xm = jnp.take_along_axis(x_max, sym, axis=1)
        bi = jnp.take_along_axis(bias, sym, axis=1)
        cf = jnp.take_along_axis(cmpl, sym, axis=1)
        sh = jnp.take_along_axis(inv_shift, sym, axis=1)
        fi = jnp.take_along_axis(inv_freq, sym, axis=1)
        flag = valid & (states >= xm)
        pair = (states & 0xFFFF).astype(jnp.uint16)
        st = jnp.where(flag, states >> 16, states)
        q = _mulhi32(st, fi) >> (sh - 32)
        new = st + bi.astype(jnp.uint32) + q * cf
        states = jnp.where(valid, new, states)
        return states, (flag, pair)

    init = jnp.full((B, 4), ANS_TOP, dtype=jnp.uint32)
    valid = (jnp.arange(G, dtype=jnp.int32)[:, None, None]
             < ngroups[None, :, None])            # (G, B, 1)
    xs = (jnp.swapaxes(syms, 0, 1), valid)        # (G, B, 4)
    states, (flags, pairs) = jax.lax.scan(step, init, xs)

    # joint compaction: emission order is (g, j); the p-th flagged emission
    # of a chunk lands at stream slot P-1-p
    flags = jnp.swapaxes(flags, 0, 1).reshape(B, G * 4)
    pairs = jnp.swapaxes(pairs, 0, 1).reshape(B, G * 4)
    f32 = flags.astype(jnp.int32)
    incl = jnp.cumsum(f32, axis=1)
    total = incl[:, -1]                           # (B,)
    dest = jnp.where(flags, total[:, None] - incl, G * 4)  # P-1-(incl-1)

    def scatter_row(dest_row, pair_row):
        out = jnp.zeros(G * 4 + 1, jnp.uint16)
        return out.at[dest_row].set(pair_row, mode="drop")

    out = jax.vmap(scatter_row)(dest, pairs)[:, :G * 4]
    return out, total, states


@functools.partial(jax.jit, static_argnames=("order", "lr", "glen"))
def decode_chunks(bufs: jax.Array, states0: jax.Array, f2s: jax.Array,
                  dtabs: jax.Array, ngroups: jax.Array, order: int,
                  lr: int, glen: int) -> tuple[jax.Array, jax.Array]:
    """4-state forward rANS decode for a batch of chunks.

    bufs:    (B, S)           uint8  renorm byte streams (64-byte zero guard)
    states0: (B, 4)           int32  initial states (j = 0..3)
    f2s:     (B, dim*2^lr)    uint8  freq slot -> symbol, per context
    dtabs:   (B, 2, dim*256)  int32  planes: freq, cumFreq
    ngroups: (B,)             int32  symbol groups per chunk

    Returns (syms (B, G, 4) uint8 with column j = state j's symbol in group
    g, nread (B,) int32 bytes consumed — the chunk's raw tail starts there).
    Decode consumption order within a group is state 3, 2, 1, 0 (reference
    v2/entropy/ANSRangeCodec.go:904-948).
    """
    B, _ = bufs.shape
    mask = (1 << lr) - 1
    top = jnp.uint32(ANS_TOP)
    freq = dtabs[:, 0].astype(jnp.uint32)
    cum = dtabs[:, 1].astype(jnp.uint32)
    bufs32 = bufs.astype(jnp.uint32)
    f2s32 = f2s.astype(jnp.int32)

    def step(carry, valid):
        st, n, prv = carry                  # (B,4) u32, (B,) i32, (B,4) i32
        syms = []
        for j in (3, 2, 1, 0):
            st_j = st[:, j]
            ctx = prv[:, j] if order == 1 else jnp.zeros(B, jnp.int32)
            slot = (st_j & mask).astype(jnp.int32)
            sym = jnp.take_along_axis(
                f2s32, (ctx * (mask + 1) + slot)[:, None], axis=1)[:, 0]
            ti = (ctx * 256 + sym)[:, None]
            f = jnp.take_along_axis(freq, ti, axis=1)[:, 0]
            cf = jnp.take_along_axis(cum, ti, axis=1)[:, 0]
            stn = f * (st_j >> lr) + slot.astype(jnp.uint32) - cf
            flag = (stn < top) & valid
            b0 = jnp.take_along_axis(bufs32, n[:, None], axis=1)[:, 0]
            b1 = jnp.take_along_axis(bufs32, n[:, None] + 1, axis=1)[:, 0]
            stn = jnp.where(flag, (stn << 16) | (b0 << 8) | b1, stn)
            n = n + 2 * flag.astype(jnp.int32)
            st = st.at[:, j].set(jnp.where(valid, stn, st_j))
            if order == 1:
                prv = prv.at[:, j].set(jnp.where(valid, sym, prv[:, j]))
            syms.append(jnp.where(valid, sym, 0).astype(jnp.uint8))
        out = jnp.stack([syms[3], syms[2], syms[1], syms[0]], axis=1)  # col j
        return (st, n, prv), out

    valid = (jnp.arange(glen, dtype=jnp.int32)[:, None]
             < ngroups[None, :])
    init = (states0.astype(jnp.uint32), jnp.zeros(B, jnp.int32),
            jnp.zeros((B, 4), jnp.int32))
    (st, n, prv), syms = jax.lax.scan(step, init, valid)
    return jnp.swapaxes(syms, 0, 1), n


def build_syms_order0(chunk: np.ndarray) -> np.ndarray:
    """(G, 4) int32 symbol matrix for an order-0 chunk (host-side numpy)."""
    end4 = len(chunk) & ~3
    if end4 == 0:
        return np.zeros((0, 4), dtype=np.int32)
    return np.flip(chunk[:end4]).reshape(-1, 4).astype(np.int32)


def build_syms_order1(chunk: np.ndarray) -> np.ndarray:
    """(G+1, 4) int32 symbol matrix for an order-1 chunk: quarter lanes of
    (cur<<8)|prv pairs walked backwards, then the final context-0 group."""
    n = len(chunk)
    end4 = n & ~3
    q = end4 >> 2
    if n <= 1 or q == 0:
        return np.zeros((0, 4), dtype=np.int32)
    lanes = chunk[:4 * q].reshape(4, q).astype(np.int32)
    cur = lanes[:, q - 2::-1] if q >= 2 else lanes[:, :0]   # (4, q-1)
    prv = lanes[:, q - 1:0:-1] if q >= 2 else lanes[:, :0]
    syms = ((cur << 8) | prv).T                             # (q-1, 4)
    final = lanes[:, 0][None, :]                            # context 0
    return np.concatenate([syms, final], axis=0).astype(np.int32)
