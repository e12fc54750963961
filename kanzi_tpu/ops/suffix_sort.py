"""Device suffix sort: Manber-Myers prefix doubling over lax.sort.

The reference builds its BWT on a host-serial divsufsort
(v2/transform/DivSufSort.go); our host engine uses SA-IS (native/src/
sais.cpp). Both are pointer-chasing algorithms with no device analogue.
This kernel instead computes the identical suffix array with prefix
doubling: O(log n) rounds, each a stable two-key sort over n elements plus
elementwise rank relabeling — exactly the shape XLA's bitonic `lax.sort`
and fused elementwise ops run well on TPU. The suffix array of a string is
unique, so the resulting BWT bytes are identical to the host engine's (the
same argument that lets the host use SA-IS instead of divsufsort).

Order semantics match sais.cpp: positions past the end compare smaller
than every symbol (appended-unique-minimum sentinel), so a suffix that is
a prefix of another sorts first.

Shapes are padded to power-of-two buckets so each corpus size class
compiles once; the true length is a traced scalar. Pad positions get
distinct ranks above every real symbol, so they sort after all real
suffixes and never perturb the order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int) -> int:
    size = 1024
    while size < n:
        size <<= 1
    return size


@functools.partial(jax.jit, static_argnums=(1,))
def _prefix_double(data_padded: jax.Array, size: int, n_true: jax.Array):
    """data_padded: [size] int32 (pad values arbitrary). Returns [size]
    int32 suffix order; entries >= n_true sit at the tail."""
    idx = jnp.arange(size, dtype=jnp.int32)
    # initial ranks: real bytes in [0,255]; pad positions 256+i (distinct,
    # increasing, larger than any real symbol)
    rank = jnp.where(idx < n_true, data_padded, 256 + idx)

    def rank2_at(rank, k):
        pos = idx + k
        gathered = rank[jnp.minimum(pos, size - 1)]
        # past the true end = sentinel (smaller than every rank)
        return jnp.where(pos < n_true, gathered, jnp.int32(-1))

    def body(carry):
        rank, k, _ = carry
        r2 = rank2_at(rank, k)
        order = jnp.lexsort((r2, rank))  # stable; primary key last
        r1s = rank[order]
        r2s = r2[order]
        neq = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
        ])
        new_sorted = jnp.cumsum(neq) - 1
        new_rank = jnp.zeros_like(rank).at[order].set(
            new_sorted.astype(jnp.int32))
        return new_rank, k * 2, order

    def cond(carry):
        rank, k, _ = carry
        return (k < size) & (jnp.max(rank) < size - 1)

    first = body((rank, jnp.int32(1), idx))
    rank, k, order = jax.lax.while_loop(cond, body, first)
    return order


def suffix_array_device(data) -> np.ndarray:
    """Suffix array of `data` (bytes/uint8 array), identical to the host
    sais.cpp order. Runs the doubling loop on the default JAX device."""
    arr = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int32)
    if n == 1:
        return np.zeros(1, np.int32)
    size = _bucket(n)
    padded = np.zeros(size, np.int32)
    padded[:n] = arr
    order = jax.device_get(_prefix_double(jnp.asarray(padded), size,
                                          jnp.int32(n)))
    return order[order < n].astype(np.int32)


def bwt_forward_device(data) -> bytes:
    """BWT block payload (header + rotated bytes) from the device suffix
    array, byte-identical to native transform type 1 (bwt.cpp
    bwtBlockCodec); the tiny header/assembly stays on host."""
    src = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    n = len(src)
    if n < 2:
        # pIndexSize would be 0 — the native codec skips such blocks
        # (bwt.cpp bwtBlockForward), so there is no payload to mirror
        raise ValueError("block too small for the BWT block codec")
    sa = suffix_array_device(src)
    chunks = 1 if n < 256 else 8
    step = -(-n // chunks)
    indexes = np.zeros(8, np.uint32)
    sel = (sa % step) == 0
    indexes[(sa[sel] // step)] = np.nonzero(sel)[0] + 1
    p_idx = int(np.nonzero(sa == 0)[0][0])
    out = np.empty(n, np.uint8)
    out[0] = src[n - 1]
    out[1:p_idx + 1] = src[sa[:p_idx] - 1]
    out[p_idx + 1:] = src[sa[p_idx + 1:] - 1]
    indexes[0] = p_idx + 1

    # pIndexSize from ceil(log2(blockSize)), exactly as bwt.cpp
    log_block = (n - 1).bit_length() if n >= 2 else 0
    pis = (log_block + 7) >> 3
    log_chunks = chunks.bit_length() - 1
    mode = (log_chunks << 2) | (pis - 1)
    header = bytearray([mode])
    for c in range(chunks):
        header += int(indexes[c] - 1).to_bytes(pis, "big")
    return bytes(header) + out.tobytes()
