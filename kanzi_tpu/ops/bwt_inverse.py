"""Device BWT inverse: batched LF-mapping walk.

The host decodes BWT blocks with an 8-way interleaved TPSI cursor walk
(native/src/bwt.cpp, mirroring reference v2/transform/BWT.go:361-628) —
a chain of data-dependent gathers, inherently latency-bound. This module
is the device-side formulation used to CLOSE the last §2.7 device-offload
question with a measurement (VERDICT r3, next #8): B independent cursor
chains (blocks and/or chunks) walk in lockstep under `lax.scan`, each
step gathering B positions from the LF mapping. The batch axis is the
only parallelism the dependency structure admits — exactly the regime
the radix-sort and FPAQ measurements showed the v5e cannot win
(no fast random gather; ~20 us sequential-step floor).

Kept correctness-complete (tested against the host inverse on the CPU
mesh); the measured verdict lives in docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_lf(last_cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side LF-mapping construction for a batch of BWT last columns.

    For each row: LF[i] = C[last[i]] + rank(last[i], i), the standard
    mapping from a row of the sorted-rotations matrix to the row of its
    left-rotation. O(n) per block with a 256-counter sweep (this is the
    cheap, bandwidth-bound part — the walk is the latency-bound part the
    device measurement targets). Returns (lf (B,N) int32, counts (B,256)).
    """
    B, N = last_cols.shape
    lf = np.empty((B, N), dtype=np.int32)
    counts = np.empty((B, 256), dtype=np.int32)
    for b in range(B):
        row = last_cols[b]
        hist = np.bincount(row, minlength=256).astype(np.int32)
        # LF[i] = C[row[i]] + stable-rank of i among equal symbols, which
        # is exactly the inverse of the stable argsort permutation
        order = np.argsort(row, kind="stable")
        lf[b, order] = np.arange(N, dtype=np.int32)
        counts[b] = hist
    return lf, counts


def lf_walk(last_cols: jax.Array, lf: jax.Array, starts: jax.Array,
            nsteps: int) -> jax.Array:
    """Walk the LF mapping `nsteps` times from `starts` (one cursor per
    row), emitting the decoded bytes in reverse text order.

    last_cols: (B, N) uint8; lf: (B, N) int32; starts: (B,) int32.
    Returns (B, nsteps) uint8. Each scan step performs one batched
    dependent gather — the minimal formulation of the inverse's critical
    path.
    """

    def step(cursors, _):
        syms = jnp.take_along_axis(last_cols, cursors[:, None],
                                   axis=1)[:, 0]
        nxt = jnp.take_along_axis(lf, cursors[:, None], axis=1)[:, 0]
        return nxt, syms

    _, out = jax.lax.scan(step, starts, None, length=nsteps)
    return out.T  # (B, nsteps), reverse text order


def bwt_inverse_device(last_cols: np.ndarray, primary: np.ndarray) -> np.ndarray:
    """Full batched device BWT inverse (textbook layout: `last_cols[b]` is
    the BWT of a block whose sorted-rotation primary row is primary[b]).
    Returns the decoded blocks (B, N) uint8."""
    B, N = last_cols.shape
    lf, _ = build_lf(last_cols)
    out = lf_walk(jnp.asarray(last_cols), jnp.asarray(lf),
                  jnp.asarray(primary.astype(np.int32)), N)
    # walk emits text back-to-front
    return np.asarray(out)[:, ::-1]
