"""Pallas TPU kernels for the batched byte-scan hot loops.

The reference's order-0 histogram is a 16-way unrolled scalar loop
(v2/internal/Global.go:220-344) feeding the incompressibility heuristic and
every frequency-based codec. Here a block row is scanned on the VPU: bytes
are one-hot compared against the 256 bin ids in (8, 128)-shaped vector
tiles and accumulated in VMEM — one grid cell per block, zero cross-cell
communication, so the kernel partitions freely over a block-sharded mesh.

CPU test runs use interpret mode (pltpu.force_tpu_interpret_mode); on TPU
hardware the same code compiles through Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scan tile: 8 sublanes x 128 lanes of bytes per step
_TILE = 1024


def _histogram_kernel(blocks_ref, out_ref):
    """One grid cell = one block row (viewed as (rows, 128)) -> 256 bins."""
    rows = blocks_ref.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)

    def step(i, acc):
        tile = blocks_ref[0, pl.ds(i * 8, 8), :].astype(jnp.int32)
        # (256, 8, 128) one-hot compare, reduced over lanes on the VPU;
        # all intermediates stay >= 2-D (Mosaic layout requirement)
        eq = (tile[None, :, :] == bins).astype(jnp.int32)
        return acc + jnp.sum(eq, axis=2)

    acc = jnp.zeros((256, 8), jnp.int32)
    acc = jax.lax.fori_loop(0, rows // 8, step, acc)
    out_ref[0, :, :] = jnp.sum(acc, axis=1, keepdims=True)


def histograms_pallas(blocks: jax.Array, interpret: bool = False) -> jax.Array:
    """Order-0 histograms of a (B, N) uint8 batch -> (B, 256) int32.

    N must be a multiple of 1024 (the container pads blocks to fixed shape).
    """
    B, N = blocks.shape
    if N % _TILE:
        raise ValueError(f"block length must be a multiple of {_TILE}")
    rows = N // 128
    view = blocks.reshape(B, rows, 128)
    out = pl.pallas_call(
        _histogram_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 256, 1), jnp.int32),
        interpret=interpret,
    )(view)
    return out.reshape(B, 256)


def _entropy_kernel(histos_ref, lengths_ref, out_ref):
    """First-order entropy x1024 per block from its histogram — the
    incompressibility gate (>= 973 -> copy block; reference
    v2/internal/Global.go:196-214 uses an integer log2 approximation; this
    device version uses float log2, which is exact enough for the gate and
    is NOT used for any format-visible decision on the host path)."""
    h = histos_ref[:, :].astype(jnp.float32)
    n = lengths_ref[:, :].astype(jnp.float32)  # (B, 1)
    p = jnp.where(h > 0, h / n, 1.0)
    bits = -jnp.sum(jnp.where(h > 0, h * jnp.log2(p), 0.0), axis=1,
                    keepdims=True)
    # [0..1024] scale: bits/byte / 8 * 1024 (the reference's >>3 + /n)
    out_ref[:, :] = (bits * 128.0 / n).astype(jnp.int32)


def entropy1024_pallas(histos: jax.Array, lengths: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """(B, 256) histograms + (B,) lengths -> (B,) entropy*1024 estimates."""
    B = histos.shape[0]
    out = pl.pallas_call(
        _entropy_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        interpret=interpret,
    )(histos, lengths.reshape(B, 1))
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_stats_pallas(blocks: jax.Array, interpret: bool = False):
    """Fused per-block stats: histogram + entropy gate, one device pass."""
    h = histograms_pallas(blocks, interpret=interpret)
    lengths = jnp.full(blocks.shape[0], blocks.shape[1], jnp.int32)
    e = entropy1024_pallas(h, lengths, interpret=interpret)
    return h, e
