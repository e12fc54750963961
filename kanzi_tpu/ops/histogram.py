"""Batched order-0 histograms + entropy estimation on device.

Used by the block scheduler for incompressibility detection
(ComputeFirstOrderEntropy1024 >= 973 -> copy block, reference:
v2/io/CompressedStream.go:778-800) and by frequency-table construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def histograms_u8(blocks: jax.Array) -> jax.Array:
    """blocks: (B, N) uint8 -> (B, 256) int32 counts.

    On TPU backends with tile-aligned blocks this dispatches to the Pallas
    VPU kernel (ops.pallas_kernels); otherwise the XLA scatter-add
    formulation below. Measured end-to-end through this environment's
    network tunnel the kernel is dispatch-latency-bound (~0.6 GB/s); see
    bench.py for the honest numbers."""
    N = blocks.shape[-1]
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu and N % 1024 == 0:
        from .pallas_kernels import histograms_pallas
        return histograms_pallas(blocks)

    def one(block):
        return jnp.zeros(256, jnp.int32).at[block].add(1)

    return jax.vmap(one)(blocks)


@jax.jit
def entropy1024(histos: jax.Array, lengths: jax.Array) -> jax.Array:
    """Order-0 entropy scaled by 1024 per block.

    histos: (B, 256) int32; lengths: (B,) int32. Device-side approximation of
    the reference's integer log (float log2 here; used only for the
    skip-block heuristic, not for bitstream contents).
    """
    h = histos.astype(jnp.float32)
    n = lengths.astype(jnp.float32)[:, None]
    p = jnp.where(h > 0, h / jnp.maximum(n, 1.0), 1.0)
    bits = -jnp.sum(jnp.where(h > 0, h * jnp.log2(p), 0.0), axis=1)
    # [0..1024] scale: bits/byte / 8 * 1024 (matches the reference's >>3 + /n;
    # random bytes -> ~1024, the 973 incompressibility gate applies directly)
    return (128.0 * bits / jnp.maximum(n[:, 0], 1.0)).astype(jnp.int32)
