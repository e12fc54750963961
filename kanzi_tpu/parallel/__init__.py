"""Block data-parallelism over a `jax.sharding.Mesh`.

The KANZ format's independently decodable blocks are the primary parallel
axis (reference P1, v2/io/CompressedStream.go:658-698; statelessness
contract v2/Definitions.go:50-52). Blocks shard across chips on a 1-D mesh;
per-chunk tables stay device-local; per-block payloads and bit-lengths are
gathered to host and spliced into the stream in block order — the device-mesh
analogue of the reference's lock-free ordered append (P2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import huffman as ops_huffman
from ..ops import histogram as ops_histogram


def compress_multiproc(*args, **kwargs):
    """Multi-process block compression (see parallel.multiproc)."""
    from .multiproc import compress_multiproc as _impl
    return _impl(*args, **kwargs)


def device_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the 'blocks' axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("blocks",))


def shard_pack_lanes(mesh: Mesh):
    """Returns a jitted lane-packing kernel sharded over the mesh.

    Lanes (rows) shard across chips; the per-chunk code tables are
    replicated (they are tiny); all gathers/scatters are row-local so XLA
    partitions with zero communication.
    """
    lane_sharding = NamedSharding(mesh, P("blocks"))
    lane2_sharding = NamedSharding(mesh, P("blocks", None))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        ops_huffman.pack_lanes,
        in_shardings=(lane2_sharding, lane_sharding, lane_sharding, repl),
        out_shardings=(lane2_sharding, lane_sharding),
    )


def compress_step(mesh: Mesh):
    """Full device compress step over a sharded batch of blocks.

    Per block: histogram + incompressibility estimate (the copy-block
    heuristic) and Huffman lane packing; a psum over the mesh yields the
    aggregate payload size — the only cross-chip communication in the
    pipeline. Returns a jitted fn:
        (blocks (B,N) u8, lane_syms (4B,FRAG) i32, lane_len (4B,) i32,
         table_idx (4B,) i32, tables (C,256) i32)
        -> (histos (B,256), entropy1024 (B,), words, nbits, total_bits ())
    """
    from jax.experimental.shard_map import shard_map

    def step(blocks, lane_syms, lane_len, table_idx, tables):
        histos = ops_histogram.histograms_u8(blocks)
        lengths = jnp.full(blocks.shape[0], blocks.shape[1], jnp.int32)
        ent = ops_histogram.entropy1024(histos, lengths)
        words, nbits = ops_huffman.pack_lanes(lane_syms, lane_len, table_idx,
                                              tables)
        total = jax.lax.psum(jnp.sum(nbits), "blocks")
        return histos, ent, words, nbits, total

    spec_b = P("blocks")
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("blocks", None), P("blocks", None), spec_b, spec_b, P()),
        out_specs=(P("blocks", None), spec_b, P("blocks", None), spec_b, P()),
        check_rep=False,
    ))


def dryrun_multichip(n_devices: int) -> None:
    """Compile + execute the full sharded compress step on tiny shapes.

    Used by the driver (and tests) with
    XLA_FLAGS=--xla_force_host_platform_device_count=N to validate the
    multi-chip path without N real chips.
    """
    mesh = device_mesh(n_devices)
    B = n_devices * 2            # 2 blocks per device
    N = 1024                     # tiny blocks
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 64, (B, N), dtype=np.uint8)
    L = 4 * B
    frag = 256  # tiny lanes: the kernel is shape-polymorphic
    syms = np.zeros((L, frag), dtype=np.int32)
    syms[:, :N // 4] = blocks.repeat(4, axis=0)[:, : N // 4]
    lane_len = np.full(L, N // 4, dtype=np.int32)
    table_idx = np.arange(L, dtype=np.int32) // 4 % 2
    tables = np.full((2, 256), (8 << 12) | 0x55, dtype=np.int32)

    fn = compress_step(mesh)
    histos, ent, words, nbits, total = fn(blocks, syms, lane_len, table_idx,
                                          tables)
    jax.block_until_ready((histos, ent, words, nbits, total))
    assert histos.shape == (B, 256)
    assert int(total) == int(np.sum(np.asarray(nbits)))
