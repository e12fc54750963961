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


class NoDeviceEngine(RuntimeError):
    """No device entropy kernel exists for the requested entropy type
    (NONE and the bit-serial binary context models run host-side by
    design — see the device ledger in docs/ARCHITECTURE.md)."""


def compress_multiproc(*args, **kwargs):
    """Multi-process block compression (see parallel.multiproc)."""
    from .multiproc import compress_multiproc as _impl
    return _impl(*args, **kwargs)


def decompress_multiproc(*args, **kwargs):
    """Multi-process block decompression (see parallel.multiproc)."""
    from .multiproc import decompress_multiproc as _impl
    return _impl(*args, **kwargs)


def device_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the 'blocks' axis.

    Honors a JAX_PLATFORMS env override even under this image's interpreter
    startup hook, which reads the variable before user code runs and pins
    the platform config (so the env alone is silently ignored — and with
    the preset 'axon' a downed TPU tunnel hangs device init forever). Only
    applied while backends are still uninitialized.
    """
    import os
    want = os.environ.get("JAX_PLATFORMS")
    if want and jax.config.jax_platforms != want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backends already initialized: keep the live platform
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
    from jax import shard_map

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
        check_vma=False,
    ))


def shard_ans_encode(mesh: Mesh):
    """Returns a jitted device-rANS encode sharded over the mesh: chunk rows
    (the batch axis) shard across chips; each chunk's scan is chip-local, so
    XLA partitions with zero communication."""
    from ..ops import ans as ops_ans
    row = NamedSharding(mesh, P("blocks"))
    row2 = NamedSharding(mesh, P("blocks", None))
    row3 = NamedSharding(mesh, P("blocks", None, None))
    return jax.jit(
        ops_ans.encode_chunks,
        in_shardings=(row3, row, row3),
        out_shardings=(row2, row, row2),
    )


def _pad_rows(arr: np.ndarray, pad: int) -> np.ndarray:
    if pad == 0:
        return arr
    return np.concatenate(
        [arr, np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)])


def mesh_writer(mesh: Mesh, **writer_kwargs):
    """A Writer whose device entropy engine runs sharded over `mesh`.

    Every dispatched block's lane/chunk batch spreads across the mesh's
    'blocks' axis (padded to the device count); tables replicate; results
    gather to host for the ordered frame splice — the device-mesh analogue
    of the reference's P1 block parallelism + P2 ordered append.
    """
    from ..kio import Writer

    ctx = dict(writer_kwargs.pop("ctx", {}) or {})
    ctx["useDevice"] = True
    w = Writer(None, ctx=ctx, **writer_kwargs)
    eng = w._dev_engine
    if eng is None:
        raise NoDeviceEngine(
            "device engine unavailable for this entropy type")
    n_dev = int(mesh.devices.size)

    if hasattr(eng, "_pack"):       # Huffman: lanes shard
        mesh_pack = shard_pack_lanes(mesh)

        def padded_pack(syms, lane_len, table_idx, tables):
            L = len(syms)
            pad = (-L) % n_dev
            words, nbits = mesh_pack(
                _pad_rows(np.ascontiguousarray(syms), pad),
                _pad_rows(np.ascontiguousarray(lane_len), pad),
                _pad_rows(np.ascontiguousarray(table_idx), pad), tables)
            return words[:L], nbits[:L]

        eng._pack = padded_pack
    else:                           # ANS: chunk rows shard
        mesh_enc = shard_ans_encode(mesh)

        def padded_encode(syms, ngroups, tables):
            B = len(syms)
            pad = (-B) % n_dev
            pairs, npairs, states = mesh_enc(
                _pad_rows(syms, pad), _pad_rows(ngroups, pad),
                _pad_rows(tables, pad))
            return pairs[:B], npairs[:B], states[:B]

        eng._encode = padded_encode
    return w


def shard_huffman_decode(mesh: Mesh):
    """Mesh-sharded device Huffman decode: lane rows shard, decode tables
    replicate (lane rows gather from arbitrary table rows)."""
    row = NamedSharding(mesh, P("blocks"))
    row2 = NamedSharding(mesh, P("blocks", None))
    repl = NamedSharding(mesh, P())
    return jax.jit(ops_huffman.decode_lanes,
                   in_shardings=(row2, row, repl), out_shardings=row2)


def mesh_decode_hooks(mesh: Mesh) -> dict:
    """Mesh-sharded device entropy decode kernels, as a ctx fragment.

    Returns {"huffman": fn, "ans": fn} for a Reader's
    ``ctx["deviceDecodeHooks"]`` — the decode-side mirror of mesh_writer:
    Huffman lane rows and ANS chunk rows spread across the 'blocks' axis;
    inverse transforms and checksums stay on host.  The hooks are plain
    per-Reader state (no module globals), so any number of concurrent mesh
    Readers in one process are independent.
    """
    from ..ops import ans as ops_ans

    n_dev = int(mesh.devices.size)
    mesh_hdec = shard_huffman_decode(mesh)

    def padded_decode_lanes(lanes, table_idx, dtables):
        L = len(lanes)
        pad = (-L) % n_dev
        syms = mesh_hdec(_pad_rows(np.ascontiguousarray(lanes), pad),
                         _pad_rows(np.ascontiguousarray(table_idx), pad),
                         dtables)
        return np.asarray(syms)[:L]

    row = NamedSharding(mesh, P("blocks"))
    row2 = NamedSharding(mesh, P("blocks", None))
    mesh_adec = jax.jit(ops_ans.decode_chunks,
                        static_argnames=("order", "lr", "glen"),
                        in_shardings=(row2, row2, row2,
                                      NamedSharding(mesh, P("blocks", None, None)),
                                      row),
                        out_shardings=(NamedSharding(mesh, P("blocks", None, None)),
                                       row))

    def padded_decode_chunks(bufs, states, f2s, dtabs, ngroups,
                             order, lr, glen):
        B = len(bufs)
        pad = (-B) % n_dev
        syms, nread = mesh_adec(
            _pad_rows(np.ascontiguousarray(bufs), pad),
            _pad_rows(np.ascontiguousarray(states), pad),
            _pad_rows(np.ascontiguousarray(f2s), pad),
            _pad_rows(np.ascontiguousarray(dtabs), pad),
            _pad_rows(np.ascontiguousarray(ngroups), pad),
            order, lr, glen)
        return np.asarray(syms)[:B], np.asarray(nread)[:B]

    return {"huffman": padded_decode_lanes, "ans": padded_decode_chunks}


def decompress_multichip(blob, mesh: Mesh) -> bytes:
    """Decode a KANZ stream with the entropy stage sharded over the mesh;
    byte-identical to the single-host decode (tested)."""
    import io as _io

    from ..kio import Reader

    r = Reader(_io.BytesIO(bytes(blob)),
               ctx={"useDevice": True,
                    "deviceDecodeHooks": mesh_decode_hooks(mesh)})
    out = bytearray()
    while True:
        c = r.read(1 << 20)
        if not c:
            break
        out += c
    return bytes(out)


def compress_multichip(data, mesh: Mesh, transform: str = "LZ",
                       entropy: str = "HUFFMAN",
                       block_size: int = 1 << 20, checksum: int = 0,
                       **writer_kwargs) -> bytes:
    """End-to-end multi-chip compression of real data: host transforms +
    per-chunk tables, mesh-sharded entropy kernels, ordered frame splice.
    The output is byte-identical to the single-host stream (tested).

    Entropy stages with no device kernel (NONE, the binary context models
    TPAQ/TPAQX/CM/FPAQ — measured net-negative on device, see
    docs/ARCHITECTURE.md device ledger) map to the block axis instead:
    one worker per mesh device runs the host engine, blocks splice in
    order (the reference's P1+P2, v2/io/CompressedStream.go:658-698).
    Only that specific signal falls back — real device/mesh failures
    (backend init, sharding errors) propagate so tests cannot silently
    certify a host-only run as a mesh run."""
    try:
        w = mesh_writer(mesh, transform=transform, entropy=entropy,
                        block_size=block_size, checksum=checksum,
                        file_size=len(data), **writer_kwargs)
    except NoDeviceEngine:
        from ..kio import Writer
        w = Writer(None, transform=transform, entropy=entropy,
                   block_size=block_size, checksum=checksum,
                   file_size=len(data), jobs=int(mesh.devices.size),
                   **writer_kwargs)
    w.write(data)
    w.close()
    return w.getvalue()


def _dryrun_corpus(n: int) -> bytes:
    rng = np.random.default_rng(7)
    text = (b"multi chip dry run: the quick brown fox jumps over the lazy "
            b"dog 0123456789 " * 64)
    parts = []
    while sum(map(len, parts)) < n:
        parts.append(text)
        parts.append(rng.integers(0, 256, 8192, dtype=np.uint8).tobytes())
        parts.append(rng.integers(0, 8, 16384, dtype=np.uint8).tobytes())
        parts.append(bytes(4096))
    return b"".join(parts)[:n]


def dryrun_multichip(n_devices: int) -> None:
    """Compile + execute the REAL multi-chip compression path.

    Compresses a multi-block mixed corpus through the mesh-sharded device
    entropy engines (real per-chunk tables, real frames, real end marker)
    across four configs — Huffman, rANS order 0 AND order 1 (per-chunk
    order-1 context tables shard over the mesh), and a level-5-style
    transform chain (host TEXT+UTF+BWT+RANK+ZRLT, mesh ANS0 entropy) with
    64-bit block checksums — and asserts every stream is byte-identical to
    the single-host C++ stream and decompresses to the input, both on host
    and through the mesh-sharded decode hooks. Used by the driver with
    XLA_FLAGS=--xla_force_host_platform_device_count=N to validate the
    multi-chip path without N real chips; also keeps the shard_map
    compress-step smoke test for the collective plumbing.
    """
    import kanzi_tpu

    mesh = device_mesh(n_devices)
    corpus = _dryrun_corpus(max(n_devices, 4) * (1 << 18) + 12345)
    # Level matrix (VERDICT r4, next #5): the ACTUAL level presets for a
    # fast-LZ level (L1), a BWT level (L5), and a context-model level (L8,
    # TPAQ — host per-block engine inside the mesh Writer), plus the
    # device-engine entropy configs (Huffman lanes, rANS order 0/1 tables
    # sharded over the mesh). Reference io-layer concurrency invariants:
    # v2/io/CompressedStream.go:658-698,1798-1856.
    configs = (
        ("L1", "LZX", "NONE", 32),
        ("huffman-mesh", "LZ", "HUFFMAN", 32),
        ("ans0-mesh", "NONE", "ANS0", 32),
        ("ans1-mesh", "NONE", "ANS1", 32),          # order-1 context tables
        ("L5", "TEXT+UTF+BWT+RANK+ZRLT", "ANS0", 64),
        ("L8", "EXE+RLT+TEXT+UTF+DNA", "TPAQ", 32),
    )
    for label, transform, entropy, cksum in configs:
        blob = compress_multichip(corpus, mesh, transform=transform,
                                  entropy=entropy, block_size=1 << 18,
                                  checksum=cksum)
        host = kanzi_tpu.compress(corpus, transform=transform,
                                  entropy=entropy, block_size=1 << 18,
                                  checksum=cksum)
        assert blob == host, f"{label} ({transform}&{entropy}): mesh stream != host"
        assert kanzi_tpu.decompress(blob) == corpus
        # the decode-side mirror: entropy stage sharded over the mesh
        assert decompress_multichip(blob, mesh) == corpus, \
            f"{label}: mesh decode != input"
        print(f"dryrun_multichip[{label}]: {transform}&{entropy} "
              f"byte-identical both directions on the {n_devices}-mesh")

    # collective plumbing smoke (psum over the mesh)
    B = n_devices * 2
    N = 1024
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 64, (B, N), dtype=np.uint8)
    L = 4 * B
    frag = 256
    syms = np.zeros((L, frag), dtype=np.int32)
    syms[:, :N // 4] = blocks.repeat(4, axis=0)[:, : N // 4]
    lane_len = np.full(L, N // 4, dtype=np.int32)
    table_idx = np.arange(L, dtype=np.int32) // 4 % 2
    tables = np.full((2, 256), (8 << 12) | 0x55, dtype=np.int32)
    fn = compress_step(mesh)
    histos, ent, words, nbits, total = fn(blocks, syms, lane_len, table_idx,
                                          tables)
    jax.block_until_ready((histos, ent, words, nbits, total))
    assert int(total) == int(np.sum(np.asarray(nbits)))
