"""kanzi_tpu — a TPU-native lossless data-compression framework.

A from-scratch re-design of the capabilities of the reference compressor
(flanglet/kanzi-go, KANZ bitstream v6): block transforms + entropy coding
over independently decodable blocks, built TPU-first:

- `kanzi_tpu.ops`      — JAX/XLA/Pallas device kernels for the batchable hot
                         loops (histograms, Huffman lanes, rANS lanes, BWT
                         inverse cursors)
- `kanzi_tpu.parallel` — block data-parallelism over a `jax.sharding.Mesh`
- `kanzi_tpu.native`   — C++ host runtime for the bit-serial loops (suffix
                         sort, adaptive coders) and frame splicing
- `kanzi_tpu.kio`      — the KANZ v6 stream container (Writer/Reader)
- `kanzi_tpu.app`      — kanzi-compatible CLI

Public convenience API:

    >>> import kanzi_tpu
    >>> blob = kanzi_tpu.compress(data, level=5)
    >>> assert kanzi_tpu.decompress(blob) == data
"""

from __future__ import annotations

import io as _io


def _tune_allocator() -> None:
    """Keep large allocations in the (warm) heap instead of fresh mmaps.

    glibc serves blocks above M_MMAP_THRESHOLD from anonymous mmaps and
    munmaps them on free, so every multi-MB buffer (every `bytes` of a block,
    every numpy scratch) pays the full page-fault cost again. On hosts with
    slow fault paths this caps the whole codec at ~200 MB/s. Raising the
    threshold and disabling trim makes the heap grow once and stay warm.
    """
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD
        libc.mallopt(-2, 1 << 24)   # M_TOP_PAD
    except Exception:
        pass  # non-glibc platform: defaults apply


_tune_allocator()

from .core import KanziError  # noqa: F401
from .kio import Reader, Writer  # noqa: F401

__version__ = "0.5.0"  # keep in sync with pyproject.toml

# Level presets: level -> (transform chain, entropy codec)
# (reference: v2/app/BlockCompressor.go:665-700)
LEVEL_PRESETS = {
    0: ("NONE", "NONE"),
    1: ("LZX", "NONE"),
    2: ("DNA+LZ", "HUFFMAN"),
    3: ("TEXT+UTF+PACK+MM+LZX", "HUFFMAN"),
    4: ("TEXT+UTF+EXE+PACK+MM+ROLZ", "NONE"),
    5: ("TEXT+UTF+BWT+RANK+ZRLT", "ANS0"),
    6: ("TEXT+UTF+BWT+SRT+ZRLT", "FPAQ"),
    7: ("LZP+TEXT+UTF+BWT+LZP", "CM"),
    8: ("EXE+RLT+TEXT+UTF+DNA", "TPAQ"),
    9: ("EXE+RLT+TEXT+UTF+DNA", "TPAQX"),
}

# Default block sizes per level (reference: v2/app/BlockCompressor.go:188-201)
DEFAULT_BLOCK_SIZE = 4 * 1024 * 1024


def block_size_for_level(level: int) -> int:
    if level == 6:
        return 8 * 1024 * 1024
    if level in (7, 8):
        return 16 * 1024 * 1024
    if level == 9:
        return 32 * 1024 * 1024
    return DEFAULT_BLOCK_SIZE


def compress(data, level: int | None = None, transform: str | None = None,
             entropy: str | None = None, block_size: int | None = None,
             jobs: int = 1, checksum: int = 0, headerless: bool = False,
             skip: bool = False) -> bytes:
    """One-shot compression to a KANZ v6 stream.

    ``skip`` enables incompressible-block detection (the CLI's ``-s``:
    magic-typed or high-entropy blocks are stored as copies — reference
    BlockCompressor ``skipBlocks``)."""
    if level is not None:
        if not 0 <= level <= 9:
            raise KanziError(f"Invalid compression level: {level}")
        transform, entropy = LEVEL_PRESETS[level]
        if block_size is None:
            block_size = block_size_for_level(level)
    transform = transform or "NONE"
    entropy = entropy or "NONE"
    block_size = block_size or DEFAULT_BLOCK_SIZE
    w = Writer(None, transform=transform, entropy=entropy, block_size=block_size,
               jobs=jobs, checksum=checksum, file_size=len(data),
               headerless=headerless,
               ctx={"skipBlocks": True} if skip else None)
    if w._os is None and not w._use_native:
        w._os = _io.BytesIO()  # legacy path needs a sink
    w.write(data)
    w.close()
    if w._os is None:
        return w.getvalue()
    return w._os.getvalue()


def decompress(data, jobs: int = 1, headerless: bool = False,
               ctx: dict | None = None) -> bytes:
    """One-shot decompression of a KANZ stream."""
    r = Reader(data, jobs=jobs, headerless=headerless, ctx=ctx)
    try:
        return r.read_all()
    finally:
        r.close()


def compress_stream(src, dst, level: int | None = None,
                    transform: str | None = None, entropy: str | None = None,
                    block_size: int | None = None, jobs: int = 1,
                    checksum: int = 0, chunk_size: int = 1 << 20) -> int:
    """Constant-memory streaming compression: read `src` (file-like) in
    chunks, write a KANZ v6 stream to `dst` (file-like). Returns the number
    of input bytes consumed. Library-level mirror of the reference's
    NewWriter + io.Copy idiom (v2/io/CompressedStream.go:166-991); the CLI
    uses the same Writer directly."""
    if level is not None:
        if not 0 <= level <= 9:
            raise KanziError(f"Invalid compression level: {level}")
        transform, entropy = LEVEL_PRESETS[level]
        if block_size is None:
            block_size = block_size_for_level(level)
    w = Writer(dst, transform=transform or "NONE", entropy=entropy or "NONE",
               block_size=block_size or DEFAULT_BLOCK_SIZE, jobs=jobs,
               checksum=checksum)
    total = 0
    try:
        while True:
            chunk = src.read(chunk_size)
            if not chunk:
                break
            w.write(chunk)
            total += len(chunk)
    finally:
        w.close()
    return total


def decompress_stream(src, dst, jobs: int = 1,
                      chunk_size: int = 1 << 20) -> int:
    """Constant-memory streaming decompression from `src` (file-like KANZ
    stream) into `dst` (file-like). Returns the number of bytes written."""
    r = Reader(src, jobs=jobs)
    total = 0
    try:
        while True:
            out = r.read(chunk_size)
            if not out:
                break
            dst.write(out)
            total += len(out)
    finally:
        r.close()
    return total
