#!/usr/bin/env python3
"""Benchmark driver entry point.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: level-1 encode throughput (GB/s) on a deterministic
silesia-like mixed corpus, single chip + host. vs_baseline compares against
the reference's published level-1 encode on its 16-core desktop
(211,957,760 bytes / 173 ms = 1.225 GB/s, reference README.md:66 /
BASELINE.md) — the machine-level number the README reports.

Extra detail (levels matrix, device-kernel throughput) goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_L1_ENCODE_GBPS = 211_957_760 / 0.173 / 1e9  # reference machine


def synth_corpus(size: int = 64 << 20) -> bytes:
    """Deterministic mixed corpus (text/binary/dna/random), silesia-like."""
    rng = np.random.default_rng(0x4B414E5A)
    parts = []
    try:
        text = open("/root/repo/SURVEY.md", "rb").read()
    except OSError:
        text = b"the quick brown fox jumps over the lazy dog. " * 1024
    # ~45% text-like
    while sum(map(len, parts)) < int(size * 0.45):
        parts.append(text)
    # ~20% structured binary (correlated int32 deltas)
    n = int(size * 0.20) // 4
    vals = np.cumsum(rng.integers(-3, 4, n, dtype=np.int32)).astype("<i4")
    parts.append(vals.tobytes())
    # ~10% DNA
    dna = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, int(size * 0.10))]
    parts.append(dna.tobytes())
    # ~10% zeros with sparse noise
    z = np.zeros(int(size * 0.10), dtype=np.uint8)
    idx = rng.integers(0, len(z), len(z) // 50)
    z[idx] = rng.integers(1, 256, len(idx), dtype=np.uint8)
    parts.append(z.tobytes())
    # ~15% incompressible
    parts.append(rng.integers(0, 256, int(size * 0.15), dtype=np.uint8).tobytes())
    blob = b"".join(parts)[:size]
    return blob


def bench_level(data: bytes, level: int, repeat: int = 1):
    import kanzi_tpu

    best_enc = best_dec = 0.0
    blob = b""
    for _ in range(repeat):
        t = time.perf_counter()
        blob = kanzi_tpu.compress(data, level=level)
        enc = len(data) / (time.perf_counter() - t)
        t = time.perf_counter()
        out = kanzi_tpu.decompress(blob)
        dec = len(data) / (time.perf_counter() - t)
        assert out == data, f"roundtrip failed at level {level}"
        best_enc = max(best_enc, enc)
        best_dec = max(best_dec, dec)
    return best_enc, best_dec, len(blob)


def bench_device_kernel():
    """Device Huffman pack throughput (bytes of symbols packed per second)."""
    try:
        import jax
        from kanzi_tpu.ops import huffman as oh
        rng = np.random.default_rng(1)
        L = 512  # 512 lanes = 2 MiB of symbols per invocation
        syms = rng.integers(0, 256, (L, oh.FRAG), dtype=np.int32)
        lane_len = np.full(L, oh.FRAG, dtype=np.int32)
        tidx = np.zeros(L, dtype=np.int32)
        tables = ((8 << 12) | np.arange(256, dtype=np.int32))[None, :]
        fn = jax.jit(oh.pack_lanes)
        out = fn(syms, lane_len, tidx, tables)
        jax.block_until_ready(out)  # compile
        t = time.perf_counter()
        iters = 8
        for _ in range(iters):
            out = fn(syms, lane_len, tidx, tables)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t
        return iters * L * oh.FRAG / dt, str(jax.devices()[0])
    except Exception as e:  # pragma: no cover
        return 0.0, f"unavailable: {e}"


def main():
    data = synth_corpus()
    detail = {}

    enc1, dec1, sz1 = bench_level(data, 1, repeat=2)
    detail["level1"] = {"enc_gbps": enc1 / 1e9, "dec_gbps": dec1 / 1e9,
                        "ratio": sz1 / len(data)}
    for lv in (2, 5):
        enc, dec, sz = bench_level(data[: 16 << 20], lv)
        detail[f"level{lv}"] = {"enc_gbps": enc / 1e9, "dec_gbps": dec / 1e9,
                                "ratio": sz / (16 << 20)}

    dev_bps, dev_name = bench_device_kernel()
    detail["device_huffman_pack_gbps"] = dev_bps / 1e9
    detail["device"] = dev_name
    print(json.dumps(detail), file=sys.stderr)

    print(json.dumps({
        "metric": "silesia-like mixed corpus encode GB/s (level 1, single chip)",
        "value": round(enc1 / 1e9, 4),
        "unit": "GB/s",
        "vs_baseline": round(enc1 / 1e9 / BASELINE_L1_ENCODE_GBPS, 4),
    }))


if __name__ == "__main__":
    main()
