#!/usr/bin/env python3
"""Benchmark driver entry point.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: level-1 encode throughput (GB/s) on a deterministic
silesia-like mixed corpus, single chip + host. vs_baseline compares against
the reference's published level-1 encode on its 16-core desktop
(211,957,760 bytes / 173 ms = 1.225 GB/s, reference README.md:66 /
BASELINE.md) — the machine-level number the README reports. This host
exposes ONE CPU core (the reference machine has 16), so vs_baseline
under-reports per-core efficiency by design; the per-level matrix and the
per-core comparison go to stderr.

Extra detail on stderr: encode+decode GB/s and ratio for every level 0-9,
the reference's per-core-equivalent throughput, and the device Huffman pack
kernel throughput (compute only, and with result readback through the
tunnel).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_L1_ENCODE_GBPS = 211_957_760 / 0.173 / 1e9  # reference machine
REFERENCE_CORES = 16

# reference silesia.tar numbers (ms for 211,957,760 bytes), README.md:66-87
REF_MS = {1: (173, 75), 2: (137, 88), 3: (230, 112), 4: (448, 185),
          5: (940, 398), 6: (1255, 973), 7: (1714, 1227),
          8: (8362, 7943), 9: (17944, 17512)}
REF_BYTES = 211_957_760


def synth_corpus(size: int = 64 << 20) -> bytes:
    """Deterministic mixed corpus (text/binary/dna/random), silesia-like."""
    rng = np.random.default_rng(0x4B414E5A)
    parts = []
    try:
        text = open("/root/repo/SURVEY.md", "rb").read()
    except OSError:
        text = b"the quick brown fox jumps over the lazy dog. " * 1024
    # ~45% text-like: repeated document with per-copy perturbations so the
    # mix is compressible but not degenerate
    tpart = []
    while sum(map(len, tpart)) < int(size * 0.45):
        arr = np.frombuffer(text, dtype=np.uint8).copy()
        idx = rng.integers(0, len(arr), len(arr) // 64)
        arr[idx] = rng.integers(32, 127, len(idx), dtype=np.uint8)
        tpart.append(arr.tobytes())
    parts.append(b"".join(tpart))
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
    # interleave the segments in 1 MiB strides so every block sees the mix
    arr = np.frombuffer(blob, dtype=np.uint8)
    m = (len(arr) >> 20) << 20
    strided = arr[:m].reshape(-1, 1 << 20)
    order = rng.permutation(len(strided))
    return strided[order].tobytes() + arr[m:].tobytes()


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
    """Device Huffman pack throughput.

    Returns (compute-only bytes/s, with-readback bytes/s, device name).
    Compute-only reflects co-located deployments where results stream onward
    on-device; with-readback is what this tunnel environment pays. Timings
    always end in a device_get: under the tunneled 'axon' platform,
    block_until_ready alone does not reliably synchronize, so compute-only
    is derived from the DIFFERENCE of an N-iteration and a 1-iteration run
    (each ending in one readback)."""
    try:
        import jax
        from kanzi_tpu.ops import huffman as oh
        rng = np.random.default_rng(1)
        L = 512  # 512 lanes = 2 MiB of symbols per invocation
        syms = rng.integers(0, 256, (L, oh.FRAG), dtype=np.uint8)
        lane_len = np.full(L, oh.FRAG, dtype=np.int32)
        tidx = np.zeros(L, dtype=np.int32)
        tables = ((8 << 12) | np.arange(256, dtype=np.int32))[None, :]
        fn = jax.jit(oh.pack_lanes)
        jax.device_get(fn(syms, lane_len, tidx, tables))  # compile

        def run(iters):
            t = time.perf_counter()
            for _ in range(iters):
                out = fn(syms, lane_len, tidx, tables)
            jax.device_get(out)
            return time.perf_counter() - t

        t1 = run(1)
        tn = run(5)
        compute = 4 * L * oh.FRAG / max(tn - t1, 1e-9)
        readback = L * oh.FRAG / t1
        return compute, readback, str(jax.devices()[0])
    except Exception as e:  # pragma: no cover
        return 0.0, 0.0, f"unavailable: {e}"


def bench_device_ans():
    """Device rANS encode + decode compute throughput (bytes/s), batch of
    128 chunks (2 MiB), same difference-timing discipline."""
    try:
        import jax
        from kanzi_tpu import native
        from kanzi_tpu.ops import ans as oa
        rng = np.random.default_rng(2)
        data = rng.integers(0, 64, 128 * 16384, dtype=np.uint8).tobytes()
        n = len(data)
        src = np.frombuffer(data, np.uint8)
        tables, hdr, hdr_bits, flags = native.ans_prepare(src, 0)
        mats = [oa.build_syms_order0(src[c * 16384:(c + 1) * 16384])
                for c in range(len(flags))]
        syms = np.stack(mats).astype(np.int32)
        ngroups = np.full(len(mats), syms.shape[1], np.int32)
        enc = jax.jit(oa.encode_chunks)
        jax.device_get(enc(syms, ngroups, tables))

        def run_enc(iters):
            t = time.perf_counter()
            for _ in range(iters):
                out = enc(syms, ngroups, tables)
            jax.device_get(out)
            return time.perf_counter() - t

        enc_bps = 2 * n / max(run_enc(3) - run_enc(1), 1e-9)

        payload, _bits = native.entropy_encode(5, src, {"bsVersion": 6})
        dtabs, f2s, states, bufs, dflags, aux = \
            native.ans_dec_prepare(np.frombuffer(payload, np.uint8), n, 0)
        dev = np.nonzero(dflags == 0)[0]
        ng = np.full(len(dev), 4096, np.int32)

        def run_dec(iters):
            t = time.perf_counter()
            for _ in range(iters):
                out = oa.decode_chunks(bufs[dev], states[dev], f2s[dev],
                                       dtabs[dev], ng, 0, 12, 4096)
            jax.device_get(out)
            return time.perf_counter() - t

        run_dec(1)  # compile
        dec_bps = 2 * n / max(run_dec(3) - run_dec(1), 1e-9)
        return enc_bps, dec_bps
    except Exception:  # pragma: no cover
        return 0.0, 0.0


def bench_device_batch_curve(budget_s: float = 300.0):
    """Wide-batch amortization curve: Huffman pack + rANS encode/decode at
    1/16/64/256 blocks (256 KiB each) per dispatch, compute-only GB/s with
    device-resident inputs (difference-of-runs ending in device_get).
    Answers whether batching finds a crossover vs the ~0.27 GB/s host core;
    measured verdict in docs/ARCHITECTURE.md.  Time-budgeted: later points
    are skipped (not recorded) if the budget runs out."""
    out = {}
    try:
        import jax
        from kanzi_tpu import native
        from kanzi_tpu.ops import ans as oa
        from kanzi_tpu.ops import huffman as oh
        rng = np.random.default_rng(42)
        t_start = time.perf_counter()
        CHUNK = 16384

        def diff_time(fn, np_args):
            dev = jax.device_put(np_args)
            o = fn(*dev)
            jax.device_get(o)

            def run(k):
                t = time.perf_counter()
                r = None
                for _ in range(k):
                    r = fn(*dev)
                jax.device_get(r)
                return time.perf_counter() - t

            t1 = run(1)
            return max(run(2) - t1, 1e-9)

        for nblocks in (1, 16, 64, 256):
            if time.perf_counter() - t_start > budget_s:
                break
            nchunks = nblocks * 16
            nbytes = nblocks * (256 << 10)
            data = rng.integers(0, 64, nbytes, dtype=np.uint8)
            L = nchunks * 4
            syms = data.reshape(L, oh.FRAG).astype(np.int32)
            tabs = np.stack([native.huffman_prepare(
                data[c * CHUNK:(c + 1) * CHUNK])[0].astype(np.int32)[0]
                for c in range(nchunks)])
            t = diff_time(jax.jit(oh.pack_lanes),
                          (syms, np.full(L, oh.FRAG, np.int32),
                           np.repeat(np.arange(nchunks, dtype=np.int32), 4),
                           tabs))
            out[f"device_huffman_pack_batch{nblocks}_gbps"] = \
                round(nbytes / t / 1e9, 4)
            if time.perf_counter() - t_start > budget_s:
                break
            atabs, _, _, _ = native.ans_prepare(data, 0)
            esyms = np.stack([oa.build_syms_order0(
                data[c * CHUNK:(c + 1) * CHUNK])
                for c in range(nchunks)]).astype(np.int32)
            t = diff_time(jax.jit(oa.encode_chunks),
                          (esyms, np.full(nchunks, esyms.shape[1], np.int32),
                           atabs))
            out[f"device_ans_encode_batch{nblocks}_gbps"] = \
                round(nbytes / t / 1e9, 4)
            if time.perf_counter() - t_start > budget_s:
                break
            payload, _ = native.entropy_encode(5, data, {"bsVersion": 6})
            dtabs, f2s, states, bufs, dflags, aux = native.ans_dec_prepare(
                np.frombuffer(payload, np.uint8), nbytes, 0)
            dev_rows = np.nonzero(dflags == 0)[0]

            def dec(b, s, f, d, g):
                return oa.decode_chunks(b, s, f, d, g, 0, 12, 4096)

            t = diff_time(jax.jit(dec),
                          (bufs[dev_rows], states[dev_rows], f2s[dev_rows],
                           dtabs[dev_rows],
                           np.full(len(dev_rows), 4096, np.int32)))
            out[f"device_ans_decode_batch{nblocks}_gbps"] = \
                round(nbytes / t / 1e9, 4)
    except Exception:
        pass
    return out


def main():
    data = synth_corpus()
    detail = {"levels": {}}

    enc1, dec1, sz1 = bench_level(data, 1, repeat=2)
    detail["levels"]["1"] = {
        "enc_gbps": round(enc1 / 1e9, 4), "dec_gbps": round(dec1 / 1e9, 4),
        "ratio": round(sz1 / len(data), 4)}

    slice16 = data[: 16 << 20]
    slice4 = data[: 4 << 20]
    for lv in (0, 2, 3, 4, 5, 6, 7, 8, 9):
        d = slice4 if lv >= 8 else slice16
        # levels 5-9: first run faults the pooled hot-path tables once per
        # process (TPAQ ~800 MB at TPAQX sizes; BWT levels ~40 MB of
        # suffix-sort scratch); report the steady state
        enc, dec, sz = bench_level(d, lv, repeat=2 if lv >= 5 else 1)
        detail["levels"][str(lv)] = {
            "enc_gbps": round(enc / 1e9, 4), "dec_gbps": round(dec / 1e9, 4),
            "ratio": round(sz / len(d), 4)}

    # per-core-equivalent comparison vs the 16-core reference machine
    ref_core = {}
    for lv, (e_ms, d_ms) in REF_MS.items():
        ref_core[str(lv)] = {
            "enc_gbps_per_core": round(REF_BYTES / (e_ms / 1e3) / 1e9 / REFERENCE_CORES, 4),
            "dec_gbps_per_core": round(REF_BYTES / (d_ms / 1e3) / 1e9 / REFERENCE_CORES, 4)}
    detail["reference_per_core"] = ref_core
    detail["host_cores"] = 1

    # Emit the essential record (headline + level matrix) BEFORE the slow
    # device section, flushed, so a driver timeout mid-device-bench cannot
    # lose the core numbers.
    print(json.dumps({
        "metric": "silesia-like mixed corpus encode GB/s (level 1, 1 host core + 1 chip)",
        "value": round(enc1 / 1e9, 4),
        "unit": "GB/s",
        "vs_baseline": round(enc1 / 1e9 / BASELINE_L1_ENCODE_GBPS, 4),
    }), flush=True)
    print(json.dumps({"levels": detail["levels"],
                      "reference_per_core": ref_core}),
          file=sys.stderr, flush=True)

    compute, readback, dev_name = bench_device_kernel()
    detail["device_huffman_pack_compute_gbps"] = round(compute / 1e9, 4)
    detail["device_huffman_pack_readback_gbps"] = round(readback / 1e9, 4)
    detail["device"] = dev_name
    ans_enc, ans_dec = bench_device_ans()
    detail["device_ans_encode_compute_gbps"] = round(ans_enc / 1e9, 4)
    detail["device_ans_decode_compute_gbps"] = round(ans_dec / 1e9, 4)
    detail["device_timing_note"] = (
        "round 2 fixed device timing to difference-of-runs ending in a "
        "device_get (block_until_ready does not synchronize under the "
        "tunneled axon platform, so earlier 'compute' numbers only measured "
        "enqueue). Per-dispatch numbers here include per-call transfer+RTT "
        "and, for the scan kernels, the ~20us/step sequential scan latency "
        "that amortizes only with much wider batches than one block")
    try:
        import jax
        import jax.numpy as jnp
        from kanzi_tpu.ops.pallas_kernels import block_stats_pallas
        rng = np.random.default_rng(2)
        blocks = jnp.asarray(rng.integers(0, 256, (16, 1 << 20), dtype=np.uint8))
        out = block_stats_pallas(blocks)
        jax.block_until_ready(out)
        t = time.perf_counter()
        for _ in range(5):
            out = block_stats_pallas(blocks)
        jax.block_until_ready(out)
        detail["pallas_block_stats_gbps"] = round(
            5 * 16 * (1 << 20) / (time.perf_counter() - t) / 1e9, 2)
    except Exception:
        detail["pallas_block_stats_gbps"] = 0.0
    curve = bench_device_batch_curve()
    detail.update(curve)
    detail["device_batch_curve_note"] = (
        "wide-batch amortization measured in round 3 (full 4-point run in "
        "docs/ARCHITECTURE.md): compute throughput plateaus at 0.02-0.08 "
        "GB/s at EVERY width 1..256 blocks — dispatch latency amortizes but "
        "per-symbol table gathers dominate; the v5e has no fast random "
        "gather, so batching never approaches the 0.27 GB/s host core. "
        "Device entropy stays correctness-complete and opt-in.")
    print(json.dumps(detail), file=sys.stderr, flush=True)
    # the curve also gets its own stderr line so driver tail truncation
    # cannot lose it
    print(json.dumps({"device_batch_curve": curve}), file=sys.stderr,
          flush=True)
    # Re-print the per-level matrix as the LAST stderr line: the driver
    # records only the tail of combined output, and the full detail line
    # above is long enough that its head (level 1!) was truncated out of
    # BENCH_r02.json.  tools/gen_readme_perf.py parses this from the tail.
    print(json.dumps({"levels": detail["levels"],
                      "reference_per_core": detail["reference_per_core"]}),
          file=sys.stderr, flush=True)



if __name__ == "__main__":
    main()
