"""Seeded randomized differential fuzz against the spec models.

The pinned vectors in test_format_vectors.py are static; this harness keeps
probing the space between them (VERDICT r3, next #3; reference test style
v2/entropy/Entropy_test.go:590-640): every run draws FRESH seeded-random
inputs — sizes crossing the codecs' chunk boundaries, one generator per
dataType class — and asserts, for every entropy codec and a set of
transforms, that the engine's bytes equal the spec model's bytes (encode
direction) and that the engine decodes its own bytes back (inverse
direction). The spec models are deliberately-literal Go transcriptions, so
a divergence must be introduced twice to slip through.

Seeding:
- base seed: $KANZI_FUZZ_SEED if set, else fresh entropy (printed on
  failure); per-case seeds derive deterministically from it.
- every failure is appended to tests/fuzz_corpus/regressions.json
  (committed); all committed regression entries re-run first in every
  session, so a once-found divergence becomes a permanent fixture.

Scope: quick slice by default (~1 min); `-m slow` widens to every
generator x chunk-boundary size plus the slow spec models (TPAQ, ROLZ)
(~5 min nightly target).
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from kanzi_tpu import entropy as ke
from kanzi_tpu import transforms as kt

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CORPUS_DIR = os.path.join(HERE, "fuzz_corpus")
REGRESSIONS = os.path.join(CORPUS_DIR, "regressions.json")
# crash journal: the current case descriptor is written here BEFORE it
# executes, so a hard native crash (segfault aborts pytest without running
# any failure handler) still leaves the reproducing seed on disk. The
# round-4 review lost its original in-suite crash seed exactly this way.
LAST_CASE = os.path.join(CORPUS_DIR, "last_case.json")


def _pre_draw(descriptor: dict) -> None:
    os.makedirs(CORPUS_DIR, exist_ok=True)
    with open(LAST_CASE, "w") as f:
        json.dump({"base_seed": BASE_SEED, **descriptor}, f)

_env_seed = os.environ.get("KANZI_FUZZ_SEED")
# explicit seed (including 0) must be honored for reproduction
BASE_SEED = int(_env_seed) if _env_seed is not None \
    else int.from_bytes(os.urandom(4), "little")


def _case_seed(*parts) -> int:
    h = 0xCBF29CE484222325
    for p in (BASE_SEED,) + parts:
        for b in str(p).encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFF


# ---------------------------------------------------------------------------
# input generators, one per dataType class (reference DetectSimpleType)
# ---------------------------------------------------------------------------

def _gen_text(rng, n):
    words = [bytes(rng.integers(97, 123, rng.integers(2, 10),
                                dtype=np.uint8)) for _ in range(64)]
    out = bytearray()
    while len(out) < n:
        out += words[int(rng.integers(0, 64))]
        out += b" " if rng.random() < 0.9 else b".\n"
    return bytes(out[:n])


def _gen_dna(rng, n):
    return np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, n)].tobytes()


def _gen_random(rng, n):
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def _gen_skewed(rng, n):
    p = np.array([0.5, 0.2, 0.1] + [0.2 / 253] * 253)
    return rng.choice(256, n, p=p / p.sum()).astype(np.uint8).tobytes()


def _gen_runs(rng, n):
    out = bytearray()
    while len(out) < n:
        out += bytes([int(rng.integers(0, 8))]) * int(rng.integers(1, 300))
    return bytes(out[:n])


def _gen_sparse_zeros(rng, n):
    a = np.zeros(n, dtype=np.uint8)
    idx = rng.integers(0, n, max(1, n // 40))
    a[idx] = rng.integers(1, 256, len(idx), dtype=np.uint8)
    return a.tobytes()


def _gen_binary_delta(rng, n):
    v = np.cumsum(rng.integers(-4, 5, (n + 3) // 4, dtype=np.int32))
    return v.astype("<i4").tobytes()[:n]


def _gen_utf8(rng, n):
    out = bytearray()
    while len(out) < n:
        r = rng.random()
        if r < 0.6:
            out += bytes([int(rng.integers(0x20, 0x7F))])
        elif r < 0.85:
            out += chr(int(rng.integers(0x80, 0x800))).encode()
        else:
            out += chr(int(rng.integers(0x800, 0x3000))).encode()
    return bytes(out[:n])


def _gen_exe(rng, n):
    out = bytearray()
    while len(out) < n:
        k = int(rng.integers(0, 5))
        if k == 0:  # call rel32
            out += b"\xe8" + int(rng.integers(-(1 << 16), 1 << 16)
                                 ).to_bytes(4, "little", signed=True)
        elif k == 1:  # jcc rel8
            out += bytes([0x74 + int(rng.integers(0, 2)),
                          int(rng.integers(2, 100))])
        elif k == 2:  # mov reg,[rbp-d8]
            out += bytes([0x48, 0x8B, 0x45, int(rng.integers(128, 256))])
        elif k == 3:
            out += bytes([0x55, 0x48, 0x89, 0xE5])
        else:
            out += bytes([int(rng.integers(0, 256))])
    return bytes(out[:n])


GENERATORS = {
    "text": _gen_text, "dna": _gen_dna, "random": _gen_random,
    "skewed": _gen_skewed, "runs": _gen_runs, "zeros": _gen_sparse_zeros,
    "bindelta": _gen_binary_delta, "utf8": _gen_utf8, "exe": _gen_exe,
}

# sizes crossing the entropy codecs' chunk boundaries (Huffman/ANS chunks
# are 16 KiB / 32 KiB class) plus odd lengths
QUICK_SIZES = (16383, 16385)
SLOW_SIZES = (1, 7, 255, 4096, 16383, 16384, 16385, 32769, 65537)


# ---------------------------------------------------------------------------
# spec-model dispatch
# ---------------------------------------------------------------------------

def _spec_entropy(codec: str, data: bytes):
    import sys
    sys.path.insert(0, HERE)
    from specmodel import ans as sans
    from specmodel import huffman as shuf
    if codec == "HUFFMAN":
        return shuf.huffman_encode(data)
    if codec == "ANS0":
        return sans.ans_encode(data, 0)
    if codec == "ANS1":
        return sans.ans_encode(data, 1)
    if codec == "RANGE":
        from specmodel.range_codec import range_encode
        return range_encode(data)
    if codec == "FPAQ":
        from specmodel.fpaq import fpaq_encode
        return fpaq_encode(data)
    if codec == "CM":
        from specmodel.binary_cm import binary_encode, SpecCMPredictor
        return binary_encode(data, SpecCMPredictor())
    if codec in ("TPAQ", "TPAQX"):
        from specmodel.binary_cm import binary_encode
        from specmodel.tpaq import SpecTPAQPredictor
        pred = SpecTPAQPredictor(block_size=65536, size=len(data),
                                 extra=(codec == "TPAQX"))
        return binary_encode(data, pred)
    raise KeyError(codec)


def _spec_transform(name: str, data: bytes):
    """Returns spec forward bytes or None for 'skip'."""
    import sys
    sys.path.insert(0, HERE)
    if name in ("ZRLT", "RLT", "SRT"):
        from specmodel import scans
        try:
            if name == "RLT":
                # engine ctx uses entropy=NONE -> the reference's fast-
                # entropy escape path (RLT.go: escape 0xFB, no histogram)
                return scans.rlt_forward(data, fast_entropy=True)
            fn = {"ZRLT": scans.zrlt_forward,
                  "SRT": scans.srt_forward}[name]
            return fn(data)
        except scans.SpecSkip:
            return None
    if name in ("MTFT", "RANK"):
        from specmodel import scans
        return scans.sbrt_forward(data, "MTF" if name == "MTFT" else "RANK")
    if name in ("LZ", "LZX"):
        from specmodel.lzx import lzx_forward, LZXSkip
        try:
            return lzx_forward(data, extra=(name == "LZX"))
        except LZXSkip:
            return None
    if name == "UTF":
        from specmodel.content_aware import utf_forward, SpecSkip
        try:
            return utf_forward(data)
        except SpecSkip:
            return None
    if name == "PACK":
        from specmodel.content_aware import alias_forward, SpecSkip
        try:
            return alias_forward(data)
        except SpecSkip:
            return None
    raise KeyError(name)


def _engine_transform(name: str, data: bytes):
    """Engine forward bytes or None for 'skip'."""
    ctx = {"bsVersion": 6, "blockSize": max(len(data), 1024),
           "entropy": "NONE", "jobs": 1}
    seq = kt.new_sequence(ctx, kt.get_type(name))
    out, flags = seq.forward(np.frombuffer(data, np.uint8))
    if flags & 0x80:
        return None, None
    return bytes(np.asarray(out).tobytes()), seq


# ---------------------------------------------------------------------------
# failure persistence
# ---------------------------------------------------------------------------

def _record_failure(entry: dict) -> None:
    os.makedirs(CORPUS_DIR, exist_ok=True)
    cur = []
    if os.path.exists(REGRESSIONS):
        cur = json.load(open(REGRESSIONS))
    if entry not in cur:
        cur.append(entry)
        json.dump(cur, open(REGRESSIONS, "w"), indent=1)


def _check_entropy(codec: str, kind: str, size: int, seed: int):
    _pre_draw({"type": "entropy", "codec": codec, "kind": kind,
               "size": size, "seed": seed})
    rng = np.random.default_rng(seed)
    data = GENERATORS[kind](rng, size)
    ctx = {"blockSize": 65536, "size": len(data)}
    try:
        spec_bytes, spec_bits = _spec_entropy(codec, data)
        got_bytes, got_bits = ke.encode(ke.get_type(codec), data, dict(ctx))
        assert (got_bits, bytes(got_bytes)) == (spec_bits, spec_bytes), (
            f"{codec} encode diverged from spec: kind={kind} size={size} "
            f"seed={seed} (base {BASE_SEED})")
        back = ke.decode(ke.get_type(codec), bytes(got_bytes), len(data),
                         dict(ctx))
        assert back == data, (
            f"{codec} decode(encode) != input: kind={kind} size={size} "
            f"seed={seed} (base {BASE_SEED})")
    except AssertionError:
        _record_failure({"type": "entropy", "codec": codec, "kind": kind,
                         "size": size, "seed": seed})
        raise


def _check_transform(name: str, kind: str, size: int, seed: int):
    _pre_draw({"type": "transform", "codec": name, "kind": kind,
               "size": size, "seed": seed})
    rng = np.random.default_rng(seed)
    data = GENERATORS[kind](rng, size)
    try:
        spec = _spec_transform(name, data)
        got, seq = _engine_transform(name, data)
        assert (spec is None) == (got is None), (
            f"{name} skip decision diverged: spec={'skip' if spec is None else 'ok'} "
            f"engine={'skip' if got is None else 'ok'} kind={kind} "
            f"size={size} seed={seed} (base {BASE_SEED})")
        if spec is not None:
            assert got == spec, (
                f"{name} forward diverged from spec: kind={kind} "
                f"size={size} seed={seed} (base {BASE_SEED})")
            back = seq.inverse(np.frombuffer(got, np.uint8))
            assert bytes(np.asarray(back).tobytes()) == data, (
                f"{name} inverse(forward) != input: kind={kind} size={size} "
                f"seed={seed} (base {BASE_SEED})")
    except AssertionError:
        _record_failure({"type": "transform", "codec": name, "kind": kind,
                         "size": size, "seed": seed})
        raise


# ---------------------------------------------------------------------------
# committed regressions always re-run first
# ---------------------------------------------------------------------------

def test_committed_regressions():
    if not os.path.exists(REGRESSIONS):
        pytest.skip("no recorded regressions")
    entries = json.load(open(REGRESSIONS))
    if not entries:
        pytest.skip("no recorded regressions")
    container_seeds = []
    for e in entries:
        if e["type"] == "entropy":
            _check_entropy(e["codec"], e["kind"], e["size"], e["seed"])
        elif e["type"] == "rolz_exe":
            _check_rolz_exe(e["codec"], e["kind"], e["size"], e["seed"])
        elif e["type"] == "legacy":
            _check_legacy(e["codec"], e["kind"], e["size"], e["seed"])
        elif e["type"] == "container":
            container_seeds.append((e["seed"], e.get("v", 1)))
        else:
            _check_transform(e["codec"], e["kind"], e["size"], e["seed"])
    if container_seeds:
        _check_container_batch(container_seeds)


# ---------------------------------------------------------------------------
# quick slice (every CI run): fresh seeds, chunk-boundary sizes
# ---------------------------------------------------------------------------

QUICK_ENTROPY = ("HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ", "CM")
QUICK_KINDS = ("text", "random", "skewed", "runs")


@pytest.mark.parametrize("codec", QUICK_ENTROPY)
def test_entropy_random_differential_quick(codec):
    for i, kind in enumerate(QUICK_KINDS):
        size = QUICK_SIZES[i % len(QUICK_SIZES)]
        _check_entropy(codec, kind, size, _case_seed(codec, kind, size, i))


@pytest.mark.parametrize("name", ("ZRLT", "RLT", "SRT", "MTFT", "RANK",
                                  "LZX", "UTF", "PACK"))
def test_transform_random_differential_quick(name):
    kinds = {"ZRLT": ("zeros", "runs"), "RLT": ("runs", "skewed"),
             "SRT": ("text", "skewed"), "MTFT": ("text", "skewed"),
             "RANK": ("text", "random"), "LZX": ("text", "runs"),
             "UTF": ("utf8", "text"), "PACK": ("dna", "skewed")}[name]
    for i, kind in enumerate(kinds):
        size = QUICK_SIZES[i % len(QUICK_SIZES)]
        _check_transform(name, kind, size, _case_seed(name, kind, size, i))


# ---------------------------------------------------------------------------
# slow sweep (-m slow): every generator x boundary size + slow models
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("codec", QUICK_ENTROPY)
def test_entropy_random_differential_sweep(codec):
    for kind in GENERATORS:
        for size in SLOW_SIZES:
            if size > 20000 and codec in ("FPAQ", "CM"):
                continue  # spec bit loop ~1s per 16 KiB; bound the sweep
            _check_entropy(codec, kind, size,
                           _case_seed("sweep", codec, kind, size))


@pytest.mark.slow
@pytest.mark.parametrize("codec", ("TPAQ", "TPAQX"))
def test_tpaq_random_differential(codec):
    for kind in ("text", "random", "runs"):
        size = 4096 + int(codec == "TPAQX")  # keep the python spec tractable
        _check_entropy(codec, kind, size, _case_seed(codec, kind, size))


@pytest.mark.slow
@pytest.mark.parametrize("name", ("ZRLT", "RLT", "SRT", "MTFT", "RANK",
                                  "LZ", "LZX", "UTF", "PACK"))
def test_transform_random_differential_sweep(name):
    for kind in GENERATORS:
        for size in (255, 4096, 16385, 65537):
            _check_transform(name, kind, size,
                             _case_seed("sweep", name, kind, size))


def _check_rolz_exe(name: str, kind: str, size: int, seed: int):
    """ROLZ/ROLZX/EXE sweep through the raw native transform entry (the
    convention of test_format_vectors): spec forward vs engine forward,
    same skip decisions, engine inverse roundtrip."""
    import sys

    from kanzi_tpu import native
    sys.path.insert(0, HERE)
    from specmodel.exe import SpecSkip as ExeSkip
    from specmodel.exe import exe_forward
    from specmodel.rolz import SpecSkip as RolzSkip
    from specmodel.rolz import rolz1_forward, rolz2_forward

    _pre_draw({"type": "rolz_exe", "codec": name, "kind": kind,
               "size": size, "seed": seed})
    rng = np.random.default_rng(seed)
    data = GENERATORS[kind](rng, size)
    if name == "EXE":
        tt, cap = 9, 4 * max(len(data), 16)
        spec_fn, skip_exc = (lambda d: exe_forward(d, dst_len=cap)), ExeSkip
    else:
        tt = 11 if name == "ROLZ" else 12
        cap = max(len(data) + len(data) // 4 + 64, 1024)
        fn = rolz1_forward if name == "ROLZ" else rolz2_forward
        spec_fn, skip_exc = (lambda d: fn(d, dst_len=cap)), RolzSkip
    try:
        spec = spec_fn(data)
    except skip_exc:
        spec = None
    try:
        out, _ = native.transform_forward(
            tt, np.frombuffer(data, np.uint8), {}, cap)
        got = bytes(out)
    except native.NativeSkip:
        got = None
    try:
        assert (spec is None) == (got is None), (
            f"{name} skip decision diverged: kind={kind} size={size} "
            f"seed={seed} (base {BASE_SEED})")
        if got is not None:
            assert got == spec, (
                f"{name} forward diverged from spec: kind={kind} "
                f"size={size} seed={seed} (base {BASE_SEED})")
            back = native.transform_inverse(
                tt, np.frombuffer(got, np.uint8), {}, len(data))
            assert bytes(back) == data, (
                f"{name} inverse(forward) != input: kind={kind} "
                f"size={size} seed={seed} (base {BASE_SEED})")
    except AssertionError:
        _record_failure({"type": "rolz_exe", "codec": name, "kind": kind,
                         "size": size, "seed": seed})
        raise


def _draw_container_config(seed: int, with_data: bool = True,
                           version: int = 2):
    """The config draw for a container case, separated so the parent
    process can describe a case (for regression entries) without running
    any native code. with_data=False skips generating the input buffer
    (the draws before it are unaffected).

    `version` gates draws appended later so committed regression entries
    keep reproducing the exact config they crashed under: v1 entries
    (no "v" field) replay without the trailing draws; fresh cases use the
    current version. New draws must only ever be APPENDED, behind a
    version bump."""
    rng = np.random.default_rng(seed)
    names = ["BWT", "BWTS", "LZ", "LZX", "LZP", "ROLZ", "ROLZX", "RLT",
             "ZRLT", "MTFT", "RANK", "SRT", "TEXT", "UTF", "PACK", "DNA",
             "MM", "EXE", "NONE"]
    chain = "+".join(names[i] for i in
                     rng.choice(len(names), int(rng.integers(1, 9))))
    entropy = ["NONE", "HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ",
               "CM"][int(rng.integers(0, 7))]
    block_size = int(rng.choice([1024, 16384, 65536, 262144])) + \
        16 * int(rng.integers(0, 4))
    checksum = int(rng.choice([0, 32, 64]))
    headerless = bool(rng.integers(0, 2))
    kind = list(GENERATORS)[int(rng.integers(0, len(GENERATORS)))]
    size = int(rng.integers(1, 200000))
    data = GENERATORS[kind](rng, size) if with_data else None
    skip_blocks = False
    if version >= 2:
        # v2 trailing draws (round 5): incompressible-block detection and
        # magic-typed data, exercising the skipBlocks copy path and the
        # container's dataType classification
        skip_blocks = bool(rng.integers(0, 2))
        if int(rng.integers(0, 4)) == 0 and data is not None and size > 8:
            data = b"\x1f\x8b\x08\x00" + data[4:]  # gzip magic prefix
    return (chain, entropy, block_size, checksum, headerless, kind, size,
            data, skip_blocks)


def _check_container(seed: int):
    _check_container_batch([(seed, 2)])


def _check_container_batch(seeds) -> None:
    """Random container config x random data roundtrips, isolated in ONE
    subprocess for the whole batch: the cases include native one-shot
    triangulation, and a native crash must fail the test with a
    reproducible seed instead of killing pytest (round-4 review lost its
    crash seed to exactly that). The child journals each case descriptor
    to LAST_CASE before executing it and prints `CASE-OK <seed>` after,
    so a dead child pinpoints the failing case without per-case
    interpreter spawns."""
    # each case is (seed, draw-version); bare ints mean current version
    cases = [(c, 2) if isinstance(c, int) else tuple(c) for c in seeds]
    env = dict(os.environ)
    env.update({"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
                # the child journals LAST_CASE; give it the parent's base
                # seed so the journal reproduces this exact session
                "KANZI_FUZZ_SEED": str(BASE_SEED)})
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--container-cases", ",".join(f"{s}:{v}" for s, v in cases)],
        capture_output=True, text=True, env=env, timeout=1800)
    ok = {int(m) for m in re.findall(r"CASE-OK (\d+)", r.stdout)}
    if r.returncode == 0 and ok.issuperset(s for s, _ in cases):
        return
    seed, version = next(((s, v) for s, v in cases if s not in ok),
                         cases[-1])
    (chain, entropy, block_size, checksum, headerless, kind, size,
     _data, _skip) = _draw_container_config(seed, with_data=False,
                                            version=version)
    if not env.get("KANZI_FUZZ_INJECT_SEGV"):
        _record_failure({"type": "container", "codec": chain, "kind": kind,
                         "size": size, "seed": seed, "v": version})
    sig = f" (signal {-r.returncode})" if r.returncode < 0 else ""
    raise AssertionError(
        f"container fuzz failure: chain={chain} entropy={entropy} "
        f"bs={block_size} cks={checksum} headerless={headerless} "
        f"kind={kind} size={size} seed={seed} (base {BASE_SEED}): "
        f"rc={r.returncode}{sig}\n"
        f"stdout={r.stdout[-1500:]}\nstderr={r.stderr[-2500:]}")


def _run_container_case(seed: int, version: int = 2):
    """The in-process body of a container case (run inside the isolation
    subprocess): Writer roundtrip, jobs=1 vs jobs=4 byte-identity, and
    triangulation of the standalone C one-shot (kz_compress/kz_decompress)
    against the Writer (docs/C_API.md, test_c_api.py). Reference io test
    style: v2/io/CompressedStream_test.go:29-96."""
    import signal

    import kanzi_tpu

    (chain, entropy, block_size, checksum, headerless, kind, size,
     data, skip_blocks) = _draw_container_config(seed, version=version)
    _pre_draw({"type": "container", "codec": chain, "kind": kind,
               "size": size, "seed": seed, "v": version})
    if os.environ.get("KANZI_FUZZ_INJECT_SEGV"):
        os.kill(os.getpid(), signal.SIGSEGV)
    cfg = dict(transform=chain, entropy=entropy, block_size=block_size,
               checksum=checksum, headerless=headerless, skip=skip_blocks)
    try:
        blob = kanzi_tpu.compress(data, **cfg)
        ctx = {"entropy": entropy, "transform": chain,
               "blockSize": block_size, "checksum": checksum,
               "outputSize": len(data), "bsVersion": 6} if headerless \
            else None
        out = kanzi_tpu.decompress(blob, headerless=headerless, ctx=ctx)
        assert out == data, (
            f"container roundtrip failed: chain={chain} entropy={entropy} "
            f"bs={block_size} cks={checksum} headerless={headerless} "
            f"kind={kind} size={size} seed={seed} (base {BASE_SEED})")
        blob4 = kanzi_tpu.compress(data, jobs=4, **cfg)
        assert blob4 == blob, (
            f"jobs=4 diverged: chain={chain} entropy={entropy} "
            f"bs={block_size} seed={seed} (base {BASE_SEED})")
        # triangulate the standalone C one-shot (kz_compress/kz_decompress)
        # against the Writer on the same drawn config — a third format
        # implementation must never drift (docs/C_API.md, test_c_api.py)
        from kanzi_tpu import native
        cchain, cet = kt.get_type(chain), ke.get_type(entropy)
        cctx = {"bsVersion": 6, "jobs": 1, "blockSize": block_size,
                "entropy": entropy}
        cblob = native.c_compress(data, block_size, cchain, cet, cctx,
                                  checksum_bits=checksum,
                                  headerless=headerless,
                                  skip_blocks=skip_blocks)
        assert cblob == blob, (
            f"C one-shot diverged from Writer: chain={chain} "
            f"entropy={entropy} bs={block_size} cks={checksum} "
            f"headerless={headerless} seed={seed} (base {BASE_SEED})")
        cout = native.c_decompress(
            cblob, len(data) + 1024, {"bsVersion": 6},
            headerless=headerless, chain=cchain, etype=cet,
            checksum_bits=checksum, block_size=block_size)
        assert cout == data, (
            f"C decompress diverged: chain={chain} entropy={entropy} "
            f"bs={block_size} seed={seed} (base {BASE_SEED})")
    except Exception as e:  # the parent records the regression entry
        raise AssertionError(
            f"container fuzz failure: chain={chain} entropy={entropy} "
            f"bs={block_size} cks={checksum} headerless={headerless} "
            f"kind={kind} size={size} seed={seed} (base {BASE_SEED}): "
            f"{type(e).__name__}: {e}") from e
    print(f"CASE-OK {seed}", flush=True)


def test_triangulation_crash_isolated(monkeypatch, tmp_path):
    """A hard native crash inside a container case must surface as a
    normal test failure naming the seed (and must not abort pytest).
    Verified by injecting SIGSEGV into the isolation subprocess."""
    monkeypatch.setenv("KANZI_FUZZ_INJECT_SEGV", "1")
    seed = _case_seed("segv-injection", 0)
    with pytest.raises(AssertionError) as exc:
        _check_container(seed)
    msg = str(exc.value)
    assert f"seed={seed}" in msg and "signal" in msg
    # the pre-draw journal must already name the case
    j = json.load(open(LAST_CASE))
    assert j["seed"] == seed and j["base_seed"] == BASE_SEED


def test_container_random_config_quick():
    _check_container_batch([_case_seed("container", i) for i in range(4)])


@pytest.mark.slow
def test_container_random_config_sweep():
    # batched isolation made per-case cost ~the work itself, so the
    # sweep widened 25 -> 40 configs in round 5
    _check_container_batch(
        [_case_seed("container-sweep", i) for i in range(40)])


def _check_legacy(combo: str, kind: str, size: int, seed: int):
    """Legacy v1-v4 container streams built by the spec writers from fresh
    random data must decode through our Reader (the fixed-vector legacy
    tests' randomized sibling)."""
    import sys

    import kanzi_tpu
    sys.path.insert(0, HERE)
    from specmodel import ans as sans
    from specmodel import legacy_v14 as l14

    def ans32k(b, order=0):
        enc = sans.SpecANSEncoder(order=order, chunk_size=32768)
        enc.write(b)
        return enc.finish()

    if combo == "v5_huffman":
        from specmodel.legacy_v5 import compress_v5_huffman
        rng = np.random.default_rng(seed)
        data = GENERATORS[kind](rng, size)
        blob = compress_v5_huffman(data, block_size=65536)
        assert kanzi_tpu.decompress(blob) == data
        return

    _pre_draw({"type": "legacy", "codec": combo, "kind": kind,
               "size": size, "seed": seed})
    combos = {
        "v4_ans0": (4, 5, lambda b: sans.ans_encode(b, 0)),
        "v4_ans1": (4, 8, lambda b: sans.ans_encode(b, 1)),
        "v3_ans32k": (3, 5, ans32k),
        "v2_ans32k": (2, 5, ans32k),
        "v1_ans0": (1, 5, lambda b: l14.ans_encode_v1(b, 0)),
        "v1_ans1": (1, 8, lambda b: l14.ans_encode_v1(b, 1)),
        "v3_fpaq": (3, 2, l14.fpaq_encode_v1),
        "v3_cm": (3, 6, l14.cm_encode_v3),
    }
    version, etype, fn = combos[combo]
    rng = np.random.default_rng(seed)
    data = GENERATORS[kind](rng, size)
    try:
        blob = l14.compress_legacy(data, version, etype, fn, 65536)
        out = kanzi_tpu.decompress(blob)
        assert out == data, (
            f"legacy {combo} decode mismatch: kind={kind} size={size} "
            f"seed={seed} (base {BASE_SEED})")
    except AssertionError:
        _record_failure({"type": "legacy", "codec": combo, "kind": kind,
                         "size": size, "seed": seed})
        raise


@pytest.mark.slow
def test_v5_random_differential():
    """v5 single-stream Huffman container streams from fresh random data
    must decode (randomized sibling of tests/test_legacy_v5.py)."""
    import sys

    import kanzi_tpu
    sys.path.insert(0, HERE)
    from specmodel.legacy_v5 import compress_v5_huffman

    for kind in ("text", "skewed", "runs", "random"):
        for size in (65535, 100001):
            seed = _case_seed("v5", kind, size)
            rng = np.random.default_rng(seed)
            data = GENERATORS[kind](rng, size)
            try:
                blob = compress_v5_huffman(data, block_size=65536)
                assert kanzi_tpu.decompress(blob) == data, (
                    f"v5 decode mismatch: kind={kind} size={size} "
                    f"seed={seed} (base {BASE_SEED})")
            except AssertionError:
                _record_failure({"type": "legacy", "codec": "v5_huffman",
                                 "kind": kind, "size": size, "seed": seed})
                raise


@pytest.mark.slow
@pytest.mark.parametrize("combo", ("v4_ans0", "v4_ans1", "v3_ans32k",
                                   "v2_ans32k", "v1_ans0", "v1_ans1",
                                   "v3_fpaq", "v3_cm"))
def test_legacy_random_differential(combo):
    # bit-level python spec coders: bound the slow ones' sizes
    sizes = (65535, 100001) if combo not in ("v3_fpaq", "v3_cm") \
        else (32769, 50000)
    for kind in ("text", "skewed", "runs", "random"):
        for size in sizes:
            _check_legacy(combo, kind, size,
                          _case_seed("legacy", combo, kind, size))


@pytest.mark.slow
@pytest.mark.parametrize("name", ("ROLZ", "ROLZX", "EXE"))
def test_rolz_exe_random_differential(name):
    kinds = ("text", "exe", "runs", "random") if name == "EXE" \
        else ("text", "dna", "runs", "exe")
    # the spec ROLZ coders are per-byte python loops; bound their sizes
    sizes = (255, 4096, 16385) if name != "EXE" else (255, 4096, 65537)
    for kind in kinds:
        for size in sizes:
            _check_rolz_exe(name, kind, size,
                            _case_seed("sweep", name, kind, size))


if __name__ == "__main__":
    # isolation-subprocess entry: run a batch of container cases in-process
    if "--container-cases" in sys.argv:
        arg = sys.argv[sys.argv.index("--container-cases") + 1]
        for tok in arg.split(","):
            sd, _, ver = tok.partition(":")
            _run_container_case(int(sd), int(ver or 2))
