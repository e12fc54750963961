"""Adversarial fuzz of the native ENCODE paths under ASAN+UBSAN.

Sibling of test_fuzz_decoders.py for the forward direction. The round-4
review found a heap overflow in the ROLZX *encoder* (the CM coder can emit
>= 9 bits per literal on adversarial chunks, overrunning the reference's
srcLen/32 slack — ROLZCodec.go:1351-1353 allocates it without per-byte
bounds checks); decode-only ASAN fuzz could never see it. This target runs
the standalone C one-shot compressor (kz_compress -> kz_decompress,
container.cpp) over a systematic matrix of random deep transform chains x
every entropy codec x all input generators, plus every committed container
regression, under an ASAN+UBSAN build in a subprocess. A skip or typed
error is acceptable; a sanitizer report or crash fails the test.

Reference scope: the chain-composed expansion contract is
v2/transform/Sequence.go:189-205 (MaxEncodedLen composition); the matrix
deliberately draws chains where intermediate stages EXPAND (MM/PACK on
random bytes, UTF on text) before a late stage runs, since that is where
forward scratch sizing bugs live.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "kanzi_tpu", "native")
ASAN_LIB = os.path.join(NATIVE, "build", "asan", "libkanzi_native_asan.so")
REGRESSIONS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fuzz_corpus", "regressions.json")

# the round-4 crash class, replayed explicitly even if regressions.json is
# ever pruned: (chain, entropy, block_size, kind, size, data seed)
KNOWN_CRASHERS = [
    ("ROLZX+DNA+ZRLT+EXE", "NONE", 262144, "random", 159619, 380539483),
    ("RLT+BWT+ROLZX", "NONE", 262144, "random", 103089, 380540353),
    ("LZ+MM+PACK+MM+RANK", "NONE", 262160, "bindelta", 55928, 1774126530),
]


def _fuzz_body():
    import numpy as np
    from kanzi_tpu import native
    from kanzi_tpu import entropy as ke
    from kanzi_tpu import transforms as kt

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_random_differential import GENERATORS

    def one(chain, entropy, block_size, kind, size, seed, checksum=0,
            headerless=False):
        rng = np.random.default_rng(seed)
        data = GENERATORS[kind](rng, size)
        cchain, cet = kt.get_type(chain), ke.get_type(entropy)
        cctx = {"bsVersion": 6, "jobs": 1, "blockSize": block_size,
                "entropy": entropy}
        blob = native.c_compress(data, block_size, cchain, cet, cctx,
                                 checksum_bits=checksum,
                                 headerless=headerless)
        out = native.c_decompress(
            blob, len(data) + 1024, {"bsVersion": 6},
            headerless=headerless, chain=cchain, etype=cet,
            checksum_bits=checksum, block_size=block_size)
        assert out == data, (
            f"roundtrip mismatch: chain={chain} entropy={entropy} "
            f"bs={block_size} kind={kind} size={size} seed={seed}")

    # 1. known encoder-crash configs (round-4 ROLZX CM overflow class)
    for chain, entropy, bs, kind, size, seed in KNOWN_CRASHERS:
        one(chain, entropy, bs, kind, size, seed)

    # 2. every committed container regression through the C one-shot.
    # Container entries only record the case seed; the full config is
    # re-drawn by the SAME helper the fuzzer uses, so the two can never
    # desynchronize.
    from test_random_differential import _draw_container_config
    if os.path.exists(REGRESSIONS):
        for e in json.load(open(REGRESSIONS)):
            if e["type"] != "container":
                continue
            (chain, entropy, block_size, checksum, headerless, kind, size,
             data, skip_blocks) = _draw_container_config(
                e["seed"], version=e.get("v", 1))
            cchain, cet = kt.get_type(chain), ke.get_type(entropy)
            cctx = {"bsVersion": 6, "jobs": 1, "blockSize": block_size,
                    "entropy": entropy}
            blob = native.c_compress(data, block_size, cchain, cet, cctx,
                                     checksum_bits=checksum,
                                     headerless=headerless,
                                     skip_blocks=skip_blocks)
            out = native.c_decompress(
                blob, len(data) + 1024, {"bsVersion": 6},
                headerless=headerless, chain=cchain, etype=cet,
                checksum_bits=checksum, block_size=block_size)
            assert out == data, f"regression replay mismatch: {e}"

    # 3. systematic matrix: random deep chains x all entropies x all
    # generators; expansion-stacking chains (MM/PACK/UTF interleavings)
    # are drawn naturally from the full 19-name pool. The matrix seed is
    # overridable (KANZI_FWD_FUZZ_SEED) so repeated runs sweep fresh
    # config space; the default stays fixed for CI reproducibility.
    matrix_seed = int(os.environ.get("KANZI_FWD_FUZZ_SEED", 0xF0D4))
    rng = np.random.default_rng(matrix_seed)
    names = ["BWT", "BWTS", "LZ", "LZX", "LZP", "ROLZ", "ROLZX", "RLT",
             "ZRLT", "MTFT", "RANK", "SRT", "TEXT", "UTF", "PACK", "DNA",
             "MM", "EXE", "NONE"]
    entropies = ["NONE", "HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ", "CM",
                 "TPAQ", "TPAQX"]
    kinds = list(GENERATORS)
    for i in range(120):
        chain = "+".join(names[j] for j in
                         rng.choice(len(names), int(rng.integers(1, 9))))
        entropy = entropies[i % len(entropies)]
        block_size = int(rng.choice([1024, 4096, 16400, 65536]))
        kind = kinds[int(rng.integers(0, len(kinds)))]
        size = int(rng.integers(1, 70000))
        one(chain, entropy, block_size, kind, size, seed=matrix_seed + i,
            checksum=int(rng.choice([0, 32])),
            headerless=bool(rng.integers(0, 2)))

    # 4. adversarial CM-coder pressure: pure-ROLZX on incompressible data
    # right at chunk boundaries (the exact overflow shape: >=9 coded bits
    # per literal byte across a full chunk)
    for size in (255, 4095, 4096, 4097, 16384, 65537):
        for kind in ("random", "bindelta", "exe"):
            one("ROLZX", "NONE", 65536, kind, size, seed=0xCC00 + size)
            one("ROLZX+ROLZX", "NONE", 16384, kind, size, seed=0xCC11 + size)

    print("FWD-FUZZ-OK")


@pytest.mark.slow
def test_forward_fuzz_under_asan():
    r = subprocess.run(["make", "-C", NATIVE, "asan"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    libasan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True).stdout.strip()
    libstdcxx = subprocess.run(
        ["g++", "-print-file-name=libstdc++.so"],
        capture_output=True, text=True).stdout.strip()
    env = dict(os.environ)
    env.update({
        "KANZI_NATIVE_LIB": ASAN_LIB,
        "LD_PRELOAD": f"{libasan} {libstdcxx}",
        "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
    })
    r = subprocess.run([sys.executable, __file__, "--run-fuzz"],
                       capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0 and "FWD-FUZZ-OK" in r.stdout, \
        f"rc={r.returncode}\nstdout={r.stdout[-2000:]}\nstderr={r.stderr[-4000:]}"


if __name__ == "__main__":
    if "--run-fuzz" in sys.argv:
        _fuzz_body()
