"""Device LF-walk BWT inverse: correctness vs a definitional host inverse
(VERDICT r3, next #8 — the kernel whose chip measurement closes the last
§2.7 device-offload question; see docs/ARCHITECTURE.md ledger)."""

import numpy as np

from kanzi_tpu.ops import bwt_inverse as obi


def _bwt_textbook(data: bytes):
    """Definitional forward: sorted rotations (no sentinel), last column +
    primary row index. O(n^2 log n) — small inputs only."""
    n = len(data)
    doubled = data + data
    rows = sorted(range(n), key=lambda i: doubled[i:i + n])
    last = bytes(data[(i + n - 1) % n] for i in rows)
    return np.frombuffer(last, np.uint8), rows.index(0)


def test_device_lf_walk_matches_host():
    rng = np.random.default_rng(3)
    texts = [
        b"banana_band_banana_band!" * 40,
        rng.integers(0, 256, 960, dtype=np.uint8).tobytes(),
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 960)].tobytes(),
        (b"aaaabbbb" * 120),
    ]
    n = min(len(t) for t in texts)
    lasts, prims = [], []
    for t in texts:
        last, p = _bwt_textbook(t[:n])
        lasts.append(last)
        prims.append(p)
    out = obi.bwt_inverse_device(np.stack(lasts), np.array(prims))
    for b, t in enumerate(texts):
        assert out[b].tobytes() == t[:n], f"block {b} decode mismatch"


def test_build_lf_is_stable_rank():
    rng = np.random.default_rng(5)
    row = rng.integers(0, 8, 64, dtype=np.uint8)
    lf, counts = obi.build_lf(row[None, :])
    c = np.zeros(8, np.int64)
    c[1:] = np.cumsum(np.bincount(row, minlength=8))[:-1]
    occ = c.copy()
    for i in range(64):
        assert lf[0, i] == occ[row[i]]
        occ[row[i]] += 1
    assert counts[0, :8].sum() == 64
