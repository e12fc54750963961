"""Pallas kernel parity (interpret mode on the CPU mesh; the same code
compiles through Mosaic on TPU hardware — see bench.py device numbers)."""

import numpy as np
import jax
import jax.numpy as jnp

from kanzi_tpu import internal
from kanzi_tpu.ops.pallas_kernels import entropy1024_pallas, histograms_pallas
from kanzi_tpu.ops import histogram as ops_histogram


def test_pallas_histogram_parity():
    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 256, (4, 4096), dtype=np.uint8)
    got = np.asarray(histograms_pallas(jnp.asarray(blocks), interpret=True))
    want = np.stack([np.bincount(b, minlength=256) for b in blocks])
    assert np.array_equal(got, want)


def test_pallas_entropy_gate_parity():
    rng = np.random.default_rng(6)
    cases = [
        rng.integers(0, 256, 8192, dtype=np.uint8),      # random: >= 973
        np.zeros(8192, dtype=np.uint8),                  # constant: 0
        rng.integers(0, 4, 8192, dtype=np.uint8),        # 2-bit alphabet
    ]
    blocks = np.stack(cases)
    h = np.stack([np.bincount(b, minlength=256) for b in blocks])
    lengths = np.full(len(cases), blocks.shape[1], np.int32)
    got = np.asarray(entropy1024_pallas(jnp.asarray(h), jnp.asarray(lengths),
                                        interpret=True))
    for i, b in enumerate(cases):
        want = internal.first_order_entropy_1024(
            len(b), internal.compute_histogram_order0(b))
        # float vs integer log2: the gate decision must agree, values close
        assert abs(int(got[i]) - want) <= 8, (i, got[i], want)
        assert (got[i] >= 973) == (want >= 973)


def test_ops_entropy1024_scale():
    # the XLA-path estimate must be on the reference's [0..1024] scale too
    rng = np.random.default_rng(7)
    b = rng.integers(0, 256, (1, 65536), dtype=np.uint8)
    h = ops_histogram.histograms_u8(jnp.asarray(b))
    e = np.asarray(ops_histogram.entropy1024(h, jnp.asarray([65536], dtype=np.int32)))
    assert 1000 <= int(e[0]) <= 1024
