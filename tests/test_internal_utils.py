"""Support utilities: log2 tables, squash/stretch, histograms, entropy
estimation, data-type detection, magic numbers, job partitioning
(reference: v2/internal/Global.go, Magic.go).
"""

import numpy as np
import pytest

from kanzi_tpu import internal
from kanzi_tpu.internal import DataType


def test_log2_exact():
    for x, want in ((1, 0), (2, 1), (3, 1), (4, 2), (255, 7), (256, 8),
                    (1 << 20, 20), ((1 << 20) - 1, 19)):
        assert internal.log2_no_check(x) == want
    with pytest.raises(Exception):
        internal.log2(0)


def test_log2_1024_scaled():
    # 1024-scaled log2, max error ~0.1% (reference Global.go:39-87)
    for x in (1, 2, 3, 10, 100, 4096, 1 << 20, (1 << 26) + 12345):
        got = internal.log2_1024(x)
        want = np.log2(x) * 1024
        assert abs(got - want) <= max(2.0, want * 0.002), (x, got, want)


def test_squash_properties():
    # logistic: monotone, odd-ish around 0, saturates at [0, 4095]
    assert internal.squash(-3000) == 0
    assert internal.squash(3000) == 4095
    assert internal.squash(0) == 2048
    vals = [internal.squash(d) for d in range(-2047, 2048, 13)]
    assert vals == sorted(vals)


def test_histograms_and_entropy():
    data = np.frombuffer(b"aabbbbcccc" * 100, dtype=np.uint8)
    h0 = internal.compute_histogram_order0(data)
    assert h0[ord("a")] == 200 and h0[ord("b")] == 400
    assert int(h0.sum()) == len(data)
    # uniform random ~ incompressible (>= 973); constant = 0
    rng = np.random.default_rng(0)
    rnd = rng.integers(0, 256, 65536, dtype=np.uint8)
    hr = internal.compute_histogram_order0(rnd)
    assert internal.first_order_entropy_1024(len(rnd), hr) >= 973
    const = np.zeros(1000, dtype=np.uint8)
    hc = internal.compute_histogram_order0(const)
    assert internal.first_order_entropy_1024(len(const), hc) == 0


def test_detect_simple_type():
    dna = np.frombuffer(b"ACGTACGTACGT" * 100, dtype=np.uint8)
    h = internal.compute_histogram_order0(dna)
    assert internal.detect_simple_type(len(dna), h) == DataType.DNA
    num = np.frombuffer(b"0123456789,. " * 100, dtype=np.uint8)
    h = internal.compute_histogram_order0(num)
    assert internal.detect_simple_type(len(num), h) == DataType.NUMERIC


def test_magic_numbers():
    assert internal.is_data_compressed(
        internal.get_magic_type(np.frombuffer(b"\x1f\x8b\x08\x00????", np.uint8)))
    assert internal.is_data_executable(
        internal.get_magic_type(np.frombuffer(b"\x7fELF\x02\x01\x01\x00", np.uint8)))
    assert internal.is_data_multimedia(
        internal.get_magic_type(np.frombuffer(b"\x89PNG\r\n\x1a\n", np.uint8)))
    assert internal.get_magic_type(
        np.frombuffer(b"plain234", np.uint8)) == internal.NO_MAGIC


def test_compute_jobs_per_task():
    # quotient + round-robin remainder (reference Global.go:424-460)
    assert internal.compute_jobs_per_task(7, 3) == [3, 2, 2]
    assert internal.compute_jobs_per_task(3, 3) == [1, 1, 1]
    # jobs <= tasks: every task still gets one job (reference semantics)
    assert internal.compute_jobs_per_task(2, 4) == [1, 1, 1, 1]
    assert sum(internal.compute_jobs_per_task(64, 7)) == 64
