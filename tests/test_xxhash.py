from kanzi_tpu.xxhash import xxhash32, xxhash64


def test_xxhash32_known_vectors():
    # canonical xxHash test vectors
    assert xxhash32(b"", 0) == 0x02CC5D05
    assert xxhash32(b"", 0x9E3779B1) == 0x36B78AE7


def test_xxhash64_known_vectors_short():
    # inputs < 32 bytes avoid the reference's quirky lane merge and match
    # canonical xxh64
    assert xxhash64(b"", 0) == 0xEF46DB3751D8E999


def test_xxhash_deterministic_and_seeded():
    data = bytes(range(256)) * 10
    a = xxhash32(data, 0x4B414E5A)
    b = xxhash32(data, 0x4B414E5A)
    assert a == b
    assert xxhash32(data, 1) != a
    c = xxhash64(data, 0x4B414E5A)
    assert c == xxhash64(data, 0x4B414E5A)
    assert 0 <= c < 1 << 64


def test_xxhash32_incremental_sizes():
    # exercise all the tail paths (16-byte stripes, 4-byte, 1-byte)
    for n in (0, 1, 3, 4, 5, 15, 16, 17, 31, 32, 33, 63, 100):
        data = bytes((i * 7 + 3) & 0xFF for i in range(n))
        h = xxhash32(data, 0)
        assert 0 <= h < 1 << 32
