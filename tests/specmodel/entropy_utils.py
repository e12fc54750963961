"""Spec models of the table-determining entropy utilities.

References:
  - EncodeAlphabet        v2/entropy/EntropyUtils.go:38-66
  - NormalizeFrequencies  v2/entropy/EntropyUtils.go:123-260
  - WriteVarInt           v2/entropy/EntropyUtils.go:264-275
  - ExpGolomb (signed)    v2/entropy/ExpGolombCodec.go:107-122 (encode),
                          :160-186 (decode semantics the encoding is derived
                          from — the 256-entry cache in the Go source is a
                          precomputation of exactly this algorithm)
  - ComputeHistogram      v2/internal/Global.go:220-344
"""

from __future__ import annotations

from .bits import SpecOBS


def encode_alphabet(obs: SpecOBS, alphabet: list[int]) -> int:
    count = len(alphabet)
    assert count <= 256
    if count == 0:
        obs.write_bit(0)   # FULL_ALPHABET
        obs.write_bit(1)   # ALPHABET_0
    elif count == 256:
        obs.write_bit(0)   # FULL_ALPHABET
        obs.write_bit(0)   # ALPHABET_256
    else:
        obs.write_bit(1)   # PARTIAL_ALPHABET
        masks = bytearray(32)
        for s in alphabet:
            masks[s >> 3] |= 1 << (s & 7)
        last_mask = alphabet[-1] >> 3
        obs.write_bits(last_mask, 5)
        obs.write_array(bytes(masks), 8 * (last_mask + 1))
    return count


def normalize_frequencies(freqs: list[int], alphabet_cap: int,
                          total_freq: int, scale: int) -> tuple[int, list[int]]:
    """Returns (alphabetSize, alphabet). Mutates freqs in place.

    alphabet_cap mirrors len(alphabet) in the Go call (the scan range of the
    squeeze loop — callers pass a 256-long array).
    """
    assert alphabet_cap <= 256
    assert 256 <= scale <= 65536
    if alphabet_cap == 0 or total_freq == 0:
        return 0, []

    # Shortcut: already normalized
    if total_freq == scale:
        alphabet = [i for i in range(256) if freqs[i] != 0]
        return len(alphabet), alphabet

    alphabet: list[int] = []
    sum_scaled = 0
    sum_freq = 0
    idx_max = 0
    scaled = dict()  # visited index -> scaled value (freqs updated at end of loop body)
    for i in range(alphabet_cap):
        f = freqs[i]
        if f == 0:
            continue
        sf = f * scale
        scaled_freq = 1 if sf <= total_freq else (sf + (total_freq >> 1)) // total_freq
        alphabet.append(i)
        sum_scaled += scaled_freq
        freqs[i] = scaled_freq
        sum_freq += f
        if scaled_freq > freqs[idx_max]:
            idx_max = i
        if sum_freq >= total_freq:
            break

    alphabet_size = len(alphabet)
    if alphabet_size == 0:
        return 0, []
    if alphabet_size == 1:
        freqs[alphabet[0]] = scale
        return 1, alphabet
    if sum_scaled == scale:
        return alphabet_size, alphabet

    delta = sum_scaled - scale
    err_thr = freqs[idx_max] >> 4
    if abs(delta) <= err_thr:
        freqs[idx_max] -= delta
        return alphabet_size, alphabet

    if delta < 0:
        delta += err_thr
        freqs[idx_max] += err_thr
        inc = 1
        delta = -delta
    else:
        delta -= err_thr
        freqs[idx_max] -= err_thr
        inc = -1

    # Slow path: spread the remaining error over symbols with freq > 2
    round_ = 1
    while round_ < 6 and delta > 0:
        adjustments = 0
        round_ += 1
        for idx in alphabet:
            if freqs[idx] <= 2:
                continue
            freqs[idx] += inc
            adjustments += 1
            delta -= 1
            if delta == 0:
                break
        if adjustments == 0:
            break

    freqs[idx_max] = max(freqs[idx_max] - delta, 1)

    # DELIBERATE divergence from the reference (mirrors the engine,
    # entropy_common.cpp): the reference can exit with sum > scale on
    # small near-uniform chunks and its own decoder rejects the stream;
    # strip the excess deterministically from entries still > 1 so the
    # emitted header is always self-consistent. Only headers that were
    # previously undecodable change.
    excess = sum(freqs[i] for i in alphabet) - scale
    while excess > 0:
        changed = 0
        for idx in alphabet:
            if excess == 0:
                break
            if freqs[idx] > 1:
                freqs[idx] -= 1
                excess -= 1
                changed += 1
        if changed == 0:
            raise ValueError("normalization: scale smaller than alphabet")
    return alphabet_size, alphabet


def write_varint(obs: SpecOBS, value: int) -> int:
    res = 1
    while value >= 128:
        obs.write_bits(0x80 | (value & 0x7F), 8)
        value >>= 7
        res += 1
    obs.write_bits(value, 8)
    return res


def expgolomb_encode_byte(obs: SpecOBS, val: int, signed: bool = True) -> None:
    """Derived from the decoder semantics (ExpGolombCodec.go:160-186):
    0 -> single 1-bit. Non-zero signed v (as int8): magnitude M = |v|,
    log2 = floor(log2(M+1))... chosen so M in [2^log2-1, 2^(log2+1)-2];
    emit log2 zeros, a 1, then (M - (2^log2 - 1)) in log2 bits, then the
    sign bit (1 = negative). Unsigned: same without the sign bit.
    """
    val &= 0xFF
    if val == 0:
        obs.write_bit(1)
        return
    if signed:
        s = val - 256 if val >= 128 else val
        m = -s if s < 0 else s
    else:
        m = val
    log2 = 0
    while (m + 1) >> (log2 + 1):
        log2 += 1
    obs.write_bits(0, log2)      # log2 zeros
    obs.write_bit(1)
    obs.write_bits(m - ((1 << log2) - 1), log2) if log2 else None
    if signed:
        obs.write_bit(1 if s < 0 else 0)


def compute_histogram(block: bytes, freqs: list[int], is_order0: bool,
                      with_total: bool) -> None:
    """v2/internal/Global.go:220-344. freqs is 257 (order 0 + total),
    256 (order 0), 257*256 (order 1 + total) or 65536 (order 1) long."""
    if is_order0:
        if with_total:
            freqs[256] += len(block)
        for b in block:
            freqs[b] += 1
        return
    length = len(block)
    stride = 257 if with_total else 256
    if length < 32:
        prv = 0
        for b in block:
            freqs[prv + b] += 1
            if with_total:
                freqs[prv + 256] += 1
            prv = stride * b
        return
    quarter = length >> 2
    # 4 lanes over quarters; lanes 1-3 seed prv from the byte before their
    # quarter; lane 3 runs to the end of the block
    for lane in range(4):
        lo = lane * quarter
        hi = (lane + 1) * quarter if lane < 3 else length
        prv = 0 if lane == 0 else stride * block[lo - 1]
        for i in range(lo, hi):
            b = block[i]
            freqs[prv + b] += 1
            if with_total:
                freqs[prv + 256] += 1
            prv = stride * b
