"""Spec model of the TPAQ/TPAQX predictor (levels 8-9).

Reference: v2/entropy/TPAQPredictor.go:24-632 plus the logistic
AdaptiveProbMap (v2/entropy/AdaptiveProbMap.go:75-113) and squash/stretch
(v2/internal/Global.go:89-144,110-128). All arithmetic is int32 with Go
wraparound semantics (emulated by _i32); table sizes derive from ctx
blockSize/size exactly as the reference constructor does
(:244-320). Deliberately literal and slow — an oracle, not an engine.
"""

from __future__ import annotations

from .tpaq_tables import (STATE_TRANSITIONS_0, STATE_TRANSITIONS_1,
                          STATE_MAP, MATCH_PRED, INV_EXP)

MAX_LENGTH = 88
BUFFER_SIZE = 64 * 1024 * 1024
HASH_SIZE = 16 * 1024 * 1024
MASK_80808080 = -2139062144
MASK_F0F0F000 = -252645376
MASK_4F4FFFFF = 1330642943
MASK_FFFF0000 = -65536
HASH = 0x7FEB352D
BEGIN_LEARN_RATE = 60 << 7
END_LEARN_RATE = 11 << 7

_TRANSITIONS = (STATE_TRANSITIONS_0, STATE_TRANSITIONS_1)


def _i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


# --- squash / stretch (v2/internal/Global.go init) ---

SQUASH_TBL = [0] * 4096
for x in range(-2047, 2048):
    w = x & 127
    y = (x >> 7) + 16
    SQUASH_TBL[x + 2047] = (INV_EXP[y] * (128 - w) + INV_EXP[y + 1] * w) >> 11
SQUASH_TBL[4095] = 4095


def squash(d: int) -> int:
    if d >= 2048:
        return 4095
    if d <= -2048:
        return 0
    return SQUASH_TBL[d + 2047]


STRETCH_TBL = [0] * 4096
_pi = 0
for x in range(-2047, 2048):
    i = squash(x)
    while _pi <= i:
        STRETCH_TBL[_pi] = x
        _pi += 1
STRETCH_TBL[4095] = 2047


class SpecLogisticAPM:
    def __init__(self, n: int, rate: int) -> None:
        self.rate = rate
        base = [(squash((j - 16) << 7) << 4) & 0xFFFF for j in range(33)]
        self.data = base * max(n, 1)
        self.index = 0
        self.gradient = (0, 65528 + (1 << rate))

    def get(self, bit: int, pr: int, ctx: int) -> int:
        g = self.gradient[bit]
        d = self.data
        d[self.index + 1] = (d[self.index + 1]
                             + ((g - d[self.index + 1]) >> self.rate)) & 0xFFFF
        d[self.index] = (d[self.index]
                         + ((g - d[self.index]) >> self.rate)) & 0xFFFF
        pr = STRETCH_TBL[pr]
        self.index = ((pr + 2048) >> 7) + 33 * ctx
        w = pr & 127
        return (d[self.index + 1] * w + d[self.index] * (128 - w)) >> 11


class _Mixer:
    __slots__ = ("pr", "skew", "w", "p", "learn_rate")

    def __init__(self) -> None:
        self.pr = 2048
        self.skew = 0
        self.w = [32768] * 8
        self.p = [0] * 8
        self.learn_rate = BEGIN_LEARN_RATE

    def update(self, bit: int) -> None:
        err = _i32(_i32((bit << 12) - self.pr) * self.learn_rate) >> 10
        if err == 0:
            return
        # learnRate += (END - learnRate) >> 31  (arith shift: -1 while above END)
        self.learn_rate += _i32(END_LEARN_RATE - self.learn_rate) >> 31
        self.skew = _i32(self.skew + err)
        for i in range(8):
            self.w[i] = _i32(self.w[i] + (_i32(self.p[i] * err) >> 12))

    def get(self, preds: list[int]) -> int:
        self.p = list(preds)
        dot = 0
        for i in range(8):
            dot += self.w[i] * preds[i]
        self.pr = squash(_i32(dot + self.skew + 65536) >> 17)
        return self.pr


def _create_context(ctx_id: int, cx: int) -> int:
    c = _i32(cx * 987654323) + ctx_id
    c &= 0xFFFFFFFF
    c = ((c << 16) | (c >> 16)) & 0xFFFFFFFF      # RotateLeft32(c, 16)
    return _i32(_i32(c * 123456791) + ctx_id)


def _hash_tpaq(x: int, y: int) -> int:
    h = _i32(x * HASH) ^ _i32(y * HASH)
    return _i32((h >> 1) ^ (h >> 9) ^ (x >> 2) ^ (y >> 3) ^ HASH)


class SpecTPAQPredictor:
    def __init__(self, block_size: int = 32768, size: int | None = None,
                 extra: bool = False) -> None:
        rbsz = block_size
        if rbsz >= 64 * 1024 * 1024:
            states_size = 1 << 28
        elif rbsz >= 16 * 1024 * 1024:
            states_size = 1 << 27
        elif rbsz >= 4 * 1024 * 1024:
            states_size = 1 << 26
        elif rbsz >= 1024 * 1024:
            states_size = 1 << 24
        else:
            states_size = 1 << 22
        absz = size if size is not None else rbsz
        if absz >= 32 * 1024 * 1024:
            mixers_size = 1 << 16
        elif absz >= 16 * 1024 * 1024:
            mixers_size = 1 << 15
        elif absz >= 8 * 1024 * 1024:
            mixers_size = 1 << 14
        elif absz >= 4 * 1024 * 1024:
            mixers_size = 1 << 13
        elif absz >= 1024 * 1024:
            mixers_size = 1 << 11
        else:
            mixers_size = 1 << 8
        buffer_size = min(BUFFER_SIZE, rbsz)
        mxsz = 1 << 30
        if absz < (1 << 26):
            mxsz = absz * 16
        hash_size = min(HASH_SIZE, mxsz)
        extra_mem = 1 if extra else 0
        mixers_size <<= 2 * extra_mem
        states_size <<= 2 * extra_mem
        hash_size <<= 2 * extra_mem
        # bsVersion>5 cap (TPAQPredictor.go:322-324).  Unreachable with the
        # v2.5.1 constants: hash_size <= HASH_SIZE<<2 = 64M < 1G entries, so
        # v5 and v6 predictors always size identically (pinned by
        # test_format_vectors.py::test_tpaq_hash_cap_unreachable).
        hash_size = min(hash_size, 1024 * 1024 * 1024)

        self.extra = extra
        self.mixers = [_Mixer() for _ in range(mixers_size)]
        self.mixer = self.mixers[0]
        self.pr = 2048
        self.c0 = 1
        self.c4 = 0
        self.c8 = 0
        self.bpos = 8
        self.pos = 0
        self.bin_count = 0
        self.match_len = 0
        self.match_pos = 0
        self.match_val = 0
        self.hash = 0
        self.big = bytearray(states_size)
        self.small0 = bytearray(1 << 16)
        self.small1 = bytearray(1 << 24)
        self.hashes = [0] * hash_size
        self.buffer = bytearray(buffer_size)
        self.states_mask = states_size - 1
        self.mixers_mask = (mixers_size - 1) & ~1
        self.hash_mask = hash_size - 1
        self.buffer_mask = buffer_size - 1
        # context pointers: (array, index)
        self.cp = [(self.small0, 0), (self.small1, 0), (self.big, 0),
                   (self.big, 0), (self.big, 0), (self.big, 0), (self.big, 0)]
        self.ctx = [0] * 7
        if extra:
            self.sse0 = SpecLogisticAPM(256, 6)
            self.sse1 = SpecLogisticAPM(65536, 7)
        else:
            self.sse0 = SpecLogisticAPM(256, 7)

    def get(self) -> int:
        return self.pr

    def update(self, bit: int) -> None:
        y = bit
        self.mixer.update(y)
        self.c0 = _i32(self.c0 + self.c0 + bit)
        self.bpos -= 1

        if self.bpos == 0:
            self.buffer[self.pos & self.buffer_mask] = self.c0 & 0xFF
            self.pos = _i32(self.pos + 1)
            self.c8 = _i32((self.c8 << 8) | ((self.c4 >> 24) & 0xFF))
            self.c4 = _i32((self.c4 << 8) | (self.c0 & 0xFF))
            self.hash = _i32((_i32(self.hash * HASH) << 4) + self.c4) & self.hash_mask
            self.c0 = 1
            self.bpos = 8
            self.bin_count += (self.c4 >> 7) & 1

            if self.match_len != 0:
                self.mixer = self.mixers[(self.c4 & self.mixers_mask) + 1]
            else:
                self.mixer = self.mixers[self.c4 & self.mixers_mask]

            self.ctx[0] = (self.c4 & 0xFF) << 8
            self.ctx[1] = (self.c4 & 0xFFFF) << 8
            self.ctx[2] = _create_context(2, self.c4 & 0x00FFFFFF)
            self.ctx[3] = _create_context(3, self.c4)

            if self.bin_count < (self.pos >> 2):
                # mostly text or mixed
                self.ctx[4] = _create_context(self.ctx[1],
                                              _i32(self.c4 ^ (self.c8 & 0xFFFF)))
                self.ctx[5] = _i32((self.c8 & MASK_F0F0F000)
                                   | ((self.c4 & MASK_F0F0F000) >> 4))
                if self.extra:
                    h1 = (self.c4 & MASK_4F4FFFFF
                          if (self.c4 & MASK_80808080) == 0
                          else self.c4 & MASK_80808080)
                    h2 = (self.c8 & MASK_4F4FFFFF
                          if (self.c8 & MASK_80808080) == 0
                          else self.c8 & MASK_80808080)
                    self.ctx[6] = _hash_tpaq(_i32(h1 << 2), h2 >> 2)
            else:
                # mostly binary
                self.ctx[4] = _create_context(_i32(HASH + self.match_len),
                                              _i32(self.c4 ^ (self.c4 & 0x000FFFFF)))
                self.ctx[5] = _i32(self.ctx[0] | _i32(self.c8 << 16))
                if self.extra:
                    self.ctx[6] = _hash_tpaq(self.c4 & MASK_FFFF0000,
                                             self.c8 >> 16)

            self._find_match()
            self.match_val = self.buffer[self.match_pos & self.buffer_mask] | 0x100
            self.hashes[self.hash] = self.pos

        table = _TRANSITIONS[bit]
        for k in range(6):
            arr, idx = self.cp[k]
            arr[idx] = table[arr[idx]]
        c = self.c0
        self.cp[0] = (self.small0, self.ctx[0] + c)
        self.cp[1] = (self.small1, self.ctx[1] + c)
        self.cp[2] = (self.big, (self.ctx[2] + c) & self.states_mask)
        self.cp[3] = (self.big, (self.ctx[3] + c) & self.states_mask)
        self.cp[4] = (self.big, (self.ctx[4] + c) & self.states_mask)
        self.cp[5] = (self.big, (self.ctx[5] ^ c) & self.states_mask)
        p = [STATE_MAP[self.cp[k][0][self.cp[k][1]]] for k in range(6)]

        p7 = self._match_pred() if self.match_len != 0 else 0

        if not self.extra:
            pr = self.mixer.get(p + [p7, p7])
            if self.bin_count < (self.pos >> 3):
                pr = (3 * self.sse0.get(y, pr, self.c0) + pr) >> 2
        else:
            arr, idx = self.cp[6]
            arr[idx] = table[arr[idx]]
            self.cp[6] = (self.big, (self.ctx[6] + c) & self.states_mask)
            p6 = STATE_MAP[self.cp[6][0][self.cp[6][1]]]
            pr = self.mixer.get(p + [p6, p7])
            if self.bin_count < (self.pos >> 3):
                pr = self.sse1.get(y, pr, self.ctx[0] + c)
            else:
                if self.bin_count >= (self.pos >> 2):
                    pr = (3 * self.sse0.get(y, pr, self.c0) + pr) >> 2
                pr = (3 * self.sse1.get(y, pr, self.ctx[0] + c) + pr) >> 2

        # pr + ((p - 2048) >>> 31): +1 iff p < 2048
        self.pr = pr + (1 if pr - 2048 < 0 else 0)

    def _find_match(self) -> None:
        if self.match_len > 0:
            if self.match_len < MAX_LENGTH:
                self.match_len += 1
            self.match_pos = _i32(self.match_pos + 1)
        else:
            self.match_pos = self.hashes[self.hash]
            if self.match_pos != 0 and self.pos - self.match_pos <= self.buffer_mask:
                r = self.match_len + 2
                s = self.pos - r
                t = self.match_pos - r
                while r <= MAX_LENGTH:
                    if self.buffer[(s - 1) & self.buffer_mask] != \
                       self.buffer[(t - 1) & self.buffer_mask]:
                        break
                    if self.buffer[s & self.buffer_mask] != \
                       self.buffer[t & self.buffer_mask]:
                        break
                    r += 2
                    s -= 2
                    t -= 2
                self.match_len = r - 2

    def _match_pred(self) -> int:
        m = self.match_val >> (self.bpos - 1)
        if self.c0 == (m >> 1):
            pv = MATCH_PRED[self.match_len - 1]
            return -pv if (m & 1) == 0 else pv
        self.match_len = 0
        return 0
