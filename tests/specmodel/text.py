"""Spec model of the TEXT codec (variants 1 and 2), forward direction.

Reference: v2/transform/TextCodec.go —
  - computeTextStats / detectTextType  :187-338 (text/XML/CRLF/UTF gates)
  - createDictionary                   :451-490 (static dict parsing)
  - reset / dictionary sizing          :652-688 (dictSize from count/128,
                                       logHashSize from blockSize/8
                                       [+1 for TPAQX], special entries)
  - codec1 Forward                     :692-868 (0x0F/0x0E escapes +
                                       5/7/7-bit indexes)
  - codec2 Forward                     :1226-1500 (mask-bit indexes,
                                       0x80 case-flip marker, >=0x80
                                       escaping in literals)
All int32 arithmetic (the word hashes) wraps like Go's.
"""

from __future__ import annotations

from .text_dict_data import DICT_EN_1024

HASH1 = 2146121005
HASH2 = -2073254261
THRESHOLD1 = 128
THRESHOLD2 = THRESHOLD1 * THRESHOLD1
THRESHOLD3 = 64
THRESHOLD4 = THRESHOLD3 * 128
MAX_DICT_SIZE = 1 << 19
MAX_WORD_LENGTH = 31
ESCAPE1 = 0x0F
ESCAPE2 = 0x0E
MASK_FLIP_CASE = 0x80
MASK_NOT_TEXT = 0x80
MASK_CRLF = 0x40
MASK_XML_HTML = 0x20
MASK_LENGTH = 0x0007FFFF
CR, LF = 13, 10


_KEYS32 = [0x47494638, 0x25504446, 0x504B0304, 0x377ABCAF, 0x89504E47,
           0x7F454C46, 0xFEEDFACE, 0xCEFAEDFE, 0xFEEDFACF, 0xCFFAEDFE,
           0x28B52FFD, 0x81CFB2CE, 0x4D534346, 0x52494646, 0x664C6143,
           0xFD377A58, 0x4B414E5A, 0x52617221]
_KEYS16 = [0x1F8B, 0x424D, 0x4D5A]


def _get_magic(src: bytes) -> int:
    """v2/internal/Magic.go:74-112."""
    if len(src) < 4:
        return 0
    key = int.from_bytes(src[:4], "big")
    if (key & ~0x0F) == 0xFFD8FFE0:
        return key
    if (key >> 8) in (0x425A68, 0x494433):
        return key >> 8
    if key in _KEYS32:
        return key
    key16 = key >> 16
    if key16 in _KEYS16:
        return key16
    if key16 in (0x5034, 0x5035, 0x5036):
        if (key >> 8) & 0xFF in (0x07, 0x0A, 0x0D, 0x20):
            return key16
    return 0


class SpecSkip(Exception):
    pass


def _i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _is_text(v: int) -> bool:
    v |= 0x20
    return ord('a') <= v <= ord('z')


def _is_upper(v: int) -> bool:
    return ord('A') <= v <= ord('Z')


_DELIM = [False] * 256
for _i in range(256):
    if ord(' ') <= _i <= ord('/') or ord(':') <= _i <= ord('?') or \
            _i in (0x0A, 0x0D, 0x09, ord('_'), ord('|'), ord('{'),
                   ord('}'), ord('['), ord(']')):
        _DELIM[_i] = True


def _static_dictionary() -> list[dict]:
    """[{word, hash, data}] for the packed case-flip dict string."""
    buf = bytearray(b for b in DICT_EN_1024.encode("latin1") if _is_text(b))
    entries = []
    anchor = 0
    h = HASH1
    i = 0
    while i < len(buf) and len(entries) < 1024:
        if _is_upper(buf[i]):
            if i > anchor:
                entries.append({"word": bytes(buf[anchor:i]), "hash": h,
                                "data": ((i - anchor) << 24) | len(entries)})
                anchor = i
                h = HASH1
            buf[i] ^= 0x20
        h = _i32(_i32(h * HASH1) ^ _i32(buf[i] * HASH2))
        i += 1
    if len(entries) < 1024:
        entries.append({"word": bytes(buf[anchor:]), "hash": h,
                        "data": ((len(buf) - anchor) << 24) | len(entries)})
    # wait — word bytes for earlier entries got case-flipped in place AFTER
    # slicing; rebuild with the final buffer contents
    out = []
    pos = 0
    for e in entries:
        ln = e["data"] >> 24
        out.append({"word": bytes(buf[pos:pos + ln]), "hash": e["hash"],
                    "data": e["data"]})
        pos += ln
    return out


_STATIC = _static_dictionary()


def compute_text_stats(block: bytes, strict: bool = True
                       ) -> tuple[int, list[int], list[list[int]]]:
    if not strict and _get_magic(block) != 0:
        raise SpecSkip("magic detected")
    freqs0 = [0] * 256
    freqs1 = [[0] * 256 for _ in range(256)]
    prv = 0
    for cur in block:
        freqs0[cur] += 1
        freqs1[prv][cur] += 1
        prv = cur
    count = len(block)

    nb_text = freqs0[CR] + freqs0[LF]
    nb_ascii = 0
    for i in range(128):
        if _is_text(i):
            nb_text += freqs0[i]
        nb_ascii += freqs0[i]
    nb_bin = count - nb_ascii
    if nb_bin > count >> 2:
        not_text = True
    else:
        not_text = nb_text < count // 4
        if strict:
            not_text = not_text or freqs0[0] >= count // 100 or \
                (nb_ascii // 95) < count // 100
        else:
            not_text = not_text or freqs0[32] < count // 50

    if not_text:
        raise SpecSkip("not text")

    res = 0
    if nb_bin <= count - count // 10:
        f1, f2 = freqs0[ord('<')], freqs0[ord('>')]
        f3 = (freqs1[ord('&')][ord('a')] + freqs1[ord('&')][ord('g')]
              + freqs1[ord('&')][ord('l')] + freqs1[ord('&')][ord('q')])
        min_freq = max((count - nb_bin) >> 9, 2)
        if f1 >= min_freq and f2 >= min_freq and f3 > 0:
            if f1 < f2:
                if f1 >= f2 - f2 // 100:
                    res |= MASK_XML_HTML
            elif f2 < f1:
                if f2 >= f1 - f1 // 100:
                    res |= MASK_XML_HTML
            else:
                res |= MASK_XML_HTML

    if freqs0[CR] != 0 and freqs0[CR] == freqs0[LF]:
        is_crlf = True
        for i in range(256):
            if i != LF and freqs1[CR][i] != 0:
                is_crlf = False
                break
            if i != CR and freqs1[i][LF] != 0:
                is_crlf = False
                break
        if is_crlf:
            res |= MASK_CRLF
    return res, freqs0, freqs1


class SpecTextCodec:
    def __init__(self, variant: int, block_size: int = 4 << 20,
                 entropy: str = "HUFFMAN") -> None:
        self.variant = variant
        # codec1 sizes the hash from blockSize/8 (cap 26); codec2 from
        # blockSize/32 (cap 24) — TextCodec.go:617-625 vs :1150-1155
        log = 13
        if variant == 1:
            if block_size >= 8:
                log = min(max((block_size // 8).bit_length() - 1, 13), 26)
        else:
            if block_size >= 32:
                log = min(max((block_size // 32).bit_length() - 1, 13), 24)
        if entropy == "TPAQX":
            log += 1
        self.log_hash_size = log
        self.hash_mask = (1 << log) - 1
        self.dict_size = 1 << 13

    def _reset(self, count: int) -> None:
        if count >= 1024:
            log = min(max((count // 128).bit_length() - 1, 13), 18)
            self.dict_size = 1 << log
        self.dict_map: dict[int, int] = {}      # slot -> entry index
        self.dict_list = [dict(e) for e in _STATIC[:min(len(_STATIC),
                                                        self.dict_size)]]
        n = len(self.dict_list)
        if self.variant == 1:
            # the two special escape entries exist only in codec1's
            # dictionary (TextCodec.go:676-679 vs :1207-1212)
            self.dict_list.append({"word": bytes([ESCAPE2]), "hash": 0,
                                   "data": (1 << 24) | n})
            self.dict_list.append({"word": bytes([ESCAPE1]), "hash": 0,
                                   "data": (1 << 24) | (n + 1)})
            self.static_dict_size = n + 2
        else:
            self.static_dict_size = n
        for i in range(self.static_dict_size):
            self.dict_map[self.dict_list[i]["hash"] & self.hash_mask] = i
        for i in range(self.static_dict_size, self.dict_size):
            self.dict_list.append({"word": None, "hash": 0, "data": i})

    def _expand(self) -> bool:
        if self.dict_size >= MAX_DICT_SIZE:
            return False
        for i in range(self.dict_size, self.dict_size * 2):
            self.dict_list.append({"word": None, "hash": 0, "data": i})
        self.dict_size <<= 1
        return True

    def forward(self, src: bytes) -> bytes:
        count = len(src)
        # codec1 runs strict stats; codec2 (fast-entropy variant) runs the
        # relaxed gate with the magic check (TextCodec.go:700,1244)
        mode, freqs0, freqs1 = compute_text_stats(src,
                                                  strict=(self.variant == 1))
        self._reset(count)
        dst_end = count
        self.is_crlf = bool(mode & MASK_CRLF)
        out = bytearray([mode])
        words = self.static_dict_size
        emit_anchor = 0
        i = 0
        while i < count and src[i] == ord(' '):
            out.append(ord(' '))
            i += 1
            emit_anchor += 1
        delim_anchor = i - 1 if (i < count and _is_text(src[i])) else i
        # codec1 uses a 2-letter threshold check identical to codec2
        while i < count:
            if _is_text(src[i]):
                i += 1
                continue
            if i > delim_anchor + 2 and _DELIM[src[i]]:
                length = i - delim_anchor - 1
                if length <= MAX_WORD_LENGTH:
                    val = src[delim_anchor + 1]
                    h1 = _i32(_i32(HASH1 * HASH1) ^ _i32(val * HASH2))
                    h2 = _i32(_i32(HASH1 * HASH1) ^ _i32((val ^ 0x20) * HASH2))
                    for k in range(delim_anchor + 2, i):
                        h = _i32(src[k] * HASH2)
                        h1 = _i32(_i32(h1 * HASH1) ^ h)
                        h2 = _i32(_i32(h2 * HASH1) ^ h)
                    pe = None
                    pe1 = self.dict_map.get(h1 & self.hash_mask)
                    e1 = self.dict_list[pe1] if pe1 is not None else None
                    if e1 is not None and e1["hash"] == h1 and \
                            (e1["data"] >> 24) == length:
                        pe = pe1
                    else:
                        pe2 = self.dict_map.get(h2 & self.hash_mask)
                        e2 = self.dict_list[pe2] if pe2 is not None else None
                        if e2 is not None and e2["hash"] == h2 and \
                                (e2["data"] >> 24) == length:
                            pe = pe2
                    if pe is not None:
                        w = self.dict_list[pe]["word"]
                        if w is None or w[1:length] != src[delim_anchor + 2:
                                                          delim_anchor + 1 + length]:
                            pe = None
                    if pe is None:
                        if (length > 3 or (length == 3 and words < THRESHOLD2)) \
                                and e1 is None:
                            slot = words
                            e = self.dict_list[slot]
                            if (e["data"] & MASK_LENGTH) >= self.static_dict_size:
                                # the reference nils the old hash slot
                                # unconditionally (TextCodec.go:806)
                                self.dict_map.pop(e["hash"] & self.hash_mask,
                                                  None)
                                e["word"] = src[delim_anchor + 1:
                                                delim_anchor + 1 + length]
                                e["hash"] = h1
                                e["data"] = (length << 24) | words
                            self.dict_map[h1 & self.hash_mask] = slot
                            words += 1
                            if words >= self.dict_size:
                                if not self._expand():
                                    words = self.static_dict_size
                    else:
                        entry = self.dict_list[pe]
                        if emit_anchor != delim_anchor or \
                                src[delim_anchor] != ord(' '):
                            self._emit_symbols(src[emit_anchor:delim_anchor + 1],
                                               out, dst_end)
                        if self.variant == 1:
                            if len(out) >= dst_end - 4:
                                raise SpecSkip("output too small")
                            out.append(ESCAPE1 if pe == pe1 else ESCAPE2)
                            self._emit_index1(out, entry["data"] & MASK_LENGTH)
                        else:
                            if len(out) >= dst_end - 3:
                                raise SpecSkip("output too small")
                            if pe != pe1:
                                out.append(MASK_FLIP_CASE)
                            self._emit_index2(out, entry["data"] & MASK_LENGTH)
                        emit_anchor = delim_anchor + 1 + (entry["data"] >> 24)
            delim_anchor = i
            i += 1
        self._emit_symbols(src[emit_anchor:count], out, dst_end)
        if len(out) > dst_end:
            raise SpecSkip("output too small")
        return bytes(out)

    # -- emission helpers --

    def _emit_index1(self, out: bytearray, val: int) -> None:
        if val < THRESHOLD1:
            out.append(val)
        elif val < THRESHOLD2:
            out.append(0x80 | (val >> 7))
            out.append(0x7F & val)
        else:
            out.append(0xE0 | (val >> 14))
            out.append(0x80 | ((val >> 7) & 0xFF) & 0xFF)
            out.append(0x7F & val)

    def _emit_index2(self, out: bytearray, w_idx: int) -> None:
        w_idx += 1
        if w_idx >= THRESHOLD3:
            if w_idx >= THRESHOLD4:
                out.append(0xF0 | ((w_idx >> 16) & 0x0F))
                out.append((w_idx >> 8) & 0xFF)
                out.append(w_idx & 0xFF)
            else:
                out.append(0xC0 | (w_idx >> 8))
                out.append(w_idx & 0xFF)
        else:
            out.append(0x80 | w_idx)

    def _emit_symbols(self, seg: bytes, out: bytearray, dst_end: int) -> None:
        if self.variant == 1:
            for cur in seg:
                if len(out) >= dst_end:
                    raise SpecSkip("output too small")
                if cur in (ESCAPE1, ESCAPE2):
                    out.append(ESCAPE1)
                    idx = self.static_dict_size - (1 if cur == ESCAPE1 else 2)
                    len_idx = 2
                    if idx >= THRESHOLD2:
                        len_idx = 3
                    elif idx < THRESHOLD1:
                        len_idx = 1
                    if len(out) + len_idx >= dst_end + 1:
                        raise SpecSkip("output too small")
                    self._emit_index1(out, idx)
                elif cur == CR:
                    if not self.is_crlf:
                        out.append(cur)
                else:
                    out.append(cur)
        else:
            for cur in seg:
                if cur == ESCAPE1:
                    if len(out) + 2 > dst_end:
                        raise SpecSkip("output too small")
                    out.append(ESCAPE1)
                    out.append(ESCAPE1)
                elif cur == CR:
                    if not self.is_crlf:
                        if len(out) >= dst_end:
                            raise SpecSkip("output too small")
                        out.append(cur)
                else:
                    if cur >= 0x80:
                        if len(out) >= dst_end:
                            raise SpecSkip("output too small")
                        out.append(ESCAPE1)
                    if len(out) >= dst_end:
                        raise SpecSkip("output too small")
                    out.append(cur)


def text_forward(src: bytes, variant: int, block_size: int = 4 << 20,
                 entropy: str = "HUFFMAN") -> bytes:
    return SpecTextCodec(variant, block_size, entropy).forward(src)
