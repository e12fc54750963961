"""Spec model of the EXE codec (X86 + ARM64 branch-target rewriting).

References:
  - EXECodec forward  v2/transform/EXECodec.go:109-297 (X86), 507-613 (ARM64)
  - detectExeType     v2/transform/EXECodec.go:710-809 — header parse first
                      (ELF/PE/Mach-O), else opcode-density heuristic gated by
                      DetectSimpleType == DT_BIN and a multimedia filter.
  - parseExeHeader    v2/transform/EXECodec.go:812-1021 (ELF64-LE subset here;
                      the native impl covers all formats — tests use ELF64).
  - DetectSimpleType  v2/internal/Global.go:346-419.

X86: E8/E9 call/jmp and 0x0F 0x8x Jcc rel32 whose high byte is a sign
extension become [opcode][BE32 absolute-address ^ 0xF0F0F0F0]; other bytes
copy with 0x9B escaped. ARM64: B/BL 26-bit immediates become absolute word
addresses (0 doubling as the false-positive escape). Output layout:
[mode][LE32 codeStart][LE32 dstIdx(code end)][body][tail copy].
"""

from __future__ import annotations

from .text import _get_magic


class SpecSkip(Exception):
    pass


_DNA = b'acgntuACGNTU"'[:12]
_NUMERIC = b"0123456789+-*/=,.:; "
_BASE64 = (b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
           b"0123456789+/")

DT_UNDEFINED, DT_TEXT, DT_MULTIMEDIA, DT_EXE = 0, 1, 2, 3
DT_NUMERIC, DT_BASE64, DT_DNA, DT_BIN = 4, 5, 6, 7
DT_UTF8, DT_SMALL_ALPHABET = 8, 9


def detect_simple_type(count: int, freqs0: list[int]) -> int:
    if count == 0:
        return DT_UNDEFINED
    if sum(freqs0[c] for c in _DNA) > count - count // 12:
        return DT_DNA
    if sum(freqs0[c] for c in _NUMERIC) == count:
        return DT_NUMERIC
    if sum(freqs0[c] for c in _BASE64) + freqs0[0x3D] == count:
        return DT_BASE64
    present = sum(1 for f in freqs0 if f > 0)
    if present == 256:
        return DT_BIN
    if present <= 4:
        return DT_SMALL_ALPHABET
    return DT_UNDEFINED


MASK_JUMP = 0xFE
INS_JUMP = 0xE8
TWO_BYTE_PREFIX = 0x0F
MASK_JCC = 0xF0
INS_JCC = 0x80
X86_ESCAPE = 0x9B
NOT_EXE = 0x80
MODE_X86 = 0x40
MODE_ARM64 = 0x20
X86_ADDR_MASK = (1 << 24) - 1
MASK_ADDRESS = 0xF0F0F0F0
ARM_B_ADDR_MASK = (1 << 26) - 1
ARM_B_OPCODE_MASK = 0xFFFFFFFF ^ ARM_B_ADDR_MASK
ARM_B_ADDR_SGN_MASK = 1 << 25
ARM_OPCODE_B = 0x14000000
ARM_OPCODE_BL = 0x94000000
MIN_BLOCK_SIZE = 4096


def _le32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "little")


def _parse_elf64_le(src: bytes) -> tuple[int, int, int] | None:
    """(arch, codeStart, codeEnd) for little-endian ELF64 only."""
    count = len(src)
    if count < 64 or src[5] != 1 or src[4] != 2:
        return None
    nb = int.from_bytes(src[0x3C:0x3E], "little")
    sz = int.from_bytes(src[0x3A:0x3C], "little")
    pos = int.from_bytes(src[0x28:0x30], "little")
    code_start = 0
    code_end = 0
    for i in range(nb):
        st = pos + i * sz
        if st + 0x28 >= count:
            return None
        typ = _le32(src, st + 4)
        off = int.from_bytes(src[st + 0x18:st + 0x20], "little")
        ln = int.from_bytes(src[st + 0x20:st + 0x28], "little")
        if typ == 1 and ln >= 64:
            if code_start == 0:
                code_start = off
            code_end = off + ln
    arch = int.from_bytes(src[18:20], "little")
    return arch, min(code_start, count), min(code_end, count)


def detect_exe_type(src: bytes, code_start: int,
                    code_end: int) -> tuple[int, int, int]:
    """Returns (mode, codeStart, codeEnd); mode has NOT_EXE|dataType bits
    on rejection. src is the full-block slice [:origCodeEnd+4]."""
    magic = _get_magic(src)
    if magic == 0x7F454C46:
        parsed = _parse_elf64_le(src)
        if parsed is not None:
            arch, code_start, code_end = parsed
            if arch in (0x03, 0x3E):
                return MODE_X86, code_start, code_end
            if arch == 0xB7:
                return MODE_ARM64, code_start, code_end

    jumps_x86 = 0
    jumps_arm = 0
    count = code_end - code_start
    histo = [0] * 256
    i = code_start
    while i < code_end:
        histo[src[i]] += 1
        if (src[i] & MASK_JUMP) == INS_JUMP:
            if src[i + 4] in (0, 0xFF):
                jumps_x86 += 1
                i += 1
                continue
        elif src[i] == TWO_BYTE_PREFIX:
            i += 1
            if src[i] in (0x38, 0x3A):
                i += 1
            if (src[i] & MASK_JCC) == INS_JCC:
                jumps_x86 += 1
                i += 1
                continue
        if (i & 3) == 0:
            instr = _le32(src, i)
            op1 = instr & ARM_B_OPCODE_MASK
            op2 = instr & 0x7F000000
            if op1 in (ARM_OPCODE_B, ARM_OPCODE_BL) or \
                    op2 in (0x34000000, 0x3500000):
                jumps_arm += 1
        i += 1

    dt = detect_simple_type(count, histo)
    if dt != DT_BIN:
        return NOT_EXE | dt, code_start, code_end
    small = sum(histo[0:16])
    if histo[0] < count // 10 or small > count // 2 or \
            histo[255] < count // 100:
        return NOT_EXE | dt, code_start, code_end
    if jumps_x86 >= count // 200:
        return MODE_X86, code_start, code_end
    if jumps_arm >= count // 200:
        return MODE_ARM64, code_start, code_end
    return NOT_EXE | dt, code_start, code_end


def _forward_x86(src: bytes, dst_len: int, code_start: int,
                 code_end: int) -> bytes:
    count = len(src)
    out = bytearray(9)
    out[0] = MODE_X86
    dst_end = dst_len - 5
    out += src[:code_start]
    src_idx = code_start
    matches = 0
    boundary = False
    while src_idx < code_end and len(out) < dst_end:
        if src[src_idx] == TWO_BYTE_PREFIX:
            if src_idx + 1 >= code_end:
                boundary = True
                break
            if (src[src_idx + 1] & MASK_JCC) == INS_JCC and \
                    src_idx + 5 >= code_end:
                boundary = True
                break
            out.append(src[src_idx])
            src_idx += 1
            if (src[src_idx] & MASK_JCC) != INS_JCC:
                if src[src_idx] == X86_ESCAPE:
                    out.append(X86_ESCAPE)
                out.append(src[src_idx])
                src_idx += 1
                continue
            if src_idx + 4 >= code_end:
                boundary = True
                break
        elif (src[src_idx] & MASK_JUMP) != INS_JUMP:
            if src[src_idx] == X86_ESCAPE:
                out.append(X86_ESCAPE)
            out.append(src[src_idx])
            src_idx += 1
            continue
        elif src_idx + 4 >= code_end:
            boundary = True
            break

        sgn = src[src_idx + 4]
        offset = _le32(src, src_idx + 1)
        if (sgn not in (0, 0xFF)) or offset == 0xFF000000:
            out.append(X86_ESCAPE)
            out.append(src[src_idx])
            src_idx += 1
            continue
        addr = src_idx
        if sgn == 0:
            addr += offset
        else:
            addr -= (-offset) & X86_ADDR_MASK
        out.append(src[src_idx])
        out += ((addr ^ MASK_ADDRESS) & 0xFFFFFFFF).to_bytes(4, "big")
        src_idx += 5
        matches += 1

    if matches < 16:
        raise SpecSkip("too few calls/jumps")
    if src_idx < code_end and not boundary:
        raise SpecSkip("too many false positives")
    if len(out) + (count - src_idx) > dst_end:
        raise SpecSkip("too many false positives")
    out[1:5] = code_start.to_bytes(4, "little")
    out[5:9] = len(out).to_bytes(4, "little")
    out += src[src_idx:]
    if len(out) > count + count // 50:
        raise SpecSkip("too many false positives")
    return bytes(out)


def _forward_arm(src: bytes, dst_len: int, code_start: int,
                 code_end: int) -> bytes:
    count = len(src)
    out = bytearray(9)
    out[0] = MODE_ARM64
    dst_end = dst_len - 8
    out += src[:code_start]
    src_idx = code_start
    matches = 0
    while src_idx + 4 <= code_end and len(out) < dst_end:
        instr = _le32(src, src_idx)
        op1 = instr & ARM_B_OPCODE_MASK
        if op1 not in (ARM_OPCODE_B, ARM_OPCODE_BL):
            out += src[src_idx:src_idx + 4]
            src_idx += 4
            continue
        offset = instr & ARM_B_ADDR_MASK
        if instr & ARM_B_ADDR_SGN_MASK == 0:
            addr = src_idx + 4 * offset
        else:
            addr = src_idx - 4 * ((-offset) & ARM_B_ADDR_MASK)
        addr = max(addr, 0)
        val = op1 | (addr >> 2)
        if addr == 0:
            out += (val & 0xFFFFFFFF).to_bytes(4, "little")
            out += src[src_idx:src_idx + 4]
            src_idx += 4
            continue
        out += (val & 0xFFFFFFFF).to_bytes(4, "little")
        src_idx += 4
        matches += 1

    if matches < 16:
        raise SpecSkip("too few calls/jumps")
    if (src_idx + 4 <= code_end and len(out) >= dst_end) or \
            len(out) + (count - src_idx) > dst_end:
        raise SpecSkip("too many false positives")
    out[1:5] = code_start.to_bytes(4, "little")
    out[5:9] = len(out).to_bytes(4, "little")
    out += src[src_idx:]
    if len(out) > count + count // 50:
        raise SpecSkip("too many false positives")
    return bytes(out)


def exe_forward(src: bytes, dst_len: int | None = None) -> bytes:
    """dataType ctx gating is the caller's concern."""
    count = len(src)
    if count < MIN_BLOCK_SIZE:
        raise SpecSkip("block too small")
    if count > (1 << 28) - 1:
        raise SpecSkip("block too big")
    if dst_len is None:
        dst_len = count + 32 if count <= 256 else count + count // 8
    code_start, code_end = 0, count - 8
    mode, code_start, code_end = detect_exe_type(src[:code_end + 4],
                                                 code_start, code_end)
    if mode & NOT_EXE:
        raise SpecSkip("not an executable")
    if code_start < 0 or code_end < code_start or code_end > count:
        raise SpecSkip("bad code section")
    if mode & ~0x0F == MODE_X86:
        return _forward_x86(src, dst_len, code_start, code_end)
    if mode & ~0x0F == MODE_ARM64:
        return _forward_arm(src, dst_len, code_start, code_end)
    raise SpecSkip("unsupported format")
