// Order-0 range codec (Subbotin style, 64-bit, 28-bit renormalization).
//
// Format spec: reference v2/entropy/RangeCodec.go. 32 KiB chunks; per chunk:
// alphabet + 3-bit logRange + log-max-bit-packed frequencies (first freq
// inferred), then the 60-bit coder stream.

#include "entropy_common.h"

namespace kz {

static constexpr u64 TOP_RANGE = 0x0FFFFFFFFFFFFFFFull;
static constexpr u64 BOTTOM_RANGE = 0x000000000000FFFFull;
static constexpr u64 RANGE_MASK = 0x0FFFFFFF00000000ull;
static constexpr u32 RANGE_CHUNK_SIZE = 1 << 15;
static constexpr u32 RANGE_LOG_RANGE = 12;

namespace {

struct RangeEncoder {
    OBS& obs;
    u64 low = 0, rng = 0;
    u32 shift = 0;
    int alphabet[256];
    i32 freqs[256];
    u64 cumFreqs[257];

    explicit RangeEncoder(OBS& o) : obs(o) {}

    void encodeHeader(int alphabetSize, u32 lr) {
        encodeAlphabet(obs, alphabet, alphabetSize);
        if (alphabetSize == 0) return;
        obs.writeBits(lr - 8, 3);
        int chkSize = alphabetSize < 64 ? 6 : 8;
        u32 llr = 3;
        while ((1u << llr) <= lr) llr++;
        for (int i = 1; i < alphabetSize; i += chkSize) {
            int maxv = freqs[alphabet[i]] - 1;
            u32 logMax = 0;
            int endj = std::min(i + chkSize, alphabetSize);
            for (int j = i + 1; j < endj; j++)
                if (freqs[alphabet[j]] - 1 > maxv) maxv = freqs[alphabet[j]] - 1;
            while ((1 << logMax) <= maxv) logMax++;
            obs.writeBits(logMax, llr);
            if (logMax == 0) continue;
            for (int j = i; j < endj; j++)
                obs.writeBits((u64)(freqs[alphabet[j]] - 1), logMax);
        }
    }

    inline void encodeByte(u8 b) {
        u64 cumFreq = cumFreqs[b];
        rng >>= shift;
        low += cumFreq * rng;
        rng *= (cumFreqs[b + 1] - cumFreq);
        while (true) {
            if (((low ^ (low + rng)) & RANGE_MASK) != 0) {
                if (rng > BOTTOM_RANGE) break;
                rng = (~low + 1) & BOTTOM_RANGE;
            }
            obs.writeBits(low >> 32, 28);
            rng <<= 28;
            low <<= 28;
        }
    }

    void write(const u8* block, i64 len) {
        i64 startChunk = 0;
        while (startChunk < len) {
            rng = TOP_RANGE;
            low = 0;
            u32 lr = RANGE_LOG_RANGE;
            i64 endChunk = std::min(startChunk + (i64)RANGE_CHUNK_SIZE, len);
            while (lr > 8 && ((i64)1 << lr) > endChunk - startChunk) lr--;
            shift = lr;
            const u8* buf = block + startChunk;
            i64 n = endChunk - startChunk;

            computeHistogram(buf, n, freqs);
            int alphabetSize = normalizeFrequencies(freqs, 256, alphabet, (int)n, 1 << lr);
            if (alphabetSize > 0) {
                cumFreqs[0] = 0;
                for (int i = 0; i < 256; i++)
                    cumFreqs[i + 1] = cumFreqs[i] + (u64)freqs[i];
            }
            encodeHeader(alphabetSize, lr);

            if (alphabetSize <= 1) {
                startChunk = endChunk;
                continue;
            }
            for (i64 i = 0; i < n; i++) encodeByte(buf[i]);
            obs.writeBits(low, 60);
            startChunk = endChunk;
        }
    }
};

struct RangeDecoder {
    IBS& ibs;
    u64 code = 0, low = 0, rng = 0;
    u32 shift = 0;
    int alphabet[256];
    i32 freqs[256];
    u64 cumFreqs[257];
    std::vector<u16> f2s;

    explicit RangeDecoder(IBS& i) : ibs(i) {}

    int decodeHeader() {
        int alphabetSize = decodeAlphabet(ibs, alphabet);
        if (alphabetSize == 0) return 0;
        if (alphabetSize != 256) std::memset(freqs, 0, sizeof(freqs));
        u32 logRange = 8 + (u32)ibs.readBits(3);
        int scale = 1 << logRange;
        shift = logRange;
        int sum = 0;
        int chkSize = alphabetSize < 64 ? 6 : 8;
        u32 llr = 3;
        while ((1u << llr) <= logRange) llr++;
        for (int i = 1; i < alphabetSize; i += chkSize) {
            u32 logMax = (u32)ibs.readBits(llr);
            if (((i64)1 << logMax) > scale) throw Error("invalid range frequency size");
            int endj = std::min(i + chkSize, alphabetSize);
            for (int j = i; j < endj; j++) {
                int freq = 1;
                if (logMax > 0) {
                    freq = 1 + (int)ibs.readBits(logMax);
                    if (freq <= 0 || freq >= scale) throw Error("invalid range frequency");
                }
                freqs[alphabet[j]] = freq;
                sum += freq;
            }
        }
        if (scale <= sum) throw Error("invalid range frequency sum");
        freqs[alphabet[0]] = scale - sum;
        cumFreqs[0] = 0;
        if ((int)f2s.size() < scale) f2s.resize(scale);
        for (int i = 0; i < 256; i++) {
            cumFreqs[i + 1] = cumFreqs[i] + (u64)freqs[i];
            int base = (int)cumFreqs[i];
            for (int j = freqs[i] - 1; j >= 0; j--) f2s[base + j] = (u16)i;
        }
        return alphabetSize;
    }

    inline u8 decodeByte() {
        rng >>= shift;
        int count = (int)((code - low) / rng);
        if (count >= (int)f2s.size()) throw Error("invalid range state");
        u16 symbol = f2s[count];
        u64 cumFreq = cumFreqs[symbol];
        low += cumFreq * rng;
        rng *= (cumFreqs[symbol + 1] - cumFreq);
        while (true) {
            if (((low ^ (low + rng)) & RANGE_MASK) != 0) {
                if (rng > BOTTOM_RANGE) break;
                rng = (~low + 1) & BOTTOM_RANGE;
            }
            code = (code << 28) | ibs.readBits(28);
            rng <<= 28;
            low <<= 28;
        }
        return (u8)symbol;
    }

    void read(u8* block, i64 len) {
        i64 startChunk = 0;
        while (startChunk < len) {
            i64 endChunk = std::min(startChunk + (i64)RANGE_CHUNK_SIZE, len);
            int alphabetSize = decodeHeader();
            if (alphabetSize == 0) throw Error("invalid range header");
            if (alphabetSize == 1) {
                std::memset(block + startChunk, alphabet[0], endChunk - startChunk);
                startChunk = endChunk;
                continue;
            }
            rng = TOP_RANGE;
            low = 0;
            code = ibs.readBits(60);
            for (i64 i = startChunk; i < endChunk; i++) block[i] = decodeByte();
            startChunk = endChunk;
        }
    }
};

}  // namespace

void rangeEncode(OBS& obs, const u8* block, i64 len) {
    if (len == 0) return;
    RangeEncoder enc(obs);
    enc.write(block, len);
}

void rangeDecode(IBS& ibs, u8* block, i64 len, int bsVersion) {
    (void)bsVersion;
    if (len == 0) return;
    RangeDecoder dec(ibs);
    dec.read(block, len);
}

}  // namespace kz
