// Full-chain stage profiler for L5-L7: runs the level's transform chain +
// entropy codec natively, timing every stage in BOTH directions on a raw
// block. Unlike prof_stages.cpp (sort/bwt/rank micro view), this shows the
// complete level budget, so regressions can be localized to a stage.
//
// Build:
//   g++ -O3 -march=native -std=c++17 -I kanzi_tpu/native/src \
//       tools/prof_chain.cpp kanzi_tpu/native/build/*.o -o /tmp/prof_chain
// Usage: prof_chain <datafile> <level 5|6|7> [reps] [blockSize]
//   With blockSize given, the file is processed in blockSize chunks inside
//   ONE process (warm allocator pools, as the real Writer does — this host
//   faults at ~6 ms/MB, so per-process profiling overstates BWT by ~2x)
//   and per-stage totals are printed per rep.
//
// Level chains (reference v2/app/BlockCompressor.go:665-700):
//   5 = TEXT+UTF+BWT+RANK+ZRLT & ANS0
//   6 = TEXT+UTF+BWT+SRT+ZRLT  & FPAQ
//   7 = LZP+TEXT+UTF+BWT+LZP   & CM

#include <malloc.h>

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "kz.h"

namespace kz {
int transformForward(int ttype, const u8* src, i32 n, u8* dst, i64 cap,
                     Ctx& ctx, i32* outLen);
int transformInverse(int ttype, const u8* src, i32 n, u8* dst, i64 cap,
                     Ctx& ctx, i32* outLen);
}

extern "C" {
int64_t kz_entropy_encode(int etype, const uint8_t* src, int64_t n,
                          uint8_t* dst, int64_t dstCap, kz::Ctx* ctx);
int64_t kz_entropy_decode(int etype, const uint8_t* src, int64_t srcLen,
                          uint8_t* dst, int64_t outLen, kz::Ctx* ctx);
}

using namespace kz;
using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
    return std::chrono::duration<double, std::milli>(Clock::now() - t0)
        .count();
}

struct Stage {
    const char* name;
    int ttype;
};

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: prof_chain <datafile> <level 5|6|7> [reps]\n");
        return 2;
    }
    // same warm-heap tuning kanzi_tpu/__init__._tune_allocator applies —
    // without it every per-block scratch allocation faults at ~6 ms/MB here
    mallopt(M_MMAP_THRESHOLD, 1 << 30);
    mallopt(M_TRIM_THRESHOLD, 1 << 30);
    mallopt(M_TOP_PAD, 1 << 24);
    FILE* fh = std::fopen(argv[1], "rb");
    if (!fh) return 2;
    std::fseek(fh, 0, SEEK_END);
    long n = std::ftell(fh);
    std::fseek(fh, 0, SEEK_SET);
    std::vector<u8> data((size_t)n);
    if (std::fread(data.data(), 1, (size_t)n, fh) != (size_t)n) return 2;
    std::fclose(fh);
    int level = std::atoi(argv[2]);
    int reps = argc > 3 ? std::atoi(argv[3]) : 3;
    long blockSize = argc > 4 ? std::atol(argv[4]) : n;
    if (blockSize <= 0 || blockSize > n) blockSize = n;

    std::vector<Stage> chain;
    int etype;
    switch (level) {
        case 5:
            chain = {{"TEXT", 10}, {"UTF", 17}, {"BWT", 1}, {"RANK", 8},
                     {"ZRLT", 6}};
            etype = 5;  // ANS0
            break;
        case 6:
            chain = {{"TEXT", 10}, {"UTF", 17}, {"BWT", 1}, {"SRT", 13},
                     {"ZRLT", 6}};
            etype = 2;  // FPAQ
            break;
        case 7:
            chain = {{"LZP", 14}, {"TEXT", 10}, {"UTF", 17}, {"BWT", 1},
                     {"LZP2", 14}};
            etype = 6;  // CM
            break;
        default:
            std::fprintf(stderr, "level must be 5, 6 or 7\n");
            return 2;
    }

    i64 cap = (i64)blockSize * 5 / 4 + (1 << 16);
    std::vector<u8> bufA(cap), bufB(cap), ebuf(cap + (cap >> 2));
    long nBlocks = (n + blockSize - 1) / blockSize;
    bool detail = nBlocks == 1;

    // stage-keyed accumulators for multi-block mode
    std::vector<std::string> keys;
    for (auto& st : chain) keys.push_back(st.name);
    keys.push_back("ENT");
    auto keyIdx = [&](const char* nm) {
        for (size_t i = 0; i < keys.size(); i++)
            if (keys[i] == nm) return (int)i;
        return -1;
    };

    for (int r = 0; r < reps; r++) {
        std::printf("-- rep %d (n=%ld, %ld blocks of %ld)\n", r, n, nBlocks,
                    blockSize);
        std::vector<double> accF(keys.size(), 0), accI(keys.size(), 0);
        double grandF = 0, grandI = 0;
        bool allOk = true;
        for (long b = 0; b < nBlocks; b++) {
        const u8* blockData = data.data() + b * blockSize;
        long bn = std::min(blockSize, n - b * blockSize);
        Ctx ctx{};
        ctx.bsVersion = 6;
        ctx.blockSize = (i32)blockSize;
        ctx.size = (i32)bn;
        ctx.entropyType = etype;
        ctx.lzVariant = 14;  // LZP for level 7 slots
        // container.cpp:153 — TEXT variant 2 for NONE/ANS0/HUFFMAN/RANGE
        ctx.textCodecVariant =
            (etype == 0 || etype == 5 || etype == 1 || etype == 4) ? 2 : 1;
        ctx.sbrtMode = 2;

        const u8* cur = blockData;
        i32 curLen = (i32)bn;
        u8* ping = bufA.data();
        u8* pong = bufB.data();
        std::vector<std::pair<int, i32>> applied;  // (ttype, pre-size)
        double t_total = 0;
        for (auto& st : chain) {
            ctx.size = curLen;
            i32 olen = 0;
            auto t0 = Clock::now();
            int rc = transformForward(st.ttype, cur, curLen, ping, cap, ctx,
                                      &olen);
            double dt = ms_since(t0);
            t_total += dt;
            accF[keyIdx(st.name)] += dt;
            if (rc == 0) {
                if (detail)
                    std::printf("  fwd %-5s %8.1f ms  %9d -> %9d\n", st.name,
                                dt, curLen, olen);
                applied.push_back({st.ttype, curLen});
                cur = ping;
                curLen = olen;
                std::swap(ping, pong);
            } else if (detail) {
                std::printf("  fwd %-5s %8.1f ms  SKIP (rc=%d)\n", st.name,
                            dt, rc);
            }
        }
        ctx.size = curLen;
        auto t0 = Clock::now();
        int64_t ebits = kz_entropy_encode(etype, cur, curLen, ebuf.data(),
                                          (i64)ebuf.size(), &ctx);
        double dt = ms_since(t0);
        t_total += dt;
        accF[keyIdx("ENT")] += dt;
        grandF += t_total;
        if (detail) {
            std::printf("  fwd ENT   %8.1f ms  %9d -> %9lld bytes\n", dt,
                        curLen, (long long)((ebits + 7) / 8));
            std::printf("  fwd TOTAL %8.1f ms  %.1f MB/s\n", t_total,
                        bn / t_total / 1e3);
        }

        // inverse direction
        double t_itotal = 0;
        std::vector<u8> dec(cap);
        ctx.size = curLen;
        t0 = Clock::now();
        int64_t drc = kz_entropy_decode(etype, ebuf.data(),
                                        (ebits + 7) / 8, dec.data(), curLen,
                                        &ctx);
        dt = ms_since(t0);
        t_itotal += dt;
        accI[keyIdx("ENT")] += dt;
        if (detail)
            std::printf("  inv ENT   %8.1f ms  (rc=%lld)\n", dt,
                        (long long)drc);
        cur = dec.data();
        for (int i = (int)applied.size() - 1; i >= 0; i--) {
            int tt = applied[i].first;
            i32 expect = applied[i].second;
            ctx.size = curLen;
            i32 olen = 0;
            t0 = Clock::now();
            int rc = transformInverse(tt, cur, curLen, ping, cap, ctx, &olen);
            dt = ms_since(t0);
            t_itotal += dt;
            const char* nm = "?";
            for (auto& st : chain)
                if (st.ttype == tt) nm = st.name;
            accI[keyIdx(nm)] += dt;
            if (detail)
                std::printf("  inv %-5s %8.1f ms  %9d -> %9d (rc=%d)\n", nm,
                            dt, curLen, olen, rc);
            if (rc != 0) break;
            if (olen != expect && i == 0)
                std::printf("  !! size mismatch: got %d want %d\n", olen,
                            expect);
            cur = ping;
            curLen = olen;
            std::swap(ping, pong);
        }
        bool ok = curLen == (i32)bn && std::memcmp(cur, blockData, bn) == 0;
        allOk = allOk && ok;
        grandI += t_itotal;
        if (detail)
            std::printf("  inv TOTAL %8.1f ms  %.1f MB/s  roundtrip=%s\n",
                        t_itotal, bn / t_itotal / 1e3, ok ? "OK" : "FAIL");
        }  // block loop
        if (!detail) {
            for (size_t i = 0; i < keys.size(); i++)
                std::printf("  stage %-5s fwd %8.0f ms  inv %8.0f ms\n",
                            keys[i].c_str(), accF[i], accI[i]);
            std::printf("  TOTAL fwd %8.0f ms (%.1f MB/s)  inv %8.0f ms "
                        "(%.1f MB/s)  roundtrip=%s\n",
                        grandF, n / grandF / 1e3, grandI, n / grandI / 1e3,
                        allOk ? "OK" : "FAIL");
        }
    }
    return 0;
}
