// Stage profiler for the L5-7 hot path: times the suffix sort, the BWT
// emit, and SBRT-RANK on a data file, isolating where level-encode cycles
// go. Build:
//   g++ -O3 -march=native -std=c++17 -I kanzi_tpu/native/src \
//       tools/prof_stages.cpp kanzi_tpu/native/build/*.o -o /tmp/prof_stages
// (link the already-built objects; this file only drives internals)

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "kz.h"

namespace kz {
const i32* suffixArrayView(const u8* src, i32 n);
int sbrtForward(const u8* src, i32 count, u8* dst, i64 cap, int mode,
                i32* outLen);
int transformForward(int ttype, const u8* src, i32 n, u8* dst, i64 cap,
                     Ctx& ctx, i32* outLen);
}

using namespace kz;
using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
    return std::chrono::duration<double, std::milli>(Clock::now() - t0)
        .count();
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: prof_stages <datafile> [reps]\n");
        return 2;
    }
    FILE* fh = std::fopen(argv[1], "rb");
    if (!fh) return 2;
    std::fseek(fh, 0, SEEK_END);
    long n = std::ftell(fh);
    std::fseek(fh, 0, SEEK_SET);
    std::vector<u8> data((size_t)n);
    if (std::fread(data.data(), 1, (size_t)n, fh) != (size_t)n) return 2;
    std::fclose(fh);
    int reps = argc > 2 ? std::atoi(argv[2]) : 3;

    std::vector<u8> out((size_t)n + 1024);

    // suffix sort (pooled; first call pays the pool faults)
    suffixArrayView(data.data(), (i32)n);
    for (int r = 0; r < reps; r++) {
        auto t0 = Clock::now();
        const i32* sa = suffixArrayView(data.data(), (i32)n);
        double t_sort = ms_since(t0);
        (void)sa;
        std::printf("sort   %8.1f ms  %.1f MB/s\n", t_sort,
                    n / t_sort / 1e3);
    }

    // full BWT forward (sort + emit) via the transform entry
    Ctx ctx{};
    ctx.bsVersion = 6;
    ctx.size = (i32)n;
    i32 olen = 0;
    transformForward(1 /*BWT*/, data.data(), (i32)n, out.data(),
                     (i64)out.size(), ctx, &olen);
    for (int r = 0; r < reps; r++) {
        auto t0 = Clock::now();
        transformForward(1, data.data(), (i32)n, out.data(),
                         (i64)out.size(), ctx, &olen);
        std::printf("bwt    %8.1f ms\n", ms_since(t0));
    }

    // RANK on the BWT output (the real chain input for SBRT)
    std::vector<u8> bwt_out(out.begin(), out.begin() + olen);
    std::vector<u8> rank_out((size_t)olen + 16);
    i32 rlen = 0;
    sbrtForward(bwt_out.data(), olen, rank_out.data(),
                (i64)rank_out.size(), 2, &rlen);
    for (int r = 0; r < reps; r++) {
        auto t0 = Clock::now();
        sbrtForward(bwt_out.data(), olen, rank_out.data(),
                    (i64)rank_out.size(), 2, &rlen);
        std::printf("rank   %8.1f ms  %.1f MB/s\n", ms_since(t0),
                    olen / ms_since(t0) / 1e3);
    }
    return 0;
}
