#include <cstdio>
#include <cstdint>
#include <cstring>
#include <vector>
#include <chrono>
namespace kz { void suffixArray(const uint8_t*, int32_t*, int32_t); }
extern double g_t[8];
int main(int argc, char** argv) {
    FILE* f = fopen(argv[1], "rb");
    std::vector<uint8_t> data(1<<22);
    size_t n = fread(data.data(), 1, data.size(), f);
    fclose(f);
    std::vector<int32_t> sa(n);
    double best = 1e9;
    for (int r = 0; r < 7; r++) {
        memset(g_t, 0, sizeof(double)*8);
        auto t0 = std::chrono::steady_clock::now();
        kz::suffixArray(data.data(), sa.data(), (int32_t)n);
        double dt = std::chrono::duration<double>(std::chrono::steady_clock::now()-t0).count();
        if (dt < best) { best = dt;
            printf("run %d: total %.1f ms | induce1 %.1f name %.1f recurse %.1f induce3 %.1f\n",
                   r, dt*1000, g_t[0]*1000, g_t[1]*1000, g_t[2]*1000, g_t[3]*1000);
        }
    }
    printf("best %.1f ms (%.1f MB/s)\n", best*1000, n/best/1e6);
    return 0;
}
