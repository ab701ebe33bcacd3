// Memory-level-parallelism probe for the FM occ walk.
//
// Question: how much faster does the SMEM/SA hot loop get if N dependent
// rank-walk chains are interleaved per thread (hiding the occ-block load
// latency) instead of walked one at a time?  The serial chain is the
// current collect_intv / fm_sa structure; the interleaved variant is the
// candidate "lane pool in C++" rewrite.  Measures both at L3-resident and
// DRAM-resident index sizes.
//
// Build+run: g++ -O3 -march=native -funroll-loops -std=c++17 \
//     tools/bench_mlp.cpp -o /tmp/bench_mlp -lz -lpthread && /tmp/bench_mlp
#include "../biscuit_tpu/native/align_host.cpp"

#include <chrono>
#include <random>
#include <sys/mman.h>

using bt::StrandFM;
using bt::invpsi_step;

static void build_random_fm(int64_t n, std::vector<uint32_t> &words,
                            std::vector<uint8_t> &ilv2,
                            std::vector<int64_t> &L2) {
    std::mt19937_64 rng(42);
    int64_t nw = (n + 15) / 16;
    words.assign(nw, 0);
    for (int64_t i = 0; i < n; ++i) {
        int c = (int)(rng() & 3);
        words[i >> 4] |= (uint32_t)c << (((~i) & 15) << 1);
    }
    int64_t nb = (n + 63) / 64;
    ilv2.assign((nb + 1) * 32, 0);
    int64_t cnt[4] = {0, 0, 0, 0};
    for (int64_t b = 0; b < nb; ++b) {
        uint8_t *blk = ilv2.data() + b * 32;
        uint32_t *cs = (uint32_t *)blk;
        uint64_t *ws = (uint64_t *)(blk + 16);
        for (int c = 0; c < 4; ++c) cs[c] = (uint32_t)cnt[c];
        for (int half = 0; half < 2; ++half) {
            uint64_t y = 0;
            for (int j = 0; j < 32; ++j) {
                int64_t i = b * 64 + half * 32 + j;
                int c = i < n ? (int)((words[i >> 4] >> (((~i) & 15) << 1)) & 3)
                              : 0;
                if (i < n) ++cnt[c];
                y |= (uint64_t)c << (62 - 2 * j);
            }
            ws[half] = y;
        }
    }
    L2.assign(5, 0);
    for (int c = 0; c < 4; ++c) L2[c + 1] = L2[c] + cnt[c];
}

int main() {
    bool huge = getenv("HUGE") && getenv("HUGE")[0] == '1';
    for (int64_t n : {16LL << 20, 256LL << 20}) {
        std::vector<uint32_t> words;
        std::vector<uint8_t> ilv2;
        std::vector<int64_t> L2;
        build_random_fm(n, words, ilv2, L2);
        uint8_t *ilv2p = ilv2.data();
        if (huge) {
            size_t sz = (ilv2.size() + (2<<20)) & ~((size_t)(2<<20) - 1);
            void *m = mmap(0, sz, PROT_READ | PROT_WRITE,
                           MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
            madvise(m, sz, MADV_HUGEPAGE);
            memcpy(m, ilv2.data(), ilv2.size());
            ilv2p = (uint8_t *)m;
        }
        StrandFM f{};
        f.words = words.data();
        f.L2 = L2.data();
        f.primary = n + 1;  // never skipped: pure rank walk
        f.seq_len = n;
        f.n_words = (int64_t)words.size();
        f.ilv2 = ilv2p;

        const int64_t total_steps = 1 << 22;
        // dependent address spreader: the next rank depends on the loaded
        // value but is forced to jump across the whole index (a synthetic
        // invPsi walk can hit a short cycle and sit in L1 otherwise)
        auto spread = [n](int64_t v) {
            return 1 + (int64_t)(((uint64_t)v * 0x9E3779B97F4A7C15ULL) %
                                 (uint64_t)(n - 1));
        };
        // serial: one dependent chain
        volatile int64_t sink = 0;
        int64_t k = 1;
        auto t0 = std::chrono::steady_clock::now();
        for (int64_t s = 0; s < total_steps; ++s) {
            k = spread(invpsi_step(f, k));
        }
        sink += k;
        double serial_s = std::chrono::duration<double>(
                              std::chrono::steady_clock::now() - t0)
                              .count();

        for (int lanes : {4, 8, 16, 32}) {
            std::vector<int64_t> ks(lanes);
            for (int i = 0; i < lanes; ++i) ks[i] = 1 + i * (n / lanes);
            t0 = std::chrono::steady_clock::now();
            for (int64_t s = 0; s < total_steps / lanes; ++s) {
                // issue prefetches for every lane's block, then step all
                for (int i = 0; i < lanes; ++i) {
                    int64_t k2 = ks[i] - (ks[i] > f.primary ? 1 : 0);
                    __builtin_prefetch(f.ilv2 + ((k2 >> 6) << 5), 0, 1);
                }
                for (int i = 0; i < lanes; ++i) {
                    ks[i] = spread(invpsi_step(f, ks[i]));
                }
            }
            for (int i = 0; i < lanes; ++i) sink += ks[i];
            double inter_s = std::chrono::duration<double>(
                                 std::chrono::steady_clock::now() - t0)
                                 .count();
            printf("n=%3lldM serial=%6.1f ns/step  lanes=%2d interleaved=%6.1f "
                   "ns/step  speedup=%.2fx\n",
                   (long long)(n >> 20), serial_s / total_steps * 1e9, lanes,
                   inter_s / total_steps * 1e9, serial_s / inter_s);
        }
    }
    return 0;
}
