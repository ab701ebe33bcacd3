// Native host glue for the aligner hot path: FM-index search, SMEM seeding,
// chaining, and banded extension for one batch of reads, multithreaded.
//
// This is a from-scratch C++ transliteration of biscuit_tpu's own Python
// modules (ops/fm.py scalar path, align/smem.py, align/chain.py,
// align/region.py, ops/sw.py sw_extend) — NOT of the reference C sources.
// The Python modules remain the ground truth; tests/test_native_engine.py
// checks region-level equality, and the E2E SAM must stay byte-identical.
//
// Returns the per-read alignment regions exactly as worker1 produces them
// BEFORE mem_merge_regions; Python handles merging, pairing and SAM.
//
// Build: part of libbiscuit_native.so (see native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace bt {

// ---------------------------------------------------------------- FM index

struct StrandFM {
    const uint32_t *words;   // packed 2-bit BWT, base i at shift (15-(i&15))*2
    const int64_t *occ;      // [n_blocks+1][4] cumulative counts per 128 bases
    const int64_t *L2;       // [5]
    const uint32_t *sa;      // sampled SA every 32 ranks; sa[0] wraps as -1
    int64_t primary;
    int64_t seq_len;
    int64_t n_words;
};

static inline int popcount32(uint32_t x) { return __builtin_popcount(x); }

struct Occ4 { int64_t c[4]; };

static Occ4 occ4(const StrandFM &f, int64_t k) {
    Occ4 o{{0, 0, 0, 0}};
    if (k < 0) return o;
    if (k == f.seq_len) {
        for (int c = 0; c < 4; ++c) o.c[c] = f.L2[c + 1] - f.L2[c];
        return o;
    }
    if (k >= f.primary) k -= 1;
    int64_t w = k >> 4;
    uint32_t t_low = (~k) & 15;
    uint32_t word = f.words[w];
    if (t_low) {
        uint32_t sh = t_low << 1;
        word = (word >> sh) << sh;
    }
    const int64_t *base = f.occ + ((k >> 7) * 4);
    // counts inside the block, words before w
    int64_t cnt[4] = {0, 0, 0, 0};
    for (int64_t j = (k >> 7) << 3; j < w; ++j) {
        uint32_t y = f.words[j];
        uint32_t inv = ~y;
        cnt[0] += popcount32(((inv >> 1) & inv) & 0x55555555u);
        cnt[1] += popcount32(((inv >> 1) & y) & 0x55555555u);
        cnt[2] += popcount32(((y >> 1) & inv) & 0x55555555u);
        cnt[3] += popcount32(((y >> 1) & y) & 0x55555555u);
    }
    {
        uint32_t y = word;
        uint32_t inv = ~y;
        cnt[0] += popcount32(((inv >> 1) & inv) & 0x55555555u) - (int64_t)t_low;
        cnt[1] += popcount32(((inv >> 1) & y) & 0x55555555u);
        cnt[2] += popcount32(((y >> 1) & inv) & 0x55555555u);
        cnt[3] += popcount32(((y >> 1) & y) & 0x55555555u);
    }
    for (int c = 0; c < 4; ++c) o.c[c] = base[c] + cnt[c];
    return o;
}

struct Intv { int64_t x0, x1, s; int32_t end; };

// bwt_extend semantics on (x0, x1, s); is_back selects the queried axis.
static void fm_extend(const StrandFM &f, const Intv &ik, Intv out[4], bool is_back) {
    int64_t xq = is_back ? ik.x0 : ik.x1;
    int64_t xo = is_back ? ik.x1 : ik.x0;
    Occ4 tk = occ4(f, xq - 1);
    Occ4 tl = occ4(f, xq - 1 + ik.s);
    int64_t sizes[4], nxq[4];
    for (int c = 0; c < 4; ++c) {
        sizes[c] = tl.c[c] - tk.c[c];
        nxq[c] = f.L2[c] + 1 + tk.c[c];
    }
    int64_t crosses = (xq <= f.primary && xq + ik.s - 1 >= f.primary) ? 1 : 0;
    int64_t b3 = xo + crosses;
    int64_t b2 = b3 + sizes[3];
    int64_t b1 = b2 + sizes[2];
    int64_t b0 = b1 + sizes[1];
    int64_t nxo[4] = {b0, b1, b2, b3};
    for (int c = 0; c < 4; ++c) {
        out[c].s = sizes[c];
        if (is_back) { out[c].x0 = nxq[c]; out[c].x1 = nxo[c]; }
        else         { out[c].x0 = nxo[c]; out[c].x1 = nxq[c]; }
        out[c].end = ik.end;
    }
}

static inline int bwt_char(const StrandFM &f, int64_t k) {
    return (f.words[k >> 4] >> (((~k) & 15) << 1)) & 3;
}

static int64_t fm_sa(const StrandFM &f, int64_t k) {
    int64_t add = 0;
    while (k & 31) {
        ++add;
        int64_t x = k - (k > f.primary ? 1 : 0);
        int c = bwt_char(f, x);
        if (k == f.primary) k = 0;
        else k = f.L2[c] + occ4(f, k).c[c];
    }
    // sa[0] is the uint32 wrap of -1: interpret as signed so the result is
    // add - 1 when the walk reaches the '$' row (ops/fm.py)
    int64_t v = (int32_t)f.sa[k >> 5];
    return add + v;
}

// --------------------------------------------------------------- options

struct Opt {
    int32_t a, b, o_del, e_del, o_ins, e_ins, pen_clip5, pen_clip3, w, zdrop;
    int64_t max_mem_intv;
    int32_t min_seed_len, split_width;
    int64_t max_occ;
    int32_t max_chain_gap;
    double split_factor, mask_level, drop_ratio;
    int32_t min_chain_weight;
    int64_t max_chain_extend;
    int32_t flag, parent_policy, bsstrand;
    int8_t mats[2][25];     // [0]=gamat, [1]=ctmat; row = ref, col = read
};

// ----------------------------------------------------------------- SMEM

struct Seed5 { int32_t start, end; int64_t x0, x1, s; };

static int smem1a(const StrandFM &fm, const StrandFM &fmc, const uint8_t *q,
                  int len, int x, int64_t min_intv, std::vector<Seed5> &mem) {
    mem.clear();
    if (q[x] > 3) return x + 1;
    if (min_intv < 1) min_intv = 1;
    int c0 = q[x];
    Intv ik{fm.L2[c0] + 1, fmc.L2[3 - c0] + 1, fm.L2[c0 + 1] - fm.L2[c0],
            (int32_t)(x + 1)};
    std::vector<Intv> curr, prev;
    int i = x + 1;
    Intv ok[4];
    for (; i < len; ++i) {
        if (q[i] < 4) {
            int c = 3 - q[i];
            fm_extend(fmc, ik, ok, false);
            if (ok[c].s != ik.s) {
                curr.push_back(ik);
                if (ok[c].s < min_intv) break;
            }
            ik = ok[c];
            ik.end = i + 1;
        } else {
            curr.push_back(ik);
            break;
        }
    }
    if (i == len) curr.push_back(ik);
    std::reverse(curr.begin(), curr.end());
    int ret = curr[0].end;
    prev.swap(curr);

    std::vector<std::pair<int32_t, Intv>> out;  // (start, entry)
    for (i = x - 1; i >= -1; --i) {
        int c = (i < 0 || q[i] > 3) ? -1 : q[i];
        curr.clear();
        for (size_t j = 0; j < prev.size(); ++j) {
            const Intv &p = prev[j];
            bool have_ok = false;
            if (c >= 0) { fm_extend(fm, p, ok, true); have_ok = true; }
            if (c < 0 || ok[c].s < min_intv) {
                if (curr.empty()) {
                    if (out.empty() || i + 1 < out.back().first)
                        out.push_back({(int32_t)(i + 1), p});
                }
            } else if (curr.empty() || ok[c].s != curr.back().s) {
                Intv e = ok[c];
                e.end = p.end;
                curr.push_back(e);
            }
            (void)have_ok;
        }
        if (curr.empty()) break;
        prev.swap(curr);
    }
    for (auto it = out.rbegin(); it != out.rend(); ++it)
        mem.push_back({it->first, it->second.end, it->second.x0,
                       it->second.x1, it->second.s});
    return ret;
}

static int seed_strategy1(const StrandFM &fm, const StrandFM &fmc,
                          const uint8_t *q, int len, int x, int min_len,
                          int64_t max_intv, Seed5 &m) {
    m = Seed5{0, 0, 0, 0, 0};
    if (q[x] > 3) return x + 1;
    int c0 = q[x];
    Intv ik{fm.L2[c0] + 1, fmc.L2[3 - c0] + 1, fm.L2[c0 + 1] - fm.L2[c0], 0};
    Intv ok[4];
    for (int i = x + 1; i < len; ++i) {
        if (q[i] < 4) {
            int c = 3 - q[i];
            fm_extend(fmc, ik, ok, false);
            if (ok[c].s < max_intv && i - x >= min_len) {
                m = Seed5{(int32_t)x, (int32_t)(i + 1), ok[c].x0, ok[c].x1, ok[c].s};
                return i + 1;
            }
            ik = ok[c];
        } else return i + 1;
    }
    return len;
}

static void collect_intv(const Opt &opt, const StrandFM &fm, const StrandFM &fmc,
                         const uint8_t *q, int len, std::vector<Seed5> &mem) {
    mem.clear();
    int split_len = (int)(opt.min_seed_len * opt.split_factor + 0.499);
    std::vector<Seed5> tmp;
    int x = 0;
    while (x < len) {
        if (q[x] < 4) {
            x = smem1a(fm, fmc, q, len, x, 1, tmp);
            for (auto &s : tmp)
                if (s.end - s.start >= opt.min_seed_len) mem.push_back(s);
        } else ++x;
    }
    size_t old_n = mem.size();
    for (size_t k = 0; k < old_n; ++k) {
        Seed5 p = mem[k];
        if (p.end - p.start < split_len || p.s > opt.split_width) continue;
        smem1a(fm, fmc, q, len, (p.start + p.end) >> 1, p.s + 1, tmp);
        for (auto &s : tmp)
            if (s.end - s.start >= opt.min_seed_len) mem.push_back(s);
    }
    if (opt.max_mem_intv > 0) {
        x = 0;
        Seed5 m;
        while (x < len) {
            if (q[x] < 4) {
                x = seed_strategy1(fm, fmc, q, len, x, opt.min_seed_len,
                                   opt.max_mem_intv, m);
                if (m.s > 0) mem.push_back(m);
            } else ++x;
        }
    }
    std::stable_sort(mem.begin(), mem.end(), [](const Seed5 &a, const Seed5 &b) {
        return ((uint64_t)(uint32_t)a.start << 32 | (uint32_t)a.end) <
               ((uint64_t)(uint32_t)b.start << 32 | (uint32_t)b.end);
    });
}

// ------------------------------------------------------------------ bns

struct Bns {
    const int64_t *ann_off;  // [n_seqs]
    const int32_t *ann_len;
    const uint8_t *ann_alt;
    int32_t n_seqs;
    const uint8_t *pac;      // unpacked forward codes [l_pac]
    int64_t l_pac;
};

static int pos2rid(const Bns &b, int64_t pos_f) {
    if (pos_f >= b.l_pac) return -1;
    int left = 0, mid = 0, right = b.n_seqs;
    while (left < right) {
        mid = (left + right) >> 1;
        if (pos_f >= b.ann_off[mid]) {
            if (mid == b.n_seqs - 1) break;
            if (pos_f < b.ann_off[mid + 1]) break;
            left = mid + 1;
        } else right = mid;
    }
    return mid;
}

static int64_t depos(const Bns &b, int64_t pos, bool &is_rev) {
    is_rev = pos >= b.l_pac;
    return is_rev ? (b.l_pac << 1) - 1 - pos : pos;
}

static int intv2rid(const Bns &b, int64_t rb, int64_t re) {
    if (rb < b.l_pac && b.l_pac < re) return -2;
    bool rev;
    int rid_b = pos2rid(b, depos(b, rb, rev));
    int rid_e = rb < re ? pos2rid(b, depos(b, re - 1, rev)) : rid_b;
    return rid_b == rid_e ? rid_b : -1;
}

static void get_seq(const Bns &b, int64_t beg, int64_t end, std::vector<uint8_t> &out) {
    out.clear();
    if (end < beg) std::swap(beg, end);
    if (end > b.l_pac << 1) end = b.l_pac << 1;
    if (beg < 0) beg = 0;
    if (beg >= b.l_pac || end <= b.l_pac) {
        if (beg >= b.l_pac) {
            int64_t beg_f = (b.l_pac << 1) - end;
            int64_t end_f = (b.l_pac << 1) - beg;
            out.resize(end_f - beg_f);
            for (int64_t k = end_f - 1, l = 0; k >= beg_f; --k, ++l)
                out[l] = 3 - b.pac[k];
        } else {
            out.assign(b.pac + beg, b.pac + end);
        }
    }
}

// clamp to the contig of `mid` and fetch; returns rid
static int fetch_seq(const Bns &b, int64_t &beg, int64_t mid, int64_t &end,
                     std::vector<uint8_t> &out) {
    if (end < beg) std::swap(beg, end);
    bool is_rev;
    int rid = pos2rid(b, depos(b, mid, is_rev));
    int64_t far_beg = b.ann_off[rid];
    int64_t far_end = far_beg + b.ann_len[rid];
    if (is_rev) {
        int64_t t = far_beg;
        far_beg = (b.l_pac << 1) - far_end;
        far_end = (b.l_pac << 1) - t;
    }
    if (beg < far_beg) beg = far_beg;
    if (end > far_end) end = far_end;
    get_seq(b, beg, end, out);
    return rid;
}

// -------------------------------------------------------------- SW extend

struct ExtRes { int score, qle, tle, gtle, gscore, max_off; };

// exact ops/sw.py::sw_extend semantics
static ExtRes sw_extend(const uint8_t *query, int qlen, const uint8_t *target,
                        int tlen, const int8_t *mat /*5x5*/, int o_del,
                        int e_del, int o_ins, int e_ins, int w, int end_bonus,
                        int zdrop, int h0) {
    int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    std::vector<int> h_row(qlen + 1, 0), e_row(qlen + 1, 0);
    h_row[0] = h0;
    if (qlen >= 1) {
        h_row[1] = h0 > oe_ins ? h0 - oe_ins : 0;
        for (int j = 2; j <= qlen && h_row[j - 1] > e_ins; ++j)
            h_row[j] = h_row[j - 1] - e_ins;
    }
    int mmax = 0;
    for (int i = 0; i < 25; ++i) mmax = std::max(mmax, (int)mat[i]);
    int max_ins = (int)((double)(qlen * mmax + end_bonus - o_ins) / e_ins + 1.0);
    max_ins = std::max(max_ins, 1);
    w = std::min(w, max_ins);
    int max_del = (int)((double)(qlen * mmax + end_bonus - o_del) / e_del + 1.0);
    max_del = std::max(max_del, 1);
    w = std::min(w, max_del);

    int max_sc = h0, max_i = -1, max_j = -1, max_ie = -1, gscore = -1, max_off = 0;
    int beg = 0, end = qlen;
    std::vector<int> H(qlen);
    for (int i = 0; i < tlen; ++i) {
        if (beg < i - w) beg = i - w;
        if (end > i + w + 1) end = i + w + 1;
        if (end > qlen) end = qlen;
        int h1_first = beg == 0 ? std::max(h0 - (o_del + e_del * (i + 1)), 0) : 0;
        if (beg >= end) {
            h_row[end] = h1_first;
            e_row[end] = 0;
            if (end == qlen && gscore <= h1_first) {
                max_ie = i;
                gscore = std::max(gscore, h1_first);
            }
            break;
        }
        const int8_t *prof = mat + 5 * target[i];
        int f = 0;
        int m = 0, mj = -1;
        for (int j = beg; j < end; ++j) {
            int Hdiag = h_row[j];
            int E = e_row[j];
            int M = Hdiag ? Hdiag + prof[query[j]] : 0;
            int h = std::max(std::max(M, E), f);
            H[j] = h;
            if (m > h) { /* keep mj */ } else { mj = j; m = h; }
            int t = std::max(M - oe_del, 0);
            e_row[j] = std::max(E - e_del, t);
            t = std::max(M - oe_ins, 0);
            f = std::max(f - e_ins, t);
        }
        int h1_last = H[end - 1];
        // shifted store
        for (int j = end; j > beg; --j) h_row[j] = H[j - 1];
        h_row[beg] = h1_first;
        e_row[end] = 0;
        if (end == qlen) {
            if (gscore <= h1_last) { max_ie = i; gscore = h1_last; }
        }
        if (m == 0) break;
        if (m > max_sc) {
            max_sc = m; max_i = i; max_j = mj;
            max_off = std::max(max_off, std::abs(mj - i));
        } else if (zdrop > 0) {
            if (i - max_i > mj - max_j) {
                if (max_sc - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop) break;
            } else {
                if (max_sc - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop) break;
            }
        }
        // band shrink (scan shifted arrays; backward scan includes index end)
        int j = beg;
        while (j < end && h_row[j] == 0 && e_row[j] == 0) ++j;
        int new_beg = j;
        j = end;
        while (j >= new_beg && h_row[j] == 0 && e_row[j] == 0) --j;
        int new_end = std::min(j + 2, qlen);
        beg = new_beg;
        end = new_end;
    }
    return ExtRes{max_sc, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off};
}

// --------------------------------------------------------------- chaining

struct SeedHit { int64_t rbeg; int32_t qbeg, len, score; };

struct Chain {
    int64_t pos;
    std::vector<SeedHit> seeds, seeds_extra;
    int32_t rid;
    uint8_t is_alt;
    int32_t w = 0, kept = 0, first = -1;
    double frac_rep = 0.0;
};

static int chain_weight(const Chain &c) {
    int64_t end = 0;
    int64_t w = 0;
    for (auto &s : c.seeds) {
        if (s.qbeg >= end) w += s.len;
        else if (s.qbeg + s.len > end) w += s.qbeg + s.len - end;
        end = std::max(end, (int64_t)s.qbeg + s.len);
    }
    int64_t tmp = w;
    w = 0; end = 0;
    for (auto &s : c.seeds) {
        if (s.rbeg >= end) w += s.len;
        else if (s.rbeg + s.len > end) w += s.rbeg + s.len - end;
        end = std::max(end, s.rbeg + s.len);
    }
    w = std::min(w, tmp);
    return (int)std::min<int64_t>(w, (1 << 30) - 1);
}

static bool merge_seed_to_chain(const Opt &opt, int64_t l_pac, Chain &c,
                                const SeedHit &s, int rid) {
    const SeedHit &last = c.seeds.back();
    if (rid != c.rid) return false;
    if (s.qbeg >= c.seeds[0].qbeg && s.qbeg + s.len <= last.qbeg + last.len &&
        s.rbeg >= c.seeds[0].rbeg && s.rbeg + s.len <= last.rbeg + last.len) {
        c.seeds_extra.push_back(s);
        return true;
    }
    if ((last.rbeg < l_pac || c.seeds[0].rbeg < l_pac) && s.rbeg >= l_pac)
        return false;
    int64_t qdist = s.qbeg - last.qbeg;
    int64_t rdist = s.rbeg - last.rbeg;
    if (rdist >= 0 && qdist - rdist <= opt.w && rdist - qdist <= opt.w &&
        qdist - last.len < opt.max_chain_gap && rdist - last.len < opt.max_chain_gap) {
        c.seeds.push_back(s);
        return true;
    }
    return false;
}

// chain clustering from a precomputed sorted seed list
static void chain_from_seeds(const Opt &opt, const StrandFM &fm, const Bns &bns,
                             int len, int parent,
                             const std::vector<Seed5> &mem,
                             std::vector<Chain> &chains, double &frac_rep_out) {
    chains.clear();
    int64_t l_pac = bns.l_pac;
    // l_rep
    int64_t l_rep = 0, b = 0, e = 0;
    for (auto &iv : mem) {
        if (iv.s <= opt.max_occ) continue;
        if (iv.start > e) { l_rep += e - b; b = iv.start; e = iv.end; }
        else e = std::max<int64_t>(e, iv.end);
    }
    l_rep += e - b;
    frac_rep_out = (double)l_rep / len;

    std::vector<int64_t> keys;  // chain pos, sorted
    std::vector<Chain> tree;
    for (auto &iv : mem) {
        int32_t slen = iv.end - iv.start;
        int64_t k = 0, count = 0;
        while (k < iv.s && count < opt.max_occ &&
               ((count > 5 && k < opt.max_occ) || count <= 5)) {
            int64_t rbeg = fm_sa(fm, iv.x0 + k);
            ++k;
            SeedHit s{rbeg, iv.start, slen, slen};
            int rid = intv2rid(bns, rbeg, rbeg + slen);
            if (rid < 0) continue;
            if ((opt.bsstrand & 1)) {
                int bss = ((rbeg > l_pac) == (parent != 0)) ? 1 : 0;
                if (bss != (opt.bsstrand >> 1)) continue;
            }
            bool to_add = false;
            if (!tree.empty()) {
                // lower = chain with largest pos <= rbeg
                auto it = std::upper_bound(keys.begin(), keys.end(), rbeg);
                if (it == keys.begin()) to_add = true;
                else {
                    size_t j = (it - keys.begin()) - 1;
                    if (!merge_seed_to_chain(opt, l_pac, tree[j], s, rid))
                        to_add = true;
                }
            } else to_add = true;
            if (to_add) {
                ++count;
                Chain c;
                c.pos = rbeg;
                c.seeds.push_back(s);
                c.rid = rid;
                c.is_alt = bns.ann_alt[rid];
                auto it = std::upper_bound(keys.begin(), keys.end(), rbeg);
                size_t j = it - keys.begin();
                keys.insert(it, rbeg);
                tree.insert(tree.begin() + j, std::move(c));
            }
        }
    }
    for (auto &c : tree) c.frac_rep = frac_rep_out;
    chains.swap(tree);
}

static void chain_flt(const Opt &opt, std::vector<Chain> &chns) {
    if (chns.empty()) return;
    std::vector<Chain> kept_chains;
    for (auto &c : chns) {
        c.first = -1;
        c.kept = 0;
        c.w = chain_weight(c);
        if (c.w >= opt.min_chain_weight) kept_chains.push_back(std::move(c));
    }
    chns.swap(kept_chains);
    if (chns.empty()) return;
    std::stable_sort(chns.begin(), chns.end(),
                     [](const Chain &a, const Chain &b) { return a.w > b.w; });
    auto chn_beg = [](const Chain &c) { return c.seeds[0].qbeg; };
    auto chn_end = [](const Chain &c) {
        const SeedHit &s = c.seeds.back();
        return s.qbeg + s.len;
    };
    std::vector<int> to_keep{0};
    chns[0].kept = 3;
    for (size_t i = 1; i < chns.size(); ++i) {
        bool large_overlap = false, broke = false;
        for (size_t kidx = 0; kidx < to_keep.size(); ++kidx) {
            Chain &ci = chns[i];
            Chain &ck = chns[to_keep[kidx]];
            int b_max = std::max(chn_beg(ck), chn_beg(ci));
            int e_min = std::min(chn_end(ck), chn_end(ci));
            if (e_min > b_max && (!ck.is_alt || ci.is_alt)) {
                int li = chn_end(ci) - chn_beg(ci);
                int lj = chn_end(ck) - chn_beg(ck);
                int min_l = std::min(li, lj);
                if (e_min - b_max >= min_l * opt.mask_level &&
                    min_l < opt.max_chain_gap) {
                    large_overlap = true;
                    if (ck.first < 0) ck.first = (int)i;
                    if (ci.w < ck.w * opt.drop_ratio &&
                        ck.w - ci.w >= opt.min_seed_len << 1) {
                        broke = true;
                        break;
                    }
                }
            }
        }
        if (!broke) {
            to_keep.push_back((int)i);
            chns[i].kept = large_overlap ? 2 : 3;
        }
    }
    for (int idx : to_keep) {
        Chain &c = chns[idx];
        if (c.first >= 0) chns[c.first].kept = 1;
    }
    int64_t k = 0;
    size_t i = 0;
    for (; i < chns.size(); ++i) {
        if (chns[i].kept == 0 || chns[i].kept == 3) continue;
        if (++k >= opt.max_chain_extend) break;
    }
    for (size_t j = i; j < chns.size(); ++j)
        if (chns[j].kept < 3) chns[j].kept = 0;
    std::vector<Chain> outc;
    for (auto &c : chns)
        if (c.kept != 0) outc.push_back(std::move(c));
    chns.swap(outc);
}

// --------------------------------------------------------------- regions

struct Region {
    int64_t rb, re;
    int32_t qb, qe, rid, score, truesc, w, seedcov, seedlen0;
    float frac_rep;
    uint8_t bss, parent;
};

static int cal_max_gap(const Opt &opt, int qlen) {
    int l_del = (int)((double)(qlen * opt.a - opt.o_del) / opt.e_del + 1.0);
    int l_ins = (int)((double)(qlen * opt.a - opt.o_ins) / opt.e_ins + 1.0);
    int l = std::max(std::max(l_del, l_ins), 1);
    return std::min(l, opt.w << 1);
}

static void chain2region1(const Opt &opt, const Bns &bns,
                          const std::vector<uint8_t> &rseq, int64_t rmax0,
                          int64_t rmax1, int rid, int l_query,
                          const uint8_t *query, const std::vector<SeedHit> &seeds,
                          std::vector<Region> &regs, int parent, size_t reg0,
                          double frac_rep) {
    const int8_t *mat = opt.mats[parent ? 1 : 0];
    size_t n = seeds.size();
    std::vector<uint64_t> srt(n);
    for (size_t i = 0; i < n; ++i)
        srt[i] = ((uint64_t)(uint32_t)seeds[i].score << 32) | (uint32_t)i;
    std::sort(srt.begin(), srt.end());
    std::vector<bool> alive(n, true);

    for (int64_t k = (int64_t)n - 1; k >= 0; --k) {
        const SeedHit &s = seeds[(uint32_t)srt[k]];
        // asymmetric seed filter
        {
            bool bad = false;
            const uint8_t *r = rseq.data() + (s.rbeg - rmax0);
            for (int i = 0; i < s.len; ++i) {
                uint8_t rb = r[i], qb = query[s.qbeg + i];
                if ((rb == 3 && qb == 1) || (rb == 0 && qb == 2)) { bad = true; break; }
            }
            if (bad) continue;
        }
        // containment test vs existing regions
        size_t u = reg0;
        bool contained = false;
        for (; u < regs.size(); ++u) {
            const Region &reg = regs[u];
            if (s.rbeg < reg.rb || s.rbeg + s.len > reg.re ||
                s.qbeg < reg.qb || s.qbeg + s.len > reg.qe) continue;
            if (s.len - reg.seedlen0 > 0.1 * l_query) continue;
            int qd = s.qbeg - reg.qb;
            int64_t rd = s.rbeg - reg.rb;
            int mg = cal_max_gap(opt, std::min<int64_t>(qd, rd));
            int w = std::min(mg, reg.w);
            if (qd - rd < w && rd - qd < w) { contained = true; break; }
            qd = reg.qe - (s.qbeg + s.len);
            rd = reg.re - (s.rbeg + s.len);
            mg = cal_max_gap(opt, std::min<int64_t>(qd, rd));
            w = std::min(mg, reg.w);
            if (qd - rd < w && rd - qd < w) { contained = true; break; }
        }
        if (contained) {
            bool overlapping = false;
            for (size_t i2 = k + 1; i2 < n; ++i2) {
                if (!alive[(uint32_t)srt[i2]]) continue;
                const SeedHit &t = seeds[(uint32_t)srt[i2]];
                if (t.len < s.len * 0.95) continue;
                if (s.qbeg <= t.qbeg && s.qbeg + s.len - t.qbeg >= s.len >> 2 &&
                    t.qbeg - s.qbeg != t.rbeg - s.rbeg) { overlapping = true; break; }
                if (t.qbeg <= s.qbeg && t.qbeg + t.len - s.qbeg >= s.len >> 2 &&
                    s.qbeg - t.qbeg != s.rbeg - t.rbeg) { overlapping = true; break; }
            }
            if (!overlapping) {
                alive[(uint32_t)srt[k]] = false;
                continue;
            }
        }
        // extension
        Region reg{};
        reg.w = opt.w;
        reg.score = reg.truesc = -1;
        reg.rid = rid;
        int aw0 = opt.w, aw1 = opt.w;
        // left
        if (s.qbeg == 0) {
            reg.score = reg.truesc = s.len * opt.a;
            reg.qb = 0;
            reg.rb = s.rbeg;
        } else {
            std::vector<uint8_t> qs(s.qbeg), rs(s.rbeg - rmax0);
            for (int i = 0; i < s.qbeg; ++i) qs[i] = query[s.qbeg - 1 - i];
            int64_t tmp = s.rbeg - rmax0;
            for (int64_t i = 0; i < tmp; ++i) rs[i] = rseq[tmp - 1 - i];
            ExtRes r{};
            for (int t = 0; t < 2; ++t) {
                int prev = reg.score;
                aw0 = opt.w << t;
                r = sw_extend(qs.data(), qs.size(), rs.data(), rs.size(), mat,
                              opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, aw0,
                              opt.pen_clip5, opt.zdrop, s.len * opt.a);
                reg.score = r.score;
                if (reg.score == prev || r.max_off < (aw0 >> 1) + (aw0 >> 2)) break;
            }
            if (r.gscore <= 0 || r.gscore <= reg.score - opt.pen_clip5) {
                reg.qb = s.qbeg - r.qle;
                reg.rb = s.rbeg - r.tle;
                reg.truesc = reg.score;
            } else {
                reg.qb = 0;
                reg.rb = s.rbeg - r.gtle;
                reg.truesc = r.gscore;
            }
        }
        // right
        if (s.qbeg + s.len == l_query) {
            reg.qe = l_query;
            reg.re = s.rbeg + s.len;
        } else {
            int sc0 = reg.score;
            int qe = s.qbeg + s.len;
            int64_t re_ = s.rbeg + s.len - rmax0;
            ExtRes r{};
            for (int t = 0; t < 2; ++t) {
                int prev = reg.score;
                aw1 = opt.w << t;
                r = sw_extend(query + qe, l_query - qe, rseq.data() + re_,
                              (int)(rmax1 - rmax0 - re_), mat, opt.o_del,
                              opt.e_del, opt.o_ins, opt.e_ins, aw1,
                              opt.pen_clip3, opt.zdrop, sc0);
                reg.score = r.score;
                if (reg.score == prev || r.max_off < (aw1 >> 1) + (aw1 >> 2)) break;
            }
            if (r.gscore <= 0 || r.gscore <= reg.score - opt.pen_clip3) {
                reg.qe = qe + r.qle;
                reg.re = rmax0 + re_ + r.tle;
                reg.truesc += reg.score - sc0;
            } else {
                reg.qe = l_query;
                reg.re = rmax0 + re_ + r.gtle;
                reg.truesc += r.gscore - sc0;
            }
        }
        reg.bss = ((reg.rb > bns.l_pac) == (parent != 0)) ? 1 : 0;
        reg.parent = (uint8_t)parent;
        uint8_t bss_e = ((reg.re > bns.l_pac) == (parent != 0)) ? 1 : 0;
        if (bss_e != reg.bss) continue;  // crosses the strand boundary
        reg.seedcov = 0;
        for (auto &t : seeds) {
            if (t.qbeg >= reg.qb && t.qbeg + t.len <= reg.qe &&
                t.rbeg >= reg.rb && t.rbeg + t.len <= reg.re)
                reg.seedcov += t.len;
        }
        reg.w = std::max(aw0, aw1);
        reg.seedlen0 = s.len;
        reg.frac_rep = (float)frac_rep;
        regs.push_back(reg);
    }
}

static void chain2region(const Opt &opt, const Bns &bns, int l_query,
                         const uint8_t *query, int parent,
                         std::vector<Chain> &chns, std::vector<Region> &regs) {
    size_t reg0 = regs.size();
    for (auto &c : chns) {
        if (c.seeds.empty()) continue;
        int64_t rmax0 = bns.l_pac << 1, rmax1 = 0;
        for (auto &s : c.seeds) {
            int64_t b = s.rbeg - (s.qbeg + cal_max_gap(opt, s.qbeg));
            int64_t e = s.rbeg + s.len +
                ((l_query - s.qbeg - s.len) +
                 cal_max_gap(opt, l_query - s.qbeg - s.len));
            rmax0 = std::min(rmax0, b);
            rmax1 = std::max(rmax1, e);
        }
        rmax0 = std::max<int64_t>(rmax0, 0);
        rmax1 = std::min<int64_t>(rmax1, bns.l_pac << 1);
        if (rmax0 < bns.l_pac && bns.l_pac < rmax1) {
            if (c.seeds[0].rbeg < bns.l_pac) rmax1 = bns.l_pac;
            else rmax0 = bns.l_pac;
        }
        std::vector<uint8_t> rseq;
        int rid = fetch_seq(bns, rmax0, c.seeds[0].rbeg, rmax1, rseq);
        size_t n0 = regs.size();
        chain2region1(opt, bns, rseq, rmax0, rmax1, rid, l_query, query,
                      c.seeds, regs, parent, reg0, c.frac_rep);
        if (regs.size() == n0 && !c.seeds_extra.empty())
            chain2region1(opt, bns, rseq, rmax0, rmax1, rid, l_query, query,
                          c.seeds_extra, regs, parent, reg0, c.frac_rep);
    }
}

// --------------------------------------------------------------- worker1

struct Ctx {
    StrandFM fm[2];  // 0 = daughter, 1 = parent
    Bns bns;
    Opt opt;
};

// align one read against one strand: convert, seed, chain, filter, extend
static void align1_core(const Ctx &cx, const uint8_t *seq, int len, int parent,
                        std::vector<Region> &regs, bool &needs_fallback) {
    if (len < cx.opt.min_seed_len) return;  // mem_chain early-out
    // mem_flt_chained_seeds gate: active only for long reads / explicit
    // min_chain_weight — fall back to the Python engine in that case
    double min_l = cx.opt.min_chain_weight
        ? 1.1 * cx.opt.min_chain_weight : 5.5 * std::log((double)len);
    if (!(min_l > 0.05 * len)) { needs_fallback = true; return; }
    std::vector<uint8_t> conv(seq, seq + len);
    if (parent) {
        for (auto &c : conv) if (c == 1) c = 3;
    } else {
        for (auto &c : conv) if (c == 2) c = 0;
    }
    const StrandFM &fm = cx.fm[parent];
    const StrandFM &fmc = cx.fm[1 - parent];
    std::vector<Seed5> mem;
    collect_intv(cx.opt, fm, fmc, conv.data(), len, mem);
    std::vector<Chain> chns;
    double frac_rep = 0.0;
    chain_from_seeds(cx.opt, fm, cx.bns, len, parent, mem, chns, frac_rep);
    chain_flt(cx.opt, chns);
    chain2region(cx.opt, cx.bns, len, seq, parent, chns, regs);
}

extern "C" {

struct StrandFMC {
    const uint32_t *words;
    const int64_t *occ;
    const int64_t *L2;
    const uint32_t *sa;
    int64_t primary, seq_len, n_words;
};

struct BnsC {
    const int64_t *ann_off;
    const int32_t *ann_len;
    const uint8_t *ann_alt;
    int32_t n_seqs;
    const uint8_t *pac;
    int64_t l_pac;
};

struct OptC {
    int32_t a, b, o_del, e_del, o_ins, e_ins, pen_clip5, pen_clip3, w, zdrop;
    int64_t max_mem_intv;
    int32_t min_seed_len, split_width;
    int64_t max_occ;
    int32_t max_chain_gap;
    double split_factor, mask_level, drop_ratio;
    int32_t min_chain_weight;
    int64_t max_chain_extend;
    int32_t flag, parent_policy, bsstrand, is_pe;
    int8_t gamat[25], ctmat[25];
};

struct RegionC {
    int64_t rb, re;
    int32_t qb, qe, rid, score, truesc, w, seedcov, seedlen0;
    float frac_rep;
    uint8_t bss, parent, pad0, pad1;
};

// worker1 over a batch. reads: concatenated nt4 codes; offs[i]..offs[i]+lens[i].
// out: per-read regions at out + i*cap; out_n[i] = count (or -1 => fall back
// to the Python engine for that read).
int bt_worker1_batch(const StrandFMC *dau, const StrandFMC *par, const BnsC *bns,
                     const OptC *optc, const uint8_t *reads, const int64_t *offs,
                     const int32_t *lens, int n_reads, RegionC *out, int cap,
                     int32_t *out_n, int n_threads) {
    Ctx cx;
    for (int i = 0; i < 2; ++i) {
        const StrandFMC *s = i ? par : dau;
        cx.fm[i] = StrandFM{s->words, s->occ, s->L2, s->sa, s->primary,
                            s->seq_len, s->n_words};
    }
    cx.bns = Bns{bns->ann_off, bns->ann_len, bns->ann_alt, bns->n_seqs,
                 bns->pac, bns->l_pac};
    Opt &o = cx.opt;
    o.a = optc->a; o.b = optc->b;
    o.o_del = optc->o_del; o.e_del = optc->e_del;
    o.o_ins = optc->o_ins; o.e_ins = optc->e_ins;
    o.pen_clip5 = optc->pen_clip5; o.pen_clip3 = optc->pen_clip3;
    o.w = optc->w; o.zdrop = optc->zdrop;
    o.max_mem_intv = optc->max_mem_intv;
    o.min_seed_len = optc->min_seed_len;
    o.split_width = optc->split_width;
    o.max_occ = optc->max_occ;
    o.max_chain_gap = optc->max_chain_gap;
    o.split_factor = optc->split_factor;
    o.mask_level = optc->mask_level;
    o.drop_ratio = optc->drop_ratio;
    o.min_chain_weight = optc->min_chain_weight;
    o.max_chain_extend = optc->max_chain_extend;
    o.flag = optc->flag;
    o.parent_policy = optc->parent_policy;
    o.bsstrand = optc->bsstrand;
    std::memcpy(o.mats[0], optc->gamat, 25);
    std::memcpy(o.mats[1], optc->ctmat, 25);
    bool pe = optc->is_pe != 0;

    auto run = [&](int lo, int hi) {
        std::vector<Region> regs;
        for (int i = lo; i < hi; ++i) {
            regs.clear();
            bool fallback = false;
            const uint8_t *seq = reads + offs[i];
            int len = lens[i];
            if (!pe) {
                int pp = o.parent_policy;
                if (!(pp & 1) || (pp >> 1))
                    align1_core(cx, seq, len, 0, regs, fallback);
                if (!(pp & 1) || !(pp >> 1))
                    align1_core(cx, seq, len, 1, regs, fallback);
            } else {
                bool r1 = (i % 2) == 0;
                int first = r1 ? 1 : 0;
                align1_core(cx, seq, len, first, regs, fallback);
                if (!o.parent_policy)
                    align1_core(cx, seq, len, 1 - first, regs, fallback);
            }
            if (fallback || (int)regs.size() > cap) {
                out_n[i] = -1;
                continue;
            }
            out_n[i] = (int32_t)regs.size();
            for (size_t j = 0; j < regs.size(); ++j) {
                const Region &r = regs[j];
                RegionC &rc = out[(int64_t)i * cap + j];
                rc.rb = r.rb; rc.re = r.re;
                rc.qb = r.qb; rc.qe = r.qe;
                rc.rid = r.rid; rc.score = r.score; rc.truesc = r.truesc;
                rc.w = r.w; rc.seedcov = r.seedcov; rc.seedlen0 = r.seedlen0;
                rc.frac_rep = r.frac_rep;
                rc.bss = r.bss; rc.parent = r.parent;
                rc.pad0 = rc.pad1 = 0;
            }
        }
    };
    if (n_threads <= 1) {
        run(0, n_reads);
    } else {
        std::vector<std::thread> ts;
        int chunk = (n_reads + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; ++t) {
            int lo = t * chunk, hi = std::min(n_reads, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back(run, lo, hi);
        }
        for (auto &t : ts) t.join();
    }
    return 0;
}

}  // extern "C"

}  // namespace bt
