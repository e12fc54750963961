// Suffix array construction via SA-IS (induced sorting), from scratch.
//
// The reference builds its BWT on Yuta Mori's divsufsort
// (v2/transform/DivSufSort.go); we use SA-IS instead — the suffix array of a
// string is unique, so the resulting BWT bytes are identical and the choice
// of algorithm is free (see SURVEY.md §7.1 step 5).
//
// Classic formulation with an explicit appended sentinel (unique smallest
// character at the end), which yields the standard order where a suffix that
// is a prefix of another sorts first — the same order divsufsort produces.
//
// Performance notes (this kernel dominates levels 5-7 encode):
// - the (symbol, S/L-type) pair is fused into one element `st = sym<<1|type`,
//   so the induced-sort inner loops touch ONE random cache line per suffix
//   instead of two; level 0 uses u16 elements (257 symbols + type = 10 bits),
//   halving memory traffic against an i32 symbol array;
// - the induced sorts software-prefetch the st element of the suffix that
//   will be processed a few iterations ahead (they are latency-bound random
//   gathers; the SA read itself is sequential);
// - scratch comes from a grow-only thread-local pool (fresh multi-MB
//   allocations fault expensively on this host).
//
// Ge Nong, Sen Zhang, Wai Hong Chan:
// "Two Efficient Algorithms for Linear Time Suffix Array Construction" (2009).

#include "kz.h"

namespace kz {

namespace {

constexpr int SAIS_PREFETCH = 16;

// st: length n, st[i] = (sym[i] << 1) | Stype[i]; sym values in [0, K);
// st[n-1] == 1 (sentinel: unique minimum symbol 0, S-type).
// SA: length n output. buckets/counts: length K scratch.
template <typename ST>
void saisCore(const ST* st, i32* SA, i32 n, i32 K, std::vector<i32>& counts,
              std::vector<i32>& buckets) {
    auto isLMS = [&](i32 i) {
        return i > 0 && (st[i] & 1) && !(st[i - 1] & 1);
    };

    counts.assign(K, 0);
    buckets.resize(K);
    for (i32 i = 0; i < n; i++) counts[st[i] >> 1]++;

    auto bucketEnds = [&]() {
        i32 sum = 0;
        for (i32 i = 0; i < K; i++) {
            sum += counts[i];
            buckets[i] = sum;
        }
    };
    auto bucketStarts = [&]() {
        i32 sum = 0;
        for (i32 i = 0; i < K; i++) {
            buckets[i] = sum;
            sum += counts[i];
        }
    };

    auto induce = [&]() {
        // L-type left-to-right
        bucketStarts();
        for (i32 i = 0; i < n; i++) {
            if (i + SAIS_PREFETCH < n) {
                i32 jp = SA[i + SAIS_PREFETCH];
                if (jp > 0) __builtin_prefetch(&st[jp - 1]);
            }
            i32 j = SA[i];
            if (j > 0) {
                ST prev = st[j - 1];
                if (!(prev & 1)) SA[buckets[prev >> 1]++] = j - 1;
            }
        }
        // S-type right-to-left
        bucketEnds();
        for (i32 i = n - 1; i >= 0; i--) {
            if (i - SAIS_PREFETCH >= 0) {
                i32 jp = SA[i - SAIS_PREFETCH];
                if (jp > 0) __builtin_prefetch(&st[jp - 1]);
            }
            i32 j = SA[i];
            if (j > 0) {
                ST prev = st[j - 1];
                if (prev & 1) SA[--buckets[prev >> 1]] = j - 1;
            }
        }
    };

    // Stage 1: place LMS suffixes at bucket ends, induce
    std::fill(SA, SA + n, -1);
    bucketEnds();
    for (i32 i = n - 1; i >= 1; i--)
        if (isLMS(i)) SA[--buckets[st[i] >> 1]] = i;
    induce();

    // Collect sorted LMS positions
    i32 m = 0;
    for (i32 i = 0; i < n; i++)
        if (SA[i] > 0 && isLMS(SA[i])) SA[m++] = SA[i];

    // Name LMS substrings in SA[m..] (ceil(n/2) slots suffice); two LMS
    // substrings get the same name iff symbols AND types match throughout,
    // which is exactly st-element equality. (A length-precompute + memcmp
    // variant was measured slower here: the cost is the random access to
    // the two substrings, not the per-element walk.)
    i32* names = SA + m;
    std::fill(names, SA + n, -1);
    i32 name = 0, prev = -1;
    for (i32 i = 0; i < m; i++) {
        i32 pos = SA[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            for (i32 d = 0;; d++) {
                if (st[prev + d] != st[pos + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (isLMS(prev + d) || isLMS(pos + d))) {
                    diff = !(isLMS(prev + d) && isLMS(pos + d));
                    break;
                }
                // the sentinel (unique min, LMS) bounds every comparison,
                // so d cannot run past the end
            }
        }
        if (diff) {
            name++;
            prev = pos;
        }
        names[pos >> 1] = name - 1;
    }

    // Build the reduced string (LMS names in text order), with types
    std::vector<i32> s1(m);
    for (i32 i = 0, j = 0; i < n - m; i++)
        if (names[i] >= 0) s1[j++] = names[i];

    // Stage 2: order LMS suffixes
    std::vector<i32> SA1(m);
    if (name < m) {
        // recurse on the reduced string: compute its types, fuse, and go.
        // Text-like inputs keep every recursion level's alphabet small
        // (measured: <25k names at all depths on mixed text), so u16 fused
        // elements — half the random-gather footprint of the induce loops —
        // apply almost always; u32 is the correctness fallback.
        std::vector<i32> saved(counts.begin(), counts.begin() + K);
        if (name < 32768) {
            std::vector<u16> st1(m);
            st1[m - 1] = (u16)((s1[m - 1] << 1) | 1);
            for (i32 i = m - 2; i >= 0; i--) {
                bool sType = (s1[i] < s1[i + 1]) ||
                             (s1[i] == s1[i + 1] && (st1[i + 1] & 1));
                st1[i] = (u16)((s1[i] << 1) | (sType ? 1 : 0));
            }
            saisCore<u16>(st1.data(), SA1.data(), m, name, counts, buckets);
        } else {
            std::vector<u32> st1(m);
            st1[m - 1] = (u32)(s1[m - 1] << 1) | 1;
            for (i32 i = m - 2; i >= 0; i--) {
                bool sType = (s1[i] < s1[i + 1]) ||
                             (s1[i] == s1[i + 1] && (st1[i + 1] & 1));
                st1[i] = ((u32)s1[i] << 1) | (sType ? 1 : 0);
            }
            saisCore<u32>(st1.data(), SA1.data(), m, name, counts, buckets);
        }
        counts.assign(saved.begin(), saved.end());  // restore (K ints, not an n-pass)
        buckets.resize(K);  // recursion shrank it to `name`; capacity is still >= K
    } else {
        for (i32 i = 0; i < m; i++) SA1[s1[i]] = i;
    }

    // LMS positions in text order
    std::vector<i32> lmsPos;
    lmsPos.reserve(m);
    for (i32 i = 1; i < n; i++)
        if (isLMS(i)) lmsPos.push_back(i);

    // Stage 3: place fully sorted LMS suffixes, induce final SA
    std::fill(SA, SA + n, -1);
    bucketEnds();
    for (i32 i = m - 1; i >= 0; i--) {
        i32 j = lmsPos[SA1[i]];
        SA[--buckets[st[j] >> 1]] = j;
    }
    induce();
}

struct SaisPools {
    std::vector<u16> st;
    std::vector<i32> sa, counts, buckets;
};

SaisPools& saisPools() {
    static thread_local SaisPools p;
    return p;
}

}  // namespace

// Standard suffix array of src (length n >= 1) into sa.
void suffixArray(const u8* src, i32* sa, i32 n) {
    if (n <= 0) return;
    if (n == 1) {
        sa[0] = 0;
        return;
    }
    SaisPools& pools = saisPools();
    std::vector<u16>& st = pools.st;
    if ((i32)st.size() < n + 1) st.resize(n + 1);
    // fused (symbol+1, type) elements, right to left
    st[n] = 1;  // sentinel: symbol 0, S-type
    {
        u16 next = (u16)(((u16)src[n - 1] + 1) << 1);  // L vs sentinel
        st[n - 1] = next;
        for (i32 i = n - 2; i >= 0; i--) {
            u16 symShifted = (u16)(((u16)src[i] + 1) << 1);
            u16 nextSym = (u16)(next & ~(u16)1);
            u16 cur = symShifted;
            if (symShifted < nextSym || (symShifted == nextSym && (next & 1)))
                cur |= 1;
            st[i] = cur;
            next = cur;
        }
    }
    std::vector<i32>& SA = pools.sa;
    if ((i32)SA.size() < n + 1) SA.resize(n + 1);
    saisCore<u16>(st.data(), SA.data(), n + 1, 257, pools.counts, pools.buckets);
    // SA[0] is the sentinel suffix; drop it
    std::memcpy(sa, SA.data() + 1, (size_t)n * sizeof(i32));
}

}  // namespace kz
