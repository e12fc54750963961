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
// Ge Nong, Sen Zhang, Wai Hong Chan:
// "Two Efficient Algorithms for Linear Time Suffix Array Construction" (2009).

#include "kz.h"

namespace kz {

namespace {

// s: length n, values in [0, K); s[n-1] == 0 is the unique minimum (sentinel).
// SA: length n output.
void saisRec(const i32* s, i32* SA, i32 n, i32 K) {
    std::vector<bool> t(n);  // S-type flag
    t[n - 1] = true;
    for (i32 i = n - 2; i >= 0; i--)
        t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);

    auto isLMS = [&](i32 i) { return i > 0 && t[i] && !t[i - 1]; };

    std::vector<i32> counts(K, 0), buckets(K);
    for (i32 i = 0; i < n; i++) counts[s[i]]++;

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
            i32 j = SA[i];
            if (j > 0 && !t[j - 1]) SA[buckets[s[j - 1]]++] = j - 1;
        }
        // S-type right-to-left
        bucketEnds();
        for (i32 i = n - 1; i >= 0; i--) {
            i32 j = SA[i];
            if (j > 0 && t[j - 1]) SA[--buckets[s[j - 1]]] = j - 1;
        }
    };

    // Stage 1: place LMS suffixes at bucket ends, induce
    std::fill(SA, SA + n, -1);
    bucketEnds();
    for (i32 i = n - 1; i >= 1; i--)
        if (isLMS(i)) SA[--buckets[s[i]]] = i;
    induce();

    // Collect sorted LMS positions
    i32 m = 0;
    for (i32 i = 0; i < n; i++)
        if (SA[i] > 0 && isLMS(SA[i])) SA[m++] = SA[i];

    // Name LMS substrings in SA[m..] (ceil(n/2) slots suffice)
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
                if (s[prev + d] != s[pos + d] || t[prev + d] != t[pos + d]) {
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

    // Build the reduced string (LMS names in text order)
    std::vector<i32> s1(m);
    for (i32 i = 0, j = 0; i < n - m; i++)
        if (names[i] >= 0) s1[j++] = names[i];

    // Stage 2: order LMS suffixes
    std::vector<i32> SA1(m);
    if (name < m) {
        saisRec(s1.data(), SA1.data(), m, name);
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
        SA[--buckets[s[j]]] = j;
    }
    induce();
}

}  // namespace

// Standard suffix array of src (length n >= 1) into sa.
void suffixArray(const u8* src, i32* sa, i32 n) {
    if (n <= 0) return;
    if (n == 1) {
        sa[0] = 0;
        return;
    }
    std::vector<i32> s(n + 1);
    for (i32 i = 0; i < n; i++) s[i] = (i32)src[i] + 1;
    s[n] = 0;  // sentinel, unique minimum
    std::vector<i32> SA(n + 1);
    saisRec(s.data(), SA.data(), n + 1, 257);
    // SA[0] is the sentinel suffix; drop it
    std::memcpy(sa, SA.data() + 1, (size_t)n * sizeof(i32));
}

}  // namespace kz
