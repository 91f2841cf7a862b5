// Benes-network route generation (switch programming from a permutation).
//
// Role of the reference's Benes router (/root/reference/common/apsu/permute/
// apsu_benes.cpp:112): given a permutation of n = 2^m elements, compute the
// straight/cross setting of every switch of the 2m-1 level network.
// Classic recursive 2-coloring (Waksman routing); the oblivious evaluation
// itself is vectorized numpy on the Python side.
//
// In-place strided layout: level L has stride 2^dep with dep = min(L,
// 2m-2-L); it pairs wires (a, a+stride) for a in blocks of 2*stride, the
// switch id of pair a being (a >> (dep+1))*stride + (a & (stride-1)).
// A subproblem (base, stride) of size 2^k covers global wires
// base + j*stride; its upper/lower children are (base, 2*stride) and
// (base+stride, 2*stride).

#include <cstdint>
#include <cstring>
#include <vector>

typedef int64_t i64;

namespace {

// perm: local permutation of size 2^k (perm[out] = in). Writes switch bits.
void route(int k, i64 base, i64 stride, int level_in, int level_out,
           const std::vector<i64> &perm, uint8_t **rows) {
    const i64 sz = (i64)1 << k;
    if (k == 1) {
        // single switch at the middle level; cross iff output 0 takes input 1
        rows[level_in][base] = (uint8_t)(perm[0] != 0);
        return;
    }
    const i64 h = sz >> 1;
    std::vector<i64> inv(sz);
    for (i64 o = 0; o < sz; o++) inv[perm[o]] = o;

    // 2-color output wires: color 0 = routed through the upper child
    std::vector<int8_t> color(sz, -1);
    for (i64 start = 0; start < sz; start++) {
        if (color[start] != -1) continue;
        i64 w = start;
        int c = 0;
        while (color[w] == -1) {
            color[w] = (int8_t)c;
            color[w ^ 1] = (int8_t)(1 - c);
            i64 src_sibling = perm[w ^ 1];
            i64 partner_in = src_sibling ^ 1;  // same input switch
            w = inv[partner_in];               // must take color c again
        }
    }

    std::vector<i64> up(h), lo(h);
    for (i64 j = 0; j < h; j++) {
        // output switch j: outputs (2j, 2j+1); cross iff output 2j comes
        // from the lower child
        rows[level_out][j * stride + base] = (uint8_t)(color[2 * j] == 1);
        i64 up_out = color[2 * j] == 0 ? 2 * j : 2 * j + 1;
        i64 lo_out = up_out ^ 1;
        up[j] = perm[up_out] >> 1;  // child-local sources (input-switch ids)
        lo[j] = perm[lo_out] >> 1;
    }
    for (i64 i = 0; i < h; i++) {
        // input switch i: wires (2i, 2i+1); straight sends 2i to the upper
        // child, so cross iff wire 2i's output is colored lower
        rows[level_in][i * stride + base] = (uint8_t)(color[inv[2 * i]] == 1);
    }
    route(k - 1, base, stride * 2, level_in + 1, level_out - 1, up, rows);
    route(k - 1, base + stride, stride * 2, level_in + 1, level_out - 1, lo, rows);
}

}  // namespace

extern "C" {

// perm: [n] int64 with perm[out] = in; n = 2^m, m >= 1.
// settings_out: [(2m-1) * (n/2)] uint8, row-major [level][switch].
void benes_route(const i64 *perm, i64 n, uint8_t *settings_out) {
    int m = 0;
    while (((i64)1 << m) < n) m++;
    const int levels = 2 * m - 1;
    const i64 half = n / 2;
    memset(settings_out, 0, (size_t)levels * half);
    std::vector<uint8_t *> rows(levels);
    for (int L = 0; L < levels; L++) rows[L] = settings_out + (i64)L * half;
    std::vector<i64> p(perm, perm + n);
    route(m, 0, 1, 0, levels - 1, p, rows.data());
}

// Reference evaluation of the network (testing/the clear part of the OSN):
// swaps rows of `values` [n, w] in place according to the settings.
void benes_apply(const uint8_t *settings, i64 n, uint8_t *values, i64 w) {
    int m = 0;
    while (((i64)1 << m) < n) m++;
    const int levels = 2 * m - 1;
    const i64 half = n / 2;
    std::vector<uint8_t> tmp(w);
    for (int L = 0; L < levels; L++) {
        const int dep = L < (levels - 1 - L) ? L : (levels - 1 - L);
        const i64 stride = (i64)1 << dep;
        const uint8_t *row = settings + (i64)L * half;
        for (i64 blk = 0; blk < n; blk += 2 * stride) {
            for (i64 j = 0; j < stride; j++) {
                const i64 a = blk + j;
                const i64 sidx = (a >> (dep + 1)) * stride + (a & (stride - 1));
                if (row[sidx]) {
                    memcpy(tmp.data(), values + a * w, w);
                    memcpy(values + a * w, values + (a + stride) * w, w);
                    memcpy(values + (a + stride) * w, tmp.data(), w);
                }
            }
        }
    }
}

}  // extern "C"
