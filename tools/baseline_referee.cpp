// Measured baseline referee for the reference's hot path (VERDICT r2 #5).
//
// The reference repo publishes NO numbers (BASELINE.md), so bench.py's
// vs_baseline denominator was a per-op napkin estimate.  This program
// replaces it with a MEASUREMENT: a single-threaded C++ implementation of
// the same arithmetic inner loops SEAL executes for the reference's
// ComputePowers + eval_patstock hot stack
// (/root/reference/receiver/apsu/receiver_osn.cpp:395-540,
//  /root/reference/receiver/apsu/bin_bundle.cpp:106-360), with SEAL's
// operation inventory at the 16M-4096 shape, compiled -O3 -march=native
// on this machine and scaled by the documented 32-thread server assumption
// (generously assuming PERFECT thread scaling, which favors the reference).
//
// This is a TIMING referee, not a correctness referee: twiddle/key tables
// are synthetic (the instruction streams are data-independent — all
// reductions are branchless, as in SEAL), so the measured cost per op is
// that of a well-optimized AVX-era scalar SEAL build.  Ops measured:
//
//   * mul_mod_barrett  — SEAL util::multiply_uint_mod (2-word const ratio)
//   * mul_mod_shoup    — SEAL util::multiply_uint_mod_lazy (Harvey/Shoup)
//   * ntt_plane        — Harvey lazy negacyclic NTT, one 56-bit limb, N=8192
//   * multiply_plain_acc — evaluator.multiply_plain(NTT) + add_inplace
//   * behz_multiply    — BFV ct×ct: FastBConv lifts, NTTs, tensor, INTTs,
//                        t/Q scale-down + Shenoy-Kumaresan (SEAL BEHZ flow)
//   * relinearize      — RNS key switch: L digits × (L+1)-limb NTT + dyadic
//                        key product, INTT, special-prime mod-down
//
// Assembly at 16M-4096 (N=8192, data limbs L=3 at eval level, Bsk=L+1):
//   powers   = 264 ct×ct+relin   (PowersDag wavefront, 4 bundle indices)
//   eval row = 44×29 multiply_plain_acc + 28 behz + 1 relin   (eval_patstock)
//   query    = powers + 24 rows  (4 bundle idx × 6 caches)
//
// Output: one JSON line with per-op microseconds and the derived
// single-thread / 32-thread full-query bundles-per-second.
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

static const int N = 8192;
static const int LOGN = 13;
static const int L = 3;      // data limbs at the PS eval level (chain idx 2)
static const int LBSK = 4;   // SEAL BEHZ auxiliary base size = L + 1

struct Modulus {
  u64 p;
  u64 ratio_hi, ratio_lo;  // floor(2^128 / p), SEAL const_ratio[1],[0]
};

static Modulus make_modulus(u64 p) {
  // floor(2^128 / p) via long division of 2^128 by p
  u128 one = ((u128)1) << 64;
  u64 hi = (u64)(one / p);          // floor(2^64/p) -> high word seed
  u128 rem = (one % p) << 64;       // remainder shifted
  u64 lo = (u64)(rem / p);
  return {p, hi, lo};
}

// SEAL util::barrett_reduce_128 + multiply_uint_mod
static inline u64 mul_mod_barrett(u64 a, u64 b, const Modulus &m) {
  u128 z = (u128)a * b;
  u64 zlo = (u64)z, zhi = (u64)(z >> 64);
  // tmp = floor(z * ratio / 2^128) (SEAL's 3-multiply estimate)
  u128 t1 = (u128)zlo * m.ratio_lo;
  u128 t2 = (u128)zlo * m.ratio_hi + (u64)(t1 >> 64);
  u128 t3 = (u128)zhi * m.ratio_lo + (u64)t2;
  u64 carry = (u64)(t2 >> 64) + (u64)(t3 >> 64);
  u64 tmp = zhi * m.ratio_hi + carry;
  u64 r = zlo - tmp * m.p;
  return r >= m.p ? r - m.p : r;
}

// SEAL util::multiply_uint_mod_lazy (Shoup), result < 2p
static inline u64 mul_mod_shoup_lazy(u64 a, u64 w, u64 wq, u64 p) {
  u64 q = (u64)(((u128)a * wq) >> 64);
  return a * w - q * p;
}

static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

volatile u64 g_sink;

// Harvey lazy negacyclic forward NTT over one limb plane (SEAL ntt_negacyclic_harvey)
static void ntt_plane(u64 *x, const u64 *tw, const u64 *twq, u64 p) {
  u64 two_p = 2 * p;
  int t = N >> 1;
  int widx = 1;
  for (int m = 1; m < N; m <<= 1) {
    for (int i = 0; i < m; i++) {
      u64 w = tw[widx], wq = twq[widx];
      widx++;
      u64 *xu = x + 2 * i * t, *xv = xu + t;
      for (int j = 0; j < t; j++) {
        u64 u = xu[j];
        u = u >= two_p ? u - two_p : u;
        u64 v = mul_mod_shoup_lazy(xv[j], w, wq, p);
        xu[j] = u + v;
        xv[j] = u + two_p - v;
      }
    }
    t >>= 1;
  }
  for (int j = 0; j < N; j++) {
    u64 u = x[j];
    u = u >= two_p ? u - two_p : u;
    x[j] = u >= p ? u - p : u;
  }
}

struct Bufs {
  std::vector<u64> tw, twq;                // [N] twiddles per stage-position
  std::vector<u64> plane;                  // [N]
  std::vector<u64> ct, pt, acc, tmp;       // [2*L*N] and friends
  std::vector<u64> wide;                   // scratch for behz (Bsk-sized)
  Modulus mq, mb;
};

static Bufs make_bufs() {
  Bufs b;
  // 56-bit NTT-friendly prime p ≡ 1 (mod 2N): search down from 2^56
  u64 p = ((u64)1 << 56) - (1 << 14) + 1;
  while (true) {
    // trial division is fine here (one-time)
    bool prime = p % 2 == 1;
    for (u64 d = 3; prime && d * d <= p; d += 2)
      if (p % d == 0) prime = false;
    if (prime && p % (2 * N) == 1) break;
    p -= 2 * N;  // keep p ≡ 1 mod 2N
  }
  b.mq = make_modulus(p);
  b.mb = make_modulus(p - 2 * N * 4);  // second modulus for Bsk loops (timing only)
  b.tw.resize(N);
  b.twq.resize(N);
  u64 s = 0x9e3779b97f4a7c15ull;
  for (int i = 0; i < N; i++) {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    b.tw[i] = s % p;
    b.twq[i] = (u64)((((u128)b.tw[i]) << 64) / p);
  }
  b.plane.assign(N, 1);
  b.ct.assign(2 * LBSK * N, 3);
  b.pt.assign(LBSK * N, 5);
  b.acc.assign(3 * LBSK * N, 7);
  b.tmp.assign(3 * LBSK * N, 9);
  b.wide.assign(3 * (L + LBSK + 1) * N, 11);
  return b;
}

// evaluator.multiply_plain (NTT form) + add_inplace: 2 comps × L limbs
static void multiply_plain_acc(Bufs &b) {
  for (int c = 0; c < 2; c++)
    for (int l = 0; l < L; l++) {
      u64 *ct = &b.ct[(c * L + l) * N];
      u64 *pt = &b.pt[l * N];
      u64 *tmp = &b.tmp[(c * L + l) * N];
      u64 *acc = &b.acc[(c * L + l) * N];
      for (int j = 0; j < N; j++)  // dyadic_product_coeffmod
        tmp[j] = mul_mod_barrett(ct[j], pt[j], b.mq);
      for (int j = 0; j < N; j++) {  // add_poly_coeffmod
        u64 z = acc[j] + tmp[j];
        acc[j] = z >= b.mq.p ? z - b.mq.p : z;
      }
    }
}

// SEAL BEHZ ct×ct multiply at L data limbs (evaluator.cpp bfv_multiply flow)
static void behz_multiply(Bufs &b) {
  // 1. FastBConv q -> Bsk ∪ {m_tilde} for 4 polys (2 cts × 2 comps):
  //    per out limb, per coeff: L barrett madds
  for (int poly = 0; poly < 4; poly++)
    for (int out = 0; out < LBSK + 1; out++) {
      u64 *dst = &b.wide[(out % 3) * N];
      for (int j = 0; j < N; j++) {
        u64 acc = 0;
        for (int l = 0; l < L; l++)
          acc += mul_mod_barrett(b.ct[(l % (2 * L)) * N + j],
                                 b.tw[(l * 97 + out) & (N - 1)], b.mb);
        dst[j] = acc;
      }
    }
  // 2. sm_mrq (Montgomery reduce m_tilde): 4 polys × LBSK planes of madds
  for (int poly = 0; poly < 4; poly++)
    for (int l = 0; l < LBSK; l++)
      for (int j = 0; j < N; j++)
        b.wide[l * N + j] = mul_mod_barrett(b.wide[l * N + j], b.tw[j], b.mb);
  // 3. forward NTT of both operands in q and Bsk: 4 × (L + LBSK) planes
  for (int k = 0; k < 4 * (L + LBSK); k++)
    ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
  // 4. tensor (c0,c1,c2): per limb of q∪Bsk: 4 dyadic mults + 1 add
  for (int l = 0; l < L + LBSK; l++) {
    const Modulus &m = l < L ? b.mq : b.mb;
    u64 *a0 = &b.ct[0], *a1 = &b.ct[L * N];
    u64 *o = &b.acc[(l % 3) * N];
    for (int j = 0; j < N; j++) {
      u64 c0 = mul_mod_barrett(a0[j], a0[j], m);
      u64 x = mul_mod_barrett(a0[j], a1[j], m);
      u64 y = mul_mod_barrett(a1[j], a0[j], m);
      u64 c1 = x + y >= m.p ? x + y - m.p : x + y;
      u64 c2 = mul_mod_barrett(a1[j], a1[j], m);
      o[j] = c0 ^ c1 ^ c2;
    }
  }
  // 5. INTT: 3 comps × (L + LBSK) planes
  for (int k = 0; k < 3 * (L + LBSK); k++)
    ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
  // 6. scale & round: ×t (shoup) on all planes, fast-floor conv q->Bsk
  //    (3 polys × LBSK out × L madds), Shenoy-Kumaresan back (3 × L out × LBSK)
  for (int k = 0; k < 3 * (L + LBSK); k++)
    for (int j = 0; j < N; j++)
      b.wide[j] = mul_mod_shoup_lazy(b.wide[j], b.tw[j], b.twq[j], b.mq.p);
  for (int poly = 0; poly < 3; poly++)
    for (int out = 0; out < LBSK + L; out++)
      for (int j = 0; j < N; j++) {
        u64 acc = 0;
        for (int l = 0; l < (out < LBSK ? L : LBSK); l++)
          acc += mul_mod_barrett(b.acc[(l % 3) * N + j],
                                 b.tw[(l * 31 + out) & (N - 1)], b.mb);
        b.tmp[(out % 3) * N + j] = acc;
      }
  g_sink += b.tmp[0];
}

// RNS key switch of one 3rd component: L digits, key limbs = L+1
static void relinearize(Bufs &b) {
  // per digit: NTT at (L+1) planes + dyadic madd against 2 key polys
  for (int d = 0; d < L; d++) {
    for (int k = 0; k < L + 1; k++)
      ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
    for (int c = 0; c < 2; c++)
      for (int l = 0; l < L + 1; l++) {
        u64 *acc = &b.acc[(c * (L + 1) + l) % (3 * LBSK) * N];
        u64 *key = &b.pt[(l % LBSK) * N];
        for (int j = 0; j < N; j++) {
          u128 z = (u128)acc[j] * key[j];  // lazy 128-bit accumulate (SEAL)
          acc[j] = (u64)z + (u64)(z >> 64);
        }
      }
  }
  // INTT 2×(L+1) planes + special-prime mod-down: 2 × L × N shoup
  for (int k = 0; k < 2 * (L + 1); k++)
    ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
  for (int c = 0; c < 2; c++)
    for (int l = 0; l < L; l++)
      for (int j = 0; j < N; j++)
        b.acc[l * N + j] =
            mul_mod_shoup_lazy(b.acc[l * N + j] + b.mq.p - b.tmp[j], b.tw[j],
                               b.twq[j], b.mq.p);
  g_sink += b.acc[0];
}

template <typename F>
static double time_op(F &&f, int iters) {
  f();  // warm
  double t0 = now_s();
  for (int i = 0; i < iters; i++) f();
  return (now_s() - t0) / iters;
}

// ---- runtime-L generalizations (the 256M-4096 branch; the 16M path above
// keeps its original compile-time-L code so the banked BASELINE_MEASURED
// numbers stay byte-reproducible) --------------------------------------

static void multiply_plain_acc_g(Bufs &b, int Ld) {
  for (int c = 0; c < 2; c++)
    for (int l = 0; l < Ld; l++) {
      u64 *ct = &b.ct[((c * Ld + l) % (2 * LBSK)) * N];
      u64 *pt = &b.pt[(l % LBSK) * N];
      u64 *tmp = &b.tmp[((c * Ld + l) % (3 * LBSK)) * N];
      u64 *acc = &b.acc[((c * Ld + l) % (3 * LBSK)) * N];
      for (int j = 0; j < N; j++)
        tmp[j] = mul_mod_barrett(ct[j], pt[j], b.mq);
      for (int j = 0; j < N; j++) {
        u64 z = acc[j] + tmp[j];
        acc[j] = z >= b.mq.p ? z - b.mq.p : z;
      }
    }
}

static void behz_multiply_g(Bufs &b, int Ld) {
  int Lb = Ld + 1;  // SEAL Bsk = data limbs + 1
  for (int poly = 0; poly < 4; poly++)
    for (int out = 0; out < Lb + 1; out++) {
      u64 *dst = &b.wide[(out % 3) * N];
      for (int j = 0; j < N; j++) {
        u64 acc = 0;
        for (int l = 0; l < Ld; l++)
          acc += mul_mod_barrett(b.ct[(l % (2 * LBSK)) * N + j],
                                 b.tw[(l * 97 + out) & (N - 1)], b.mb);
        dst[j] = acc;
      }
    }
  for (int poly = 0; poly < 4; poly++)
    for (int l = 0; l < Lb; l++)
      for (int j = 0; j < N; j++)
        b.wide[(l % 3) * N + j] =
            mul_mod_barrett(b.wide[(l % 3) * N + j], b.tw[j], b.mb);
  for (int k = 0; k < 4 * (Ld + Lb); k++)
    ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
  for (int l = 0; l < Ld + Lb; l++) {
    const Modulus &m = l < Ld ? b.mq : b.mb;
    u64 *a0 = &b.ct[0], *a1 = &b.ct[LBSK * N];
    u64 *o = &b.acc[(l % 3) * N];
    for (int j = 0; j < N; j++) {
      u64 c0 = mul_mod_barrett(a0[j], a0[j], m);
      u64 x = mul_mod_barrett(a0[j], a1[j], m);
      u64 y = mul_mod_barrett(a1[j], a0[j], m);
      u64 c1 = x + y >= m.p ? x + y - m.p : x + y;
      u64 c2 = mul_mod_barrett(a1[j], a1[j], m);
      o[j] = c0 ^ c1 ^ c2;
    }
  }
  for (int k = 0; k < 3 * (Ld + Lb); k++)
    ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
  for (int k = 0; k < 3 * (Ld + Lb); k++)
    for (int j = 0; j < N; j++)
      b.wide[j] = mul_mod_shoup_lazy(b.wide[j], b.tw[j], b.twq[j], b.mq.p);
  for (int poly = 0; poly < 3; poly++)
    for (int out = 0; out < Lb + Ld; out++)
      for (int j = 0; j < N; j++) {
        u64 acc = 0;
        for (int l = 0; l < (out < Lb ? Ld : Lb); l++)
          acc += mul_mod_barrett(b.acc[(l % 3) * N + j],
                                 b.tw[(l * 31 + out) & (N - 1)], b.mb);
        b.tmp[(out % 3) * N + j] = acc;
      }
  g_sink += b.tmp[0];
}

static void relinearize_g(Bufs &b, int Ld) {
  for (int d = 0; d < Ld; d++) {
    for (int k = 0; k < Ld + 1; k++)
      ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
    for (int c = 0; c < 2; c++)
      for (int l = 0; l < Ld + 1; l++) {
        u64 *acc = &b.acc[(c * (Ld + 1) + l) % (3 * LBSK) * N];
        u64 *key = &b.pt[(l % LBSK) * N];
        for (int j = 0; j < N; j++) {
          u128 z = (u128)acc[j] * key[j];
          acc[j] = (u64)z + (u64)(z >> 64);
        }
      }
  }
  for (int k = 0; k < 2 * (Ld + 1); k++)
    ntt_plane(b.plane.data(), b.tw.data(), b.twq.data(), b.mq.p);
  for (int c = 0; c < 2; c++)
    for (int l = 0; l < Ld; l++)
      for (int j = 0; j < N; j++)
        b.acc[(l % (3 * LBSK)) * N + j] =
            mul_mod_shoup_lazy(b.acc[(l % (3 * LBSK)) * N + j] + b.mq.p -
                                   b.tmp[j],
                               b.tw[j], b.twq[j], b.mq.p);
  g_sink += b.acc[0];
}

// 256M-4096 op inventory (parameters/256M-4096.json): N=8192,
// ps_low_degree=310 -> ph=311, K=4000 -> nh=12 high powers, 13 segments;
// query powers [1,4,10,11,28,33,78,118,143 | 311,1555] = 9 low + 2 high
// sources -> (310-9) + (12-2) = 311 DAG products per bundle index, B=3.
// Reference levels (SEAL semantics, receiver_osn.cpp:446-488 +
// bin_bundle.cpp regen at chain index 2): powers at the FULL data chain
// (4 of the 5 limbs in [50,50,50,38,30]; the 30-bit limb is the special
// prime), eval after one mod-switch at 3 limbs.  C (caches per bundle)
// comes from argv (the grid run's measured value; ~34 = ceil(132507/4000)).
static int main_256m(int C) {
  Bufs b = make_bufs();
  const int LP = 4;  // powers: full data chain
  const int LE = 3;  // eval: chain index 2
  double t_mpa = time_op([&] { multiply_plain_acc_g(b, LE); }, 100);
  double t_mul_p = time_op([&] { behz_multiply_g(b, LP); }, 20);
  double t_rel_p = time_op([&] { relinearize_g(b, LP); }, 20);
  double t_mul_e = time_op([&] { behz_multiply_g(b, LE); }, 20);
  double t_rel_e = time_op([&] { relinearize_g(b, LE); }, 20);

  double powers_s = 3 * 311.0 * (t_mul_p + t_rel_p);
  double row_s = 310.0 * 13.0 * t_mpa + 12.0 * t_mul_e + t_rel_e;
  int rows = 3 * C;
  double query_1t = powers_s + rows * row_s;
  double query_32t = query_1t / 32.0;
  printf(
      "{\"config\": \"256M-4096\", \"caches\": %d, "
      "\"multiply_plain_acc_us\": %.2f, \"behz_multiply_pow_us\": %.2f, "
      "\"relinearize_pow_us\": %.2f, \"behz_multiply_eval_us\": %.2f, "
      "\"relinearize_eval_us\": %.2f, "
      "\"powers_s_1t\": %.3f, \"eval_row_s_1t\": %.4f, "
      "\"query_s_1t\": %.3f, \"query_s_32t\": %.4f, "
      "\"full_query_bundles_per_sec_32t\": %.3f, "
      "\"assumptions\": \"single-thread measured on this host, scaled by 32 "
      "threads with perfect scaling; SEAL-semantics op inventory at "
      "256M-4096 (powers L=4 data limbs, eval L=3 after one switch, "
      "Bsk=L+1, N=8192); caches from the measured grid placement\"}\n",
      C, t_mpa * 1e6, t_mul_p * 1e6, t_rel_p * 1e6, t_mul_e * 1e6,
      t_rel_e * 1e6, powers_s, row_s, query_1t, query_32t,
      rows / query_32t);
  return 0;
}

int main(int argc, char **argv) {
  if (argc > 1 && std::strcmp(argv[1], "256m") == 0)
    return main_256m(argc > 2 ? std::atoi(argv[2]) : 34);
  Bufs b = make_bufs();

  double t_ntt = time_op([&] { ntt_plane(b.plane.data(), b.tw.data(),
                                         b.twq.data(), b.mq.p); }, 200);
  double t_mpa = time_op([&] { multiply_plain_acc(b); }, 200);
  double t_mul = time_op([&] { behz_multiply(b); }, 30);
  double t_rel = time_op([&] { relinearize(b); }, 30);

  // 16M-4096 assembly (N=8192, ps_low_degree=44, K=1304 -> nh=28 high powers,
  // 29 segments; 4 bundle indices × 6 caches = 24 rows; PowersDag computes
  // (44 + 28 - 6 sources) ≈ 66 products per bundle index = 264 ct×ct+relin)
  double powers_s = 264.0 * (t_mul + t_rel);
  double row_s = 44.0 * 29.0 * t_mpa + 28.0 * t_mul + t_rel;
  double query_1t = powers_s + 24.0 * row_s;
  double query_32t = query_1t / 32.0;  // PERFECT scaling assumed (generous)
  // non-PS hot-kernel referee: deg-1304 dot product per bundle
  double hot_row_1t = 1304.0 * t_mpa;

  printf(
      "{\"ntt_plane_us\": %.2f, \"multiply_plain_acc_us\": %.2f, "
      "\"behz_multiply_us\": %.2f, \"relinearize_us\": %.2f, "
      "\"powers_s_1t\": %.3f, \"eval_row_s_1t\": %.4f, "
      "\"query_s_1t\": %.3f, \"query_s_32t\": %.4f, "
      "\"full_query_bundles_per_sec_32t\": %.2f, "
      "\"hot_kernel_bundles_per_sec_32t\": %.2f, "
      "\"assumptions\": \"single-thread measured on this host, scaled by "
      "32 threads with perfect scaling; SEAL-semantics op inventory at "
      "16M-4096 (L=3 eval limbs, Bsk=4, N=8192)\"}\n",
      t_ntt * 1e6, t_mpa * 1e6, t_mul * 1e6, t_rel * 1e6, powers_s, row_s,
      query_1t, query_32t, 24.0 / query_32t, 32.0 / hot_row_1t);
  return 0;
}
