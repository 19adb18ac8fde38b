// Fused DC level shift + reversible color transform (RCT), both
// directions.  Exact-integer analog of mct_np.rct_fwd/rct_inv +
// dc_shift_fwd/dc_shift_inv (reference: src/lib/jp2/mct/mct.cpp:85
// encode_rev, :143 decode_rev) — one streaming pass instead of the
// half-dozen numpy temporaries, OpenMP across row ranges.
//
// Only the reversible path lives here: it is pure int32 arithmetic, so
// fusing cannot change results.  The irreversible (ICT) path stays in
// numpy/BLAS where its float op order is pinned by the golden corpus.

#include <cstdint>
#include <omp.h>

namespace {
constexpr int64_t PAR_MIN = int64_t(1) << 18;
}

extern "C" {

// y = (r' + 2g' + b') >> 2, u = b' - g', v = r' - g' with x' = x - shift.
// In-place safe (out may alias in): each element depends only on the
// same index.
int grok_rct_fwd(const int32_t* r, const int32_t* g, const int32_t* b,
                 int32_t* y, int32_t* u, int32_t* v, int64_t n,
                 int32_t s0, int32_t s1, int32_t s2, int nthreads) {
#pragma omp parallel for schedule(static) num_threads(nthreads) \
    if (n >= PAR_MIN)
    for (int64_t i = 0; i < n; i++) {
        int32_t rr = r[i] - s0, gg = g[i] - s1, bb = b[i] - s2;
        y[i] = (rr + 2 * gg + bb) >> 2;
        u[i] = bb - gg;
        v[i] = rr - gg;
    }
    return 0;
}

// g = y - ((u+v)>>2); r = v+g; b = u+g; then per-component DC unshift
// and clamp to [lo, hi].  In-place safe.
int grok_rct_inv(const int32_t* y, const int32_t* u, const int32_t* v,
                 int32_t* r, int32_t* g, int32_t* b, int64_t n,
                 const int32_t* shifts, const int32_t* lo,
                 const int32_t* hi, int nthreads) {
    int32_t s0 = shifts[0], s1 = shifts[1], s2 = shifts[2];
    int32_t l0 = lo[0], l1 = lo[1], l2 = lo[2];
    int32_t h0 = hi[0], h1 = hi[1], h2 = hi[2];
#pragma omp parallel for schedule(static) num_threads(nthreads) \
    if (n >= PAR_MIN)
    for (int64_t i = 0; i < n; i++) {
        int32_t gg = y[i] - ((u[i] + v[i]) >> 2);
        int32_t rr = v[i] + gg + s0;
        int32_t bb = u[i] + gg + s2;
        gg += s1;
        r[i] = rr < l0 ? l0 : (rr > h0 ? h0 : rr);
        g[i] = gg < l1 ? l1 : (gg > h1 ? h1 : gg);
        b[i] = bb < l2 ? l2 : (bb > h2 ? h2 : bb);
    }
    return 0;
}

// Plain fused DC shift + clamp for the no-MCT decode path.
int grok_dc_unshift(const int32_t* in, int32_t* out, int64_t n,
                    int32_t shift, int32_t lo, int32_t hi, int nthreads) {
#pragma omp parallel for schedule(static) num_threads(nthreads) \
    if (n >= PAR_MIN)
    for (int64_t i = 0; i < n; i++) {
        int32_t x = in[i] + shift;
        out[i] = x < lo ? lo : (x > hi ? hi : x);
    }
    return 0;
}

}  // extern "C"
