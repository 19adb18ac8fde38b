// Host-side multi-level DWT (5/3 integer + 9/7 float), the CPU analog of
// the device kernels (ops/dwt_jax.py, ops/dwt_pallas.py) for the
// single-tile host path.  Canvas-coordinate lifting with periodic
// symmetric extension, matching the numpy oracle ops/dwt_np.py bit-for-bit
// (reference semantics: src/lib/jp2/transform/dwt53.cpp:150, dwt97.cpp:90).
//
// Performance structure (vs the reference's threaded line strips,
// WaveletForward.h:96-151 / dwt.cpp:774-852):
//  - boundary-peeled line kernels: the symmetric-extension `reflect` is
//    evaluated only for the first/last tap of each pass; the interior is
//    a branch-free stride-2 loop the compiler vectorizes (AVX2/AVX-512)
//  - 9/7 rows are deinterleaved once so all four lifting passes run on
//    contiguous arrays
//  - OpenMP parallel-for over rows in both the vertical and horizontal
//    passes (persistent libgomp pool, no per-level thread spawn)
//  - scratch buffers hoisted out of the level loop; no zero-fill of
//    buffers that are fully overwritten

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float ALPHA = -1.586134342059924f;
constexpr float BETA = -0.052980118572961f;
constexpr float GAMMA = 0.882911075530934f;
constexpr float DELTA = 0.443506852043971f;
constexpr double K = 1.230174104914001;
const float INV_K = (float)(1.0 / K);
const float K_HALF = (float)(K / 2.0);
const float TWO_OVER_K = (float)(2.0 / K);
const float K_F = (float)K;

static inline int ceil_div(int a, int b) { return (a + b - 1) / b; }

// Minimum elements in a pass before it is worth fanning rows out over
// OpenMP: below this the wakeup cost plus contention with the T1 worker
// pool (which runs right after the DWT in the tile pipeline) exceeds the
// win. 512^2 tiles run the DWT single-threaded; >=2K tiles parallelize.
constexpr size_t PAR_MIN = (size_t)1 << 21;
static inline int imax(int a, int b) { return a > b ? a : b; }

// Reflect canvas index i into [u0, u1).
static inline int reflect(int i, int u0, int u1) {
  int n = u1 - u0;
  if (n == 1) return u0;
  int period = 2 * (n - 1);
  int j = (i - u0) % period;
  if (j < 0) j += period;
  if (j >= n) j = period - j;
  return u0 + j;
}

// Parity geometry of a 1-D segment [u0, u0+n).
struct Par {
  int u0, u1, fe, fo, ne, no;
  // packed-index offsets valid in the interior (no reflection):
  //   even sample k, neighbors in odd array:  {k+d_eo, k+d_eo+1}
  //   odd  sample k, neighbors in even array: {k+d_oe, k+d_oe+1}
  int d_eo, d_oe;
  Par(int u0_, int n) : u0(u0_), u1(u0_ + n) {
    fe = (u0 & 1) ? u0 + 1 : u0;
    fo = (u0 & 1) ? u0 : u0 + 1;
    ne = n > 0 ? (u1 - fe + 1) / 2 : 0;
    no = n > 0 ? (u1 - fo + 1) / 2 : 0;
    d_eo = (fe - 1 - fo) >> 1;  // -1 (u0 even) or 0 (u0 odd)
    d_oe = (fo - 1 - fe) >> 1;  // -1 (u0 odd) or 0 (u0 even)
  }
  // interior ranges [k0, k1) for the even- and odd-indexed passes
  // (outside them, pos±1 leaves [u0,u1) and needs reflect)
  int e_k0() const { return (fe - 1 >= u0) ? 0 : 1; }
  int e_k1() const {
    return (ne > 0 && fe + 2 * (ne - 1) + 1 <= u1 - 1) ? ne : ne - 1;
  }
  int o_k0() const { return (fo - 1 >= u0) ? 0 : 1; }
  int o_k1() const {
    return (no > 0 && fo + 2 * (no - 1) + 1 <= u1 - 1) ? no : no - 1;
  }
};

// ---------------------------------------------------------------------------
// 5/3 line kernels (packed lo/hi), boundary-peeled.
// ---------------------------------------------------------------------------

static inline void fwd53_hi_one(const int32_t* in, const Par& p, int k,
                                int32_t* hi) {
  int pos = p.fo + 2 * k;
  int l = reflect(pos - 1, p.u0, p.u1) - p.u0;
  int r = reflect(pos + 1, p.u0, p.u1) - p.u0;
  hi[k] = in[pos - p.u0] - ((in[l] + in[r]) >> 1);
}

static inline void fwd53_lo_one(const int32_t* in, const int32_t* hi,
                                const Par& p, int k, int32_t* lo) {
  int pos = p.fe + 2 * k;
  int l = (reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1;
  int r = (reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1;
  lo[k] = in[pos - p.u0] + ((hi[l] + hi[r] + 2) >> 2);
}

static void fwd53_line(const int32_t* __restrict in, int n, int u0,
                       int32_t* __restrict lo, int32_t* __restrict hi) {
  if (n == 1) {
    if (u0 & 1) hi[0] = in[0] * 2; else lo[0] = in[0];
    return;
  }
  Par p(u0, n);
  {
    int k0 = p.o_k0(), k1 = imax(p.o_k1(), k0);
    for (int k = 0; k < k0; k++) fwd53_hi_one(in, p, k, hi);
    const int32_t* base = in + (p.fo - u0);
    for (int k = k0; k < k1; k++)
      hi[k] = base[2 * k] - ((base[2 * k - 1] + base[2 * k + 1]) >> 1);
    for (int k = k1; k < p.no; k++) fwd53_hi_one(in, p, k, hi);
  }
  {
    int k0 = p.e_k0(), k1 = imax(p.e_k1(), k0);
    for (int k = 0; k < k0; k++) fwd53_lo_one(in, hi, p, k, lo);
    const int32_t* base = in + (p.fe - u0);
    const int32_t* hb = hi + p.d_eo;
    for (int k = k0; k < k1; k++)
      lo[k] = base[2 * k] + ((hb[k] + hb[k + 1] + 2) >> 2);
    for (int k = k1; k < p.ne; k++) fwd53_lo_one(in, hi, p, k, lo);
  }
}

static inline void inv53_xe_one(const int32_t* lo, const int32_t* hi,
                                const Par& p, int k, int32_t* xe) {
  int pos = p.fe + 2 * k;
  int l = (reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1;
  int r = (reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1;
  xe[k] = lo[k] - ((hi[l] + hi[r] + 2) >> 2);
}

static inline void inv53_od_one(const int32_t* hi, const int32_t* xe,
                                const Par& p, int k, int32_t* out) {
  int pos = p.fo + 2 * k;
  int l = (reflect(pos - 1, p.u0, p.u1) - p.fe) >> 1;
  int r = (reflect(pos + 1, p.u0, p.u1) - p.fe) >> 1;
  out[pos - p.u0] = hi[k] + ((xe[l] + xe[r]) >> 1);
}

static void inv53_line(const int32_t* __restrict lo,
                       const int32_t* __restrict hi, int n, int u0,
                       int32_t* __restrict out, int32_t* __restrict xe) {
  if (n == 1) {
    out[0] = (u0 & 1) ? (hi[0] >> 1) : lo[0];
    return;
  }
  Par p(u0, n);
  {
    int k0 = p.e_k0(), k1 = imax(p.e_k1(), k0);
    for (int k = 0; k < k0; k++) inv53_xe_one(lo, hi, p, k, xe);
    const int32_t* hb = hi + p.d_eo;
    for (int k = k0; k < k1; k++)
      xe[k] = lo[k] - ((hb[k] + hb[k + 1] + 2) >> 2);
    for (int k = k1; k < p.ne; k++) inv53_xe_one(lo, hi, p, k, xe);
  }
  {
    int k0 = p.o_k0(), k1 = imax(p.o_k1(), k0);
    for (int k = 0; k < k0; k++) inv53_od_one(hi, xe, p, k, out);
    int32_t* base = out + (p.fo - u0);
    const int32_t* xb = xe + p.d_oe;
    for (int k = k0; k < k1; k++)
      base[2 * k] = hi[k] + ((xb[k] + xb[k + 1]) >> 1);
    for (int k = k1; k < p.no; k++) inv53_od_one(hi, xe, p, k, out);
  }
  for (int k = 0; k < p.ne; k++) out[p.fe + 2 * k - u0] = xe[k];
}

// ---------------------------------------------------------------------------
// 9/7 line kernels: deinterleave once, then 4 contiguous lifting passes.
// `ev`/`od` are caller scratch of >= ne / no floats.
// ---------------------------------------------------------------------------

// one lifting pass step with reflection (odd target, even source)
static inline void lift_oe_one(float* od, const float* ev, const Par& p,
                               int k, float c) {
  int pos = p.fo + 2 * k;
  int a = (reflect(pos - 1, p.u0, p.u1) - p.fe) >> 1;
  int b = (reflect(pos + 1, p.u0, p.u1) - p.fe) >> 1;
  od[k] += c * (ev[a] + ev[b]);
}

static inline void lift_eo_one(float* ev, const float* od, const Par& p,
                               int k, float c) {
  int pos = p.fe + 2 * k;
  int a = (reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1;
  int b = (reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1;
  ev[k] += c * (od[a] + od[b]);
}

static inline void lift_oe(float* __restrict od, const float* __restrict ev,
                           const Par& p, float c) {
  int k0 = p.o_k0(), k1 = imax(p.o_k1(), k0);
  for (int k = 0; k < k0; k++) lift_oe_one(od, ev, p, k, c);
  const float* eb = ev + p.d_oe;
  for (int k = k0; k < k1; k++) od[k] += c * (eb[k] + eb[k + 1]);
  for (int k = k1; k < p.no; k++) lift_oe_one(od, ev, p, k, c);
}

static inline void lift_eo(float* __restrict ev, const float* __restrict od,
                           const Par& p, float c) {
  int k0 = p.e_k0(), k1 = imax(p.e_k1(), k0);
  for (int k = 0; k < k0; k++) lift_eo_one(ev, od, p, k, c);
  const float* ob = od + p.d_eo;
  for (int k = k0; k < k1; k++) ev[k] += c * (ob[k] + ob[k + 1]);
  for (int k = k1; k < p.ne; k++) lift_eo_one(ev, od, p, k, c);
}

static void fwd97_line(const float* __restrict in, int n, int u0,
                       float* __restrict lo, float* __restrict hi,
                       float* __restrict ev, float* __restrict od) {
  if (n == 1) {
    if (u0 & 1) hi[0] = in[0] * K_HALF; else lo[0] = in[0] * INV_K;
    return;
  }
  Par p(u0, n);
  for (int k = 0; k < p.ne; k++) ev[k] = in[p.fe - u0 + 2 * k];
  for (int k = 0; k < p.no; k++) od[k] = in[p.fo - u0 + 2 * k];
  lift_oe(od, ev, p, ALPHA);
  lift_eo(ev, od, p, BETA);
  lift_oe(od, ev, p, GAMMA);
  lift_eo(ev, od, p, DELTA);
  for (int k = 0; k < p.ne; k++) lo[k] = ev[k] * INV_K;
  for (int k = 0; k < p.no; k++) hi[k] = od[k] * K_HALF;
}

static void inv97_line(const float* __restrict lo, const float* __restrict hi,
                       int n, int u0, float* __restrict out,
                       float* __restrict ev, float* __restrict od) {
  if (n == 1) {
    out[0] = (u0 & 1) ? hi[0] * TWO_OVER_K : lo[0] * K_F;
    return;
  }
  Par p(u0, n);
  for (int k = 0; k < p.ne; k++) ev[k] = lo[k] * K_F;
  for (int k = 0; k < p.no; k++) od[k] = hi[k] * TWO_OVER_K;
  lift_eo(ev, od, p, -DELTA);
  lift_oe(od, ev, p, -GAMMA);
  lift_eo(ev, od, p, -BETA);
  lift_oe(od, ev, p, -ALPHA);
  for (int k = 0; k < p.ne; k++) out[p.fe - u0 + 2 * k] = ev[k];
  for (int k = 0; k < p.no; k++) out[p.fo - u0 + 2 * k] = od[k];
}

// ---------------------------------------------------------------------------
// Vertical lifting done row-at-a-time (contiguous, vectorized), rows fanned
// out over OpenMP.
// ---------------------------------------------------------------------------

static void fwd53_vert(const int32_t* cur, int cw, int ch, int y0,
                       int32_t* vlo, int32_t* vhi) {
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) vhi[j] = cur[j] * 2;
    else
      std::memcpy(vlo, cur, sizeof(int32_t) * cw);
    return;
  }
  Par p(y0, ch);
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    int pos = p.fo + 2 * k;
    const int32_t* src = cur + (size_t)(pos - y0) * cw;
    const int32_t* a =
        cur + (size_t)(reflect(pos - 1, p.u0, p.u1) - y0) * cw;
    const int32_t* b =
        cur + (size_t)(reflect(pos + 1, p.u0, p.u1) - y0) * cw;
    int32_t* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] - ((a[j] + b[j]) >> 1);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    const int32_t* src = cur + (size_t)(pos - y0) * cw;
    const int32_t* a =
        vhi + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const int32_t* b =
        vhi + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    int32_t* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + ((a[j] + b[j] + 2) >> 2);
  }
}

static void inv53_vert(const int32_t* vlo, const int32_t* vhi, int cw,
                       int ch, int y0, int32_t* out) {
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) out[j] = vhi[j] >> 1;
    else
      std::memcpy(out, vlo, sizeof(int32_t) * cw);
    return;
  }
  Par p(y0, ch);
  // xe rows written straight into out (even canvas rows)
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    const int32_t* a =
        vhi + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const int32_t* b =
        vhi + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const int32_t* src = vlo + (size_t)k * cw;
    int32_t* dst = out + (size_t)(pos - y0) * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] - ((a[j] + b[j] + 2) >> 2);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    int pos = p.fo + 2 * k;
    const int32_t* a = out + (size_t)(reflect(pos - 1, p.u0, p.u1) - y0) * cw;
    const int32_t* b = out + (size_t)(reflect(pos + 1, p.u0, p.u1) - y0) * cw;
    const int32_t* src = vhi + (size_t)k * cw;
    int32_t* dst = out + (size_t)(pos - y0) * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + ((a[j] + b[j]) >> 1);
  }
}

static void fwd97_vert(const float* cur, int cw, int ch, int y0, float* vlo,
                       float* vhi) {
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) vhi[j] = cur[j] * K_HALF;
    else
      for (int j = 0; j < cw; j++) vlo[j] = cur[j] * INV_K;
    return;
  }
  Par p(y0, ch);
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    int pos = p.fo + 2 * k;
    const float* src = cur + (size_t)(pos - y0) * cw;
    const float* a = cur + (size_t)(reflect(pos - 1, p.u0, p.u1) - y0) * cw;
    const float* b = cur + (size_t)(reflect(pos + 1, p.u0, p.u1) - y0) * cw;
    float* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + ALPHA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    const float* src = cur + (size_t)(pos - y0) * cw;
    const float* a =
        vhi + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const float* b =
        vhi + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    float* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + BETA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    int pos = p.fo + 2 * k;
    const float* a =
        vlo + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fe) >> 1) * cw;
    const float* b =
        vlo + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fe) >> 1) * cw;
    float* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] + GAMMA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    const float* a =
        vhi + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const float* b =
        vhi + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    float* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++)
      dst[j] = (dst[j] + DELTA * (a[j] + b[j])) * INV_K;
  }
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    float* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] *= K_HALF;
  }
}

static void inv97_vert(const float* vlo, const float* vhi, int cw, int ch,
                       int y0, float* out, float* lbuf, float* hbuf) {
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) out[j] = vhi[j] * TWO_OVER_K;
    else
      for (int j = 0; j < cw; j++) out[j] = vlo[j] * K_F;
    return;
  }
  Par p(y0, ch);
  float* l = lbuf;
  float* h = hbuf;
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++)
    for (int j = 0; j < cw; j++)
      l[(size_t)k * cw + j] = vlo[(size_t)k * cw + j] * K_F;
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++)
    for (int j = 0; j < cw; j++)
      h[(size_t)k * cw + j] = vhi[(size_t)k * cw + j] * TWO_OVER_K;
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    const float* a =
        h + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const float* b =
        h + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    float* dst = l + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] - DELTA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    int pos = p.fo + 2 * k;
    const float* a =
        l + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fe) >> 1) * cw;
    const float* b =
        l + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fe) >> 1) * cw;
    float* dst = h + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] - GAMMA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    const float* a =
        h + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    const float* b =
        h + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fo) >> 1) * cw;
    float* dst = l + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] - BETA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.no * cw >= PAR_MIN)
  for (int k = 0; k < p.no; k++) {
    int pos = p.fo + 2 * k;
    const float* a =
        l + (size_t)((reflect(pos - 1, p.u0, p.u1) - p.fe) >> 1) * cw;
    const float* b =
        l + (size_t)((reflect(pos + 1, p.u0, p.u1) - p.fe) >> 1) * cw;
    float* dst = out + (size_t)(pos - y0) * cw;
    const float* src = h + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] - ALPHA * (a[j] + b[j]);
  }
#pragma omp parallel for schedule(static) if ((size_t)p.ne * cw >= PAR_MIN)
  for (int k = 0; k < p.ne; k++) {
    int pos = p.fe + 2 * k;
    std::memcpy(out + (size_t)(pos - y0) * cw, l + (size_t)k * cw,
                sizeof(float) * cw);
  }
}

// Persistent per-thread scratch arenas: repeated 1-4 MB vector churn per
// call costs ~1 ms in mmap/page faults; grow-only reuse pays it once.
template <typename T>
static T* arena(int slot, size_t n) {
  static thread_local std::vector<T> bufs[6];
  auto& v = bufs[slot];
  if (v.size() < n) v.resize(n);
  return v.data();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI: multi-level transforms writing bands into caller-provided buffers.
// Band layout per level lev (resolution r = levels - lev): HL, LH, HH
// buffers passed via offsets into band_flat; final LL at ll_out.
// ---------------------------------------------------------------------------

extern "C" {

// Forward 5/3: data (h*w int32, canvas origin x0,y0) consumed as scratch.
// band_off: per level 3 offsets (HL, LH, HH) into band_flat; ll written to
// band_flat + ll_off.
int grok_dwt53_fwd(int32_t* data, int w, int h, int x0, int y0, int levels,
                   int32_t* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  if (w <= 0 || h <= 0) return 0;  // degenerate tile-component
  int cw = w, ch = h, cx0 = x0, cy0 = y0;
  int32_t* cur = arena<int32_t>(0, (size_t)w * h);
  std::memcpy(cur, data, sizeof(int32_t) * (size_t)w * h);
  int32_t* vbuf = arena<int32_t>(1, (size_t)w * h);  // vlo | vhi
  int32_t* next =
      arena<int32_t>(2, (size_t)((w + 1) / 2 + 1) * ((h + 1) / 2 + 1));
  for (int lev = 0; lev < levels; lev++) {
    Par px(cx0, cw), py(cy0, ch);
    int ne_x = px.ne, no_x = px.no, ne_y = py.ne, no_y = py.no;

    int32_t* vlo = vbuf;
    int32_t* vhi = vbuf + (size_t)ne_y * cw;
    fwd53_vert(cur, cw, ch, cy0, vlo, vhi);

    int32_t* hl = band_flat + band_off[lev * 3];
    int32_t* lh = band_flat + band_off[lev * 3 + 1];
    int32_t* hh = band_flat + band_off[lev * 3 + 2];
    int32_t* nx = next;
#pragma omp parallel if ((size_t)(ne_y + no_y) * cw >= PAR_MIN)
    {
      std::vector<int32_t> lo_line(ne_x > 0 ? ne_x : 1);
      std::vector<int32_t> hi_line(no_x > 0 ? no_x : 1);
#pragma omp for schedule(static) nowait
      for (int r = 0; r < ne_y; r++) {
        fwd53_line(vlo + (size_t)r * cw, cw, cx0, lo_line.data(),
                   hi_line.data());
        std::memcpy(nx + (size_t)r * ne_x, lo_line.data(),
                    sizeof(int32_t) * ne_x);
        std::memcpy(hl + (size_t)r * no_x, hi_line.data(),
                    sizeof(int32_t) * no_x);
      }
#pragma omp for schedule(static)
      for (int r = 0; r < no_y; r++) {
        fwd53_line(vhi + (size_t)r * cw, cw, cx0, lo_line.data(),
                   hi_line.data());
        std::memcpy(lh + (size_t)r * ne_x, lo_line.data(),
                    sizeof(int32_t) * ne_x);
        std::memcpy(hh + (size_t)r * no_x, hi_line.data(),
                    sizeof(int32_t) * no_x);
      }
    }
    std::memcpy(cur, nx, sizeof(int32_t) * (size_t)ne_y * ne_x);
    cw = ne_x;
    ch = ne_y;
    cx0 = ceil_div(cx0, 2);
    cy0 = ceil_div(cy0, 2);
  }
  std::memcpy(band_flat + ll_off, cur, sizeof(int32_t) * cw * ch);
  return 0;
}

// Inverse 5/3. bands laid out as in grok_dwt53_fwd; output h*w into data.
int grok_dwt53_inv(int32_t* data, int w, int h, int x0, int y0, int levels,
                   const int32_t* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  if (w <= 0 || h <= 0) return 0;  // degenerate tile-component
  // compute per-level geometry top-down
  std::vector<int> ws(levels + 1), hs(levels + 1), xs(levels + 1),
      ys(levels + 1);
  ws[0] = w; hs[0] = h; xs[0] = x0; ys[0] = y0;
  for (int i = 1; i <= levels; i++) {
    Par px(xs[i - 1], ws[i - 1]), py(ys[i - 1], hs[i - 1]);
    ws[i] = ws[i - 1] > 0 ? px.ne : 0;
    hs[i] = hs[i - 1] > 0 ? py.ne : 0;
    xs[i] = ceil_div(xs[i - 1], 2);
    ys[i] = ceil_div(ys[i - 1], 2);
  }
  int32_t* cur = arena<int32_t>(0, (size_t)w * h);
  std::memcpy(cur, band_flat + ll_off,
              sizeof(int32_t) * (size_t)ws[levels] * hs[levels]);
  int32_t* vbuf = arena<int32_t>(1, (size_t)w * h);  // top | bot
  int32_t* out = arena<int32_t>(2, (size_t)w * h);
  for (int lev = levels - 1; lev >= 0; lev--) {
    int cw = ws[lev], ch = hs[lev], cx0 = xs[lev], cy0 = ys[lev];
    int ne_x = ws[lev + 1];
    int no_x = cw - ne_x;
    int ne_y = hs[lev + 1];
    int no_y = ch - ne_y;
    const int32_t* hl = band_flat + band_off[lev * 3];
    const int32_t* lh = band_flat + band_off[lev * 3 + 1];
    const int32_t* hh = band_flat + band_off[lev * 3 + 2];
    int32_t* top = vbuf;
    int32_t* bot = vbuf + (size_t)ne_y * cw;
#pragma omp parallel if ((size_t)(ne_y + no_y) * cw >= PAR_MIN)
    {
      std::vector<int32_t> line(cw > 0 ? cw : 1);
      std::vector<int32_t> xe_scratch(cw > 0 ? cw : 1);
#pragma omp for schedule(static) nowait
      for (int r = 0; r < ne_y; r++) {
        inv53_line(cur + (size_t)r * ne_x, hl + (size_t)r * no_x, cw,
                   cx0, top + (size_t)r * cw, xe_scratch.data());
      }
#pragma omp for schedule(static)
      for (int r = 0; r < no_y; r++) {
        inv53_line(lh + (size_t)r * ne_x, hh + (size_t)r * no_x, cw, cx0,
                   bot + (size_t)r * cw, xe_scratch.data());
      }
    }
    inv53_vert(top, bot, cw, ch, cy0, out);
    std::memcpy(cur, out, sizeof(int32_t) * (size_t)ch * cw);
  }
  std::memcpy(data, cur, sizeof(int32_t) * (size_t)w * h);
  return 0;
}

// Forward / inverse 9/7 (float32), same buffer conventions.
int grok_dwt97_fwd(float* data, int w, int h, int x0, int y0, int levels,
                   float* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  if (w <= 0 || h <= 0) return 0;  // degenerate tile-component
  int cw = w, ch = h, cx0 = x0, cy0 = y0;
  float* cur = arena<float>(0, (size_t)w * h);
  std::memcpy(cur, data, sizeof(float) * (size_t)w * h);
  float* vbuf = arena<float>(1, (size_t)w * h);
  float* next = arena<float>(2, (size_t)((w + 1) / 2 + 1) * ((h + 1) / 2 + 1));
  for (int lev = 0; lev < levels; lev++) {
    Par px(cx0, cw), py(cy0, ch);
    int ne_x = px.ne, no_x = px.no, ne_y = py.ne, no_y = py.no;

    float* vlo = vbuf;
    float* vhi = vbuf + (size_t)ne_y * cw;
    fwd97_vert(cur, cw, ch, cy0, vlo, vhi);

    float* hl = band_flat + band_off[lev * 3];
    float* lh = band_flat + band_off[lev * 3 + 1];
    float* hh = band_flat + band_off[lev * 3 + 2];
    float* nx = next;
#pragma omp parallel if ((size_t)(ne_y + no_y) * cw >= PAR_MIN)
    {
      std::vector<float> lo_line(ne_x > 0 ? ne_x : 1);
      std::vector<float> hi_line(no_x > 0 ? no_x : 1);
      std::vector<float> ev(ne_x > 0 ? ne_x : 1), od(no_x > 0 ? no_x : 1);
#pragma omp for schedule(static) nowait
      for (int r = 0; r < ne_y; r++) {
        fwd97_line(vlo + (size_t)r * cw, cw, cx0, lo_line.data(),
                   hi_line.data(), ev.data(), od.data());
        std::memcpy(nx + (size_t)r * ne_x, lo_line.data(),
                    sizeof(float) * ne_x);
        std::memcpy(hl + (size_t)r * no_x, hi_line.data(),
                    sizeof(float) * no_x);
      }
#pragma omp for schedule(static)
      for (int r = 0; r < no_y; r++) {
        fwd97_line(vhi + (size_t)r * cw, cw, cx0, lo_line.data(),
                   hi_line.data(), ev.data(), od.data());
        std::memcpy(lh + (size_t)r * ne_x, lo_line.data(),
                    sizeof(float) * ne_x);
        std::memcpy(hh + (size_t)r * no_x, hi_line.data(),
                    sizeof(float) * no_x);
      }
    }
    std::memcpy(cur, nx, sizeof(float) * (size_t)ne_y * ne_x);
    cw = ne_x;
    ch = ne_y;
    cx0 = ceil_div(cx0, 2);
    cy0 = ceil_div(cy0, 2);
  }
  std::memcpy(band_flat + ll_off, cur, sizeof(float) * cw * ch);
  return 0;
}

int grok_dwt97_inv(float* data, int w, int h, int x0, int y0, int levels,
                   const float* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  if (w <= 0 || h <= 0) return 0;  // degenerate tile-component
  std::vector<int> ws(levels + 1), hs(levels + 1), xs(levels + 1),
      ys(levels + 1);
  ws[0] = w; hs[0] = h; xs[0] = x0; ys[0] = y0;
  for (int i = 1; i <= levels; i++) {
    Par px(xs[i - 1], ws[i - 1]), py(ys[i - 1], hs[i - 1]);
    ws[i] = ws[i - 1] > 0 ? px.ne : 0;
    hs[i] = hs[i - 1] > 0 ? py.ne : 0;
    xs[i] = ceil_div(xs[i - 1], 2);
    ys[i] = ceil_div(ys[i - 1], 2);
  }
  float* cur = arena<float>(0, (size_t)w * h);
  std::memcpy(cur, band_flat + ll_off,
              sizeof(float) * (size_t)ws[levels] * hs[levels]);
  float* vbuf = arena<float>(1, (size_t)w * h);  // top | bot
  float* out = arena<float>(2, (size_t)w * h);
  float* lscratch = arena<float>(3, (size_t)w * ((h + 1) / 2 + 1));
  float* hscratch = arena<float>(4, (size_t)w * ((h + 1) / 2 + 1));
  for (int lev = levels - 1; lev >= 0; lev--) {
    int cw = ws[lev], ch = hs[lev], cx0 = xs[lev], cy0 = ys[lev];
    int ne_x = ws[lev + 1];
    int no_x = cw - ne_x;
    int ne_y = hs[lev + 1];
    int no_y = ch - ne_y;
    const float* hl = band_flat + band_off[lev * 3];
    const float* lh = band_flat + band_off[lev * 3 + 1];
    const float* hh = band_flat + band_off[lev * 3 + 2];
    float* top = vbuf;
    float* bot = vbuf + (size_t)ne_y * cw;
#pragma omp parallel if ((size_t)(ne_y + no_y) * cw >= PAR_MIN)
    {
      std::vector<float> ev(cw > 0 ? cw : 1), od(cw > 0 ? cw : 1);
#pragma omp for schedule(static) nowait
      for (int r = 0; r < ne_y; r++) {
        inv97_line(cur + (size_t)r * ne_x, hl + (size_t)r * no_x, cw,
                   cx0, top + (size_t)r * cw, ev.data(), od.data());
      }
#pragma omp for schedule(static)
      for (int r = 0; r < no_y; r++) {
        inv97_line(lh + (size_t)r * ne_x, hh + (size_t)r * no_x, cw, cx0,
                   bot + (size_t)r * cw, ev.data(), od.data());
      }
    }
    inv97_vert(top, bot, cw, ch, cy0, out, lscratch, hscratch);
    std::memcpy(cur, out, sizeof(float) * (size_t)ch * cw);
  }
  std::memcpy(data, cur, sizeof(float) * (size_t)w * h);
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Windowed partial inverse: single-axis kernels
//
// Native core of ops/dwt_window.py (the reference's decode_partial_tile
// analog, reference: src/lib/jp2/transform/dwt.cpp:1182-2160): per-level
// axis inverses over fetched band crops, bit/float-exact with the numpy
// fallback (_inv53_axis / _inv97_axis).  Neighbor index schedules are
// shared by every row, so they are precomputed once and the row loop is
// a tight clip-free gather the compiler vectorizes.
// ---------------------------------------------------------------------------

namespace {

static inline int win_reflect(int i, int u0, int u1) {
  int n = u1 - u0;
  if (n == 1) return u0;
  int period = 2 * (n - 1);
  int j = (i - u0) % period;
  if (j < 0) j += period;
  if (j >= n) j = period - j;
  return u0 + j;
}

static inline int win_clip(int v, int n) {
  return v < 0 ? 0 : (v >= n ? n - 1 : v);
}

static inline void win_parity(int u0, int n, int* fe, int* fo, int* ne,
                              int* no) {
  *fe = (u0 & 1) ? u0 + 1 : u0;
  *fo = (u0 & 1) ? u0 : u0 + 1;
  *ne = n > 0 ? (u0 + n - *fe + 1) / 2 : 0;
  *no = n > 0 ? (u0 + n - *fo + 1) / 2 : 0;
}

}  // namespace

extern "C" {

// 5/3 inverse along the packed axis for a window: lo (rows, lo_n) crop
// starting at packed index lo_k0, hi likewise; writes (rows, c1-c0)
// canvas columns [c0, c1).  Caller guarantees n >= 2 and
// u0 <= c0 < c1 <= u0+n.
int grok_dwt_win53_axis(const int32_t* lo, int lo_n, int lo_k0,
                        const int32_t* hi, int hi_n, int hi_k0,
                        int rows, int u0, int n, int c0, int c1,
                        int32_t* out) {
  int fe, fo, ne, no;
  win_parity(u0, n, &fe, &fo, &ne, &no);
  const int u1 = u0 + n;
  // evens covering [c0-1, c1+1)
  int ge0 = u0 > c0 - 1 ? u0 : c0 - 1;
  int ge1 = u1 < c1 + 1 ? u1 : c1 + 1;
  int e0 = (ge0 - fe + 1) / 2;
  if (e0 < 0) e0 = 0;
  int e1 = (ge1 - 1 - fe) / 2 + 1;
  if (e1 > ne) e1 = ne;
  if (e1 < e0) e1 = e0;
  int nxe = e1 - e0;
  // odds in [c0, c1)
  int o0 = (c0 - fo + 1) / 2;
  if (o0 < 0) o0 = 0;
  int o1 = (c1 - 1 - fo) / 2 + 1;
  if (o1 > no) o1 = no;
  if (o1 < o0) o1 = o0;
  int nod = o1 - o0;

  std::vector<int> eli(nxe), eri(nxe), elo(nxe);
  for (int k = 0; k < nxe; k++) {
    int pos = fe + 2 * (e0 + k);
    eli[k] = win_clip(((win_reflect(pos - 1, u0, u1) - fo) >> 1) - hi_k0,
                      hi_n);
    eri[k] = win_clip(((win_reflect(pos + 1, u0, u1) - fo) >> 1) - hi_k0,
                      hi_n);
    elo[k] = win_clip((e0 + k) - lo_k0, lo_n);
  }
  std::vector<int> oli(nod), ori(nod), ohi(nod);
  for (int k = 0; k < nod; k++) {
    int pos = fo + 2 * (o0 + k);
    oli[k] = win_clip(((win_reflect(pos - 1, u0, u1) - fe) >> 1) - e0, nxe);
    ori[k] = win_clip(((win_reflect(pos + 1, u0, u1) - fe) >> 1) - e0, nxe);
    ohi[k] = win_clip((o0 + k) - hi_k0, hi_n);
  }
  // output scatter schedules
  int wout = c1 - c0;
  std::vector<int> ev_dst, ev_src;
  for (int k = 0; k < nxe; k++) {
    int pos = fe + 2 * (e0 + k);
    if (pos >= c0 && pos < c1) {
      ev_dst.push_back(pos - c0);
      ev_src.push_back(k);
    }
  }
  std::vector<int32_t> xe((size_t)nxe);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) firstprivate(xe) \
    if (rows > 64 && (int64_t)rows * wout > 65536)
#endif
  for (int r = 0; r < rows; r++) {
    const int32_t* lr = lo + (size_t)r * lo_n;
    const int32_t* hr = hi + (size_t)r * hi_n;
    int32_t* orow = out + (size_t)r * wout;
    for (int k = 0; k < nxe; k++)
      xe[k] = lr[elo[k]] - ((hr[eli[k]] + hr[eri[k]] + 2) >> 2);
    for (size_t k = 0; k < ev_dst.size(); k++)
      orow[ev_dst[k]] = xe[ev_src[k]];
    for (int k = 0; k < nod; k++) {
      int pos = fo + 2 * (o0 + k);
      orow[pos - c0] =
          hr[ohi[k]] + ((xe[oli[k]] + xe[ori[k]]) >> 1);
    }
  }
  return 0;
}

// 9/7 inverse along the packed axis for a window (float32 op order
// identical to _inv97_axis: scale whole crops, four lifting passes over
// the crops, scatter canvas columns [c0, c1)).
int grok_dwt_win97_axis(const float* lo, int lo_n, int lo_k0,
                        const float* hi, int hi_n, int hi_k0,
                        int rows, int u0, int n, int c0, int c1,
                        float* out) {
  int fe, fo, ne, no;
  win_parity(u0, n, &fe, &fo, &ne, &no);
  (void)ne;
  (void)no;
  const int u1 = u0 + n;
  // neighbor schedules over the full crops
  std::vector<int> ea(lo_n), eb(lo_n), oa(hi_n), ob(hi_n);
  for (int k = 0; k < lo_n; k++) {
    int pos = fe + 2 * (lo_k0 + k);
    ea[k] = win_clip(((win_reflect(pos - 1, u0, u1) - fo) >> 1) - hi_k0,
                     hi_n);
    eb[k] = win_clip(((win_reflect(pos + 1, u0, u1) - fo) >> 1) - hi_k0,
                     hi_n);
  }
  for (int k = 0; k < hi_n; k++) {
    int pos = fo + 2 * (hi_k0 + k);
    oa[k] = win_clip(((win_reflect(pos - 1, u0, u1) - fe) >> 1) - lo_k0,
                     lo_n);
    ob[k] = win_clip(((win_reflect(pos + 1, u0, u1) - fe) >> 1) - lo_k0,
                     lo_n);
  }
  int wout = c1 - c0;
  std::vector<int> ev_dst, ev_src, od_dst, od_src;
  for (int k = 0; k < lo_n; k++) {
    int pos = fe + 2 * (lo_k0 + k);
    if (pos >= c0 && pos < c1) {
      ev_dst.push_back(pos - c0);
      ev_src.push_back(k);
    }
  }
  for (int k = 0; k < hi_n; k++) {
    int pos = fo + 2 * (hi_k0 + k);
    if (pos >= c0 && pos < c1) {
      od_dst.push_back(pos - c0);
      od_src.push_back(k);
    }
  }
  std::vector<float> ev((size_t)lo_n), od((size_t)hi_n);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) firstprivate(ev, od) \
    if (rows > 64 && (int64_t)rows * wout > 65536)
#endif
  for (int r = 0; r < rows; r++) {
    const float* lr = lo + (size_t)r * lo_n;
    const float* hr = hi + (size_t)r * hi_n;
    float* orow = out + (size_t)r * wout;
    for (int k = 0; k < lo_n; k++) ev[k] = lr[k] * K_F;
    for (int k = 0; k < hi_n; k++) od[k] = hr[k] * TWO_OVER_K;
    for (int k = 0; k < lo_n; k++)
      ev[k] = ev[k] - DELTA * (od[ea[k]] + od[eb[k]]);
    for (int k = 0; k < hi_n; k++)
      od[k] = od[k] - GAMMA * (ev[oa[k]] + ev[ob[k]]);
    for (int k = 0; k < lo_n; k++)
      ev[k] = ev[k] - BETA * (od[ea[k]] + od[eb[k]]);
    for (int k = 0; k < hi_n; k++)
      od[k] = od[k] - ALPHA * (ev[oa[k]] + ev[ob[k]]);
    for (size_t k = 0; k < ev_dst.size(); k++)
      orow[ev_dst[k]] = ev[ev_src[k]];
    for (size_t k = 0; k < od_dst.size(); k++)
      orow[od_dst[k]] = od[od_src[k]];
  }
  return 0;
}

}  // extern "C"
