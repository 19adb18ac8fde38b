// Host-side multi-level DWT (5/3 integer + 9/7 float), the CPU analog of
// the device kernels (ops/dwt_jax.py, ops/dwt_pallas.py) for the
// single-tile host path.  Canvas-coordinate lifting with periodic
// symmetric extension, matching the numpy oracle ops/dwt_np.py bit-for-bit
// (reference semantics: src/lib/jp2/transform/dwt53.cpp:150, dwt97.cpp:90;
// layout restructured: whole-row vertical lifting + per-row horizontal
// lifting instead of the reference's threaded line strips).

#include <cstdint>
#include <cstring>
#include <vector>

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

// ---------------------------------------------------------------------------
// Horizontal (within-row) lifting on a scratch line.
// ---------------------------------------------------------------------------

template <typename T>
struct LineBufs {
  std::vector<T> even, odd;
};

// 5/3 forward along a row: in[0..n) at canvas origin u0 -> lo|hi packed
// into out (lo first: ne entries, then no entries).
static void fwd53_line(const int32_t* in, int n, int u0, int32_t* lo,
                       int32_t* hi) {
  int u1 = u0 + n;
  if (n == 1) {
    if (u0 & 1) hi[0] = in[0] * 2; else lo[0] = in[0];
    return;
  }
  int first_even = (u0 % 2 == 0) ? u0 : u0 + 1;
  int first_odd = (u0 % 2 == 1) ? u0 : u0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    int l = reflect(pos - 1, u0, u1) - u0;
    int r = reflect(pos + 1, u0, u1) - u0;
    hi[k] = in[pos - u0] - ((in[l] + in[r]) >> 1);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    int l = (reflect(pos - 1, u0, u1) - first_odd) >> 1;
    int r = (reflect(pos + 1, u0, u1) - first_odd) >> 1;
    lo[k] = in[pos - u0] + ((hi[l] + hi[r] + 2) >> 2);
  }
}

static void inv53_line(const int32_t* lo, const int32_t* hi, int n, int u0,
                       int32_t* out, int32_t* xe) {
  int u1 = u0 + n;
  if (n == 1) {
    out[0] = (u0 & 1) ? (hi[0] >> 1) : lo[0];
    return;
  }
  int first_even = (u0 % 2 == 0) ? u0 : u0 + 1;
  int first_odd = (u0 % 2 == 1) ? u0 : u0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    int l = (reflect(pos - 1, u0, u1) - first_odd) >> 1;
    int r = (reflect(pos + 1, u0, u1) - first_odd) >> 1;
    xe[k] = lo[k] - ((hi[l] + hi[r] + 2) >> 2);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    int l = (reflect(pos - 1, u0, u1) - first_even) >> 1;
    int r = (reflect(pos + 1, u0, u1) - first_even) >> 1;
    out[pos - u0] = hi[k] + ((xe[l] + xe[r]) >> 1);
  }
  for (int k = 0; k < ne; k++) out[first_even + 2 * k - u0] = xe[k];
}

static void fwd97_line(const float* in, int n, int u0, float* lo,
                       float* hi, float* l, float* h) {
  int u1 = u0 + n;
  if (n == 1) {
    if (u0 & 1) hi[0] = in[0] * K_HALF; else lo[0] = in[0] * INV_K;
    return;
  }
  int first_even = (u0 % 2 == 0) ? u0 : u0 + 1;
  int first_odd = (u0 % 2 == 1) ? u0 : u0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    int a = reflect(pos - 1, u0, u1) - u0;
    int b = reflect(pos + 1, u0, u1) - u0;
    h[k] = in[pos - u0] + ALPHA * (in[a] + in[b]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_odd) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_odd) >> 1;
    l[k] = in[pos - u0] + BETA * (h[a] + h[b]);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_even) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_even) >> 1;
    h[k] = h[k] + GAMMA * (l[a] + l[b]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_odd) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_odd) >> 1;
    l[k] = l[k] + DELTA * (h[a] + h[b]);
  }
  for (int k = 0; k < ne; k++) lo[k] = l[k] * INV_K;
  for (int k = 0; k < no; k++) hi[k] = h[k] * K_HALF;
}

static void inv97_line(const float* lo, const float* hi, int n, int u0,
                       float* out, float* l, float* h) {
  int u1 = u0 + n;
  if (n == 1) {
    out[0] = (u0 & 1) ? hi[0] * TWO_OVER_K : lo[0] * K_F;
    return;
  }
  int first_even = (u0 % 2 == 0) ? u0 : u0 + 1;
  int first_odd = (u0 % 2 == 1) ? u0 : u0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  for (int k = 0; k < ne; k++) l[k] = lo[k] * K_F;
  for (int k = 0; k < no; k++) h[k] = hi[k] * TWO_OVER_K;
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_odd) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_odd) >> 1;
    l[k] = l[k] - DELTA * (h[a] + h[b]);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_even) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_even) >> 1;
    h[k] = h[k] - GAMMA * (l[a] + l[b]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_odd) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_odd) >> 1;
    l[k] = l[k] - BETA * (h[a] + h[b]);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    int a = (reflect(pos - 1, u0, u1) - first_even) >> 1;
    int b = (reflect(pos + 1, u0, u1) - first_even) >> 1;
    out[pos - u0] = h[k] - ALPHA * (l[a] + l[b]);
  }
  for (int k = 0; k < ne; k++) out[first_even + 2 * k - u0] = l[k];
}

// ---------------------------------------------------------------------------
// Vertical lifting done row-at-a-time (contiguous, vectorizable).
// ---------------------------------------------------------------------------

// 5/3 forward vertical: cur (ch x cw) origin y0 -> vlo (ne x cw),
// vhi (no x cw).
static void fwd53_vert(const int32_t* cur, int cw, int ch, int y0,
                       int32_t* vlo, int32_t* vhi) {
  int u1 = y0 + ch;
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) vhi[j] = cur[j] * 2;
    else
      std::memcpy(vlo, cur, sizeof(int32_t) * cw);
    return;
  }
  int first_even = (y0 % 2 == 0) ? y0 : y0 + 1;
  int first_odd = (y0 % 2 == 1) ? y0 : y0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    const int32_t* src = cur + (size_t)(pos - y0) * cw;
    const int32_t* a = cur + (size_t)(reflect(pos - 1, y0, u1) - y0) * cw;
    const int32_t* b = cur + (size_t)(reflect(pos + 1, y0, u1) - y0) * cw;
    int32_t* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] - ((a[j] + b[j]) >> 1);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    const int32_t* src = cur + (size_t)(pos - y0) * cw;
    const int32_t* a =
        vhi + (size_t)((reflect(pos - 1, y0, u1) - first_odd) >> 1) * cw;
    const int32_t* b =
        vhi + (size_t)((reflect(pos + 1, y0, u1) - first_odd) >> 1) * cw;
    int32_t* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + ((a[j] + b[j] + 2) >> 2);
  }
}

static void inv53_vert(const int32_t* vlo, const int32_t* vhi, int cw,
                       int ch, int y0, int32_t* out) {
  int u1 = y0 + ch;
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) out[j] = vhi[j] >> 1;
    else
      std::memcpy(out, vlo, sizeof(int32_t) * cw);
    return;
  }
  int first_even = (y0 % 2 == 0) ? y0 : y0 + 1;
  int first_odd = (y0 % 2 == 1) ? y0 : y0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  // xe rows written straight into out (even canvas rows)
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    const int32_t* a =
        vhi + (size_t)((reflect(pos - 1, y0, u1) - first_odd) >> 1) * cw;
    const int32_t* b =
        vhi + (size_t)((reflect(pos + 1, y0, u1) - first_odd) >> 1) * cw;
    const int32_t* src = vlo + (size_t)k * cw;
    int32_t* dst = out + (size_t)(pos - y0) * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] - ((a[j] + b[j] + 2) >> 2);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    const int32_t* a =
        out + (size_t)(reflect(pos - 1, y0, u1) - y0) * cw;
    const int32_t* b =
        out + (size_t)(reflect(pos + 1, y0, u1) - y0) * cw;
    const int32_t* src = vhi + (size_t)k * cw;
    int32_t* dst = out + (size_t)(pos - y0) * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + ((a[j] + b[j]) >> 1);
  }
}

static void fwd97_vert(const float* cur, int cw, int ch, int y0, float* vlo,
                       float* vhi) {
  int u1 = y0 + ch;
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) vhi[j] = cur[j] * K_HALF;
    else
      for (int j = 0; j < cw; j++) vlo[j] = cur[j] * INV_K;
    return;
  }
  int first_even = (y0 % 2 == 0) ? y0 : y0 + 1;
  int first_odd = (y0 % 2 == 1) ? y0 : y0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    const float* src = cur + (size_t)(pos - y0) * cw;
    const float* a = cur + (size_t)(reflect(pos - 1, y0, u1) - y0) * cw;
    const float* b = cur + (size_t)(reflect(pos + 1, y0, u1) - y0) * cw;
    float* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + ALPHA * (a[j] + b[j]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    const float* src = cur + (size_t)(pos - y0) * cw;
    const float* a =
        vhi + (size_t)((reflect(pos - 1, y0, u1) - first_odd) >> 1) * cw;
    const float* b =
        vhi + (size_t)((reflect(pos + 1, y0, u1) - first_odd) >> 1) * cw;
    float* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] + BETA * (a[j] + b[j]);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    const float* a =
        vlo + (size_t)((reflect(pos - 1, y0, u1) - first_even) >> 1) * cw;
    const float* b =
        vlo + (size_t)((reflect(pos + 1, y0, u1) - first_even) >> 1) * cw;
    float* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] + GAMMA * (a[j] + b[j]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    const float* a =
        vhi + (size_t)((reflect(pos - 1, y0, u1) - first_odd) >> 1) * cw;
    const float* b =
        vhi + (size_t)((reflect(pos + 1, y0, u1) - first_odd) >> 1) * cw;
    float* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] + DELTA * (a[j] + b[j]);
  }
  for (int k = 0; k < ne; k++) {
    float* dst = vlo + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] *= INV_K;
  }
  for (int k = 0; k < no; k++) {
    float* dst = vhi + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] *= K_HALF;
  }
}

static void inv97_vert(const float* vlo, const float* vhi, int cw, int ch,
                       int y0, float* out) {
  int u1 = y0 + ch;
  if (ch == 1) {
    if (y0 & 1)
      for (int j = 0; j < cw; j++) out[j] = vhi[j] * TWO_OVER_K;
    else
      for (int j = 0; j < cw; j++) out[j] = vlo[j] * K_F;
    return;
  }
  int first_even = (y0 % 2 == 0) ? y0 : y0 + 1;
  int first_odd = (y0 % 2 == 1) ? y0 : y0 + 1;
  int ne = (u1 - first_even + 1) / 2;
  int no = (u1 - first_odd + 1) / 2;
  std::vector<float> l((size_t)ne * cw), h((size_t)no * cw);
  for (size_t i = 0; i < l.size(); i++) l[i] = vlo[i] * K_F;
  for (size_t i = 0; i < h.size(); i++) h[i] = vhi[i] * TWO_OVER_K;
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    const float* a =
        h.data() + (size_t)((reflect(pos - 1, y0, u1) - first_odd) >> 1) * cw;
    const float* b =
        h.data() + (size_t)((reflect(pos + 1, y0, u1) - first_odd) >> 1) * cw;
    float* dst = l.data() + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] - DELTA * (a[j] + b[j]);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    const float* a =
        l.data() + (size_t)((reflect(pos - 1, y0, u1) - first_even) >> 1) * cw;
    const float* b =
        l.data() + (size_t)((reflect(pos + 1, y0, u1) - first_even) >> 1) * cw;
    float* dst = h.data() + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] - GAMMA * (a[j] + b[j]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    const float* a =
        h.data() + (size_t)((reflect(pos - 1, y0, u1) - first_odd) >> 1) * cw;
    const float* b =
        h.data() + (size_t)((reflect(pos + 1, y0, u1) - first_odd) >> 1) * cw;
    float* dst = l.data() + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = dst[j] - BETA * (a[j] + b[j]);
  }
  for (int k = 0; k < no; k++) {
    int pos = first_odd + 2 * k;
    const float* a =
        l.data() + (size_t)(reflect(pos - 1, y0, u1) - first_even) / 2 * cw;
    const float* b =
        l.data() + (size_t)(reflect(pos + 1, y0, u1) - first_even) / 2 * cw;
    float* dst = out + (size_t)(pos - y0) * cw;
    const float* src = h.data() + (size_t)k * cw;
    for (int j = 0; j < cw; j++) dst[j] = src[j] - ALPHA * (a[j] + b[j]);
  }
  for (int k = 0; k < ne; k++) {
    int pos = first_even + 2 * k;
    std::memcpy(out + (size_t)(pos - y0) * cw, l.data() + (size_t)k * cw,
                sizeof(float) * cw);
  }
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
  int cw = w, ch = h, cx0 = x0, cy0 = y0;
  std::vector<int32_t> cur(data, data + (size_t)w * h);
  std::vector<int32_t> vlo, vhi, next;
  std::vector<int32_t> lo_line, hi_line;
  for (int lev = 0; lev < levels; lev++) {
    int u1x = cx0 + cw;
    int first_even_x = (cx0 % 2 == 0) ? cx0 : cx0 + 1;
    int first_odd_x = (cx0 % 2 == 1) ? cx0 : cx0 + 1;
    int ne_x = cw > 0 ? (u1x - first_even_x + 1) / 2 : 0;
    int no_x = cw > 0 ? (u1x - first_odd_x + 1) / 2 : 0;
    int u1y = cy0 + ch;
    int first_even_y = (cy0 % 2 == 0) ? cy0 : cy0 + 1;
    int first_odd_y = (cy0 % 2 == 1) ? cy0 : cy0 + 1;
    int ne_y = ch > 0 ? (u1y - first_even_y + 1) / 2 : 0;
    int no_y = ch > 0 ? (u1y - first_odd_y + 1) / 2 : 0;

    vlo.assign((size_t)ne_y * cw, 0);
    vhi.assign((size_t)no_y * cw, 0);
    fwd53_vert(cur.data(), cw, ch, cy0, vlo.data(), vhi.data());

    next.assign((size_t)ne_y * ne_x, 0);
    int32_t* hl = band_flat + band_off[lev * 3];
    int32_t* lh = band_flat + band_off[lev * 3 + 1];
    int32_t* hh = band_flat + band_off[lev * 3 + 2];
    lo_line.resize(ne_x > 0 ? ne_x : 1);
    hi_line.resize(no_x > 0 ? no_x : 1);
    for (int r = 0; r < ne_y; r++) {
      fwd53_line(vlo.data() + (size_t)r * cw, cw, cx0, lo_line.data(),
                 hi_line.data());
      std::memcpy(next.data() + (size_t)r * ne_x, lo_line.data(),
                  sizeof(int32_t) * ne_x);
      std::memcpy(hl + (size_t)r * no_x, hi_line.data(),
                  sizeof(int32_t) * no_x);
    }
    for (int r = 0; r < no_y; r++) {
      fwd53_line(vhi.data() + (size_t)r * cw, cw, cx0, lo_line.data(),
                 hi_line.data());
      std::memcpy(lh + (size_t)r * ne_x, lo_line.data(),
                  sizeof(int32_t) * ne_x);
      std::memcpy(hh + (size_t)r * no_x, hi_line.data(),
                  sizeof(int32_t) * no_x);
    }
    cur.swap(next);
    cw = ne_x;
    ch = ne_y;
    cx0 = ceil_div(cx0, 2);
    cy0 = ceil_div(cy0, 2);
  }
  std::memcpy(band_flat + ll_off, cur.data(), sizeof(int32_t) * cw * ch);
  return 0;
}

// Inverse 5/3. bands laid out as in grok_dwt53_fwd; output h*w into data.
int grok_dwt53_inv(int32_t* data, int w, int h, int x0, int y0, int levels,
                   const int32_t* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  // compute per-level geometry top-down
  std::vector<int> ws(levels + 1), hs(levels + 1), xs(levels + 1),
      ys(levels + 1);
  ws[0] = w; hs[0] = h; xs[0] = x0; ys[0] = y0;
  for (int i = 1; i <= levels; i++) {
    int fe_x = (xs[i - 1] % 2 == 0) ? xs[i - 1] : xs[i - 1] + 1;
    int fe_y = (ys[i - 1] % 2 == 0) ? ys[i - 1] : ys[i - 1] + 1;
    ws[i] = ws[i - 1] > 0 ? (xs[i - 1] + ws[i - 1] - fe_x + 1) / 2 : 0;
    hs[i] = hs[i - 1] > 0 ? (ys[i - 1] + hs[i - 1] - fe_y + 1) / 2 : 0;
    xs[i] = ceil_div(xs[i - 1], 2);
    ys[i] = ceil_div(ys[i - 1], 2);
  }
  std::vector<int32_t> cur(band_flat + ll_off,
                           band_flat + ll_off + (size_t)ws[levels] * hs[levels]);
  std::vector<int32_t> top, bot, out;
  std::vector<int32_t> line;
  for (int lev = levels - 1; lev >= 0; lev--) {
    int cw = ws[lev], ch = hs[lev], cx0 = xs[lev], cy0 = ys[lev];
    int ne_x = ws[lev + 1];
    int no_x = cw - ne_x;
    int ne_y = hs[lev + 1];
    int no_y = ch - ne_y;
    const int32_t* hl = band_flat + band_off[lev * 3];
    const int32_t* lh = band_flat + band_off[lev * 3 + 1];
    const int32_t* hh = band_flat + band_off[lev * 3 + 2];
    top.assign((size_t)ne_y * cw, 0);
    bot.assign((size_t)no_y * cw, 0);
    line.resize(cw > 0 ? cw : 1);
    std::vector<int32_t> xe_scratch(cw > 0 ? cw : 1);
    for (int r = 0; r < ne_y; r++) {
      inv53_line(cur.data() + (size_t)r * ne_x, hl + (size_t)r * no_x, cw,
                 cx0, line.data(), xe_scratch.data());
      std::memcpy(top.data() + (size_t)r * cw, line.data(),
                  sizeof(int32_t) * cw);
    }
    for (int r = 0; r < no_y; r++) {
      inv53_line(lh + (size_t)r * ne_x, hh + (size_t)r * no_x, cw, cx0,
                 line.data(), xe_scratch.data());
      std::memcpy(bot.data() + (size_t)r * cw, line.data(),
                  sizeof(int32_t) * cw);
    }
    out.assign((size_t)ch * cw, 0);
    inv53_vert(top.data(), bot.data(), cw, ch, cy0, out.data());
    cur.swap(out);
  }
  std::memcpy(data, cur.data(), sizeof(int32_t) * (size_t)w * h);
  return 0;
}

// Forward / inverse 9/7 (float32), same buffer conventions.
int grok_dwt97_fwd(float* data, int w, int h, int x0, int y0, int levels,
                   float* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  int cw = w, ch = h, cx0 = x0, cy0 = y0;
  std::vector<float> cur(data, data + (size_t)w * h);
  std::vector<float> vlo, vhi, next, lo_line, hi_line;
  for (int lev = 0; lev < levels; lev++) {
    int u1x = cx0 + cw;
    int fe_x = (cx0 % 2 == 0) ? cx0 : cx0 + 1;
    int fo_x = (cx0 % 2 == 1) ? cx0 : cx0 + 1;
    int ne_x = (u1x - fe_x + 1) / 2;
    int no_x = (u1x - fo_x + 1) / 2;
    int u1y = cy0 + ch;
    int fe_y = (cy0 % 2 == 0) ? cy0 : cy0 + 1;
    int ne_y = (u1y - fe_y + 1) / 2;
    int no_y = ch - ne_y;

    vlo.assign((size_t)ne_y * cw, 0.f);
    vhi.assign((size_t)no_y * cw, 0.f);
    fwd97_vert(cur.data(), cw, ch, cy0, vlo.data(), vhi.data());

    next.assign((size_t)ne_y * ne_x, 0.f);
    float* hl = band_flat + band_off[lev * 3];
    float* lh = band_flat + band_off[lev * 3 + 1];
    float* hh = band_flat + band_off[lev * 3 + 2];
    lo_line.resize(ne_x > 0 ? ne_x : 1);
    hi_line.resize(no_x > 0 ? no_x : 1);
    std::vector<float> l_s(cw > 0 ? cw : 1), h_s(cw > 0 ? cw : 1);
    for (int r = 0; r < ne_y; r++) {
      fwd97_line(vlo.data() + (size_t)r * cw, cw, cx0, lo_line.data(),
                 hi_line.data(), l_s.data(), h_s.data());
      std::memcpy(next.data() + (size_t)r * ne_x, lo_line.data(),
                  sizeof(float) * ne_x);
      std::memcpy(hl + (size_t)r * no_x, hi_line.data(),
                  sizeof(float) * no_x);
    }
    for (int r = 0; r < no_y; r++) {
      fwd97_line(vhi.data() + (size_t)r * cw, cw, cx0, lo_line.data(),
                 hi_line.data(), l_s.data(), h_s.data());
      std::memcpy(lh + (size_t)r * ne_x, lo_line.data(),
                  sizeof(float) * ne_x);
      std::memcpy(hh + (size_t)r * no_x, hi_line.data(),
                  sizeof(float) * no_x);
    }
    cur.swap(next);
    cw = ne_x;
    ch = ne_y;
    cx0 = ceil_div(cx0, 2);
    cy0 = ceil_div(cy0, 2);
  }
  std::memcpy(band_flat + ll_off, cur.data(), sizeof(float) * cw * ch);
  return 0;
}

int grok_dwt97_inv(float* data, int w, int h, int x0, int y0, int levels,
                   const float* band_flat, const int64_t* band_off,
                   int64_t ll_off) {
  std::vector<int> ws(levels + 1), hs(levels + 1), xs(levels + 1),
      ys(levels + 1);
  ws[0] = w; hs[0] = h; xs[0] = x0; ys[0] = y0;
  for (int i = 1; i <= levels; i++) {
    int fe_x = (xs[i - 1] % 2 == 0) ? xs[i - 1] : xs[i - 1] + 1;
    int fe_y = (ys[i - 1] % 2 == 0) ? ys[i - 1] : ys[i - 1] + 1;
    ws[i] = ws[i - 1] > 0 ? (xs[i - 1] + ws[i - 1] - fe_x + 1) / 2 : 0;
    hs[i] = hs[i - 1] > 0 ? (ys[i - 1] + hs[i - 1] - fe_y + 1) / 2 : 0;
    xs[i] = ceil_div(xs[i - 1], 2);
    ys[i] = ceil_div(ys[i - 1], 2);
  }
  std::vector<float> cur(band_flat + ll_off,
                         band_flat + ll_off + (size_t)ws[levels] * hs[levels]);
  std::vector<float> top, bot, out, line;
  for (int lev = levels - 1; lev >= 0; lev--) {
    int cw = ws[lev], ch = hs[lev], cx0 = xs[lev], cy0 = ys[lev];
    int ne_x = ws[lev + 1];
    int no_x = cw - ne_x;
    int ne_y = hs[lev + 1];
    int no_y = ch - ne_y;
    const float* hl = band_flat + band_off[lev * 3];
    const float* lh = band_flat + band_off[lev * 3 + 1];
    const float* hh = band_flat + band_off[lev * 3 + 2];
    top.assign((size_t)ne_y * cw, 0.f);
    bot.assign((size_t)no_y * cw, 0.f);
    line.resize(cw > 0 ? cw : 1);
    std::vector<float> l_s(cw > 0 ? cw : 1), h_s(cw > 0 ? cw : 1);
    for (int r = 0; r < ne_y; r++) {
      inv97_line(cur.data() + (size_t)r * ne_x, hl + (size_t)r * no_x, cw,
                 cx0, line.data(), l_s.data(), h_s.data());
      std::memcpy(top.data() + (size_t)r * cw, line.data(),
                  sizeof(float) * cw);
    }
    for (int r = 0; r < no_y; r++) {
      inv97_line(lh + (size_t)r * ne_x, hh + (size_t)r * no_x, cw, cx0,
                 line.data(), l_s.data(), h_s.data());
      std::memcpy(bot.data() + (size_t)r * cw, line.data(),
                  sizeof(float) * cw);
    }
    out.assign((size_t)ch * cw, 0.f);
    inv97_vert(top.data(), bot.data(), cw, ch, cy0, out.data());
    cur.swap(out);
  }
  std::memcpy(data, cur.data(), sizeof(float) * (size_t)w * h);
  return 0;
}

}  // extern "C"
