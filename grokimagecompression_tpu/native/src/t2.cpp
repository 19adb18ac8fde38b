// Native Tier-2 packet encoder: emits all layers' packets for one
// precinct group (the 1 or 3 band-precincts a packet covers) in one call.
//
// Bit-identical to the Python reference (codestream/t2.py encode_packet,
// tagtree.py, bitio.py), which follows ISO/IEC 15444-1 B.10 (reference
// behavior: src/lib/jp2/t2/T2.cpp encode_packet:859,
// codestream/TagTree.cpp:230, BitIO.h).  Inter-packet T2 state (tag
// trees, inclusion, Lblock, consumed passes) is per-precinct, so holding
// it inside a single native call over the layer loop reproduces the
// packet-by-packet state evolution exactly.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int T2_INF = 999999999;

// ---------------------------------------------------------------------------
// Bit writer with 0xFF stuffing (packet headers).
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t>& out;
  int buf = 0, ct = 8;

  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}

  void emit() {
    out.push_back((uint8_t)buf);
    ct = (buf == 0xFF) ? 7 : 8;
    buf = 0;
  }

  void write_bit(int b) {
    buf = (buf << 1) | (b & 1);
    if (--ct == 0) emit();
  }

  void write_bits(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) write_bit((v >> i) & 1);
  }

  void write_commacode(int n) {
    for (int i = 0; i < n; i++) write_bit(1);
    write_bit(0);
  }

  void write_numpasses(int n) {
    if (n == 1) write_bit(0);
    else if (n == 2) write_bits(0b10, 2);
    else if (n <= 5) { write_bits(0b11, 2); write_bits(n - 3, 2); }
    else if (n <= 36) { write_bits(0b1111, 4); write_bits(n - 6, 5); }
    else { write_bits(0b111111111, 9); write_bits(n - 37, 7); }
  }

  void flush() {
    int full = (!out.empty() && out.back() == 0xFF) ? 7 : 8;
    if (ct < full) {
      buf <<= ct;
      out.push_back((uint8_t)(buf & 0xFF));
      buf = 0;
      ct = 8;
    }
    if (!out.empty() && out.back() == 0xFF) out.push_back(0x00);
  }
};

// ---------------------------------------------------------------------------
// Tag tree
// ---------------------------------------------------------------------------

struct TagTree {
  int w, h, nlev;
  std::vector<int> dims_w, dims_h, off;
  std::vector<int> value, low;
  std::vector<uint8_t> known;

  TagTree(int w_, int h_) : w(w_), h(h_) {
    int lw = w, lh = h, o = 0;
    for (;;) {
      dims_w.push_back(lw);
      dims_h.push_back(lh);
      off.push_back(o);
      o += lw * lh;
      if (lw == 1 && lh == 1) break;
      lw = (lw + 1) / 2;
      lh = (lh + 1) / 2;
    }
    nlev = (int)dims_w.size();
    value.assign(o, T2_INF);
    low.assign(o, 0);
    known.assign(o, 0);
  }

  void set_value(int x, int y, int v) {
    for (int lev = 0; lev < nlev; lev++) {
      int idx = off[lev] + (y >> lev) * dims_w[lev] + (x >> lev);
      if (value[idx] > v) value[idx] = v; else break;
    }
  }

  void encode(BitWriter& bw, int x, int y, int threshold) {
    int lo = 0;
    for (int lev = nlev - 1; lev >= 0; lev--) {
      int idx = off[lev] + (y >> lev) * dims_w[lev] + (x >> lev);
      if (lo < low[idx]) lo = low[idx];
      while (lo < threshold) {
        if (lo >= value[idx]) {
          if (!known[idx]) {
            bw.write_bit(1);
            known[idx] = 1;
          }
          break;
        }
        bw.write_bit(0);
        lo += 1;
      }
      low[idx] = lo;
    }
  }
};

constexpr int CBLKSTY_LAZY = 0x01;
constexpr int CBLKSTY_TERMALL = 0x04;

static int seg_maxpasses(int seg_index, int style) {
  if (style & CBLKSTY_TERMALL) return 1;
  if (style & CBLKSTY_LAZY) {
    if (seg_index == 0) return 10;
    return (seg_index % 2 == 1) ? 2 : 1;
  }
  return 109;
}

static inline int floorlog2(int n) {
  int r = -1;
  while (n) { r++; n >>= 1; }
  return r;
}

struct CblkState {
  int cx, cy, imsb, numpasses;
  int64_t data_off;
  const int32_t* rates;      // cumulative, per pass
  const uint8_t* term;       // per pass
  const int32_t* layer_np;   // per layer
  bool included = false;
  int lblock = 3;
  int passes_used = 0;

  int first_contrib_layer(int numlayers) const {
    for (int l = 0; l < numlayers; l++)
      if (layer_np[l] > 0) return l;
    return T2_INF;
  }

  int pass_bytes(int a, int b) const {
    if (b <= a) return 0;
    int lo = a > 0 ? rates[a - 1] : 0;
    return rates[b - 1] - lo;
  }
};

}  // namespace

extern "C" {

// Encode all layers of one precinct group.
//   nbands: band-precincts in this packet (1 or 3)
//   grid[b*2], grid[b*2+1]: tag-tree grid dims per band-precinct
//   ncblks[b]: code-blocks per band-precinct
//   cblk_meta (per cblk, flattened across bands, int64 x 5):
//     cx, cy, imsb, numpasses, data_off
//   layer_npasses: int32 per cblk x numlayers
//   pass_rates: int32 per cblk x pass_stride (cumulative)
//   pass_term: uint8 per cblk x pass_stride
//   data_flat: all cblk data (offsets via data_off)
//   out: output buffer; layer_off[l] gets the fragment start; returns
//     total bytes or -1 on overflow.
int grok_t2_encode_precinct(
    int numlayers, int style, int eph, int nbands, const int32_t* grid,
    const int32_t* ncblks, const int64_t* cblk_meta,
    const int32_t* layer_npasses, const int32_t* pass_rates,
    const uint8_t* pass_term, int pass_stride, const uint8_t* data_flat,
    uint8_t* out, int64_t out_cap, int64_t* layer_off) {
  // Build per-band tag trees + cblk states.
  std::vector<TagTree> incl, imsbt;
  std::vector<std::vector<CblkState>> bands(nbands);
  int ci = 0;
  for (int b = 0; b < nbands; b++) {
    int gw = grid[b * 2] > 0 ? grid[b * 2] : 1;
    int gh = grid[b * 2 + 1] > 0 ? grid[b * 2 + 1] : 1;
    incl.emplace_back(gw, gh);
    imsbt.emplace_back(gw, gh);
    for (int k = 0; k < ncblks[b]; k++, ci++) {
      CblkState cs;
      cs.cx = (int)cblk_meta[ci * 5];
      cs.cy = (int)cblk_meta[ci * 5 + 1];
      cs.imsb = (int)cblk_meta[ci * 5 + 2];
      cs.numpasses = (int)cblk_meta[ci * 5 + 3];
      cs.data_off = cblk_meta[ci * 5 + 4];
      cs.rates = pass_rates + (size_t)ci * pass_stride;
      cs.term = pass_term + (size_t)ci * pass_stride;
      cs.layer_np = layer_npasses + (size_t)ci * numlayers;
      bands[b].push_back(cs);
    }
  }
  for (int b = 0; b < nbands; b++) {
    for (auto& cb : bands[b]) {
      int fl = cb.first_contrib_layer(numlayers);
      incl[b].set_value(cb.cx, cb.cy, fl);
      imsbt[b].set_value(cb.cx, cb.cy, cb.imsb);
    }
  }

  std::vector<uint8_t> frag;
  int64_t total = 0;
  for (int layer = 0; layer < numlayers; layer++) {
    layer_off[layer] = total;
    frag.clear();
    BitWriter bw(frag);
    bool nonempty = false;
    for (int b = 0; b < nbands; b++)
      for (auto& cb : bands[b])
        if (cb.layer_np[layer] > 0) nonempty = true;
    std::vector<uint8_t> body;
    if (!nonempty) {
      bw.write_bit(0);
      bw.flush();
      if (eph) {
        frag.push_back(0xFF);
        frag.push_back(0x92);
      }
    } else {
      bw.write_bit(1);
      for (int b = 0; b < nbands; b++) {
        for (auto& cb : bands[b]) {
          int n = cb.layer_np[layer];
          if (!cb.included) {
            incl[b].encode(bw, cb.cx, cb.cy, layer + 1);
          } else {
            bw.write_bit(n > 0 ? 1 : 0);
          }
          if (n == 0) continue;
          if (!cb.included) {
            int t = 1;
            for (;;) {
              imsbt[b].encode(bw, cb.cx, cb.cy, t);
              if (cb.imsb < t) break;
              t += 1;
            }
            cb.included = true;
            cb.lblock = 3;
          }
          bw.write_numpasses(n);
          // Segments of this layer.
          int segs_np[64], segs_nb[64], nsegs = 0;
          {
            int a = cb.passes_used, end = a + n, i = a;
            while (i < end) {
              int j = i;
              while (j < end - 1 && !cb.term[j]) j++;
              segs_np[nsegs] = j - i + 1;
              segs_nb[nsegs] = cb.pass_bytes(i, j + 1);
              nsegs++;
              i = j + 1;
            }
          }
          int increment = 0;
          for (int s2 = 0; s2 < nsegs; s2++) {
            int nb2 = segs_nb[s2];
            int bits_needed = 1;
            while ((1 << bits_needed) <= nb2) bits_needed++;
            if (nb2 == 0) bits_needed = 1;
            int have = cb.lblock + floorlog2(segs_np[s2]);
            if (bits_needed - have > increment)
              increment = bits_needed - have;
          }
          bw.write_commacode(increment);
          cb.lblock += increment;
          for (int s2 = 0; s2 < nsegs; s2++)
            bw.write_bits((uint32_t)segs_nb[s2],
                          cb.lblock + floorlog2(segs_np[s2]));
          int start = cb.passes_used > 0 ? cb.rates[cb.passes_used - 1] : 0;
          int nbytes = 0;
          for (int s2 = 0; s2 < nsegs; s2++) nbytes += segs_nb[s2];
          const uint8_t* src = data_flat + cb.data_off + start;
          body.insert(body.end(), src, src + nbytes);
          cb.passes_used += n;
        }
      }
      bw.flush();
      if (eph) {
        frag.push_back(0xFF);
        frag.push_back(0x92);
      }
      frag.insert(frag.end(), body.begin(), body.end());
    }
    if (total + (int64_t)frag.size() > out_cap) return -1;
    std::memcpy(out + total, frag.data(), frag.size());
    total += (int64_t)frag.size();
  }
  layer_off[numlayers] = total;
  return (int)total;
}

}  // extern "C"
