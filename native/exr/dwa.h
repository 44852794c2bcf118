// DWA (DWAA/DWAB) decode for the native EXR codec — decode-only C++ twin
// of pcss_unet_tpu/io/dwa.py (itself implemented from the OpenEXR file-
// format specification; see that module's docstring for the layout).
//
// Chunk layout: 11x uint64 header (version, unknown usize/csize, AC csize,
// DC csize, RLE csize/usize/raw, AC count, DC count, AC selector) followed
// by the UNKNOWN / AC / DC / RLE segments.  Channel classification uses
// the default rules (HALF r/g/b/y/by/ry suffixes -> LOSSY_DCT with Rec.709
// CSC for full r,g,b prefix sets; HALF a -> RLE; everything else verbatim
// via deflate).  LOSSY_DCT planes: per-8x8-block half-quantized DCT
// coefficients, DC in its own reorder+delta+deflate segment, zig-zag AC as
// zero-run tokens (0xff00|run) through the PIZ Huffman coder, all in the
// sign-preserving x^(1/2.2) nonlinear half domain.
//
// The decoder reconstructs EVERY channel of a chunk in one pass (the CSC
// coupling makes per-channel decode wasteful); the Reader caches the
// result per chunk offset so reading N channels costs one decode.
//
// The Python twin is the differential-test oracle (tests/test_exr.py).

#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

#include "piz.h"

namespace dwa {

enum Scheme { SCHEME_UNKNOWN = 0, SCHEME_LOSSY_DCT = 1, SCHEME_RLE = 2 };
constexpr int kPtHalf = 1;
constexpr uint64_t kAcStaticHuffman = 0, kAcDeflate = 1;

struct Chan {
  std::string name;
  int pixel_type;  // EXR pixel type: UINT(0)/HALF(1)/FLOAT(2)
};

inline std::string suffix(const std::string& name) {
  size_t p = name.rfind('.');
  std::string s = p == std::string::npos ? name : name.substr(p + 1);
  for (auto& c : s) c = (char)std::tolower((unsigned char)c);
  return s;
}

// Default channel rules -> per-channel scheme + CSC index triples
// (r,g,b HALF channels sharing a prefix, in first-seen prefix order).
inline void classify(const std::vector<Chan>& channels,
                     std::vector<int>* schemes,
                     std::vector<std::vector<int>>* csc) {
  schemes->clear();
  for (const auto& ch : channels) {
    std::string s = suffix(ch.name);
    if (ch.pixel_type != kPtHalf)
      schemes->push_back(SCHEME_UNKNOWN);
    else if (s == "r" || s == "g" || s == "b" || s == "y" || s == "by" ||
             s == "ry")
      schemes->push_back(SCHEME_LOSSY_DCT);
    else if (s == "a")
      schemes->push_back(SCHEME_RLE);
    else
      schemes->push_back(SCHEME_UNKNOWN);
  }
  csc->clear();
  std::vector<std::string> prefixes;
  std::vector<int> ri, gi, bi;
  for (size_t i = 0; i < channels.size(); ++i) {
    if ((*schemes)[i] != SCHEME_LOSSY_DCT) continue;
    std::string s = suffix(channels[i].name);
    if (s != "r" && s != "g" && s != "b") continue;
    size_t dot = channels[i].name.rfind('.');
    std::string prefix =
        dot == std::string::npos ? "" : channels[i].name.substr(0, dot);
    size_t gidx = prefixes.size();
    for (size_t k = 0; k < prefixes.size(); ++k)
      if (prefixes[k] == prefix) { gidx = k; break; }
    if (gidx == prefixes.size()) {
      prefixes.push_back(prefix);
      ri.push_back(-1);
      gi.push_back(-1);
      bi.push_back(-1);
    }
    (s == "r" ? ri : s == "g" ? gi : bi)[gidx] = (int)i;
  }
  for (size_t k = 0; k < prefixes.size(); ++k)
    if (ri[k] >= 0 && gi[k] >= 0 && bi[k] >= 0)
      csc->push_back({ri[k], gi[k], bi[k]});
}

// DCT processing order: chlist order; a CSC set is emitted whole at its
// first member; other DCT channels solo.  -> list of index groups.
inline std::vector<std::vector<int>> plane_order(
    const std::vector<Chan>& channels, const std::vector<int>& schemes,
    const std::vector<std::vector<int>>& csc) {
  std::vector<std::vector<int>> order;
  std::vector<char> done(channels.size(), 0);
  for (size_t i = 0; i < channels.size(); ++i) {
    if (schemes[i] != SCHEME_LOSSY_DCT || done[i]) continue;
    const std::vector<int>* group = nullptr;
    for (const auto& g : csc)
      if (g[0] == (int)i || g[1] == (int)i || g[2] == (int)i) {
        group = &g;
        break;
      }
    if (group) {
      order.push_back(*group);
      for (int j : *group) done[j] = 1;
    } else {
      order.push_back({(int)i});
      done[i] = 1;
    }
  }
  return order;
}

// half bits (nonlinear domain) -> half bits (linear domain): the
// sign-preserving x^2.2 transfer over all 65536 patterns, float32 powf to
// match the numpy LUT (io/dwa.py _lut_nonlinear); NaN/Inf pass through,
// and sign(0)*x semantics map -0 to +0 exactly as np.sign does.
inline const uint16_t* to_linear_lut(float (*half_to_float_fn)(uint16_t),
                                     uint16_t (*float_to_half_fn)(float)) {
  // C++11 magic static: decodes run GIL-free on multiple threads, so the
  // lazy init must be race-free (a plain static vector + empty() check
  // would be a concurrent-resize UB).
  static const std::vector<uint16_t>* lut = [&] {
    auto* t = new std::vector<uint16_t>(65536);
    for (uint32_t b = 0; b < 65536; ++b) {
      float f = half_to_float_fn((uint16_t)b);
      if (!std::isfinite(f)) {
        (*t)[b] = (uint16_t)b;
        continue;
      }
      float s = f > 0.f ? 1.f : f < 0.f ? -1.f : 0.f;
      (*t)[b] = float_to_half_fn(s * std::pow(std::fabs(f), 2.2f));
    }
    return t;
  }();
  return lut->data();
}

inline const int* zigzag() {
  static const int z[64] = {
      0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};
  return z;
}

// orthonormal 8-point DCT-II basis C[k][x]
inline const float* dct_basis() {
  static const std::vector<float>* C = [] {  // race-free lazy init
    auto* t = new std::vector<float>(64);
    for (int k = 0; k < 8; ++k) {
      float s = k == 0 ? std::sqrt(1.0f / 8.0f) : std::sqrt(2.0f / 8.0f);
      for (int x = 0; x < 8; ++x)
        (*t)[k * 8 + x] =
            s * std::cos((float)(M_PI * (2 * x + 1) * k / 16.0));
    }
    return t;
  }();
  return C->data();
}

// EXR RLE decode (same scheme as the scanline codec's)
inline bool rle_decode(const uint8_t* src, size_t n, uint8_t* dst,
                       size_t expected) {
  size_t i = 0, o = 0;
  while (i < n && o < expected) {
    uint8_t count = src[i++];
    if (count > 127) {
      size_t run = 256 - (size_t)count;
      if (i + run > n || o + run > expected) return false;
      std::memcpy(dst + o, src + i, run);
      i += run;
      o += run;
    } else {
      if (i >= n) return false;
      size_t run = (size_t)count + 1;
      if (o + run > expected) return false;
      std::memset(dst + o, src[i], run);
      ++i;
      o += run;
    }
  }
  return o == expected;
}

// Undo the ZIP reorder+delta byte transform (DC segment uses it).
inline void undo_zip_transform(std::vector<uint8_t>& buf,
                               std::vector<uint8_t>& out) {
  size_t n = buf.size();
  for (size_t i = 1; i < n; ++i)
    buf[i] = (uint8_t)((int)buf[i - 1] + (int)buf[i] - 128);
  out.resize(n);
  const uint8_t* t1 = buf.data();
  const uint8_t* t2 = buf.data() + (n + 1) / 2;
  uint8_t* s = out.data();
  uint8_t* stop = s + n;
  while (true) {
    if (s < stop) *s++ = *t1++; else break;
    if (s < stop) *s++ = *t2++; else break;
  }
}

inline bool inflate_to(const uint8_t* src, size_t n, size_t expected,
                       std::vector<uint8_t>* out, std::string* err) {
  out->resize(expected);
  uLongf dlen = expected;
  if (expected == 0) return n == 0 || true;
  if (uncompress(out->data(), &dlen, src, n) != Z_OK || dlen != expected) {
    *err = "DWA: inflate failed";
    return false;
  }
  return true;
}

// half bits (linear) -> half bits (nonlinear x^(1/2.2)) — encoder-side
// twin of to_linear_lut, matching io/dwa.py _lut_nonlinear.
inline const uint16_t* to_nonlinear_lut(float (*half_to_float_fn)(uint16_t),
                                        uint16_t (*float_to_half_fn)(float)) {
  // race-free lazy init (see to_linear_lut)
  static const std::vector<uint16_t>* lut = [&] {
    auto* t = new std::vector<uint16_t>(65536);
    for (uint32_t b = 0; b < 65536; ++b) {
      float f = half_to_float_fn((uint16_t)b);
      if (!std::isfinite(f)) {
        (*t)[b] = (uint16_t)b;
        continue;
      }
      float s = f > 0.f ? 1.f : f < 0.f ? -1.f : 0.f;
      (*t)[b] = float_to_half_fn(s * std::pow(std::fabs(f), 1.0f / 2.2f));
    }
    return t;
  }();
  return lut->data();
}

// ZIP reorder+delta byte transform (DC segment; mirror of the codec's).
inline void do_zip_transform(const uint8_t* src, size_t n,
                             std::vector<uint8_t>* out) {
  out->resize(n);
  uint8_t* t1 = out->data();
  uint8_t* t2 = out->data() + (n + 1) / 2;
  for (size_t i = 0; i < n; ++i)
    (i & 1 ? *t2++ : *t1++) = src[i];
  uint8_t prev = n ? (*out)[0] : 0;
  for (size_t i = 1; i < n; ++i) {
    uint8_t cur = (*out)[i];
    (*out)[i] = (uint8_t)((int)cur - (int)prev + 128);
    prev = cur;
  }
}

// EXR RLE encode (same scheme the scanline writer uses).
inline void rle_encode(const uint8_t* d, size_t n, std::string* enc) {
  enc->clear();
  enc->reserve(n);
  size_t i = 0;
  while (i < n) {
    size_t run = 1;
    while (i + run < n && d[i + run] == d[i] && run < 127) ++run;
    if (run >= 3) {
      enc->push_back((char)(run - 1));
      enc->push_back((char)d[i]);
      i += run;
    } else {
      size_t start = i;
      while (i < n && i - start < 127 &&
             !(i + 2 < n && d[i] == d[i + 1] && d[i] == d[i + 2]))
        ++i;
      enc->push_back((char)(256 - (i - start)));
      enc->append((const char*)d + start, i - start);
    }
  }
}

inline bool deflate_to(const uint8_t* src, size_t n, std::string* out) {
  uLongf clen = compressBound(n);
  std::vector<uint8_t> buf(clen);
  if (compress2(buf.data(), &clen, src, n, Z_DEFAULT_COMPRESSION) != Z_OK)
    return false;
  out->assign((const char*)buf.data(), clen);
  return true;
}

// Round a DCT coefficient to the coarsest-mantissa half within its error
// budget (zero when |c| <= err) — mirrors io/dwa.py
// _quantize_to_sparse_half including the uint16 wrap semantics.
inline uint16_t quantize_sparse_half(float c, float err,
                                     float (*h2f)(uint16_t),
                                     uint16_t (*f2h)(float)) {
  if (std::fabs(c) <= err) return 0;
  uint16_t bits = f2h(c);
  for (int keep = 0; keep < 10; ++keep) {
    int drop = 10 - keep;
    uint32_t mask = ~((1u << drop) - 1);
    uint16_t cand = (uint16_t)(((uint32_t)bits + (1u << (drop - 1))) & mask);
    if (std::fabs(h2f(cand) - c) <= err) return cand;
  }
  return bits;
}

// 63 zig-zag AC halfs -> tokens (nonzero verbatim, zero runs 0xff00|run).
inline void rle_ac(const uint16_t* q, std::vector<uint16_t>* out) {
  int prev = 0;
  for (int idx = 0; idx < 63; ++idx) {
    if (!q[idx]) continue;
    int run = idx - prev;
    while (run > 0) {
      int r = run > 255 ? 255 : run;
      out->push_back((uint16_t)(0xFF00 | r));
      run -= r;
    }
    out->push_back(q[idx]);
    prev = idx + 1;
  }
  int run = 63 - prev;
  while (run > 0) {
    int r = run > 255 ? 255 : run;
    out->push_back((uint16_t)(0xFF00 | r));
    run -= r;
  }
}

// Encode one DWA chunk (header version 1, default channel rules).
// ``planes``: chlist-ordered [n_lines * width] float32 (row stride =
// width).  ``level`` is the DWA compression level (default 45).
inline bool compress(const std::vector<const float*>& planes,
                     const std::vector<Chan>& channels, int width,
                     int n_lines, float level, std::string* out,
                     std::string* err,
                     float (*h2f)(uint16_t), uint16_t (*f2h)(float)) {
  std::vector<int> schemes;
  std::vector<std::vector<int>> csc;
  classify(channels, &schemes, &csc);
  auto order = plane_order(channels, schemes, csc);
  float base_err = level / 100000.0f;

  const float* C = dct_basis();
  const int* zz = zigzag();
  const uint16_t* nl_lut = to_nonlinear_lut(h2f, f2h);

  int nbx = (width + 7) / 8, nby = (n_lines + 7) / 8;
  size_t blocks_per_plane = (size_t)nbx * nby;
  size_t npix = (size_t)width * n_lines;
  int pw = nbx * 8, ph = nby * 8;

  std::vector<uint16_t> dc_all;
  std::vector<uint16_t> ac_tokens;
  std::string rle_bytes, unknown;

  // nonlinearize into an 8-aligned edge-replicated canvas
  auto nonlinearize = [&](const float* src, std::vector<float>* dst) {
    dst->resize((size_t)ph * pw);
    for (int y = 0; y < ph; ++y) {
      int sy = y < n_lines ? y : n_lines - 1;
      const float* row = src + (size_t)sy * width;
      float* drow = dst->data() + (size_t)y * pw;
      for (int x = 0; x < pw; ++x) {
        int sx = x < width ? x : width - 1;
        drow[x] = h2f(nl_lut[f2h(row[sx])]);
      }
    }
  };

  std::vector<std::vector<float>> group;
  for (const auto& idxs : order) {
    group.assign(idxs.size(), {});
    for (size_t pi = 0; pi < idxs.size(); ++pi)
      nonlinearize(planes[idxs[pi]], &group[pi]);
    if (idxs.size() == 3) {  // Rec.709 forward CSC (nonlinear domain)
      float* R = group[0].data();
      float* G = group[1].data();
      float* B = group[2].data();
      for (size_t i = 0; i < group[0].size(); ++i) {
        float r = R[i], g = G[i], b = B[i];
        float y = 0.2126f * r + 0.7152f * g + 0.0722f * b;
        R[i] = y;
        G[i] = (b - y) / 1.8556f;
        B[i] = (r - y) / 1.5748f;
      }
    }
    for (auto& plane : group) {
      for (size_t b = 0; b < blocks_per_plane; ++b) {
        int by = (int)(b / nbx), bx = (int)(b % nbx);
        const float* src = plane.data() + (size_t)by * 8 * pw + bx * 8;
        // forward 8x8 DCT: coef[k][l] = sum_y sum_x C[k,y] B[y,x] C[l,x]
        float tmp[64], coef[64];
        for (int k = 0; k < 8; ++k)
          for (int x = 0; x < 8; ++x) {
            float acc = 0.f;
            for (int y = 0; y < 8; ++y)
              acc += C[k * 8 + y] * src[(size_t)y * pw + x];
            tmp[k * 8 + x] = acc;
          }
        for (int k = 0; k < 8; ++k)
          for (int l = 0; l < 8; ++l) {
            float acc = 0.f;
            for (int x = 0; x < 8; ++x) acc += tmp[k * 8 + x] * C[l * 8 + x];
            coef[k * 8 + l] = acc;
          }
        uint16_t q[64];
        for (int j = 0; j < 64; ++j)
          q[j] = quantize_sparse_half(coef[zz[j]],
                                      base_err * (1.0f + 0.35f * j),
                                      h2f, f2h);
        dc_all.push_back(q[0]);
        rle_ac(q + 1, &ac_tokens);
      }
    }
  }

  for (size_t i = 0; i < channels.size(); ++i) {
    if (schemes[i] == SCHEME_RLE) {
      std::string lo(npix, '\0'), hi(npix, '\0');
      for (size_t p = 0; p < npix; ++p) {
        uint16_t v = f2h(planes[i][p]);
        lo[p] = (char)(v & 0xFF);
        hi[p] = (char)(v >> 8);
      }
      rle_bytes += lo;
      rle_bytes += hi;
    } else if (schemes[i] == SCHEME_UNKNOWN) {
      if (channels[i].pixel_type == kPtHalf) {
        for (size_t p = 0; p < npix; ++p) {
          uint16_t v = f2h(planes[i][p]);
          unknown.append((const char*)&v, 2);
        }
      } else if (channels[i].pixel_type == 2) {  // FLOAT verbatim
        unknown.append((const char*)planes[i], npix * 4);
      } else {  // UINT
        for (size_t p = 0; p < npix; ++p) {
          uint32_t v = (uint32_t)planes[i][p];
          unknown.append((const char*)&v, 4);
        }
      }
    }
  }

  std::string unknown_z, ac_z, dc_z, rle_z, rle_rle;
  if (!unknown.empty() &&
      !deflate_to((const uint8_t*)unknown.data(), unknown.size(),
                  &unknown_z)) {
    *err = "DWA: deflate failed";
    return false;
  }
  if (!ac_tokens.empty() &&
      !piz::huf_compress(ac_tokens.data(), ac_tokens.size(), &ac_z)) {
    *err = "DWA: AC huffman encode failed";
    return false;
  }
  if (!dc_all.empty()) {
    std::vector<uint8_t> dct;
    do_zip_transform((const uint8_t*)dc_all.data(), dc_all.size() * 2, &dct);
    if (!deflate_to(dct.data(), dct.size(), &dc_z)) {
      *err = "DWA: deflate failed";
      return false;
    }
  }
  if (!rle_bytes.empty()) {
    rle_encode((const uint8_t*)rle_bytes.data(), rle_bytes.size(), &rle_rle);
    if (!deflate_to((const uint8_t*)rle_rle.data(), rle_rle.size(), &rle_z)) {
      *err = "DWA: deflate failed";
      return false;
    }
  }

  uint64_t hdr[11] = {1,
                      (uint64_t)unknown.size(),
                      (uint64_t)unknown_z.size(),
                      (uint64_t)ac_z.size(),
                      (uint64_t)dc_z.size(),
                      (uint64_t)rle_z.size(),
                      (uint64_t)rle_rle.size(),
                      (uint64_t)rle_bytes.size(),
                      (uint64_t)ac_tokens.size(),
                      (uint64_t)dc_all.size(),
                      kAcStaticHuffman};
  out->assign((const char*)hdr, 88);
  *out += unknown_z;
  *out += ac_z;
  *out += dc_z;
  *out += rle_z;
  return true;
}

// Decode one DWA chunk: every channel -> [n_lines * width] float32 planes
// in chlist order.  half conversion functions are injected from the codec
// so both share one rounding implementation.
inline bool decompress(const uint8_t* payload, size_t csize,
                       const std::vector<Chan>& channels, int width,
                       int n_lines, std::vector<std::vector<float>>* out,
                       std::string* err,
                       float (*h2f)(uint16_t), uint16_t (*f2h)(float)) {
  if (csize < 88) { *err = "DWA: truncated chunk"; return false; }
  uint64_t hdr[11];
  std::memcpy(hdr, payload, 88);
  uint64_t version = hdr[0], unk_usize = hdr[1], unk_csize = hdr[2],
           ac_csize = hdr[3], dc_csize = hdr[4], rle_csize = hdr[5],
           rle_usize = hdr[6], rle_raw = hdr[7], ac_count = hdr[8],
           dc_count = hdr[9], ac_comp = hdr[10];
  size_t pos = 88;
  if (version >= 2) {  // serialized channel rules: skip, apply defaults
    if (pos + 2 > csize) { *err = "DWA: truncated rules"; return false; }
    uint16_t rule_size;
    std::memcpy(&rule_size, payload + pos, 2);
    if (rule_size < 2) { *err = "DWA: corrupt rules block"; return false; }
    pos += rule_size;
    if (pos > csize) { *err = "DWA: truncated rules"; return false; }
  }
  // Every header field is corruption-controlled: validate each segment
  // size against the REMAINING bytes (a naive summed check can wrap
  // uint64 and pass), and the element counts against what the plane
  // geometry can actually hold (huge counts would otherwise throw
  // length_error through the extern-C boundary -> std::terminate).
  size_t remaining = csize - pos;
  for (uint64_t seg : {unk_csize, ac_csize, dc_csize, rle_csize}) {
    if (seg > remaining) {
      *err = "DWA: segment sizes exceed chunk";
      return false;
    }
    remaining -= seg;
  }
  {
    int nbx_ = (width + 7) / 8, nby_ = (n_lines + 7) / 8;
    uint64_t bpp = (uint64_t)nbx_ * nby_;
    uint64_t max_planes = 2 * (uint64_t)channels.size();  // FLOAT = 2 u16
    // per block: <= 63 AC entries, each at worst one token + one run token
    if (dc_count > bpp * max_planes ||
        ac_count > 126 * bpp * max_planes ||
        unk_usize > (uint64_t)width * n_lines * 4 * channels.size() ||
        rle_usize > (uint64_t)width * n_lines * 4 * channels.size() ||
        rle_raw > (uint64_t)width * n_lines * 4 * channels.size()) {
      *err = "DWA: header counts exceed plane geometry";
      return false;
    }
  }
  std::vector<uint8_t> unknown;
  if (unk_csize &&
      !inflate_to(payload + pos, unk_csize, unk_usize, &unknown, err))
    return false;
  pos += unk_csize;
  std::vector<uint16_t> ac_tokens(ac_count);
  if (ac_count) {
    if (ac_comp == kAcStaticHuffman) {
      if (!piz::huf_decompress(payload + pos, ac_csize, ac_tokens.data(),
                               ac_count, err))
        return false;
    } else if (ac_comp == kAcDeflate) {
      std::vector<uint8_t> raw;
      if (!inflate_to(payload + pos, ac_csize, ac_count * 2, &raw, err))
        return false;
      std::memcpy(ac_tokens.data(), raw.data(), ac_count * 2);
    } else {
      *err = "DWA: unknown AC compression selector";
      return false;
    }
  }
  pos += ac_csize;
  std::vector<uint16_t> dc_all(dc_count);
  if (dc_count) {
    std::vector<uint8_t> z, dcb;
    if (!inflate_to(payload + pos, dc_csize, dc_count * 2, &z, err))
      return false;
    undo_zip_transform(z, dcb);
    std::memcpy(dc_all.data(), dcb.data(), dc_count * 2);
  }
  pos += dc_csize;
  std::vector<uint8_t> rle_bytes;
  if (rle_csize) {
    std::vector<uint8_t> rle_rle;
    if (!inflate_to(payload + pos, rle_csize, rle_usize, &rle_rle, err))
      return false;
    rle_bytes.resize(rle_raw);
    if (!rle_decode(rle_rle.data(), rle_rle.size(), rle_bytes.data(),
                    rle_raw)) {
      *err = "DWA: RLE decode failed";
      return false;
    }
  }

  std::vector<int> schemes;
  std::vector<std::vector<int>> csc;
  classify(channels, &schemes, &csc);
  auto order = plane_order(channels, schemes, csc);

  int nbx = (width + 7) / 8, nby = (n_lines + 7) / 8;
  size_t blocks_per_plane = (size_t)nbx * nby;
  size_t npix = (size_t)width * n_lines;
  out->assign(channels.size(), {});

  const float* C = dct_basis();
  const int* zz = zigzag();
  const uint16_t* lin_lut = to_linear_lut(h2f, f2h);
  size_t dc_pos = 0, ac_pos = 0;
  // padded plane scratch (blocks cover an 8-aligned canvas)
  std::vector<std::vector<float>> group_planes;
  for (const auto& idxs : order) {
    group_planes.assign(idxs.size(),
                        std::vector<float>((size_t)nby * 8 * nbx * 8));
    for (size_t pi = 0; pi < idxs.size(); ++pi) {
      if (dc_pos + blocks_per_plane > dc_count) {
        *err = "DWA: DC segment exhausted";
        return false;
      }
      float* plane = group_planes[pi].data();
      int pw = nbx * 8;
      for (size_t b = 0; b < blocks_per_plane; ++b) {
        // zig-zag coefficients: DC from its segment, AC from run tokens
        float coef[64] = {0};
        uint16_t q0 = dc_all[dc_pos + b];
        coef[zz[0]] = h2f(q0);
        int filled = 0;
        while (filled < 63) {
          if (ac_pos >= ac_count) {
            *err = "DWA: AC stream exhausted";
            return false;
          }
          uint16_t t = ac_tokens[ac_pos++];
          if ((t & 0xFF00) == 0xFF00) {
            filled += t & 0xFF;
            if (filled > 63) {
              *err = "DWA: AC zero run overruns block";
              return false;
            }
          } else {
            coef[zz[1 + filled]] = h2f(t);
            ++filled;
          }
        }
        // inverse 8x8 DCT: block[y][x] = sum_k sum_l C[k][y] coef[k][l] C[l][x]
        float tmp[64];
        for (int y = 0; y < 8; ++y)
          for (int l = 0; l < 8; ++l) {
            float acc = 0.f;
            for (int k = 0; k < 8; ++k) acc += C[k * 8 + y] * coef[k * 8 + l];
            tmp[y * 8 + l] = acc;
          }
        int by = (int)(b / nbx), bx = (int)(b % nbx);
        float* dst = plane + (size_t)by * 8 * pw + bx * 8;
        for (int y = 0; y < 8; ++y)
          for (int x = 0; x < 8; ++x) {
            float acc = 0.f;
            for (int l = 0; l < 8; ++l) acc += tmp[y * 8 + l] * C[l * 8 + x];
            dst[(size_t)y * pw + x] = acc;
          }
      }
      dc_pos += blocks_per_plane;
    }
    if (idxs.size() == 3) {  // CSC set: Rec.709 Y'CbCr -> R,G,B (nonlinear)
      float* Y = group_planes[0].data();
      float* Cb = group_planes[1].data();
      float* Cr = group_planes[2].data();
      size_t n = group_planes[0].size();
      for (size_t i = 0; i < n; ++i) {
        float y = Y[i], cb = Cb[i], cr = Cr[i];
        float r = y + 1.5748f * cr;
        float bch = y + 1.8556f * cb;
        float g = (y - 0.2126f * r - 0.0722f * bch) / 0.7152f;
        Y[i] = r;
        Cb[i] = g;
        Cr[i] = bch;
      }
    }
    for (size_t pi = 0; pi < idxs.size(); ++pi) {
      auto& dst = (*out)[idxs[pi]];
      dst.resize(npix);
      const float* plane = group_planes[pi].data();
      int pw = nbx * 8;
      for (int y = 0; y < n_lines; ++y)
        for (int x = 0; x < width; ++x)
          dst[(size_t)y * width + x] =
              h2f(lin_lut[f2h(plane[(size_t)y * pw + x])]);
    }
  }

  size_t rpos = 0;
  for (size_t i = 0; i < channels.size(); ++i) {
    if (schemes[i] != SCHEME_RLE) continue;
    if (rpos + 2 * npix > rle_bytes.size()) {
      *err = "DWA: RLE segment exhausted";
      return false;
    }
    auto& dst = (*out)[i];
    dst.resize(npix);
    const uint8_t* lo = rle_bytes.data() + rpos;
    const uint8_t* hi = lo + npix;
    for (size_t p = 0; p < npix; ++p)
      dst[p] = h2f((uint16_t)((hi[p] << 8) | lo[p]));
    rpos += 2 * npix;
  }

  size_t upos = 0;
  for (size_t i = 0; i < channels.size(); ++i) {
    if (schemes[i] != SCHEME_UNKNOWN) continue;
    int psz = channels[i].pixel_type == kPtHalf ? 2 : 4;
    if (upos + npix * psz > unknown.size()) {
      *err = "DWA: UNKNOWN segment exhausted";
      return false;
    }
    auto& dst = (*out)[i];
    dst.resize(npix);
    const uint8_t* src = unknown.data() + upos;
    if (channels[i].pixel_type == kPtHalf) {
      for (size_t p = 0; p < npix; ++p) {
        uint16_t v;
        std::memcpy(&v, src + p * 2, 2);
        dst[p] = h2f(v);
      }
    } else if (channels[i].pixel_type == 2) {  // FLOAT
      std::memcpy(dst.data(), src, npix * 4);
    } else {  // UINT
      for (size_t p = 0; p < npix; ++p) {
        uint32_t v;
        std::memcpy(&v, src + p * 4, 4);
        dst[p] = (float)v;
      }
    }
    upos += npix * psz;
  }
  return true;
}

}  // namespace dwa
