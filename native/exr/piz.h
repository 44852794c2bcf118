// PIZ compression (wavelet + canonical Huffman) for the native EXR codec.
//
// Implemented from the OpenEXR file-format specification (see the format
// notes in pcss_unet_tpu/io/piz.py, the pure-Python twin and differential
// oracle); not a copy of ImfPizCompressor.  Chunk layout:
//   u16 minNonZero, u16 maxNonZero, bitmap[min..max], i32 hufLen, huf data.
// Huffman blob: u32 im, iM, tableLength, nBits, reserved; packed 6-bit
// code-length table with zero-run escapes (59..63); MSB-first bitstream;
// symbol iM is the run-length marker (8-bit operand = extra repeats).

#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <algorithm>
#ifdef PIZ_PROFILE
#include <chrono>
#include <cstdio>
#endif

namespace piz {

constexpr int kUShortRange = 1 << 16;
constexpr int kBitmapSize = kUShortRange >> 3;
constexpr int kHufEncSize = kUShortRange + 1;
constexpr int kShortZeroRun = 59;
constexpr int kLongZeroRun = 63;
constexpr int kShortestLongRun = 2 + kLongZeroRun - kShortZeroRun;  // 6
constexpr int kLongestLongRun = 255 + kShortestLongRun;
constexpr int kMaxCodeLen = 58;

// ---------------------------------------------------------------- bitmap/LUT

inline void bitmap_from_data(const uint16_t* data, size_t n, uint8_t* bitmap,
                             int* min_nz, int* max_nz) {
  std::memset(bitmap, 0, kBitmapSize);
  for (size_t i = 0; i < n; ++i) bitmap[data[i] >> 3] |= 1u << (data[i] & 7);
  bitmap[0] &= ~1u;  // zero is implicit
  *min_nz = kBitmapSize - 1;
  *max_nz = 0;
  for (int i = 0; i < kBitmapSize; ++i) {
    if (bitmap[i]) {
      if (*min_nz > i) *min_nz = i;
      if (*max_nz < i) *max_nz = i;
    }
  }
}

inline int forward_lut_from_bitmap(const uint8_t* bitmap, uint16_t* lut) {
  int k = 0;
  for (int i = 0; i < kUShortRange; ++i) {
    if (i == 0 || (bitmap[i >> 3] & (1u << (i & 7))))
      lut[i] = (uint16_t)k++;
    else
      lut[i] = 0;
  }
  return k - 1;  // maxValue
}

inline int reverse_lut_from_bitmap(const uint8_t* bitmap, uint16_t* lut) {
  int k = 0;
  for (int i = 0; i < kUShortRange; ++i)
    if (i == 0 || (bitmap[i >> 3] & (1u << (i & 7)))) lut[k++] = (uint16_t)i;
  int max_value = k - 1;
  while (k < kUShortRange) lut[k++] = 0;
  return max_value;
}

// ----------------------------------------------------------------- wavelet

inline void wenc14(uint16_t a, uint16_t b, uint16_t* l, uint16_t* h) {
  int16_t as = (int16_t)a, bs = (int16_t)b;
  *l = (uint16_t)(int16_t)((as + bs) >> 1);
  *h = (uint16_t)(int16_t)(as - bs);
}

inline void wdec14(uint16_t l, uint16_t h, uint16_t* a, uint16_t* b) {
  int16_t ls = (int16_t)l, hs = (int16_t)h;
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  *a = (uint16_t)(int16_t)ai;
  *b = (uint16_t)(int16_t)(ai - hi);
}

constexpr int kAOffset = 1 << 15;
constexpr int kModMask = (1 << 16) - 1;

inline void wenc16(uint16_t a, uint16_t b, uint16_t* l, uint16_t* h) {
  int ao = ((int)a + kAOffset) & kModMask;
  int m = (ao + (int)b) >> 1;
  int d = ao - (int)b;
  if (d < 0) m = (m + kAOffset) & kModMask;
  *l = (uint16_t)m;
  *h = (uint16_t)(d & kModMask);
}

inline void wdec16(uint16_t l, uint16_t h, uint16_t* a, uint16_t* b) {
  int m = l, d = h;
  int bb = (m - (d >> 1)) & kModMask;
  int aa = (d + bb - kAOffset) & kModMask;
  *b = (uint16_t)bb;
  *a = (uint16_t)aa;
}

// 2-D wavelet over a [ny, nx] grid with x-stride ox and row stride oy
// (both in uint16 units).
inline void wav2_encode(uint16_t* in, int nx, int ox, int ny, int oy,
                        int max_value) {
  bool w14 = max_value < (1 << 14);
  int n = std::min(nx, ny);
  int p = 1, p2 = 2;
  uint16_t i00, i01, i10, i11;
  while (p2 <= n) {
    uint16_t* py = in;
    uint16_t* ey = in + (size_t)oy * (ny - p2);
    int oy1 = oy * p, oy2 = oy * p2;
    int ox1 = ox * p, ox2 = ox * p2;
    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + (size_t)ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wenc14(*px, *p01, &i00, &i01);
          wenc14(*p10, *p11, &i10, &i11);
          wenc14(i00, i10, px, p10);
          wenc14(i01, i11, p01, p11);
        } else {
          wenc16(*px, *p01, &i00, &i01);
          wenc16(*p10, *p11, &i10, &i11);
          wenc16(i00, i10, px, p10);
          wenc16(i01, i11, p01, p11);
        }
      }
      if (nx & p) {
        uint16_t* p10 = px + oy1;
        if (w14) wenc14(*px, *p10, &i00, p10);
        else wenc16(*px, *p10, &i00, p10);
        *px = i00;
      }
    }
    if (ny & p) {
      uint16_t* px = py;
      uint16_t* ex = py + (size_t)ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14) wenc14(*px, *p01, &i00, p01);
        else wenc16(*px, *p01, &i00, p01);
        *px = i00;
      }
    }
    p = p2;
    p2 <<= 1;
  }
}

inline void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy,
                        int max_value) {
  bool w14 = max_value < (1 << 14);
  int n = std::min(nx, ny);
  int p = 1;
  while (p <= n) p <<= 1;
  p >>= 1;
  int p2 = p;
  p >>= 1;
  uint16_t i00, i01, i10, i11;
  while (p >= 1) {
    uint16_t* py = in;
    uint16_t* ey = in + (size_t)oy * (ny - p2);
    int oy1 = oy * p, oy2 = oy * p2;
    int ox1 = ox * p, ox2 = ox * p2;
    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + (size_t)ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wdec14(*px, *p10, &i00, &i10);
          wdec14(*p01, *p11, &i01, &i11);
          wdec14(i00, i01, px, p01);
          wdec14(i10, i11, p10, p11);
        } else {
          wdec16(*px, *p10, &i00, &i10);
          wdec16(*p01, *p11, &i01, &i11);
          wdec16(i00, i01, px, p01);
          wdec16(i10, i11, p10, p11);
        }
      }
      if (nx & p) {
        uint16_t* p10 = px + oy1;
        if (w14) wdec14(*px, *p10, &i00, p10);
        else wdec16(*px, *p10, &i00, p10);
        *px = i00;
      }
    }
    if (ny & p) {
      uint16_t* px = py;
      uint16_t* ex = py + (size_t)ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14) wdec14(*px, *p01, &i00, p01);
        else wdec16(*px, *p01, &i00, p01);
        *px = i00;
      }
    }
    p2 = p;
    p >>= 1;
  }
}

// ----------------------------------------------------------------- Huffman

struct BitWriter {
  std::string out;
  uint64_t c = 0;
  int lc = 0;
  void write(int nbits, uint64_t v) {
    c = (c << nbits) | v;
    lc += nbits;
    while (lc >= 8) {
      lc -= 8;
      out.push_back((char)((c >> lc) & 0xFF));
    }
  }
  size_t bit_count() const { return out.size() * 8 + lc; }
  void flush() {
    if (lc) {
      out.push_back((char)((c << (8 - lc)) & 0xFF));
      lc = 0;
    }
  }
};

struct BitReader {
  const uint8_t* data;
  size_t size, pos;
  uint64_t c = 0;
  int lc = 0;
  bool overrun = false;
  BitReader(const uint8_t* d, size_t n, size_t p) : data(d), size(n), pos(p) {}
  uint64_t read(int nbits) {
    while (lc < nbits) {
      if (pos >= size) { overrun = true; return 0; }
      c = (c << 8) | data[pos++];
      lc += 8;
    }
    lc -= nbits;
    return (c >> lc) & ((1ull << nbits) - 1);
  }
};

// Code-length computation via two-queue Huffman over sorted symbols.
inline bool build_code_lengths(std::vector<uint64_t>& freq,
                               std::vector<int>& lengths) {
  struct Node {
    uint64_t f;
    int sym;       // >= 0 leaf, -1 internal
    int left, right;
  };
  for (;;) {
    std::vector<int> syms;
    for (int s = 0; s < kHufEncSize; ++s)
      if (freq[s]) syms.push_back(s);
    if (syms.empty()) return false;
    if (syms.size() == 1) {
      lengths.assign(kHufEncSize, 0);
      lengths[syms[0]] = 1;
      return true;
    }
    std::vector<Node> nodes;
    nodes.reserve(syms.size() * 2);
    for (int s : syms) nodes.push_back({freq[s], s, -1, -1});
    std::sort(nodes.begin(), nodes.end(),
              [](const Node& a, const Node& b) { return a.f < b.f; });
    // two queues: sorted leaves + FIFO of merged nodes (both nondecreasing)
    std::vector<int> merged;
    size_t li = 0, mi = 0;
    auto pop_min = [&]() -> int {
      bool leaf_ok = li < nodes.size() && nodes[li].sym >= 0;
      // indices into `nodes`: leaves occupy [0, nLeaves); merged appended
      if (li < syms.size() &&
          (mi >= merged.size() || nodes[li].f <= nodes[merged[mi]].f))
        return (int)li++;
      return merged[mi++];
      (void)leaf_ok;
    };
    size_t n_leaves = syms.size();
    while ((n_leaves - li) + (merged.size() - mi) > 1) {
      int a = pop_min();
      int b = pop_min();
      nodes.push_back({nodes[a].f + nodes[b].f, -1, a, b});
      merged.push_back((int)nodes.size() - 1);
    }
    int root = (li < n_leaves) ? (int)li : merged[mi];
    // BFS depths
    lengths.assign(kHufEncSize, 0);
    std::vector<std::pair<int, int>> stack{{root, 0}};
    int max_len = 0;
    while (!stack.empty()) {
      auto [idx, d] = stack.back();
      stack.pop_back();
      const Node& nd = nodes[idx];
      if (nd.sym >= 0) {
        int l = d ? d : 1;
        lengths[nd.sym] = l;
        if (l > max_len) max_len = l;
      } else {
        stack.push_back({nd.left, d + 1});
        stack.push_back({nd.right, d + 1});
      }
    }
    if (max_len <= kMaxCodeLen) return true;
    for (int s : syms) freq[s] = (freq[s] + 1) >> 1;  // flatten and retry
  }
}

// OpenEXR canonical code assignment: codes packed as (code << 6) | length.
inline void canonical_codes(const std::vector<int>& lengths,
                            std::vector<uint64_t>& codes) {
  uint64_t count[kMaxCodeLen + 1] = {0};
  for (int s = 0; s < kHufEncSize; ++s)
    if (lengths[s]) count[lengths[s]]++;
  uint64_t next[kMaxCodeLen + 1] = {0};
  uint64_t c = 0;
  for (int i = kMaxCodeLen; i > 0; --i) {
    next[i] = c;
    c = (c + count[i]) >> 1;
  }
  codes.assign(kHufEncSize, 0);
  for (int s = 0; s < kHufEncSize; ++s) {
    int l = lengths[s];
    if (l) codes[s] = (next[l]++ << 6) | (uint64_t)l;
  }
}

inline void pack_enc_table(const std::vector<int>& lengths, int im, int iM,
                           BitWriter* w) {
  int i = im;
  while (i <= iM) {
    int l = lengths[i];
    if (l == 0) {
      int zerun = 1;
      while (i + zerun <= iM && zerun < kLongestLongRun &&
             lengths[i + zerun] == 0)
        ++zerun;
      if (zerun >= kShortestLongRun) {
        w->write(6, kLongZeroRun);
        w->write(8, zerun - kShortestLongRun);
        i += zerun;
        continue;
      }
      if (zerun >= 2) {
        w->write(6, kShortZeroRun + zerun - 2);
        i += zerun;
        continue;
      }
    }
    w->write(6, (uint64_t)l);
    ++i;
  }
}

inline bool unpack_enc_table(BitReader* r, int im, int iM,
                             std::vector<int>& lengths) {
  lengths.assign(kHufEncSize, 0);
  int i = im;
  while (i <= iM) {
    int l = (int)r->read(6);
    if (r->overrun) return false;
    if (l == kLongZeroRun) {
      i += (int)r->read(8) + kShortestLongRun;
    } else if (l >= kShortZeroRun) {
      i += l - kShortZeroRun + 2;
    } else {
      if (i < kHufEncSize) lengths[i] = l;
      ++i;
    }
    if (i > iM + 1) return false;
  }
  return !r->overrun;
}

inline bool huf_compress(const uint16_t* data, size_t n, std::string* out) {
  if (n == 0) { out->clear(); return true; }
  std::vector<uint64_t> freq(kHufEncSize, 0);
  for (size_t i = 0; i < n; ++i) freq[data[i]]++;
  int max_sym = kUShortRange - 1;
  while (max_sym > 0 && !freq[max_sym]) --max_sym;
  int iM = max_sym + 1;  // run-length pseudo-symbol
  freq[iM] = 1;
  int im = 0;
  while (!freq[im]) ++im;

  std::vector<int> lengths;
  if (!build_code_lengths(freq, lengths)) return false;
  std::vector<uint64_t> codes;
  canonical_codes(lengths, codes);

  BitWriter table;
  pack_enc_table(lengths, im, iM, &table);
  table.flush();

  BitWriter w;
  auto put = [&](int sym) {
    uint64_t c = codes[sym];
    w.write((int)(c & 63), c >> 6);
  };
  int rl_cost = (int)(codes[iM] & 63) + 8;
  size_t i = 0;
  while (i < n) {
    uint16_t sym = data[i];
    size_t j = i + 1;
    while (j < n && data[j] == sym) ++j;
    size_t total = j - i;
    int sym_len = (int)(codes[sym] & 63);
    while (total > 0) {
      size_t chunk = std::min<size_t>(total, 256);
      int cs = (int)chunk - 1;
      if (cs > 0 && sym_len + rl_cost < sym_len * (int)chunk) {
        put(sym);
        put(iM);
        w.write(8, (uint64_t)cs);
      } else {
        for (size_t k = 0; k < chunk; ++k) put(sym);
      }
      total -= chunk;
    }
    i = j;
  }
  uint32_t n_bits = (uint32_t)w.bit_count();
  w.flush();

  out->clear();
  uint32_t hdr[5] = {(uint32_t)im, (uint32_t)iM,
                     (uint32_t)table.out.size(), n_bits, 0};
  out->append((const char*)hdr, 20);
  out->append(table.out);
  out->append(w.out);
  return true;
}

inline bool huf_decompress(const uint8_t* blob, size_t blob_n, uint16_t* out,
                           size_t n_out, std::string* err) {
  if (n_out == 0) return true;
  if (blob_n < 20) { *err = "PIZ: huffman header truncated"; return false; }
  uint32_t im, iM, table_len, n_bits;
  std::memcpy(&im, blob, 4);
  std::memcpy(&iM, blob + 4, 4);
  std::memcpy(&table_len, blob + 8, 4);
  std::memcpy(&n_bits, blob + 12, 4);
  (void)table_len;
  if (im >= kHufEncSize || iM >= kHufEncSize || im > iM) {
    *err = "PIZ: bad huffman symbol range";
    return false;
  }
  BitReader r(blob, blob_n, 20);
  std::vector<int> lengths;
  if (!unpack_enc_table(&r, (int)im, (int)iM, lengths)) {
    *err = "PIZ: corrupt huffman table";
    return false;
  }
  // byte-align to the start of the data stream
  r.lc = 0;

  // canonical decode tables
  uint64_t count[kMaxCodeLen + 1] = {0};
  for (int s = 0; s < kHufEncSize; ++s)
    if (lengths[s]) count[lengths[s]]++;
  uint64_t first[kMaxCodeLen + 1] = {0};
  uint64_t c = 0;
  for (int i = kMaxCodeLen; i > 0; --i) {
    first[i] = c;
    c = (c + count[i]) >> 1;
  }
  std::vector<int> sym_base(kMaxCodeLen + 2, 0);
  for (int l = 1; l <= kMaxCodeLen; ++l)
    sym_base[l + 1] = sym_base[l] + (int)count[l];
  std::vector<int> symbols(sym_base[kMaxCodeLen + 1]);
  {
    std::vector<int> fill(kMaxCodeLen + 1, 0);
    for (int s = 0; s < kHufEncSize; ++s) {
      int l = lengths[s];
      if (l) symbols[sym_base[l] + fill[l]++] = s;
    }
  }

  // Fast path: a 2^14-entry table maps the next 14 bits directly to one
  // or TWO decoded symbols.  Pass 1 is the standard canonical-Huffman
  // single-symbol table (ImfHuf uses the same width) — measured ~3x on
  // PIZ chunk decode.  Pass 2 upgrades entries to symbol PAIRS wherever
  // the first code leaves room for a complete second code inside the
  // same window (neither may be the RLE marker): typical wavelet/AC
  // streams average ~7-bit codes, so most lookups then emit two symbols
  // for one peek+branch.  Entry layout (u64):
  //   bits 0-5 len1, 6-11 total_len, 12-13 nsyms, 14-30 sym1, 34-50 sym2
  //   (symbols are 17-bit: the alphabet is kHufEncSize = 65537).
  constexpr int kFastBits = 14;
  std::vector<uint64_t> fast_tbl(1u << kFastBits, 0);
  {
    std::vector<int> fill(kMaxCodeLen + 1, 0);
    for (int s = 0; s < kHufEncSize; ++s) {
      int l = lengths[s];
      if (!l) continue;
      uint64_t codev = first[l] + (uint64_t)fill[l]++;
      if (l > kFastBits || codev >= (1ull << l)) continue;
      uint32_t lo = (uint32_t)(codev << (kFastBits - l));
      uint32_t hi = lo + (1u << (kFastBits - l));
      uint64_t ns = (s == (int)iM) ? 0 : 1;  // marker: no direct emit
      uint64_t ent = (uint64_t)l | ((uint64_t)l << 6) | (ns << 12) |
                     ((uint64_t)s << 14) | ((uint64_t)s << 34);
      for (uint32_t e = lo; e < hi; ++e) fast_tbl[e] = ent;
    }
    // Pass 2 costs a 128 KB copy + 16 K probes: only worth it when the
    // stream has enough symbols to amortize (small chunks skip it).
    std::vector<uint64_t> singles;
    if (n_out >= 16384) singles = fast_tbl;  // pristine pass-1 copy
    for (uint32_t i = 0; i < (uint32_t)singles.size(); ++i) {
      uint64_t e1 = singles[i];
      if (!e1 || !((e1 >> 12) & 3)) continue;  // empty or RLE marker
      int l1 = (int)(e1 & 63);
      uint32_t s1 = (uint32_t)((e1 >> 14) & 0x1FFFF);
      if (l1 >= kFastBits) continue;
      uint64_t e2 = singles[(i << l1) & ((1u << kFastBits) - 1)];
      if (!e2 || !((e2 >> 12) & 3)) continue;
      int l2 = (int)(e2 & 63);
      uint32_t s2 = (uint32_t)((e2 >> 14) & 0x1FFFF);
      if (l1 + l2 > kFastBits) continue;
      fast_tbl[i] = (uint64_t)l1 | ((uint64_t)(l1 + l2) << 6) |
                    (2ull << 12) | ((uint64_t)s1 << 14) | ((uint64_t)s2 << 34);
    }
  }

  size_t pos = 0;
  int64_t bits_left = n_bits;
#ifdef PIZ_PROFILE
  size_t n_fast = 0, n_slow = 0, n_tail = 0, n_pair = 0;
#endif

  // exact single-symbol decode (stream tail / pathological tables)
  auto decode_slow = [&]() -> int {
    uint64_t code = 0;
    int len = 0;
    while (true) {
      if (bits_left <= 0 || r.overrun) {
        *err = "PIZ: huffman bitstream exhausted";
        return -1;
      }
      code = (code << 1) | r.read(1);
      --bits_left;
      if (++len > kMaxCodeLen) {
        *err = "PIZ: no huffman code match";
        return -1;
      }
      if (!count[len]) continue;
      uint64_t idx = code - first[len];
      if (idx < count[len]) return symbols[sym_base[len] + (int)idx];
    }
  };

  // long codes (> kFastBits): canonical decode by LENGTH — peek a full
  // code window once and test each populated length with two compares,
  // instead of shifting bits in one at a time (the 30% of symbols this
  // path serves dominated the decode before; now ~2 iterations typical).
  auto decode_long = [&]() -> int {
    while (r.lc <= 56 && r.pos < r.size) {
      r.c = (r.c << 8) | r.data[r.pos++];
      r.lc += 8;
    }
    int avail = (int)(bits_left < (int64_t)r.lc ? bits_left : (int64_t)r.lc);
    for (int len = kFastBits + 1; len <= kMaxCodeLen && len <= avail; ++len) {
      if (!count[len]) continue;
      uint64_t code = (r.c >> (r.lc - len)) & ((1ull << len) - 1);
      uint64_t idx = code - first[len];
      if (idx < count[len]) {
        r.lc -= len;
        bits_left -= len;
        return symbols[sym_base[len] + (int)idx];
      }
    }
    return decode_slow();  // stream tail (not enough bits in the window)
  };

  while (pos < n_out) {
    int sym;
    while (r.lc <= 56 && r.pos < r.size) {  // refill the peek window deep
      r.c = (r.c << 8) | r.data[r.pos++];
      r.lc += 8;
    }
    if (bits_left >= kFastBits && r.lc >= kFastBits) {
      uint32_t peek = (uint32_t)(
          (r.c >> (r.lc - kFastBits)) & ((1u << kFastBits) - 1));
      uint64_t e = fast_tbl[peek];
      int ns = (int)((e >> 12) & 3);
      if (ns && pos + 2 <= n_out) {
        // branchless 1-or-2 symbol emit: singles duplicate sym into the
        // second field and advance by 1, so the hot path has no
        // data-dependent branch (a 50/50 pair/single branch mispredicts
        // its way out of the pair win)
        int tl = (int)((e >> 6) & 63);
        r.lc -= tl;
        bits_left -= tl;
        out[pos] = (uint16_t)((e >> 14) & 0x1FFFF);
        out[pos + (ns - 1)] = (uint16_t)((e >> 34) & 0x1FFFF);
        pos += ns;
#ifdef PIZ_PROFILE
        n_fast += ns;
        n_pair += (ns == 2);
#endif
        continue;
      }
      if (e) {  // RLE marker (ns == 0) or the last output slot: one symbol
        r.lc -= (int)(e & 63);
        bits_left -= (int64_t)(e & 63);
        sym = (int)((e >> 14) & 0x1FFFF);
#ifdef PIZ_PROFILE
        ++n_fast;
#endif
      } else {
        sym = decode_long();
#ifdef PIZ_PROFILE
        ++n_slow;
#endif
      }
    } else {
      sym = decode_slow();
#ifdef PIZ_PROFILE
      ++n_tail;
#endif
    }
    if (sym < 0) return false;
    if (sym == (int)iM) {
      if (pos == 0) { *err = "PIZ: leading RLE marker"; return false; }
      if (bits_left < 8) {
        *err = "PIZ: huffman bitstream exhausted";
        return false;
      }
      int cs = (int)r.read(8);
      bits_left -= 8;
      if (r.overrun) { *err = "PIZ: huffman bitstream exhausted"; return false; }
      if (pos + (size_t)cs > n_out) { *err = "PIZ: RLE overrun"; return false; }
      uint16_t prev = out[pos - 1];
      for (int k = 0; k < cs; ++k) out[pos++] = prev;
    } else {
      out[pos++] = (uint16_t)sym;
    }
  }
#ifdef PIZ_PROFILE
  fprintf(stderr, "huf: fast %zu slow %zu tail %zu pair %zu\n", n_fast,
          n_slow, n_tail, n_pair);
#endif
  return true;
}

// ------------------------------------------------------------- chunk level

struct ChanDesc {
  int u16_size;  // HALF = 1, FLOAT/UINT = 2
};

// interleaved scanline bytes -> PIZ payload
inline bool compress(const uint8_t* raw, size_t raw_n,
                     const std::vector<ChanDesc>& chans, int width,
                     int n_lines, std::string* out) {
  size_t total = raw_n / 2;
  std::vector<uint16_t> buf(total);
  std::vector<int> row_u16(chans.size());
  size_t line_stride = 0;
  for (size_t k = 0; k < chans.size(); ++k) {
    row_u16[k] = width * chans[k].u16_size;
    line_stride += row_u16[k];
  }
  // rearrange into per-channel planes
  size_t ppos = 0;
  size_t off = 0;
  for (size_t k = 0; k < chans.size(); ++k) {
    for (int line = 0; line < n_lines; ++line) {
      std::memcpy(buf.data() + ppos + (size_t)line * row_u16[k],
                  raw + ((size_t)line * line_stride + off) * 2,
                  (size_t)row_u16[k] * 2);
    }
    ppos += (size_t)row_u16[k] * n_lines;
    off += row_u16[k];
  }

  std::vector<uint8_t> bitmap(kBitmapSize);
  int min_nz, max_nz;
  bitmap_from_data(buf.data(), total, bitmap.data(), &min_nz, &max_nz);
  std::vector<uint16_t> lut(kUShortRange);
  int max_value = forward_lut_from_bitmap(bitmap.data(), lut.data());
  for (size_t i = 0; i < total; ++i) buf[i] = lut[buf[i]];

  ppos = 0;
  for (size_t k = 0; k < chans.size(); ++k) {
    int sz = chans[k].u16_size;
    for (int j = 0; j < sz; ++j)
      wav2_encode(buf.data() + ppos + j, width, sz, n_lines, row_u16[k],
                  max_value);
    ppos += (size_t)row_u16[k] * n_lines;
  }

  std::string huf;
  if (!huf_compress(buf.data(), total, &huf)) return false;

  out->clear();
  uint16_t mm[2] = {(uint16_t)min_nz, (uint16_t)max_nz};
  out->append((const char*)mm, 4);
  if (min_nz <= max_nz)
    out->append((const char*)bitmap.data() + min_nz, max_nz - min_nz + 1);
  int32_t hlen = (int32_t)huf.size();
  out->append((const char*)&hlen, 4);
  out->append(huf);
  return true;
}

// PIZ payload -> interleaved scanline bytes
inline bool decompress(const uint8_t* payload, size_t payload_n,
                       const std::vector<ChanDesc>& chans, int width,
                       int n_lines, uint8_t* out, std::string* err) {
  if (payload_n < 4) { *err = "PIZ: chunk truncated"; return false; }
  uint16_t min_nz, max_nz;
  std::memcpy(&min_nz, payload, 2);
  std::memcpy(&max_nz, payload + 2, 2);
  size_t pos = 4;
  std::vector<uint8_t> bitmap(kBitmapSize, 0);
  if (min_nz <= max_nz) {
    size_t cnt = (size_t)max_nz - min_nz + 1;
    if (pos + cnt + 4 > payload_n) { *err = "PIZ: chunk truncated"; return false; }
    std::memcpy(bitmap.data() + min_nz, payload + pos, cnt);
    pos += cnt;
  }
  std::vector<uint16_t> lut(kUShortRange);
  int max_value = reverse_lut_from_bitmap(bitmap.data(), lut.data());
  int32_t hlen;
  if (pos + 4 > payload_n) { *err = "PIZ: chunk truncated"; return false; }
  std::memcpy(&hlen, payload + pos, 4);
  pos += 4;
  if (hlen < 0 || pos + (size_t)hlen > payload_n) {
    *err = "PIZ: bad huffman length";
    return false;
  }

  std::vector<int> row_u16(chans.size());
  size_t line_stride = 0;
  for (size_t k = 0; k < chans.size(); ++k) {
    row_u16[k] = width * chans[k].u16_size;
    line_stride += row_u16[k];
  }
  size_t total = line_stride * n_lines;
  std::vector<uint16_t> buf(total);
#ifdef PIZ_PROFILE
  auto t0 = std::chrono::steady_clock::now();
#endif
  if (!huf_decompress(payload + pos, (size_t)hlen, buf.data(), total, err))
    return false;
#ifdef PIZ_PROFILE
  auto t1 = std::chrono::steady_clock::now();
#endif

  size_t ppos = 0;
  size_t off = 0;
  for (size_t k = 0; k < chans.size(); ++k) {
    int sz = chans[k].u16_size;
    for (int j = 0; j < sz; ++j)
      wav2_decode(buf.data() + ppos + j, width, sz, n_lines, row_u16[k],
                  max_value);
    for (size_t i = 0; i < (size_t)row_u16[k] * n_lines; ++i)
      buf[ppos + i] = lut[buf[ppos + i]];
    for (int line = 0; line < n_lines; ++line)
      std::memcpy(out + ((size_t)line * line_stride + off) * 2,
                  buf.data() + ppos + (size_t)line * row_u16[k],
                  (size_t)row_u16[k] * 2);
    ppos += (size_t)row_u16[k] * n_lines;
    off += row_u16[k];
  }
#ifdef PIZ_PROFILE
  auto t2 = std::chrono::steady_clock::now();
  fprintf(stderr, "piz chunk: huf %.2f ms rest %.2f ms\n",
          std::chrono::duration<double, std::milli>(t1 - t0).count(),
          std::chrono::duration<double, std::milli>(t2 - t1).count());
#endif
  return true;
}

}  // namespace piz
