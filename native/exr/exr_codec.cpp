// Native EXR scanline codec for the pcss_unet_tpu input pipeline.
//
// The reference pipeline decodes G-buffer EXR stacks through the OpenEXR
// C++ bindings (reference setdata.py:42-58); this is the framework's own
// native decoder/encoder covering the subset the pipeline uses:
//   - single-part scanline files, version 2
//   - single-part tiled files, all level modes (ONE_LEVEL decoded in full;
//     MIPMAP/RIPMAP decode the full-resolution level 0, skipping the
//     low-res pyramid levels — the plane OpenEXR bindings expose)
//   - ALL ten compression schemes encode+decode: NONE(0), RLE(1),
//     ZIPS(2), ZIP(3), PIZ(4), PXR24(5), B44(6), B44A(7), DWAA(8),
//     DWAB(9)
//   - pixel types UINT(0), HALF(1), FLOAT(2)
//   - any line order (chunks scatter by their own y/tile coords)
// Exposed as a C ABI consumed via ctypes (pcss_unet_tpu/io/exr.py).  The
// pure-Python twin (io/exr_py.py) is the fallback and the differential-test
// oracle.  File-level parallelism happens in Python threads: every entry
// point is GIL-free during the whole decode.
//
// Build: see native/exr/build.sh  (g++ -O3 -shared -fPIC ... -lz)

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <mutex>
#include <string>
#include <thread>
#include <vector>
#include <memory>
#include <zlib.h>

#include "piz.h"
#include "dwa.h"

namespace {

constexpr int32_t kMagic = 20000630;
constexpr int PT_UINT = 0, PT_HALF = 1, PT_FLOAT = 2;
constexpr int COMP_NONE = 0, COMP_RLE = 1, COMP_ZIPS = 2, COMP_ZIP = 3,
              COMP_PIZ = 4, COMP_PXR24 = 5, COMP_B44 = 6, COMP_B44A = 7,
              COMP_DWAA = 8, COMP_DWAB = 9;

struct Channel {
  std::string name;
  int32_t pixel_type;
};

inline int pixel_size(int32_t pt) {
  return pt == PT_HALF ? 2 : 4;
}

// IEEE half -> float (scalar; decode path converts full rows)
inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int e = -1;
      uint32_t m = mant;
      do { m <<= 1; ++e; } while (!(m & 0x400));
      bits = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3ff) << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}


// 65536-entry half->float table: the per-pixel scalar conversion measured
// ~3.6 ns/px (30 ms of a 1080p 4-channel HALF frame); one 256 KB table
// turns it into a single indexed load.  C++11 magic statics make the lazy
// init thread-safe (decodes run GIL-free on multiple threads).
inline const float* half_lut() {
  static const std::vector<float>* lut = [] {
    auto* t = new std::vector<float>(65536);
    for (int i = 0; i < 65536; ++i) (*t)[i] = half_to_float((uint16_t)i);
    return t;
  }();
  return lut->data();
}

// float32 -> half with IEEE round-to-nearest-even (matches numpy's
// .astype(float16), so both codecs write identical HALF bytes)
inline uint16_t float_to_half(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  uint32_t sign = (bits >> 16) & 0x8000u;
  int32_t exp = (int32_t)((bits >> 23) & 0xff) - 127 + 15;
  uint32_t mant = bits & 0x7fffffu;
  if (((bits >> 23) & 0xff) == 0xff)  // inf / NaN
    return (uint16_t)(sign | 0x7c00u | (mant ? 0x200 : 0));
  if (exp >= 31) return (uint16_t)(sign | 0x7c00u);  // overflow -> inf
  if (exp <= 0) {
    if (exp < -10) return (uint16_t)sign;
    mant |= 0x800000u;
    int shift = 14 - exp;
    uint32_t half_mant = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1);
    uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (half_mant & 1))) ++half_mant;
    return (uint16_t)(sign | half_mant);  // carry naturally bumps the exp
  }
  uint32_t half = sign | ((uint32_t)exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1fffu;
  if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) ++half;
  return (uint16_t)half;
}

// Within-file chunk-parallel decode width.  -1 = uninitialized (read
// PCSS_EXR_THREADS once on first use; unset/1 keeps the serial path,
// 0/"auto" uses the hardware thread count); pcss_exr_set_threads()
// overrides at runtime.  File-level parallelism still belongs to the
// Python callers (every entry point is GIL-free) — this lever is for
// single-file latency (e.g. the one-EXR inference CLI, where a 1080p
// DWAA decode costs ~10x the jitted forward pass on a multicore host).
std::atomic<int> g_decode_threads{-1};

inline int decode_threads_setting() {
  int v = g_decode_threads.load(std::memory_order_relaxed);
  if (v == -1) {
    v = 1;
    if (const char* e = std::getenv("PCSS_EXR_THREADS")) {
      if (std::strcmp(e, "auto") == 0) {
        v = 0;
      } else {
        v = std::atoi(e);
        if (v < 0 || (v == 0 && e[0] != '0')) v = 1;
      }
    }
    g_decode_threads.store(v, std::memory_order_relaxed);
  }
  if (v == 0) {
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? (int)hw : 1;
  }
  return v;
}

struct Reader {
  std::vector<uint8_t> owned;       // file bytes (when opened from path)
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<Channel> channels;
  int compression = COMP_NONE;
  int32_t xmin = 0, ymin = 0, xmax = 0, ymax = 0;
  int width = 0, height = 0;
  int lines_per_chunk = 1;
  bool tiled = false;
  int tile_w = 0, tile_h = 0;
  int level_mode = 0, level_rounding = 0;
  std::vector<int64_t> chunk_offsets;
  std::string error;
  // multi-part (version flag 0x1000): selected part, chunk part-number
  // prefix size (4 bytes in multi-part streams, 0 otherwise), and the
  // selected part's authoritative chunkCount attribute
  int want_part = 0;
  std::string want_part_name;       // by-name selection (empty = by index)
  int n_parts = 1;
  int chunk_prefix = 0;
  int32_t forced_chunks = -1;
  std::vector<std::string> part_names;

  bool fail(const std::string& msg) { error = msg; return false; }

  bool read_cstr(size_t& pos, std::string* out) {
    size_t start = pos;
    while (pos < size && data[pos] != 0) ++pos;
    if (pos >= size) return false;
    out->assign((const char*)data + start, pos - start);
    ++pos;
    return true;
  }

  // Walk one header's attribute list from ``pos`` (left just past the
  // terminating empty name).  When ``record`` the part's channels/
  // dataWindow/compression/tiles fill the Reader members; ``chunk_count``
  // and ``ptype`` always capture chunkCount/type when present.
  bool parse_one_header(size_t& pos, bool record, bool* have_channels,
                        bool* have_dw, bool* have_comp, bool* have_tiles,
                        int32_t* chunk_count, std::string* ptype,
                        std::string* pname) {
    while (true) {
      std::string name, type;
      if (!read_cstr(pos, &name)) return fail("truncated header");
      if (name.empty()) break;
      if (!read_cstr(pos, &type)) return fail("truncated header");
      if (pos + 4 > size) return fail("truncated header");
      int32_t asize;
      std::memcpy(&asize, data + pos, 4);
      pos += 4;
      if (asize < 0 || pos + (size_t)asize > size) return fail("bad attribute size");
      const uint8_t* payload = data + pos;
      if (name == "chunkCount" && asize >= 4) {
        std::memcpy(chunk_count, payload, 4);
      } else if (name == "name") {
        pname->assign((const char*)payload, (size_t)asize);
        while (!pname->empty() && pname->back() == '\0') pname->pop_back();
      } else if (name == "type") {
        ptype->assign((const char*)payload, (size_t)asize);
        while (!ptype->empty() && ptype->back() == '\0') ptype->pop_back();
      } else if (!record) {
        // parts other than the selected one only contribute chunkCount
      } else if (name == "channels") {
        size_t cpos = 0;
        while (cpos < (size_t)asize && payload[cpos] != 0) {
          Channel ch;
          size_t s = cpos;
          while (cpos < (size_t)asize && payload[cpos] != 0) ++cpos;
          ch.name.assign((const char*)payload + s, cpos - s);
          ++cpos;
          if (cpos + 16 > (size_t)asize) return fail("bad chlist");
          std::memcpy(&ch.pixel_type, payload + cpos, 4);
          int32_t xs, ys;  // subsampled channels would decode garbage
          std::memcpy(&xs, payload + cpos + 8, 4);
          std::memcpy(&ys, payload + cpos + 12, 4);
          if (xs != 1 || ys != 1)
            return fail("subsampled channel '" + ch.name +
                        "' not supported");
          cpos += 16;  // pixel_type(4) + pLinear/reserved(4) + xSampling(4) + ySampling(4)
          channels.push_back(ch);
        }
        *have_channels = true;
      } else if (name == "dataWindow") {
        if (asize < 16) return fail("bad dataWindow");
        std::memcpy(&xmin, payload, 4);
        std::memcpy(&ymin, payload + 4, 4);
        std::memcpy(&xmax, payload + 8, 4);
        std::memcpy(&ymax, payload + 12, 4);
        *have_dw = true;
      } else if (name == "compression") {
        if (asize < 1) return fail("bad compression");
        compression = payload[0];
        *have_comp = true;
      } else if (name == "tiles") {
        if (asize < 9) return fail("bad tiles attribute");
        uint32_t tw, th;
        std::memcpy(&tw, payload, 4);
        std::memcpy(&th, payload + 4, 4);
        uint8_t mode = payload[8];
        level_mode = mode & 0xF;
        level_rounding = (mode >> 4) & 0xF;
        if (level_mode > 2)
          return fail("bad tiledesc level mode (0/1/2 expected)");
        tile_w = (int)tw;
        tile_h = (int)th;
        *have_tiles = true;
      }
      pos += asize;
    }
    return true;
  }

  bool parse() {
    if (size < 8) return fail("truncated file");
    int32_t magic, version;
    std::memcpy(&magic, data, 4);
    std::memcpy(&version, data + 4, 4);
    if (magic != kMagic) return fail("bad magic (not an EXR file)");
    // version flags: 0x200 tiled, 0x400 long names (ok), 0x800 deep,
    // 0x1000 multi-part
    tiled = (version & 0x200) != 0;
    if (version & 0x800) return fail("deep-data EXR not supported");
    bool multipart = (version & 0x1000) != 0;
    bool have_tiles = false;
    size_t pos = 8;
    bool have_channels = false, have_dw = false, have_comp = false;
    if (!multipart) {
      if (want_part != 0 || !want_part_name.empty())
        return fail("part selection on a single-part file");
      int32_t cc = -1;
      std::string ptype, pname;
      if (!parse_one_header(pos, true, &have_channels, &have_dw, &have_comp,
                            &have_tiles, &cc, &ptype, &pname))
        return false;
    } else {
      // headers back to back, list ended by an empty byte; then every
      // part's chunk-offset table back to back in part order; chunks
      // lead with a 4-byte part number.  Pass 1 collects every part's
      // name/type/chunkCount (so by-NAME selection needs no second file
      // read); pass 2 records the selected part's attributes.
      std::vector<int32_t> counts;
      std::vector<std::string> types;
      size_t p1 = pos;
      while (p1 < size && data[p1] != 0) {
        int32_t cc = -1;
        std::string ptype, pname;
        bool dc0, dc1, dc2, dc3;  // discarded in the non-recording pass
        if (!parse_one_header(p1, false, &dc0, &dc1, &dc2, &dc3, &cc,
                              &ptype, &pname))
          return false;
        if (cc < 0) return fail("multi-part header missing chunkCount");
        counts.push_back(cc);
        types.push_back(ptype);
        part_names.push_back(pname);
      }
      if (p1 >= size) return fail("truncated multi-part header list");
      ++p1;  // empty byte terminating the header list
      n_parts = (int)counts.size();
      if (!want_part_name.empty()) {
        want_part = -1;
        for (int i = 0; i < n_parts; ++i)
          if (part_names[i] == want_part_name) { want_part = i; break; }
        if (want_part < 0)
          return fail("no part named '" + want_part_name + "'");
      }
      if (want_part >= n_parts) return fail("part index out of range");
      for (int i = 0; i <= want_part; ++i) {  // pass 2: record selected
        int32_t cc = -1;
        std::string ptype, pname;
        if (!parse_one_header(pos, i == want_part, &have_channels, &have_dw,
                              &have_comp, &have_tiles, &cc, &ptype, &pname))
          return false;
      }
      const std::string& sel_type = types[want_part];
      if (sel_type == "deepscanline" || sel_type == "deeptile")
        return fail("deep-data EXR part not supported");
      tiled = sel_type == "tiledimage";  // per-part, not the version bit
      pos = p1;
      for (int p = 0; p < want_part; ++p)
        pos += (size_t)counts[p] * 8;
      forced_chunks = counts[want_part];
      chunk_prefix = 4;
    }
    if (!have_channels || !have_dw || !have_comp)
      return fail("missing required header attribute");
    if (compression == COMP_ZIP || compression == COMP_PXR24)
      lines_per_chunk = 16;
    else if (compression == COMP_PIZ || compression == COMP_B44 ||
             compression == COMP_B44A || compression == COMP_DWAA)
      lines_per_chunk = 32;
    else if (compression == COMP_DWAB)
      lines_per_chunk = 256;
    else if (compression == COMP_NONE || compression == COMP_RLE ||
             compression == COMP_ZIPS) lines_per_chunk = 1;
    else return fail("unsupported compression (decode supports NONE, RLE, "
                     "ZIPS, ZIP, PIZ, PXR24, B44, B44A, DWAA, DWAB)");
    width = xmax - xmin + 1;
    height = ymax - ymin + 1;
    if (width <= 0 || height <= 0) return fail("empty data window");
    int n_chunks;
    if (tiled) {
      if (!have_tiles) return fail("tiled EXR missing 'tiles' attribute");
      if (tile_w <= 0 || tile_h <= 0) return fail("bad tile size");
      // total chunks across every pyramid level = offset-table length
      auto round_log2 = [](int x, int up) {
        int l = 0;
        for (int64_t v = 1; v < x; v <<= 1) ++l;      // ceil(log2(x))
        if (!up && l > 0 && (1ll << l) > x) --l;      // floor for ROUND_DOWN
        return l;
      };
      auto level_size = [](int s, int l, int up) {
        int64_t d = 1ll << l;
        int64_t r = up ? (s + d - 1) / d : s / d;
        return (int)std::max<int64_t>(1, r);
      };
      auto tiles_in = [&](int s, int t) { return (s + t - 1) / t; };
      int64_t total = 0;
      if (level_mode == 0) {
        total = (int64_t)tiles_in(width, tile_w) * tiles_in(height, tile_h);
      } else if (level_mode == 1) {  // MIPMAP_LEVELS: lx == ly
        int n = round_log2(std::max(width, height), level_rounding) + 1;
        for (int l = 0; l < n; ++l)
          total += (int64_t)tiles_in(level_size(width, l, level_rounding),
                                     tile_w) *
                   tiles_in(level_size(height, l, level_rounding), tile_h);
      } else {  // RIPMAP_LEVELS: full (lx, ly) grid
        int nx = round_log2(width, level_rounding) + 1;
        int ny = round_log2(height, level_rounding) + 1;
        for (int ly = 0; ly < ny; ++ly)
          for (int lx = 0; lx < nx; ++lx)
            total += (int64_t)tiles_in(level_size(width, lx, level_rounding),
                                       tile_w) *
                     tiles_in(level_size(height, ly, level_rounding), tile_h);
      }
      if (total > (int64_t)1 << 30) return fail("tile count overflow");
      n_chunks = (int)total;
    } else {
      n_chunks = (height + lines_per_chunk - 1) / lines_per_chunk;
    }
    if (forced_chunks >= 0)  // multi-part: chunkCount attr is authoritative
      n_chunks = forced_chunks;
    if (pos + (size_t)n_chunks * 8 > size) return fail("truncated offset table");
    chunk_offsets.resize(n_chunks);
    std::memcpy(chunk_offsets.data(), data + pos, (size_t)n_chunks * 8);
    return true;
  }

  // EXR RLE decode: signed count byte; n<0 -> -n literals, n>=0 -> n+1
  // repeats of the following byte.
  static bool rle_decode(const uint8_t* src, size_t n, uint8_t* dst,
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

  // Undo OpenEXR's reorder+delta transform (shared impl in dwa.h).
  static void undo_zip_transform(std::vector<uint8_t>& buf,
                                 std::vector<uint8_t>& out) {
    dwa::undo_zip_transform(buf, out);
  }

  // Per-decoding-thread scratch: buffers reused across a thread's blocks
  // plus its own error slot, so chunk decodes share no mutable state and
  // can run concurrently (chunks scatter to disjoint plane regions).
  struct Scratch {
    std::vector<uint8_t> scratch, raw;
    std::vector<uint16_t> b44_plane;
    std::string error;
  };

  // PXR24 stores per-row per-channel byte planes of running-differenced
  // pixels, zlib-compressed; FLOAT rows are 24-bit (low byte dropped).
  // Decodes one bw x bh block at (x0, y0), scattering every requested
  // channel (dsts[k] != null) into its full-width plane in ONE pass.
  bool pxr24_block(const uint8_t* payload, int csize, int bw, int bh,
                   int x0, int y0, const std::vector<float*>& dsts,
                   Scratch& sc) {
    size_t planes_size = 0;
    for (auto& ch : channels)
      planes_size += (size_t)bw *
          (ch.pixel_type == PT_FLOAT ? 3 : ch.pixel_type == PT_HALF ? 2 : 4)
          * bh;
    sc.scratch.resize(planes_size);
    uLongf dlen = planes_size;
    if (uncompress(sc.scratch.data(), &dlen, payload, csize) != Z_OK ||
        dlen != planes_size) {
      sc.error = "pxr24 inflate failed";
      return false;
    }
    size_t pos = 0;
    for (int line = 0; line < bh; ++line) {
      for (size_t k = 0; k < channels.size(); ++k) {
        int cpt = channels[k].pixel_type;
        int nplanes = cpt == PT_FLOAT ? 3 : cpt == PT_HALF ? 2 : 4;
        if (!dsts[k]) {
          pos += (size_t)bw * nplanes;
          continue;
        }
        const uint8_t* p = sc.scratch.data() + pos;
        float* row = dsts[k] + (size_t)(y0 + line) * width + x0;
        if (cpt == PT_FLOAT) {
          uint32_t acc = 0;
          for (int x = 0; x < bw; ++x) {
            uint32_t diff = ((uint32_t)p[x] << 16) |
                            ((uint32_t)p[bw + x] << 8) |
                            (uint32_t)p[2 * bw + x];
            acc = (acc + diff) & 0xFFFFFFu;
            uint32_t bits = acc << 8;
            std::memcpy(&row[x], &bits, 4);
          }
        } else if (cpt == PT_HALF) {
          uint32_t acc = 0;
          for (int x = 0; x < bw; ++x) {
            uint32_t diff = ((uint32_t)p[x] << 8) | (uint32_t)p[bw + x];
            acc = (acc + diff) & 0xFFFFu;
            row[x] = half_lut()[(uint16_t)acc];
          }
        } else {
          uint32_t acc = 0;
          for (int x = 0; x < bw; ++x) {
            uint32_t diff = ((uint32_t)p[x] << 24) |
                            ((uint32_t)p[bw + x] << 16) |
                            ((uint32_t)p[2 * bw + x] << 8) |
                            (uint32_t)p[3 * bw + x];
            acc += diff;
            row[x] = (float)acc;
          }
        }
        pos += (size_t)bw * nplanes;
      }
    }
    return true;
  }

  // B44/B44A block decode (mirrors io/b44.py, itself implemented from the
  // OpenEXR format spec): channels stored planar; HALF planes as row-major
  // 4x4 pixel blocks — 14 bytes each (16-bit base + sixteen 6-bit fields:
  // shift then 15 chained deltas), or 3 bytes for a flat block (third byte
  // 0xFC).  FLOAT/UINT planes are verbatim.  Half values live in an
  // order-preserving integer domain (negatives bit-inverted, positives
  // offset by 0x8000).
  bool b44_block(const uint8_t* payload, int csize, int bw, int bh,
                 int x0, int y0, const std::vector<float*>& dsts,
                 Scratch& sc) {
    static const int kOrder[15][2] = {
        {4, 0}, {8, 4}, {12, 8},
        {1, 0}, {5, 4}, {9, 8}, {13, 12},
        {2, 1}, {6, 5}, {10, 9}, {14, 13},
        {3, 2}, {7, 6}, {11, 10}, {15, 14}};
    const uint8_t* p = payload;
    const uint8_t* end = payload + csize;
    for (size_t k = 0; k < channels.size(); ++k) {
      int cpt = channels[k].pixel_type;
      bool want = dsts[k] != nullptr;
      if (cpt != PT_HALF) {  // FLOAT/UINT stored verbatim, planar
        size_t nbytes = (size_t)bw * bh * pixel_size(cpt);
        if (p + nbytes > end) { sc.error = "truncated B44 chunk"; return false; }
        if (want) {
          for (int line = 0; line < bh; ++line) {
            const uint8_t* src = p + (size_t)line * bw * pixel_size(cpt);
            float* row = dsts[k] + (size_t)(y0 + line) * width + x0;
            if (cpt == PT_FLOAT) {
              std::memcpy(row, src, (size_t)bw * 4);
            } else {
              for (int x = 0; x < bw; ++x) {
                uint32_t v;
                std::memcpy(&v, src + (size_t)x * 4, 4);
                row[x] = (float)v;
              }
            }
          }
        }
        p += nbytes;
        continue;
      }
      int hb = (bh + 3) / 4, wb = (bw + 3) / 4;
      int pw = wb * 4;
      if (want) sc.b44_plane.resize((size_t)hb * 4 * pw);
      for (int by = 0; by < hb; ++by) {
        for (int bx = 0; bx < wb; ++bx) {
          if (p + 3 > end) { sc.error = "truncated B44 chunk"; return false; }
          uint16_t t[16];
          uint16_t base = ((uint16_t)p[0] << 8) | p[1];
          if (p[2] == 0xFC) {  // flat block (B44A form; legal in both)
            for (int i = 0; i < 16; ++i) t[i] = base;
            p += 3;
          } else {
            if (p + 14 > end) { sc.error = "truncated B44 chunk"; return false; }
            int fields[16];
            for (int g = 0; g < 4; ++g) {  // 6-bit fields, MSB-first
              const uint8_t* q = p + 2 + g * 3;
              fields[g * 4 + 0] = q[0] >> 2;
              fields[g * 4 + 1] = ((q[0] & 0x3) << 4) | (q[1] >> 4);
              fields[g * 4 + 2] = ((q[1] & 0xF) << 2) | (q[2] >> 6);
              fields[g * 4 + 3] = q[2] & 0x3F;
            }
            int shift = fields[0];
            int bias = 0x20 << shift;
            t[0] = base;
            for (int i = 0; i < 15; ++i)
              t[kOrder[i][0]] = (uint16_t)(((int)t[kOrder[i][1]] +
                                            (fields[i + 1] << shift) - bias) &
                                           0xFFFF);
            p += 14;
          }
          if (want) {
            for (int iy = 0; iy < 4; ++iy)
              for (int ix = 0; ix < 4; ++ix) {
                uint16_t v = t[iy * 4 + ix];
                uint16_t h = (v & 0x8000) ? (uint16_t)(v & 0x7FFF)
                                          : (uint16_t)(~v & 0xFFFF);
                sc.b44_plane[(size_t)(by * 4 + iy) * pw + bx * 4 + ix] = h;
              }
          }
        }
      }
      if (want) {
        for (int line = 0; line < bh; ++line) {
          float* row = dsts[k] + (size_t)(y0 + line) * width + x0;
          const uint16_t* src = sc.b44_plane.data() + (size_t)line * pw;
          for (int x = 0; x < bw; ++x) row[x] = half_lut()[src[x]];
        }
      }
    }
    return true;
  }

  // DWA chunk decode (dwa.h): the CSC coupling means one pass reconstructs
  // every channel anyway; all requested channels scatter from that pass.
  bool dwa_block(const uint8_t* payload, int csize, int bw, int bh,
                 int x0, int y0, const std::vector<float*>& dsts,
                 Scratch& sc) {
    std::vector<dwa::Chan> chs(channels.size());
    for (size_t k = 0; k < channels.size(); ++k)
      chs[k] = {channels[k].name, (int)channels[k].pixel_type};
    std::vector<std::vector<float>> planes;
    if (!dwa::decompress(payload, (size_t)csize, chs, bw, bh, &planes,
                         &sc.error,
                         [lut = half_lut()](uint16_t h) { return lut[h]; },
                         [](float f) { return float_to_half(f); }))
      return false;
    for (size_t k = 0; k < channels.size(); ++k) {
      if (!dsts[k]) continue;
      const std::vector<float>& plane = planes[k];
      for (int line = 0; line < bh; ++line)
        std::memcpy(dsts[k] + (size_t)(y0 + line) * width + x0,
                    plane.data() + (size_t)line * bw, (size_t)bw * 4);
    }
    return true;
  }

  // Decode one compressed block (scanline chunk or tile): bw x bh pixels at
  // (x0, y0) in the data window; ONE decompression pass scatters every
  // requested channel (dsts[k] != null) into its full-width plane — an
  // N-channel read costs one inflate/Huffman pass, not N.
  bool decode_block(const uint8_t* payload, int csize, int bw, int bh,
                    int x0, int y0, const std::vector<float*>& dsts,
                    Scratch& sc) {
    if (compression == COMP_PXR24)
      return pxr24_block(payload, csize, bw, bh, x0, y0, dsts, sc);
    size_t line_bytes = 0;
    std::vector<size_t> chan_off(channels.size());
    for (size_t i = 0; i < channels.size(); ++i) {
      chan_off[i] = line_bytes;
      line_bytes += (size_t)bw * pixel_size(channels[i].pixel_type);
    }
    size_t raw_size = line_bytes * (size_t)bh;
    const uint8_t* lines_ptr;
    if ((size_t)csize >= raw_size) {
      lines_ptr = payload;  // stored raw (COMP_NONE or incompressible block)
    } else if (compression == COMP_NONE) {
      // A short COMP_NONE chunk must be rejected here: the scatter loop
      // reads raw_size bytes from the payload, and the only size check so
      // far was off + 8 + csize <= file size.
      sc.error = "uncompressed chunk shorter than its line block";
      return false;
    } else if (compression == COMP_B44 || compression == COMP_B44A) {
      return b44_block(payload, csize, bw, bh, x0, y0, dsts, sc);
    } else if (compression == COMP_DWAA || compression == COMP_DWAB) {
      return dwa_block(payload, csize, bw, bh, x0, y0, dsts, sc);
    } else if (compression == COMP_PIZ) {
      std::vector<piz::ChanDesc> cds(channels.size());
      for (size_t k = 0; k < channels.size(); ++k)
        cds[k].u16_size = channels[k].pixel_type == PT_HALF ? 1 : 2;
      sc.raw.resize(raw_size);
      if (!piz::decompress(payload, (size_t)csize, cds, bw, bh,
                           sc.raw.data(), &sc.error))
        return false;
      lines_ptr = sc.raw.data();
    } else if (compression == COMP_RLE) {
      sc.scratch.resize(raw_size);
      if (!rle_decode(payload, csize, sc.scratch.data(), raw_size)) {
        sc.error = "RLE decode failed";
        return false;
      }
      undo_zip_transform(sc.scratch, sc.raw);
      lines_ptr = sc.raw.data();
    } else {
      sc.scratch.resize(raw_size);
      uLongf dlen = raw_size;
      if (uncompress(sc.scratch.data(), &dlen, payload, csize) != Z_OK ||
          dlen != raw_size) {
        sc.error = "zlib inflate failed";
        return false;
      }
      undo_zip_transform(sc.scratch, sc.raw);
      lines_ptr = sc.raw.data();
    }
    for (int line = 0; line < bh; ++line) {
      for (size_t k = 0; k < channels.size(); ++k) {
        if (!dsts[k]) continue;
        const uint8_t* src = lines_ptr + line_bytes * line + chan_off[k];
        float* row = dsts[k] + (size_t)(y0 + line) * width + x0;
        int pt = channels[k].pixel_type;
        if (pt == PT_FLOAT) {
          std::memcpy(row, src, (size_t)bw * 4);
        } else if (pt == PT_HALF) {
          const uint16_t* hp = (const uint16_t*)src;
          for (int x = 0; x < bw; ++x) row[x] = half_lut()[hp[x]];
        } else {  // UINT
          const uint32_t* up = (const uint32_t*)src;
          for (int x = 0; x < bw; ++x) row[x] = (float)up[x];
        }
      }
    }
    return true;
  }

  // Decode ``n`` channels (by name) into dst planes [height*width] float32
  // in ONE pass over the chunks.  present[i] is set to 1 if channel i
  // exists in the file, 0 otherwise (its plane is left untouched).
  // Returns 0 on success, -1 on error.
  int read_channels(const char* const* cnames, float* const* dst_planes,
                    int n, int* present) {
    std::vector<float*> dsts(channels.size(), nullptr);
    std::vector<int> chan_of(n, -1);  // request j -> file channel index
    bool any = false;
    for (int j = 0; j < n; ++j) {
      present[j] = 0;
      for (size_t i = 0; i < channels.size(); ++i)
        if (channels[i].name == cnames[j]) {
          if (!dsts[i]) dsts[i] = dst_planes[j];  // first request wins
          chan_of[j] = (int)i;
          present[j] = 1;
          any = true;
          break;
        }
    }
    if (!any) return 0;
    // Duplicate requests for one channel share a decode: the first
    // request's plane receives the scatter, the rest copy from it.
    auto finish = [&]() {
      for (int j = 0; j < n; ++j)
        if (chan_of[j] >= 0 && dst_planes[j] != dsts[chan_of[j]])
          std::memcpy(dst_planes[j], dsts[chan_of[j]],
                      (size_t)width * height * 4);
      return 0;
    };

    struct Job { const uint8_t* payload; int32_t csize; int bw, bh, x0, y0; };
    std::vector<Job> jobs;
    jobs.reserve(chunk_offsets.size());
    // Each level-0 tile / scanline block may appear at most once, so the
    // jobs cover disjoint plane regions — the precondition for the
    // worker-pool path below (two threads scattering into the same rows
    // would be a data race, not just a deterministic overwrite).
    std::vector<bool> seen_block;
    if (tiled) {
      for (int64_t raw_off : chunk_offsets) {
        // tile chunk: [part(4) if multi-part] dx, dy, levelX, levelY,
        // dataSize, payload
        int64_t off = raw_off + chunk_prefix;
        if (raw_off < 0 || (size_t)off + 20 > size) {
          error = "bad tile offset"; return -1;
        }
        if (chunk_prefix) {
          int32_t pn;
          std::memcpy(&pn, data + raw_off, 4);
          if (pn != want_part) { error = "chunk part-number mismatch"; return -1; }
        }
        int32_t dx, dy, lx, ly, csize;
        std::memcpy(&dx, data + off, 4);
        std::memcpy(&dy, data + off + 4, 4);
        std::memcpy(&lx, data + off + 8, 4);
        std::memcpy(&ly, data + off + 12, 4);
        std::memcpy(&csize, data + off + 16, 4);
        if (csize < 0 || (size_t)off + 20 + (size_t)csize > size) {
          error = "bad tile size"; return -1;
        }
        if (lx || ly) {
          if (level_mode == 0) {
            error = "unexpected tile level in ONE_LEVEL file"; return -1;
          }
          continue;  // full-res level 0 only; pyramid levels skipped
        }
        // validate the tile INDEX before multiplying — dx * tile_w can
        // overflow int to a negative x0 that slips past an x0 >= width
        // check and scatters out of bounds
        int ntx = (width + tile_w - 1) / tile_w;
        int nty = (height + tile_h - 1) / tile_h;
        if (dx < 0 || dy < 0 || dx >= ntx || dy >= nty) {
          error = "bad tile index"; return -1;
        }
        if (seen_block.empty()) seen_block.resize((size_t)ntx * nty, false);
        size_t slot = (size_t)dy * ntx + dx;
        if (seen_block[slot]) { error = "duplicate tile"; return -1; }
        seen_block[slot] = true;
        int x0 = dx * tile_w, y0 = dy * tile_h;
        int bw = std::min(tile_w, width - x0);
        int bh = std::min(tile_h, height - y0);
        jobs.push_back({data + off + 20, csize, bw, bh, x0, y0});
      }
    } else {
      for (size_t ci = 0; ci < chunk_offsets.size(); ++ci) {
        int64_t raw_off = chunk_offsets[ci];
        int64_t off = raw_off + chunk_prefix;
        if (raw_off < 0 || (size_t)off + 8 > size) { error = "bad chunk offset"; return -1; }
        if (chunk_prefix) {
          int32_t pn;
          std::memcpy(&pn, data + raw_off, 4);
          if (pn != want_part) { error = "chunk part-number mismatch"; return -1; }
        }
        int32_t y, csize;
        std::memcpy(&y, data + off, 4);
        std::memcpy(&csize, data + off + 4, 4);
        if (csize < 0 || (size_t)off + 8 + (size_t)csize > size) {
          error = "bad chunk size"; return -1;
        }
        // chunks scatter by their own y — a corrupt y would otherwise
        // become an out-of-bounds plane write, and an unaligned or
        // duplicate y would overlap another chunk's rows (a data race on
        // the worker-pool path)
        if (y < ymin || y > ymax) { error = "chunk y out of range"; return -1; }
        int y0 = y - ymin;
        if (y0 % lines_per_chunk != 0) {
          error = "chunk y not aligned to a line-block boundary"; return -1;
        }
        size_t slot = (size_t)y0 / lines_per_chunk;
        if (seen_block.empty())
          seen_block.resize((size_t)(height + lines_per_chunk - 1) /
                                lines_per_chunk, false);
        if (seen_block[slot]) { error = "duplicate chunk y"; return -1; }
        seen_block[slot] = true;
        int n_lines = std::min(lines_per_chunk, height - y0);
        jobs.push_back({data + off + 8, csize, width, n_lines, 0, y0});
      }
    }

    // Validated jobs write to disjoint plane regions (duplicate /
    // unaligned blocks were rejected above): decode them on a worker pool
    // when configured (decode_threads_setting > 1), else serially with one
    // reused scratch.  Width is capped at 16 threads per file — a 1080p
    // scanline file has ~68 ZIP chunks, so the marginal thread past 16
    // buys <6% while the spawn cost is paid per decode; the cap is
    // documented at both Python entry points.
    int nt = decode_threads_setting();
    if (nt > (int)jobs.size()) nt = (int)jobs.size();
    if (nt > 16) nt = 16;
    if (nt <= 1) {
      Scratch sc;
      for (const Job& j : jobs)
        if (!decode_block(j.payload, j.csize, j.bw, j.bh, j.x0, j.y0, dsts,
                          sc)) {
          error = sc.error;
          return -1;
        }
    } else {
      std::atomic<size_t> next{0};
      std::atomic<bool> failed{false};
      std::mutex err_mu;
      auto worker = [&]() {
        Scratch sc;
        while (!failed.load(std::memory_order_relaxed)) {
          size_t i = next.fetch_add(1, std::memory_order_relaxed);
          if (i >= jobs.size()) break;
          const Job& j = jobs[i];
          if (!decode_block(j.payload, j.csize, j.bw, j.bh, j.x0, j.y0,
                            dsts, sc)) {
            std::lock_guard<std::mutex> g(err_mu);
            if (!failed.exchange(true)) error = sc.error;
            break;
          }
        }
      };
      std::vector<std::thread> pool;
      pool.reserve(nt - 1);
      for (int t = 1; t < nt; ++t) pool.emplace_back(worker);
      worker();
      for (auto& th : pool) th.join();
      if (failed.load()) return -1;
    }
    return finish();
  }

  // Single-channel convenience (legacy API): 1 found, 0 absent, -1 error.
  int read_channel(const char* cname, float* dst) {
    int present = 0;
    float* planes[1] = {dst};
    const char* names[1] = {cname};
    if (read_channels(names, planes, 1, &present) != 0) return -1;
    return present;
  }
};

// ZIP reorder+delta: one shared implementation (dwa.h) serves the
// scanline writer, the DWA DC segment, and their inverses.
void do_zip_transform(const uint8_t* src, size_t n, std::vector<uint8_t>& out) {
  dwa::do_zip_transform(src, n, &out);
}

}  // namespace

extern "C" {

// Within-file chunk-parallel decode width: n > 1 decodes each file's
// chunks on n threads, n == 0 means "hardware thread count", n == 1
// restores the serial default, n < 0 re-reads PCSS_EXR_THREADS.
void pcss_exr_set_threads(int n) {
  g_decode_threads.store(n < 0 ? -1 : n, std::memory_order_relaxed);
}

void* pcss_exr_open(const uint8_t* data, int64_t size) {
  auto* r = new Reader();
  r->data = data;
  r->size = (size_t)size;
  if (!r->parse()) {
    // keep handle so the caller can read the error, but flag it
    r->width = -1;
  }
  return r;
}

// Open a file exposing one part of a (possibly multi-part) EXR by index.
// Part 0 of a single-part file is the file itself.
void* pcss_exr_open_file_part(const char* path, int part) {
  FILE* f = std::fopen(path, "rb");
  auto* r = new Reader();
  r->want_part = part;
  if (!f) {
    r->fail("cannot open file");
    r->width = -1;
    return r;
  }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  r->owned.resize((size_t)sz);
  size_t got = std::fread(r->owned.data(), 1, (size_t)sz, f);
  std::fclose(f);
  r->data = r->owned.data();
  r->size = got;
  if (got != (size_t)sz || !r->parse()) {
    if (r->error.empty()) r->error = "short read";
    r->width = -1;
  }
  return r;
}

void* pcss_exr_open_file(const char* path) {
  return pcss_exr_open_file_part(path, 0);
}

// Open a multi-part file selecting the part by NAME — one file read total
// (the header walk resolves the index; no separate name query needed).
void* pcss_exr_open_file_named(const char* path, const char* part_name) {
  FILE* f = std::fopen(path, "rb");
  auto* r = new Reader();
  r->want_part_name = part_name ? part_name : "";
  if (!f) {
    r->fail("cannot open file");
    r->width = -1;
    return r;
  }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  r->owned.resize((size_t)sz);
  size_t got = std::fread(r->owned.data(), 1, (size_t)sz, f);
  std::fclose(f);
  r->data = r->owned.data();
  r->size = got;
  if (got != (size_t)sz || !r->parse()) {
    if (r->error.empty()) r->error = "short read";
    r->width = -1;
  }
  return r;
}

// Number of parts in the opened file (1 for single-part).
int pcss_exr_num_parts(void* h) {
  return ((Reader*)h)->n_parts;
}

// Name of part idx ("" for unnamed/single-part).  -1 if out of range.
int pcss_exr_part_name(void* h, int idx, char* buf, int buflen) {
  auto* r = (Reader*)h;
  if (idx < 0 || idx >= r->n_parts) return -1;
  const char* nm = (size_t)idx < r->part_names.size()
                       ? r->part_names[idx].c_str() : "";
  std::snprintf(buf, buflen, "%s", nm);
  return 0;
}

int pcss_exr_dims(void* h, int* width, int* height) {
  auto* r = (Reader*)h;
  if (r->width < 0) return -1;
  *width = r->width;
  *height = r->height;
  return 0;
}

int pcss_exr_num_channels(void* h) {
  auto* r = (Reader*)h;
  return (int)r->channels.size();
}

int pcss_exr_channel_name(void* h, int idx, char* buf, int buflen) {
  auto* r = (Reader*)h;
  if (idx < 0 || idx >= (int)r->channels.size()) return -1;
  std::snprintf(buf, buflen, "%s", r->channels[idx].name.c_str());
  return 0;
}

int pcss_exr_read_channel(void* h, const char* name, float* dst) {
  return ((Reader*)h)->read_channel(name, dst);
}

// Decode n channels in ONE pass over the file's chunks (one inflate/
// Huffman/DCT pass total, not per channel).  present[i] <- 1 if channel i
// exists (its plane filled), 0 if absent.  Returns 0 ok, -1 error.
int pcss_exr_read_channels(void* h, const char* const* names,
                           float* const* dsts, int n, int* present) {
  return ((Reader*)h)->read_channels(names, dsts, n, present);
}

const char* pcss_exr_error(void* h) {
  return ((Reader*)h)->error.c_str();
}

void pcss_exr_close(void* h) {
  delete (Reader*)h;
}

// B44 4x4 block encode: ``t`` holds the 16 forward-transformed codes
// (row-major).  Mirrors the Python encoder (io/b44.py) exactly — smallest
// shift whose chained deltas fit 6 bits with bounded reconstruction
// error; quantizes against the *reconstructed* predecessor.  Returns 3
// (flat, B44A only) or 14 bytes written to ``out``.
static int b44_encode_block(const uint16_t* t, bool flat_ok, uint8_t* out) {
  static const int kOrder[15][2] = {
      {4, 0}, {8, 4}, {12, 8},
      {1, 0}, {5, 4}, {9, 8}, {13, 12},
      {2, 1}, {6, 5}, {10, 9}, {14, 13},
      {3, 2}, {7, 6}, {11, 10}, {15, 14}};
  uint16_t base = t[0];
  out[0] = (uint8_t)(base >> 8);
  out[1] = (uint8_t)(base & 0xFF);
  if (flat_ok) {
    bool flat = true;
    for (int i = 1; i < 16; ++i)
      if (t[i] != base) { flat = false; break; }
    if (flat) { out[2] = 0xFC; return 3; }
  }
  int fields[16];
  for (int shift = 0; shift <= 16; ++shift) {
    int bias = 0x20 << shift;
    int half = (1 << shift) >> 1;
    int recon[16];
    for (int i = 0; i < 16; ++i) recon[i] = t[i];
    bool ok = true;
    fields[0] = shift;
    for (int i = 0; i < 15; ++i) {
      int tgt = kOrder[i][0], pred = kOrder[i][1];
      int diff = (int)t[tgt] - recon[pred] + bias;
      int d = (diff + half) >> shift;
      if (d < 0 || d > 0x3F) { ok = false; d = d < 0 ? 0 : 0x3F; }
      recon[tgt] = (recon[pred] + (d << shift) - bias) & 0xFFFF;
      fields[i + 1] = d;
    }
    if (ok) {
      for (int i = 0; i < 16 && ok; ++i) {
        int e = recon[i] - (int)t[i];
        if (e < 0) e = -e;
        if (e > half) ok = false;
      }
    }
    if (ok || shift == 16) {  // shift 16 = safety net (accept clipped)
      for (int g = 0; g < 4; ++g) {
        uint8_t* q = out + 2 + g * 3;
        int f0 = fields[g * 4], f1 = fields[g * 4 + 1];
        int f2 = fields[g * 4 + 2], f3 = fields[g * 4 + 3];
        q[0] = (uint8_t)((f0 << 2) | (f1 >> 4));
        q[1] = (uint8_t)(((f1 & 0xF) << 4) | (f2 >> 2));
        q[2] = (uint8_t)(((f2 & 0x3) << 6) | f3);
      }
      return 14;
    }
  }
  return 14;  // unreachable
}

static void append_attr(std::string* header, const char* aname,
                        const char* atype, const std::string& payload) {
  *header += aname; header->push_back(0);
  *header += atype; header->push_back(0);
  int32_t len = (int32_t)payload.size();
  header->append((const char*)&len, 4);
  *header += payload;
}

// Build one part's header attributes (NO terminating empty name) and its
// compressed chunks — the shared engine behind the single- and multi-part
// writers.  Scanline when tile_w == 0, ONE_LEVEL tiled otherwise.
static int prep_part(const char* const* names,
                     const float* const* chans, int n, int width, int height,
                     int compression, int pixel_type, int tile_w, int tile_h,
                     std::string* header_attrs,
                     std::vector<std::string>* chunk_headers_out,
                     std::vector<std::string>* payloads_out) {
  if (compression != COMP_NONE && compression != COMP_RLE &&
      compression != COMP_ZIPS && compression != COMP_ZIP &&
      compression != COMP_PIZ && compression != COMP_PXR24 &&
      compression != COMP_B44 && compression != COMP_B44A &&
      compression != COMP_DWAA && compression != COMP_DWAB)
    return -1;
  if (pixel_type != PT_HALF && pixel_type != PT_FLOAT) return -1;
  const bool tiled = tile_w > 0;
  if (tiled && tile_h <= 0) return -1;
  int lpc = (compression == COMP_ZIP || compression == COMP_PXR24) ? 16
            : (compression == COMP_PIZ || compression == COMP_B44 ||
               compression == COMP_B44A || compression == COMP_DWAA) ? 32
            : compression == COMP_DWAB                               ? 256
                                                                     : 1;
  int psz = pixel_size(pixel_type);

  std::string& header = *header_attrs;
  header.clear();
  auto attr = [&](const char* aname, const char* atype,
                  const std::string& payload) {
    append_attr(&header, aname, atype, payload);
  };
  std::string chlist;
  for (int i = 0; i < n; ++i) {
    chlist += names[i]; chlist.push_back(0);
    int32_t pt = pixel_type, zero = 0, one = 1;
    chlist.append((const char*)&pt, 4);
    chlist.append((const char*)&zero, 4);  // pLinear + reserved
    chlist.append((const char*)&one, 4);   // xSampling
    chlist.append((const char*)&one, 4);   // ySampling
  }
  chlist.push_back(0);
  int32_t box[4] = {0, 0, width - 1, height - 1};
  std::string boxs((const char*)box, 16);
  float paspect = 1.0f, swc[2] = {0, 0}, sww = 1.0f;
  attr("channels", "chlist", chlist);
  attr("compression", "compression", std::string(1, (char)compression));
  attr("dataWindow", "box2i", boxs);
  attr("displayWindow", "box2i", boxs);
  attr("lineOrder", "lineOrder", std::string(1, (char)0));
  attr("pixelAspectRatio", "float", std::string((const char*)&paspect, 4));
  attr("screenWindowCenter", "v2f", std::string((const char*)swc, 8));
  attr("screenWindowWidth", "float", std::string((const char*)&sww, 4));
  if (tiled) {
    std::string td;
    uint32_t tw = (uint32_t)tile_w, th = (uint32_t)tile_h;
    td.append((const char*)&tw, 4);
    td.append((const char*)&th, 4);
    td.push_back(0);  // ONE_LEVEL, ROUND_DOWN
    attr("tiles", "tiledesc", td);
  }

  std::vector<uint8_t> rows, transformed, comp_buf;

  // Compress `rows` (row-interleaved raw block bytes, bw x bh) into
  // *payload; the PXR24 path re-reads the source floats directly.
  auto compress_block = [&](int x0, int y0, int bw, int bh,
                            std::string* payload) -> int {
    size_t block_line = (size_t)bw * psz * n;
    rows.resize(block_line * bh);
    uint8_t* w = rows.data();
    for (int line = 0; line < bh; ++line) {
      for (int k = 0; k < n; ++k) {
        const float* src = chans[k] + (size_t)(y0 + line) * width + x0;
        if (pixel_type == PT_FLOAT) {
          std::memcpy(w, src, (size_t)bw * 4);
          w += (size_t)bw * 4;
        } else {
          uint16_t* hw = (uint16_t*)w;
          for (int x = 0; x < bw; ++x) hw[x] = float_to_half(src[x]);
          w += (size_t)bw * 2;
        }
      }
    }
    if (compression == COMP_PIZ) {
      std::vector<piz::ChanDesc> cds(n);
      for (int k = 0; k < n; ++k)
        cds[k].u16_size = pixel_type == PT_HALF ? 1 : 2;
      std::string comp;
      if (!piz::compress(rows.data(), rows.size(), cds, bw, bh, &comp))
        return -2;
      if (comp.size() < rows.size())
        *payload = comp;
      else
        payload->assign((const char*)rows.data(), rows.size());
    } else if (compression == COMP_PXR24) {
      // byte planes of running-differenced (rounded-24-bit) pixels
      transformed.clear();
      transformed.reserve(block_line * bh);
      std::vector<uint8_t> p0(bw), p1(bw), p2(bw);
      for (int line = 0; line < bh; ++line) {
        for (int k = 0; k < n; ++k) {
          const float* src = chans[k] + (size_t)(y0 + line) * width + x0;
          if (pixel_type == PT_FLOAT) {
            uint32_t prev = 0;
            for (int x = 0; x < bw; ++x) {
              uint32_t bits;
              std::memcpy(&bits, &src[x], 4);
              uint32_t exp = (bits >> 23) & 0xFFu;
              uint32_t p24;
              if (exp == 255) {
                p24 = (bits >> 8) & 0xFFFFFFu;
                if (bits & 0x7FFFFFu) p24 |= 1;  // keep NaN non-zero
              } else {
                p24 = ((bits >> 8) & 0xFFFFFFu) + ((bits >> 7) & 1u);
                if (p24 > 0xFFFFFFu) p24 = 0xFFFFFFu;
              }
              uint32_t diff = (p24 - prev) & 0xFFFFFFu;
              prev = p24;
              p0[x] = (uint8_t)(diff >> 16);
              p1[x] = (uint8_t)(diff >> 8);
              p2[x] = (uint8_t)diff;
            }
            transformed.insert(transformed.end(), p0.begin(), p0.end());
            transformed.insert(transformed.end(), p1.begin(), p1.end());
            transformed.insert(transformed.end(), p2.begin(), p2.end());
          } else {
            uint32_t prev = 0;
            for (int x = 0; x < bw; ++x) {
              uint32_t h = float_to_half(src[x]);
              uint32_t diff = (h - prev) & 0xFFFFu;
              prev = h;
              p0[x] = (uint8_t)(diff >> 8);
              p1[x] = (uint8_t)diff;
            }
            transformed.insert(transformed.end(), p0.begin(), p0.end());
            transformed.insert(transformed.end(), p1.begin(), p1.end());
          }
        }
      }
      uLongf clen = compressBound(transformed.size());
      comp_buf.resize(clen);
      if (compress2(comp_buf.data(), &clen, transformed.data(),
                    transformed.size(), Z_DEFAULT_COMPRESSION) != Z_OK)
        return -2;
      payload->assign((const char*)comp_buf.data(), clen);
    } else if (compression == COMP_DWAA || compression == COMP_DWAB) {
      // DWA encode (dwa.h): contiguous per-channel f32 block planes in
      // chlist order; default channel rules, level 45, header version 1.
      std::vector<dwa::Chan> dchans(n);
      std::vector<std::vector<float>> dplanes(n);
      std::vector<const float*> dptrs(n);
      for (int k = 0; k < n; ++k) {
        dchans[k] = {names[k], pixel_type};
        dplanes[k].resize((size_t)bw * bh);
        for (int line = 0; line < bh; ++line)
          std::memcpy(dplanes[k].data() + (size_t)line * bw,
                      chans[k] + (size_t)(y0 + line) * width + x0,
                      (size_t)bw * 4);
        dptrs[k] = dplanes[k].data();
      }
      std::string derr;
      if (!dwa::compress(dptrs, dchans, bw, bh, 45.0f, payload, &derr,
                         [lut = half_lut()](uint16_t h) { return lut[h]; },
                         [](float f) { return float_to_half(f); }))
        return -2;
      if (payload->size() >= rows.size())  // didn't shrink: store raw
        payload->assign((const char*)rows.data(), rows.size());
    } else if (compression == COMP_B44 || compression == COMP_B44A) {
      // HALF planes as 4x4 14-byte (3-byte flat, B44A) blocks; FLOAT
      // stored verbatim planar.  The standard didn't-shrink rule at the
      // end stores raw interleaved instead (all-FLOAT chunks hit it).
      payload->clear();
      if (pixel_type == PT_FLOAT) {
        for (int k = 0; k < n; ++k)
          for (int line = 0; line < bh; ++line)
            payload->append(
                (const char*)(chans[k] + (size_t)(y0 + line) * width + x0),
                (size_t)bw * 4);
      } else {
        int hb = (bh + 3) / 4, wb = (bw + 3) / 4;
        int pw = wb * 4, ph = hb * 4;
        std::vector<uint16_t> tp((size_t)ph * pw);
        for (int k = 0; k < n; ++k) {
          // forward-transformed padded plane (edge replication)
          for (int iy = 0; iy < ph; ++iy) {
            int sy = iy < bh ? iy : bh - 1;
            const float* src = chans[k] + (size_t)(y0 + sy) * width + x0;
            for (int ix = 0; ix < pw; ++ix) {
              int sx = ix < bw ? ix : bw - 1;
              uint16_t hbits = float_to_half(src[sx]);
              uint16_t v;
              if ((hbits & 0x7C00) == 0x7C00) v = 0x8000;  // Inf/NaN -> +0
              else if (hbits & 0x8000) v = (uint16_t)(~hbits & 0xFFFF);
              else v = (uint16_t)(hbits | 0x8000);
              tp[(size_t)iy * pw + ix] = v;
            }
          }
          for (int by = 0; by < hb; ++by)
            for (int bx = 0; bx < wb; ++bx) {
              uint16_t blk[16];
              for (int iy = 0; iy < 4; ++iy)
                for (int ix = 0; ix < 4; ++ix)
                  blk[iy * 4 + ix] =
                      tp[(size_t)(by * 4 + iy) * pw + bx * 4 + ix];
              uint8_t enc[14];
              int nb = b44_encode_block(blk, compression == COMP_B44A, enc);
              payload->append((const char*)enc, nb);
            }
        }
      }
      if (payload->size() >= rows.size())  // didn't shrink: store raw
        payload->assign((const char*)rows.data(), rows.size());
    } else if (compression == COMP_NONE) {
      payload->assign((const char*)rows.data(), rows.size());
    } else if (compression == COMP_RLE) {
      do_zip_transform(rows.data(), rows.size(), transformed);
      std::string enc;  // shared EXR RLE encoder (dwa.h)
      dwa::rle_encode(transformed.data(), transformed.size(), &enc);
      if (enc.size() < rows.size())
        *payload = enc;
      else
        payload->assign((const char*)rows.data(), rows.size());
    } else {
      do_zip_transform(rows.data(), rows.size(), transformed);
      uLongf clen = compressBound(transformed.size());
      comp_buf.resize(clen);
      if (compress2(comp_buf.data(), &clen, transformed.data(),
                    transformed.size(), Z_DEFAULT_COMPRESSION) != Z_OK)
        return -2;
      if (clen < rows.size())
        payload->assign((const char*)comp_buf.data(), clen);
      else
        payload->assign((const char*)rows.data(), rows.size());
    }
    return 0;
  };

  std::vector<std::string>& payloads = *payloads_out;
  std::vector<std::string>& chunk_headers = *chunk_headers_out;
  if (tiled) {
    int ntx = (width + tile_w - 1) / tile_w;
    int nty = (height + tile_h - 1) / tile_h;
    payloads.resize((size_t)ntx * nty);
    chunk_headers.resize(payloads.size());
    size_t ci = 0;
    for (int dy = 0; dy < nty; ++dy) {
      for (int dx = 0; dx < ntx; ++dx, ++ci) {
        int x0 = dx * tile_w, y0 = dy * tile_h;
        int bw = std::min(tile_w, width - x0);
        int bh = std::min(tile_h, height - y0);
        int rc = compress_block(x0, y0, bw, bh, &payloads[ci]);
        if (rc != 0) return rc;
        int32_t hdr[5] = {dx, dy, 0, 0, (int32_t)payloads[ci].size()};
        chunk_headers[ci].assign((const char*)hdr, 20);
      }
    }
  } else {
    int n_chunks = (height + lpc - 1) / lpc;
    payloads.resize(n_chunks);
    chunk_headers.resize(n_chunks);
    for (int ci = 0; ci < n_chunks; ++ci) {
      int y0 = ci * lpc;
      int bh = std::min(lpc, height - y0);
      int rc = compress_block(0, y0, width, bh, &payloads[ci]);
      if (rc != 0) return rc;
      int32_t hdr[2] = {y0, (int32_t)payloads[ci].size()};
      chunk_headers[ci].assign((const char*)hdr, 8);
    }
  }
  return 0;
}

// Single-part writer: prep one part, terminate its header, emit the file.
static int write_impl(const char* path, const char* const* names,
                      const float* const* chans, int n, int width, int height,
                      int compression, int pixel_type, int tile_w,
                      int tile_h) {
  std::string header;
  std::vector<std::string> chunk_headers, payloads;
  int rc = prep_part(names, chans, n, width, height, compression, pixel_type,
                     tile_w, tile_h, &header, &chunk_headers, &payloads);
  if (rc != 0) return rc;
  header.push_back(0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return -3;
  bool ok = true;
  auto put = [&](const void* p, size_t nbytes) {
    if (nbytes) ok = ok && std::fwrite(p, 1, nbytes, f) == nbytes;
  };
  const bool tiled = tile_w > 0;
  int32_t magic = kMagic, version = tiled ? (2 | 0x200) : 2;
  put(&magic, 4);
  put(&version, 4);
  put(header.data(), header.size());
  int64_t pos = 8 + (int64_t)header.size() + 8LL * (int64_t)payloads.size();
  for (size_t ci = 0; ci < payloads.size(); ++ci) {
    put(&pos, 8);
    pos += (int64_t)chunk_headers[ci].size() + (int64_t)payloads[ci].size();
  }
  for (size_t ci = 0; ci < payloads.size(); ++ci) {
    put(chunk_headers[ci].data(), chunk_headers[ci].size());
    put(payloads[ci].data(), payloads[ci].size());
  }
  // short writes / failed flush (disk full) must NOT report success — a
  // silently truncated file would be discovered only at read time
  if (std::fclose(f) != 0) ok = false;
  return ok ? 0 : -3;
}

// Write a single-part scanline EXR.  names: n null-terminated channel names
// (MUST be in ascending/alphabetical order); chans: n pointers to
// [height*width] float32.  Returns 0 on success.
int pcss_exr_write(const char* path, const char* const* names,
                   const float* const* chans, int n, int width, int height,
                   int compression, int pixel_type) {
  return write_impl(path, names, chans, n, width, height, compression,
                    pixel_type, 0, 0);
}

// Write a single-part ONE_LEVEL tiled EXR with tile_w x tile_h tiles.
int pcss_exr_write_tiled(const char* path, const char* const* names,
                         const float* const* chans, int n, int width,
                         int height, int compression, int pixel_type,
                         int tile_w, int tile_h) {
  if (tile_w <= 0 || tile_h <= 0) return -1;
  return write_impl(path, names, chans, n, width, height, compression,
                    pixel_type, tile_w, tile_h);
}

// Write a multi-part EXR (version flag 0x1000).  Channel names/planes are
// flattened across parts in part order (n_chans[p] per part); widths/
// heights are per part.  Each part carries the mandated name/type/
// chunkCount attributes; chunks lead with their part number; per-part
// offset tables stored back to back.  Part names must be unique.
int pcss_exr_write_multipart(const char* path,
                             const char* const* part_names, int n_parts,
                             const int* n_chans, const char* const* names,
                             const float* const* chans, const int* widths,
                             const int* heights, int compression,
                             int pixel_type, int tile_w, int tile_h) {
  if (n_parts <= 0) return -1;
  for (int i = 0; i < n_parts; ++i)
    for (int j = i + 1; j < n_parts; ++j)
      if (std::strcmp(part_names[i], part_names[j]) == 0) return -1;
  const char* ptype = tile_w > 0 ? "tiledimage" : "scanlineimage";

  std::vector<std::string> headers(n_parts);
  std::vector<std::vector<std::string>> part_chdrs(n_parts);
  std::vector<std::vector<std::string>> part_payloads(n_parts);
  int coff = 0;
  for (int p = 0; p < n_parts; ++p) {
    int rc = prep_part(names + coff, chans + coff, n_chans[p], widths[p],
                       heights[p], compression, pixel_type, tile_w, tile_h,
                       &headers[p], &part_chdrs[p], &part_payloads[p]);
    if (rc != 0) return rc;
    coff += n_chans[p];
    append_attr(&headers[p], "name", "string", part_names[p]);
    append_attr(&headers[p], "type", "string", ptype);
    int32_t cc = (int32_t)part_payloads[p].size();
    append_attr(&headers[p], "chunkCount", "int",
                std::string((const char*)&cc, 4));
    headers[p].push_back(0);  // end of this part's attribute list
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) return -3;
  bool ok = true;
  auto put = [&](const void* p, size_t nbytes) {
    if (nbytes) ok = ok && std::fwrite(p, 1, nbytes, f) == nbytes;
  };
  int32_t magic = kMagic, version = 2 | 0x1000;
  put(&magic, 4);
  put(&version, 4);
  size_t header_block = 1;  // trailing empty header byte
  size_t n_total = 0;
  for (int p = 0; p < n_parts; ++p) {
    header_block += headers[p].size();
    n_total += part_payloads[p].size();
  }
  for (int p = 0; p < n_parts; ++p)
    put(headers[p].data(), headers[p].size());
  if (std::fputc(0, f) == EOF) ok = false;
  int64_t pos = 8 + (int64_t)header_block + 8LL * (int64_t)n_total;
  for (int p = 0; p < n_parts; ++p)
    for (size_t ci = 0; ci < part_payloads[p].size(); ++ci) {
      put(&pos, 8);
      pos += 4 + (int64_t)part_chdrs[p][ci].size() +
             (int64_t)part_payloads[p][ci].size();
    }
  for (int p = 0; p < n_parts; ++p)
    for (size_t ci = 0; ci < part_payloads[p].size(); ++ci) {
      int32_t pn = p;
      put(&pn, 4);
      put(part_chdrs[p][ci].data(), part_chdrs[p][ci].size());
      put(part_payloads[p][ci].data(), part_payloads[p][ci].size());
    }
  // disk-full / failed flush must not report success (see write_impl)
  if (std::fclose(f) != 0) ok = false;
  return ok ? 0 : -3;
}

}  // extern "C"
