// exr_oracle — a thin CLI over libOpenEXR (the REAL library, 3.1.x) used by
// tests/test_exr_interop.py to validate this repo's two from-spec codecs
// (pcss_unet_tpu/io/exr_py.py and native/exr/) against upstream OpenEXR at
// the byte level.  The reference pipeline consumes EXRs through the OpenEXR
// bindings (setdata.py:42), so "decodes what libOpenEXR writes, and writes
// what libOpenEXR decodes" is the exact interop contract to pin.
//
// Commands:
//   write <out.exr> <compression> <W> <H> <chanspec> <data.bin>
//         [--tiled TX TY [one|mip|rip] [down|up]] [--parts N] [--level F]
//         [--dw X0 Y0] [--decreasing]
//     chanspec: comma list "NAME:half|float|uint".  data.bin: planar
//     float32, chanspec order, W*H per plane (×N for --parts; part p gets
//     plane block p).  For mip/rip pyramids level (0,0) gets the real
//     data, coarser levels a point-sampled decimation (matching the
//     repo's synthetic pyramid writer).
//   dump <in.exr> <out.bin> [--part P]
//     prints "W H name:type ..." (chlist order) on stdout and writes the
//     decoded planes as planar float32 (same order) to out.bin.
//
// Build: make (tests/oracle/Makefile).  The test suite skips, not fails,
// when the library is absent.
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfInputFile.h>
#include <ImfInputPart.h>
#include <ImfMultiPartInputFile.h>
#include <ImfMultiPartOutputFile.h>
#include <ImfOutputFile.h>
#include <ImfOutputPart.h>
#include <ImfPartType.h>
#include <ImfStandardAttributes.h>
#include <ImfTiledOutputFile.h>
#include <ImfTiledOutputPart.h>
#include <half.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

using namespace OPENEXR_IMF_NAMESPACE;
using IMATH_NAMESPACE::Box2i;
using IMATH_NAMESPACE::V2i;

namespace {

struct Chan {
    std::string name;
    PixelType type;
};

std::vector<Chan> parse_chanspec(const std::string& spec) {
    std::vector<Chan> out;
    size_t pos = 0;
    while (pos < spec.size()) {
        size_t comma = spec.find(',', pos);
        std::string item = spec.substr(
            pos, comma == std::string::npos ? std::string::npos : comma - pos);
        size_t colon = item.find(':');
        if (colon == std::string::npos)
            throw std::runtime_error("bad chanspec item: " + item);
        std::string name = item.substr(0, colon);
        std::string ty = item.substr(colon + 1);
        PixelType pt;
        if (ty == "half") pt = HALF;
        else if (ty == "float") pt = FLOAT;
        else if (ty == "uint") pt = UINT;
        else throw std::runtime_error("bad pixel type: " + ty);
        out.push_back({name, pt});
        if (comma == std::string::npos) break;
        pos = comma + 1;
    }
    return out;
}

Compression parse_compression(const std::string& c) {
    static const std::map<std::string, Compression> m = {
        {"none", NO_COMPRESSION},   {"rle", RLE_COMPRESSION},
        {"zips", ZIPS_COMPRESSION}, {"zip", ZIP_COMPRESSION},
        {"piz", PIZ_COMPRESSION},   {"pxr24", PXR24_COMPRESSION},
        {"b44", B44_COMPRESSION},   {"b44a", B44A_COMPRESSION},
        {"dwaa", DWAA_COMPRESSION}, {"dwab", DWAB_COMPRESSION},
    };
    auto it = m.find(c);
    if (it == m.end()) throw std::runtime_error("bad compression: " + c);
    return it->second;
}

// Per-channel typed staging buffers for one part's full data window.
struct Staged {
    std::vector<std::vector<half>> halves;
    std::vector<std::vector<float>> floats;
    std::vector<std::vector<uint32_t>> uints;
};

// Convert planar float32 test data (one plane per channel) into typed
// buffers, half/uint values quantized exactly as the file will hold them.
Staged stage(const std::vector<Chan>& chans, const float* data, size_t npix) {
    Staged s;
    for (size_t c = 0; c < chans.size(); ++c) {
        const float* p = data + c * npix;
        switch (chans[c].type) {
            case HALF: {
                std::vector<half> v(npix);
                for (size_t i = 0; i < npix; ++i) v[i] = half(p[i]);
                s.halves.push_back(std::move(v));
                s.floats.emplace_back();
                s.uints.emplace_back();
                break;
            }
            case FLOAT: {
                s.halves.emplace_back();
                s.floats.emplace_back(p, p + npix);
                s.uints.emplace_back();
                break;
            }
            default: {
                std::vector<uint32_t> v(npix);
                for (size_t i = 0; i < npix; ++i)
                    v[i] = static_cast<uint32_t>(p[i]);
                s.halves.emplace_back();
                s.floats.emplace_back();
                s.uints.push_back(std::move(v));
            }
        }
    }
    return s;
}

// FrameBuffer over staged planes laid out for data window (x0,y0)+(W,H).
FrameBuffer make_fb(const std::vector<Chan>& chans, Staged& s, int x0,
                    int y0, int w) {
    FrameBuffer fb;
    for (size_t c = 0; c < chans.size(); ++c) {
        char* base;
        size_t xs;
        switch (chans[c].type) {
            case HALF:
                base = reinterpret_cast<char*>(s.halves[c].data());
                xs = sizeof(half);
                break;
            case FLOAT:
                base = reinterpret_cast<char*>(s.floats[c].data());
                xs = sizeof(float);
                break;
            default:
                base = reinterpret_cast<char*>(s.uints[c].data());
                xs = sizeof(uint32_t);
        }
        fb.insert(chans[c].name,
                  Slice(chans[c].type,
                        base - (static_cast<ptrdiff_t>(y0) * w + x0) * xs,
                        xs, xs * w));
    }
    return fb;
}

std::vector<float> read_bin(const char* path, size_t count) {
    std::vector<float> v(count);
    FILE* f = std::fopen(path, "rb");
    if (!f) throw std::runtime_error(std::string("cannot open ") + path);
    if (std::fread(v.data(), sizeof(float), count, f) != count) {
        std::fclose(f);
        throw std::runtime_error("short read from data.bin");
    }
    std::fclose(f);
    return v;
}

// Point-sampled decimation matching the repo's pyramid test writer
// (io/exr_py.py tiled pyramid tests): sample [::2**l, ::2**l].
std::vector<float> decimate(const std::vector<float>& full, int w, int h,
                            int lw, int lh, int lx, int ly, size_t nchan) {
    std::vector<float> out(nchan * size_t(lw) * lh);
    for (size_t c = 0; c < nchan; ++c)
        for (int y = 0; y < lh; ++y)
            for (int x = 0; x < lw; ++x)
                out[c * size_t(lw) * lh + size_t(y) * lw + x] =
                    full[c * size_t(w) * h +
                         size_t(std::min(h - 1, y << ly)) * w +
                         std::min(w - 1, x << lx)];
    return out;
}

int cmd_write(int argc, char** argv) {
    if (argc < 7) throw std::runtime_error("write: too few args");
    const char* out_path = argv[1];
    Compression comp = parse_compression(argv[2]);
    int w = std::atoi(argv[3]), h = std::atoi(argv[4]);
    std::vector<Chan> chans = parse_chanspec(argv[5]);
    const char* bin_path = argv[6];

    bool tiled = false, decreasing = false;
    int tx = 0, ty = 0, parts = 1, x0 = 0, y0 = 0;
    LevelMode lmode = ONE_LEVEL;
    LevelRoundingMode lround = ROUND_DOWN;
    float dwa_level = -1.0f;
    for (int i = 7; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--tiled") {
            tiled = true;
            tx = std::atoi(argv[++i]);
            ty = std::atoi(argv[++i]);
            if (i + 1 < argc && argv[i + 1][0] != '-') {
                std::string m = argv[++i];
                lmode = m == "mip" ? MIPMAP_LEVELS
                        : m == "rip" ? RIPMAP_LEVELS : ONE_LEVEL;
                if (i + 1 < argc && argv[i + 1][0] != '-') {
                    lround = std::string(argv[++i]) == "up" ? ROUND_UP
                                                            : ROUND_DOWN;
                }
            }
        } else if (a == "--parts") {
            parts = std::atoi(argv[++i]);
        } else if (a == "--level") {
            dwa_level = std::atof(argv[++i]);
        } else if (a == "--dw") {
            x0 = std::atoi(argv[++i]);
            y0 = std::atoi(argv[++i]);
        } else if (a == "--decreasing") {
            decreasing = true;
        } else {
            throw std::runtime_error("unknown option: " + a);
        }
    }

    size_t npix = size_t(w) * h;
    std::vector<float> data = read_bin(bin_path, npix * chans.size() * parts);

    auto make_header = [&](int part) {
        Header hd(w, h);
        hd.dataWindow() = Box2i(V2i(x0, y0), V2i(x0 + w - 1, y0 + h - 1));
        hd.displayWindow() = hd.dataWindow();
        hd.compression() = comp;
        hd.lineOrder() = decreasing ? DECREASING_Y : INCREASING_Y;
        if (dwa_level >= 0) addDwaCompressionLevel(hd, dwa_level);
        for (auto& c : chans) hd.channels().insert(c.name, Channel(c.type));
        if (parts > 1) {
            hd.setName("part" + std::to_string(part));
            hd.setType(tiled ? TILEDIMAGE : SCANLINEIMAGE);
        }
        if (tiled) hd.setTileDescription(
            TileDescription(tx, ty, lmode, lround));
        return hd;
    };

    if (parts > 1) {
        std::vector<Header> headers;
        for (int p = 0; p < parts; ++p) headers.push_back(make_header(p));
        MultiPartOutputFile mp(out_path, headers.data(), parts);
        for (int p = 0; p < parts; ++p) {
            Staged s = stage(chans, data.data() + size_t(p) * npix *
                             chans.size(), npix);
            FrameBuffer fb = make_fb(chans, s, x0, y0, w);
            if (tiled) {
                TiledOutputPart tp(mp, p);
                tp.setFrameBuffer(fb);
                tp.writeTiles(0, tp.numXTiles() - 1, 0, tp.numYTiles() - 1);
            } else {
                OutputPart op(mp, p);
                op.setFrameBuffer(fb);
                op.writePixels(h);
            }
        }
        return 0;
    }

    if (tiled) {
        TiledOutputFile f(out_path, make_header(0));
        for (int ly = 0; ly < f.numYLevels(); ++ly) {
            for (int lx = 0; lx < f.numXLevels(); ++lx) {
                if (lmode == MIPMAP_LEVELS && lx != ly) continue;
                int lw = f.levelWidth(lx), lh = f.levelHeight(ly);
                std::vector<float> ldata =
                    (lx == 0 && ly == 0)
                        ? data
                        : decimate(data, w, h, lw, lh, lx, ly, chans.size());
                Staged s = stage(chans, ldata.data(), size_t(lw) * lh);
                FrameBuffer fb = make_fb(chans, s, x0, y0, lw);
                f.setFrameBuffer(fb);
                f.writeTiles(0, f.numXTiles(lx) - 1, 0, f.numYTiles(ly) - 1,
                             lx, ly);
            }
        }
        return 0;
    }

    OutputFile f(out_path, make_header(0));
    Staged s = stage(chans, data.data(), npix);
    FrameBuffer fb = make_fb(chans, s, x0, y0, w);
    f.setFrameBuffer(fb);
    f.writePixels(h);
    return 0;
}

int cmd_dump(int argc, char** argv) {
    if (argc < 3) throw std::runtime_error("dump: too few args");
    const char* in_path = argv[1];
    const char* out_path = argv[2];
    int part = 0;
    for (int i = 3; i < argc; ++i) {
        if (std::string(argv[i]) == "--part") part = std::atoi(argv[++i]);
    }

    MultiPartInputFile mp(in_path);
    InputPart ip(mp, part);
    const Header& hd = ip.header();
    Box2i dw = hd.dataWindow();
    int w = dw.max.x - dw.min.x + 1, h = dw.max.y - dw.min.y + 1;
    size_t npix = size_t(w) * h;

    std::vector<Chan> chans;
    for (auto it = hd.channels().begin(); it != hd.channels().end(); ++it)
        chans.push_back({it.name(), it.channel().type});

    Staged s;
    for (auto& c : chans) {
        s.halves.emplace_back(c.type == HALF ? npix : 0);
        s.floats.emplace_back(c.type == FLOAT ? npix : 0);
        s.uints.emplace_back(c.type == UINT ? npix : 0);
    }
    FrameBuffer fb = make_fb(chans, s, dw.min.x, dw.min.y, w);
    ip.setFrameBuffer(fb);
    ip.readPixels(dw.min.y, dw.max.y);

    std::printf("%d %d", w, h);
    FILE* f = std::fopen(out_path, "wb");
    if (!f) throw std::runtime_error(std::string("cannot open ") + out_path);
    std::vector<float> plane(npix);
    for (size_t c = 0; c < chans.size(); ++c) {
        const char* ty = chans[c].type == HALF    ? "half"
                         : chans[c].type == FLOAT ? "float"
                                                  : "uint";
        std::printf(" %s:%s", chans[c].name.c_str(), ty);
        for (size_t i = 0; i < npix; ++i)
            plane[i] = chans[c].type == HALF    ? float(s.halves[c][i])
                       : chans[c].type == FLOAT ? s.floats[c][i]
                                                : float(s.uints[c][i]);
        std::fwrite(plane.data(), sizeof(float), npix, f);
    }
    std::fclose(f);
    std::printf("\n");
    return 0;
}

}  // namespace

int main(int argc, char** argv) {
    try {
        if (argc < 2) throw std::runtime_error(
            "usage: exr_oracle write|dump ...");
        if (std::string(argv[1]) == "write") return cmd_write(argc - 1,
                                                              argv + 1);
        if (std::string(argv[1]) == "dump") return cmd_dump(argc - 1,
                                                            argv + 1);
        throw std::runtime_error(std::string("unknown command ") + argv[1]);
    } catch (const std::exception& e) {
        std::fprintf(stderr, "exr_oracle: %s\n", e.what());
        return 1;
    }
}
