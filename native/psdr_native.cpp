// psdr_tpu native runtime: host-side builders and loaders.
//
// TPU-native equivalents of the reference's native components:
//  * obj_*       — OBJ mesh parsing (replaces vendored tinyobjloader,
//                  /root/reference is the behavioral reference: mesh.cpp:62-141)
//  * build_edges — 2-manifold edge-adjacency table (mesh.cpp:143-203)
//  * morton_topology — acceleration-structure build: Morton sort + complete
//                  implicit tree topology (the OptiX GAS-build analog,
//                  scene_optix.cpp:34-72); the AABB refit runs on-device in JAX.
//
// Exposed as a C ABI consumed through ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC psdr_native.cpp -o libpsdr_native.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct ObjMesh {
    std::vector<float> verts;    // 3 * nv
    std::vector<float> uvs;      // 2 * nt
    std::vector<int32_t> faces;  // 3 * nf (vertex ids)
    std::vector<int32_t> fuvs;   // 3 * nf (uv ids, -1 if none)
    bool has_uv_faces = false;
};

// fast float parse over a whitespace-separated span
inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

}  // namespace

extern "C" {

void* obj_load(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return nullptr; }
    fclose(f);
    buf[size] = '\n';

    auto* m = new ObjMesh();
    const char* p = buf.data();
    const char* end = buf.data() + size;
    std::vector<int> vidx, tidx;
    while (p < end) {
        const char* line_end = (const char*)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        const char* q = skip_ws(p, line_end);
        if (q + 1 < line_end && q[0] == 'v' && (q[1] == ' ' || q[1] == '\t')) {
            char* r = const_cast<char*>(q + 1);
            for (int k = 0; k < 3; ++k) m->verts.push_back(strtof(r, &r));
        } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 't'
                   && (q[2] == ' ' || q[2] == '\t')) {
            char* r = const_cast<char*>(q + 2);
            for (int k = 0; k < 2; ++k) m->uvs.push_back(strtof(r, &r));
        } else if (q + 1 < line_end && q[0] == 'f' && (q[1] == ' ' || q[1] == '\t')) {
            vidx.clear(); tidx.clear();
            const char* r = q + 1;
            while (r < line_end) {
                r = skip_ws(r, line_end);
                if (r >= line_end || *r == '\n') break;
                char* e;
                long v = strtol(r, &e, 10);
                if (e == r) break;
                long t = 0;
                bool has_t = false;
                r = e;
                if (r < line_end && *r == '/') {
                    ++r;
                    if (r < line_end && *r != '/') {
                        t = strtol(r, &e, 10);
                        has_t = true;
                        r = e;
                    }
                    if (r < line_end && *r == '/') {  // normal index: skip
                        ++r;
                        strtol(r, &e, 10);
                        r = e;
                    }
                }
                vidx.push_back((int)(v > 0 ? v - 1 : (long)(m->verts.size() / 3) + v));
                tidx.push_back(has_t ? (int)(t > 0 ? t - 1 : (long)(m->uvs.size() / 2) + t) : -1);
                if (has_t) m->has_uv_faces = true;
            }
            for (size_t k = 1; k + 1 < vidx.size(); ++k) {  // fan triangulation
                m->faces.push_back(vidx[0]);
                m->faces.push_back(vidx[k]);
                m->faces.push_back(vidx[k + 1]);
                m->fuvs.push_back(tidx[0] < 0 ? 0 : tidx[0]);
                m->fuvs.push_back(tidx[k] < 0 ? 0 : tidx[k]);
                m->fuvs.push_back(tidx[k + 1] < 0 ? 0 : tidx[k + 1]);
            }
        }
        p = line_end + 1;
    }
    return m;
}

void obj_counts(void* handle, int32_t* nv, int32_t* nf, int32_t* nt,
                int32_t* has_uv) {
    auto* m = (ObjMesh*)handle;
    *nv = (int32_t)(m->verts.size() / 3);
    *nf = (int32_t)(m->faces.size() / 3);
    *nt = (int32_t)(m->uvs.size() / 2);
    *has_uv = m->has_uv_faces ? 1 : 0;
}

void obj_copy(void* handle, float* verts, int32_t* faces, float* uvs,
              int32_t* fuvs) {
    auto* m = (ObjMesh*)handle;
    memcpy(verts, m->verts.data(), m->verts.size() * sizeof(float));
    memcpy(faces, m->faces.data(), m->faces.size() * sizeof(int32_t));
    if (!m->uvs.empty()) memcpy(uvs, m->uvs.data(), m->uvs.size() * sizeof(float));
    if (!m->fuvs.empty()) memcpy(fuvs, m->fuvs.data(), m->fuvs.size() * sizeof(int32_t));
}

void obj_free(void* handle) { delete (ObjMesh*)handle; }

// Edge-adjacency table. out rows: [v0, v1, face0, face1|-1, opp_vertex0].
// Returns edge count, -1 on >2-manifold, -2 on duplicated face pair.
int32_t build_edges(const int32_t* faces, int32_t nf, int32_t* out,
                    int32_t max_edges) {
    std::unordered_map<uint64_t, int32_t> first;  // edge key -> out row
    first.reserve((size_t)nf * 3);
    int32_t ne = 0;
    for (int32_t f = 0; f < nf; ++f) {
        for (int k = 0; k < 3; ++k) {
            int32_t a = faces[3 * f + k];
            int32_t b = faces[3 * f + (k + 1) % 3];
            int32_t opp = faces[3 * f + (k + 2) % 3];
            uint64_t lo = (uint64_t)std::min(a, b);
            uint64_t hi = (uint64_t)std::max(a, b);
            uint64_t key = (lo << 32) | hi;
            auto it = first.find(key);
            if (it == first.end()) {
                if (ne >= max_edges) return -3;
                out[5 * ne + 0] = (int32_t)lo;
                out[5 * ne + 1] = (int32_t)hi;
                out[5 * ne + 2] = f;
                out[5 * ne + 3] = -1;
                out[5 * ne + 4] = opp;
                first.emplace(key, ne);
                ++ne;
            } else {
                int32_t row = it->second;
                if (out[5 * row + 3] >= 0) return -1;   // 3rd face on edge
                if (out[5 * row + 2] == f) return -2;   // duplicate face
                out[5 * row + 3] = f;
            }
        }
    }
    return ne;
}

// Morton-ordered complete-tree topology (the accel "build").
// perm_out must hold num_leaves*leaf_size entries (call morton_counts first),
// skip_out 2*num_leaves.
static inline uint64_t expand_bits(uint64_t v) {
    v = (v | (v << 16)) & 0x030000FFull;
    v = (v | (v << 8)) & 0x0300F00Full;
    v = (v | (v << 4)) & 0x030C30C3ull;
    v = (v | (v << 2)) & 0x09249249ull;
    return v;
}

int32_t morton_num_leaves(int32_t nf, int32_t leaf_size) {
    int32_t n_leaf = (nf + leaf_size - 1) / leaf_size;
    int32_t p = 1;
    while (p < n_leaf) p <<= 1;
    return p;
}

void morton_topology(const float* p0, const float* e1, const float* e2,
                     int32_t nf, int32_t leaf_size, int32_t* perm_out,
                     int32_t* skip_out) {
    std::vector<float> cx(nf), cy(nf), cz(nf);
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = 0; i < nf; ++i) {
        float c[3];
        for (int k = 0; k < 3; ++k) {
            c[k] = p0[3 * i + k] + (e1[3 * i + k] + e2[3 * i + k]) / 3.0f;
            mn[k] = std::min(mn[k], c[k]);
            mx[k] = std::max(mx[k], c[k]);
        }
        cx[i] = c[0]; cy[i] = c[1]; cz[i] = c[2];
    }
    float ext[3];
    for (int k = 0; k < 3; ++k)
        ext[k] = std::max(mx[k] - mn[k], 1e-12f);

    std::vector<std::pair<uint64_t, int32_t>> keys(nf);
    for (int32_t i = 0; i < nf; ++i) {
        auto q = [&](float v, int k) {
            float t = (v - mn[k]) / ext[k] * 1023.0f;
            return (uint64_t)std::min(std::max(t, 0.0f), 1023.0f);
        };
        uint64_t code = (expand_bits(q(cx[i], 0)) << 2)
                      | (expand_bits(q(cy[i], 1)) << 1)
                      | expand_bits(q(cz[i], 2));
        keys[i] = {code, i};
    }
    std::stable_sort(keys.begin(), keys.end(),
                     [](const auto& a, const auto& b) { return a.first < b.first; });

    int32_t P = morton_num_leaves(nf, leaf_size);
    int32_t total = P * leaf_size;
    for (int32_t i = 0; i < total; ++i)
        perm_out[i] = i < nf ? keys[i].second : -1;

    int32_t n = 2 * P;
    skip_out[0] = 0;
    for (int32_t i = 1; i < n; ++i) {
        int32_t k = i;
        while ((k & 1) && k > 1) k >>= 1;
        skip_out[i] = k <= 1 ? 0 : k + 1;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PIZ decompression (OpenEXR wavelet + Huffman format), enough to read the
// common HALF/FLOAT scanline files the reference ships (tinyexr parity).
// ---------------------------------------------------------------------------

namespace piz {

constexpr int HUF_ENCBITS = 16;
constexpr int HUF_DECBITS = 14;
constexpr int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;
constexpr int HUF_DECSIZE = 1 << HUF_DECBITS;
constexpr int HUF_DECMASK = HUF_DECSIZE - 1;
constexpr int SHORT_ZEROCODE_RUN = 59;
constexpr int LONG_ZEROCODE_RUN = 63;
constexpr int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;

struct HufDec {
    int len = 0;
    int lit = 0;
    std::vector<int> lits;
};

struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint64_t c = 0;
    int lc = 0;
    bool ok = true;
    uint64_t get(int n) {
        while (lc < n) {
            if (p >= end) { ok = false; return 0; }
            c = (c << 8) | *p++;
            lc += 8;
        }
        lc -= n;
        return (c >> lc) & ((1ull << n) - 1);
    }
};

inline uint64_t huf_length(uint64_t code) { return code & 63; }
inline uint64_t huf_code(uint64_t code) { return code >> 6; }

static bool unpack_enc_table(BitReader& br, int im, int iM,
                             std::vector<uint64_t>& hcode) {
    hcode.assign(HUF_ENCSIZE, 0);
    for (int i = im; i <= iM;) {
        uint64_t l = br.get(6);
        if (!br.ok) return false;
        if (l == (uint64_t)LONG_ZEROCODE_RUN) {
            int zerun = (int)br.get(8) + SHORTEST_LONG_RUN;
            if (i + zerun > iM + 1) return false;
            i += zerun;
        } else if (l >= (uint64_t)SHORT_ZEROCODE_RUN) {
            int zerun = (int)(l - SHORT_ZEROCODE_RUN + 2);
            if (i + zerun > iM + 1) return false;
            i += zerun;
        } else {
            hcode[i++] = l;
        }
    }
    // canonical codes
    uint64_t n[59] = {0};
    for (int i = 0; i < HUF_ENCSIZE; ++i) n[huf_length(hcode[i])] += 1;
    uint64_t c = 0;
    for (int i = 58; i > 0; --i) {
        uint64_t nc = (c + n[i]) >> 1;
        n[i] = c;
        c = nc;
    }
    for (int i = 0; i < HUF_ENCSIZE; ++i) {
        uint64_t l = hcode[i];
        if (l > 0) hcode[i] = l | (n[l]++ << 6);
    }
    return true;
}

static bool build_dec_table(const std::vector<uint64_t>& hcode, int im, int iM,
                            std::vector<HufDec>& hdecod) {
    hdecod.assign(HUF_DECSIZE, HufDec());
    for (int i = im; i <= iM; ++i) {
        uint64_t c = huf_code(hcode[i]);
        int l = (int)huf_length(hcode[i]);
        if (l == 0) continue;
        if (c >> l) return false;
        if (l > HUF_DECBITS) {
            HufDec& pl = hdecod[(c >> (l - HUF_DECBITS))];
            if (pl.len) return false;
            pl.lits.push_back(i);
        } else {
            uint64_t base = c << (HUF_DECBITS - l);
            uint64_t count = 1ull << (HUF_DECBITS - l);
            for (uint64_t j = 0; j < count; ++j) {
                HufDec& pl = hdecod[base + j];
                if (pl.len || !pl.lits.empty()) return false;
                pl.len = l;
                pl.lit = i;
            }
        }
    }
    return true;
}

static bool huf_decode(const uint8_t* src, int n_bits, int im, int iM,
                       const std::vector<uint64_t>& hcode,
                       const std::vector<HufDec>& hdecod,
                       uint16_t* out, size_t n_out) {
    uint64_t c = 0;
    int lc = 0;
    size_t oi = 0;
    const uint8_t* p = src;
    const uint8_t* end = src + (n_bits + 7) / 8;
    int rlc = iM;

    auto emit = [&](int s) -> bool {
        if (s == rlc) {
            // run-length escape: next 8 bits = repeat count of previous
            if (lc < 8) {
                if (p >= end) return false;
                c = (c << 8) | *p++;
                lc += 8;
            }
            lc -= 8;
            int cs = (int)((c >> lc) & 0xff);
            if (oi == 0 || oi + cs > n_out) return false;
            uint16_t prev = out[oi - 1];
            for (int k = 0; k < cs; ++k) out[oi++] = prev;
        } else {
            if (oi >= n_out) return false;
            out[oi++] = (uint16_t)s;
        }
        return true;
    };

    while (p < end) {
        c = (c << 8) | *p++;
        lc += 8;
        while (lc >= HUF_DECBITS) {
            const HufDec& pl = hdecod[(c >> (lc - HUF_DECBITS)) & HUF_DECMASK];
            if (pl.len) {
                lc -= pl.len;
                if (!emit(pl.lit)) return false;
            } else {
                bool found = false;
                for (int j : pl.lits) {
                    int l = (int)huf_length(hcode[j]);
                    while (lc < l && p < end) {
                        c = (c << 8) | *p++;
                        lc += 8;
                    }
                    if (lc >= l
                        && huf_code(hcode[j]) == ((c >> (lc - l)) & ((1ull << l) - 1))) {
                        lc -= l;
                        if (!emit(j)) return false;
                        found = true;
                        break;
                    }
                }
                if (!found) return false;
            }
        }
    }
    // flush remaining whole codes in the accumulator
    int tail = (8 - n_bits) & 7;
    c >>= tail;
    lc -= tail;
    while (lc > 0) {
        const HufDec& pl = hdecod[(c << (HUF_DECBITS - lc)) & HUF_DECMASK];
        if (pl.len && pl.len <= lc) {
            lc -= pl.len;
            if (!emit(pl.lit)) return false;
        } else {
            break;
        }
    }
    return oi == n_out;
}

inline void wdec14(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
    int16_t ls = (int16_t)l;
    int16_t hs = (int16_t)h;
    int hi = hs;
    int ai = ls + (hi & 1) + (hi >> 1);
    int16_t as = (int16_t)ai;
    int16_t bs = (int16_t)(ai - hi);
    a = (uint16_t)as;
    b = (uint16_t)bs;
}

constexpr int NBITS16 = 16;
constexpr int A_OFFSET = 1 << (NBITS16 - 1);
constexpr int MOD_MASK = (1 << NBITS16) - 1;

inline void wdec16(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
    int m = l;
    int d = h;
    int bb = (m - (d >> 1)) & MOD_MASK;
    int aa = (d + bb - A_OFFSET) & MOD_MASK;
    b = (uint16_t)bb;
    a = (uint16_t)aa;
}

static void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy,
                        uint16_t mx) {
    bool w14 = mx < (1 << 14);
    int n = nx > ny ? ny : nx;
    int p = 1;
    while (p <= n) p <<= 1;
    p >>= 1;
    int p2 = p;
    p >>= 1;

    while (p >= 1) {
        uint16_t* py = in;
        uint16_t* ey = in + (size_t)oy * (ny - p2);
        int oy1 = oy * p, oy2 = oy * p2;
        int ox1 = ox * p, ox2 = ox * p2;
        uint16_t i00, i01, i10, i11;

        for (; py <= ey; py += oy2) {
            uint16_t* px = py;
            uint16_t* ex = py + (size_t)ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                uint16_t* p01 = px + ox1;
                uint16_t* p10 = px + oy1;
                uint16_t* p11 = p10 + ox1;
                if (w14) {
                    wdec14(*px, *p10, i00, i10);
                    wdec14(*p01, *p11, i01, i11);
                    wdec14(i00, i01, *px, *p01);
                    wdec14(i10, i11, *p10, *p11);
                } else {
                    wdec16(*px, *p10, i00, i10);
                    wdec16(*p01, *p11, i01, i11);
                    wdec16(i00, i01, *px, *p01);
                    wdec16(i10, i11, *p10, *p11);
                }
            }
            if (nx & p) {
                uint16_t* p10 = px + oy1;
                if (w14) wdec14(*px, *p10, i00, i10);
                else wdec16(*px, *p10, i00, i10);
                *px = i00;
                *p10 = i10;
            }
        }
        if (ny & p) {
            uint16_t* px = py;
            uint16_t* ex = py + (size_t)ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                uint16_t* p01 = px + ox1;
                if (w14) wdec14(*px, *p01, i00, i01);
                else wdec16(*px, *p01, i00, i01);
                *px = i00;
                *p01 = i01;
            }
        }
        p2 = p;
        p >>= 1;
    }
}

}  // namespace piz

extern "C" {

// Decode one PIZ block. channels described by nx/ny/size (shorts per sample).
// out: concatenated channel planes (nx*size) * ny shorts each.
// Returns 0 on success, negative error codes otherwise.
int32_t piz_decode(const uint8_t* src, int32_t src_len, int32_t n_channels,
                   const int32_t* nx, const int32_t* ny, const int32_t* size,
                   uint16_t* out) {
    using namespace piz;
    if (src_len < 4) return -1;
    const uint8_t* p = src;
    const uint8_t* end = src + src_len;

    uint16_t min_nz, max_nz;
    memcpy(&min_nz, p, 2);
    memcpy(&max_nz, p + 2, 2);
    p += 4;
    if (max_nz >= 8192) return -2;

    uint8_t bitmap[8192] = {0};
    if (min_nz <= max_nz) {
        int nb = max_nz - min_nz + 1;
        if (p + nb > end) return -3;
        memcpy(bitmap + min_nz, p, nb);
        p += nb;
    }

    // reverse lut
    std::vector<uint16_t> lut(1 << 16);
    int k = 0;
    for (int i = 0; i < (1 << 16); ++i)
        if ((bitmap[i >> 3] & (1 << (i & 7))))
            lut[k++] = (uint16_t)i;
    uint16_t max_value = (uint16_t)(k > 0 ? k - 1 : 0);

    int32_t huf_len;
    if (p + 4 > end) return -4;
    memcpy(&huf_len, p, 4);
    p += 4;
    if (p + huf_len > end) return -5;

    size_t total = 0;
    for (int c = 0; c < n_channels; ++c)
        total += (size_t)nx[c] * ny[c] * size[c];
    std::vector<uint16_t> tmp(total);

    // huffman: header im, iM, tableLength, nBits, reserved
    if (huf_len < 20) return -6;
    int32_t im, iM, nBits;
    memcpy(&im, p, 4);
    memcpy(&iM, p + 4, 4);
    memcpy(&nBits, p + 12, 4);
    if (im < 0 || im >= HUF_ENCSIZE || iM < 0 || iM >= HUF_ENCSIZE) return -7;
    BitReader br{p + 20, p + huf_len};
    std::vector<uint64_t> hcode;
    if (!unpack_enc_table(br, im, iM, hcode)) return -8;
    std::vector<HufDec> hdecod;
    if (!build_dec_table(hcode, im, iM, hdecod)) return -9;
    // data follows the packed table at the reader's current byte position
    const uint8_t* data = br.p;
    if (!huf_decode(data, nBits, im, iM, hcode, hdecod, tmp.data(), total))
        return -10;

    // wavelet per channel plane
    size_t off = 0;
    for (int c = 0; c < n_channels; ++c) {
        int w = nx[c] * size[c];
        wav2_decode(tmp.data() + off, w, 1, ny[c], w, max_value);
        off += (size_t)w * ny[c];
    }
    // apply lut
    for (size_t i = 0; i < total; ++i) tmp[i] = lut[tmp[i]];
    memcpy(out, tmp.data(), total * sizeof(uint16_t));
    return 0;
}

}  // extern "C"
