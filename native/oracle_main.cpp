// Golden-value oracle for the planet_tpu parity tests.
//
// This is NOT product code: it is a headless re-statement of the algorithms
// specified in SURVEY.md (which cites the reference formulas at
// /root/reference/perlin.h:10-88, main.cpp:123-151, 537-598, 689-734,
// 823-832), written fresh so pytest can compare the JAX engine against a
// scalar C build bit-for-bit. It dumps .npy files into the directory given
// as argv[1].
//
// Build: g++ -O2 -o oracle oracle_main.cpp   (see native/Makefile)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

// ---------------------------------------------------------------- npy output

static void npy_write(const std::string &path, const char *descr,
                      const std::vector<size_t> &shape, const void *data,
                      size_t elem_size) {
    std::string dict = "{'descr': '";
    dict += descr;
    dict += "', 'fortran_order': False, 'shape': (";
    size_t count = 1;
    for (size_t i = 0; i < shape.size(); i++) {
        char buf[32];
        snprintf(buf, sizeof buf, "%zu", shape[i]);
        dict += buf;
        if (shape.size() == 1 || i + 1 < shape.size()) dict += ",";
        if (i + 1 < shape.size()) dict += " ";
        count *= shape[i];
    }
    dict += "), }";
    size_t header_len = 10 + dict.size() + 1;       // magic+ver+len + dict + \n
    size_t pad = (64 - header_len % 64) % 64;
    dict.append(pad, ' ');
    dict += '\n';

    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
    const unsigned char magic[8] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0};
    fwrite(magic, 1, 8, f);
    uint16_t hl = (uint16_t)dict.size();
    fwrite(&hl, 2, 1, f);
    fwrite(dict.data(), 1, dict.size(), f);
    fwrite(data, elem_size, count, f);
    fclose(f);
}

static void npy_f32(const std::string &p, const std::vector<size_t> &s,
                    const std::vector<float> &d) { npy_write(p, "<f4", s, d.data(), 4); }
static void npy_f64(const std::string &p, const std::vector<size_t> &s,
                    const std::vector<double> &d) { npy_write(p, "<f8", s, d.data(), 8); }
static void npy_u64(const std::string &p, const std::vector<size_t> &s,
                    const std::vector<uint64_t> &d) { npy_write(p, "<u8", s, d.data(), 8); }
static void npy_i64(const std::string &p, const std::vector<size_t> &s,
                    const std::vector<int64_t> &d) { npy_write(p, "<i8", s, d.data(), 8); }

// ------------------------------------------------------- deterministic PRNG

struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed) {}
    uint64_t next() {
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        return s * 2685821657736338717ULL;
    }
    // uniform double in [0, 1) with 53 random bits — exactly reproducible
    // from integer ops in Python.
    double uniform() { return (double)(next() >> 11) * (1.0 / 9007199254740992.0); }
    double range(double lo, double hi) { return lo + uniform() * (hi - lo); }
    uint64_t below(uint64_t n) { return next() % n; }
};

// ----------------------------------------------------------------- noise

static const unsigned char kPerm[256] = {
    211,222, 90, 42,136, 37,204,126, 22,101,213,137,251, 28,247,205,
    185,176,200,206,243,130,252,188, 19,235,231,  1,170,109, 11, 31,
     58,134,230,148, 65,184,250,226,129,197,135, 99,201,  5, 40,220,
    132,218, 15,110,120,239,151, 35,141, 70,217,  7,107,150,178,162,
    160, 93,164,118,174, 29, 45, 84,207, 81,  8, 64, 43,244,203, 67,
     95, 25, 69,  3,183,242, 94,172,121,144,122,249, 61,159,240, 59,
    193,157,224, 52, 71,112, 32,167,155,165,177,255, 78, 10, 26,149,
    124,133,140,189,233, 60, 96,254, 50,236,131,215, 49, 79, 54,214,
    196,104,234, 18,181, 53,152,116,127, 30,182,  6, 98,146,208,102,
    221,241, 48,228, 73, 82,245,142,105, 80, 34,246, 23,139,238, 97,
     51,190,186,232, 44, 91, 87,173, 16,168, 46, 75,199,138,198, 33,
     24, 66,225,195,169,100, 88,237, 38, 57,  0,  4, 86, 14,253,115,
     47,212,180,171,163, 63,194,227,210, 62, 12, 89,161,192, 39,166,
    128,123, 17,223,106,117,229,108, 76,145,125,219,175, 36,202,114,
    153, 72,209, 27, 83, 85, 13, 68,147,158,187,179,156,154, 56, 77,
     20,143,119,103,113,191,  9, 41, 74,216,  2,111, 21, 92,248, 55,
};

static const float kGrad[16][3] = {
    {1,1,0},{-1,1,0},{1,-1,0},{-1,-1,0},
    {1,0,1},{-1,0,1},{1,0,-1},{-1,0,-1},
    {0,1,1},{0,-1,1},{0,1,-1},{0,-1,-1},
    {1,1,0},{-1,1,0},{0,-1,1},{0,-1,-1},
};

static inline int perm_at(int i) { return kPerm[i & 255]; }

static inline float grad_dot(float x, float y, float z, int ix, int iy, int iz) {
    int h = perm_at(perm_at(perm_at(ix) + iy) + iz);
    const float *g = kGrad[h & 15];
    return x * g[0] + y * g[1] + z * g[2];
}

static float noise3(double x, double y, double z) {
    // cell split: truncation toward zero of a conditionally shifted value
    int ix = (int)((x < 0.0) ? (x - 1.0) : x);
    int iy = (int)((y < 0.0) ? (y - 1.0) : y);
    int iz = (int)((z < 0.0) ? (z - 1.0) : z);
    x -= ix; y -= iy; z -= iz;

    float u = (float)((((x) * 6.0f - 15.0f) * (x) + 10.0f) * (x) * (x) * (x));
    float v = (float)((((y) * 6.0f - 15.0f) * (y) + 10.0f) * (y) * (y) * (y));
    float w = (float)((((z) * 6.0f - 15.0f) * (z) + 10.0f) * (z) * (z) * (z));

    float g000 = grad_dot((float)x,       (float)y,       (float)z,       ix,   iy,   iz);
    float g100 = grad_dot((float)(x - 1), (float)y,       (float)z,       ix+1, iy,   iz);
    float g010 = grad_dot((float)x,       (float)(y - 1), (float)z,       ix,   iy+1, iz);
    float g110 = grad_dot((float)(x - 1), (float)(y - 1), (float)z,       ix+1, iy+1, iz);
    float g001 = grad_dot((float)x,       (float)y,       (float)(z - 1), ix,   iy,   iz+1);
    float g101 = grad_dot((float)(x - 1), (float)y,       (float)(z - 1), ix+1, iy,   iz+1);
    float g011 = grad_dot((float)x,       (float)(y - 1), (float)(z - 1), ix,   iy+1, iz+1);
    float g111 = grad_dot((float)(x - 1), (float)(y - 1), (float)(z - 1), ix+1, iy+1, iz+1);

#define LERP_(a, b, t) ((a) + ((b) - (a)) * (t))
    float x00 = LERP_(g000, g100, u);
    float x10 = LERP_(g010, g110, u);
    float x01 = LERP_(g001, g101, u);
    float x11 = LERP_(g011, g111, u);
    float y0 = LERP_(x00, x10, v);
    float y1 = LERP_(x01, x11, v);
    return LERP_(y0, y1, w);
#undef LERP_
}

static float fbm(double x, double y, double z, double lac, float gain, int oct) {
    double freq = 1.0;
    float amp = 1.0f, value = 0.0f;
    for (int i = 0; i < oct; i++) {
        value += noise3(x * freq, y * freq, z * freq) * amp;
        freq *= lac;
        amp *= gain;
    }
    return value;
}

static float ridged(double x, double y, double z, double lac, float gain, int oct) {
    const float offset = 1.0f;
    double freq = 1.0;
    float amp = 1.0f, weight = 1.0f, value = 0.0f;
    for (int i = 0; i < oct; i++) {
        float n = noise3(x * freq, y * freq, z * freq);
        if (n < 0.0f) n = -n;
        n = offset - n;
        n = n * n;
        value += n * amp * weight;
        weight = n;
        freq *= lac;
        amp *= gain;
    }
    return value;
}

// ----------------------------------------------------------- terrain functor

struct V3d { double x, y, z; };
static inline V3d v3(double x, double y, double z) { return {x, y, z}; }
static inline V3d operator+(V3d a, V3d b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
static inline V3d operator-(V3d a, V3d b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
static inline V3d operator*(V3d a, double s) { return {a.x*s, a.y*s, a.z*s}; }
static inline double dot(V3d a, V3d b) { return a.x*b.x + a.y*b.y + a.z*b.z; }
static inline V3d normalize(V3d a) {
    double len = sqrt(dot(a, a));
    return {a.x / len, a.y / len, a.z / len};
}

static float terrain_height(V3d p, int depth, int max_depth) {
    int octaves = 6 + 12 * depth / max_depth;
    p = p * 0.00001;
    return ridged(p.x, p.y, p.z, 2.0f, 0.55f, octaves) * 8848.0f;
}

// --------------------------------------------------- quadtree / cube sphere

static const double kRadius = 6371000.0;
static const int kMaxLod = 18;   // (int)(log2(2*pi*R/29) - 2) for R=6371 km

struct QID { uint64_t v; };

static QID root_id(uint64_t face) {
    return { (1ULL << 63) | (face << 60) };
}
static uint64_t id_depth(QID q) { return (q.v >> 55) & 31ULL; }
static QID child_id(QID q, uint64_t child) {
    uint64_t depth = id_depth(q);
    return { (q.v + (1ULL << 55)) | (child << (2 * depth)) };
}

struct OQuad { V3d p[4]; QID id; };

// Root quads: cube corners normalized to the sphere, with the reference's
// per-face winding (corner order a, b, d, c of the face loop).
static void root_quads(OQuad out[6]) {
    V3d c[8];
    int k = 0;
    for (int z = -1; z <= 1; z += 2)
        for (int y = -1; y <= 1; y += 2)
            for (int x = -1; x <= 1; x += 2)
                c[k++] = normalize(v3(0, 0, 0) + v3((double)x, (double)y, (double)z)) * kRadius;
    // index mapping for the loop order above: (x,y,z) -> bit0=x+, bit1=y+, bit2=z+
    // reference vertex numbering: 0:(-1,-1,-1) 1:(1,-1,-1) 2:(1,1,-1) 3:(-1,1,-1)
    //                             4:(-1,-1,1) 5:(1,-1,1) 6:(1,1,1) 7:(-1,1,1)
    int map[8] = {0, 1, 3, 2, 4, 5, 7, 6};
    V3d vts[8];
    for (int i = 0; i < 8; i++) vts[map[i]] = c[i];

    int faces[6][4] = {
        {0, 1, 2, 3},  // front
        {1, 5, 6, 2},  // right
        {5, 4, 7, 6},  // back
        {4, 0, 3, 7},  // left
        {3, 2, 6, 7},  // top
        {4, 5, 1, 0},  // bottom
    };
    for (int f = 0; f < 6; f++) {
        // (a, b, d, c): third and fourth swapped relative to the loop
        out[f].p[0] = vts[faces[f][0]];
        out[f].p[1] = vts[faces[f][1]];
        out[f].p[2] = vts[faces[f][3]];
        out[f].p[3] = vts[faces[f][2]];
        out[f].id = root_id((uint64_t)f);
    }
}

// Children of a quad: edge midpoints and center re-projected to the sphere.
static void subdivide(const OQuad &q, OQuad out[4]) {
    V3d mid = normalize(q.p[0] + q.p[1] + q.p[2] + q.p[3]) * kRadius;
    V3d e01 = normalize(q.p[0] + q.p[1]) * kRadius;
    V3d e02 = normalize(q.p[0] + q.p[2]) * kRadius;
    V3d e13 = normalize(q.p[1] + q.p[3]) * kRadius;
    V3d e23 = normalize(q.p[2] + q.p[3]) * kRadius;
    V3d g[9] = { q.p[0], e01, q.p[1], e02, mid, e13, q.p[2], e23, q.p[3] };
    int sel[4][4] = { {0,1,3,4}, {1,2,4,5}, {3,4,6,7}, {4,5,7,8} };
    for (int ci = 0; ci < 4; ci++) {
        for (int j = 0; j < 4; j++) out[ci].p[j] = g[sel[ci][j]];
        out[ci].id = child_id(q.id, (uint64_t)ci);
    }
}

// LOD refinement (reference ProcessQuad, main.cpp:537-598).
static void refine(const OQuad &q, V3d cam, int lod,
                   std::vector<OQuad> &leaves) {
    if (lod == 0) { leaves.push_back(q); return; }

    V3d mid_n = normalize(q.p[0] + q.p[1] + q.p[2] + q.p[3]);
    V3d mid = mid_n * kRadius;

    V3d probes[5];
    for (int i = 0; i < 4; i++) {
        float h = terrain_height(q.p[i], 0, 1);
        probes[i] = q.p[i] + normalize(q.p[i]) * (double)h;
    }
    float hm = terrain_height(mid, 0, 1);
    probes[4] = mid + mid_n * (double)hm;

    V3d d30 = probes[3] - probes[0];
    V3d d21 = probes[2] - probes[1];
    double d = (dot(d30, d30) + dot(d21, d21)) / (1.0 + 2.5 * lod / kMaxLod);

    bool split = false;
    for (int i = 0; i < 5; i++) {
        V3d dc = probes[i] - cam;
        if (dot(dc, dc) * 2.0 < d) { split = true; break; }
    }
    if (!split) { leaves.push_back(q); return; }

    OQuad kids[4];
    subdivide(q, kids);
    for (int i = 0; i < 4; i++) refine(kids[i], cam, lod - 1, leaves);
}

// Tile rasterization (reference GenerateHeightMap, main.cpp:123-151).
static void gen_tile(const OQuad &q, int dim, int max_depth, float *out) {
    int depth = (int)id_depth(q.id);
    V3d du0 = q.p[1] - q.p[0];
    V3d du1 = q.p[3] - q.p[2];
    double div = 1.0 / (dim - 3);
    for (int y = 0; y < dim; y++) {
        for (int x = 0; x < dim; x++) {
            double u = (x - 1) * div;
            double v = (y - 1) * div;
            V3d a = q.p[0] + du0 * u;
            V3d b = q.p[2] + du1 * u;
            V3d dv = b - a;
            V3d p = a + dv * v;
            out[y * dim + x] = terrain_height(p, depth, max_depth);
        }
    }
}

// ------------------------------------------------- tessellation (f32 spec)
//
// Scalar restatement of the vertex program specified by the reference's
// embedded GLSL (main.cpp:286-367) and fragment shade (main.cpp:369-381),
// in float like the GPU: slerp corner interpolation with linear fallback,
// bilinear CLAMP_TO_EDGE tile sampling, central-difference normals + TBN,
// camera-relative clip transform.

struct V3f { float x, y, z; };
static inline V3f v3f(float x, float y, float z) { return {x, y, z}; }
static inline V3f operator+(V3f a, V3f b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
static inline V3f operator-(V3f a, V3f b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
static inline V3f operator*(V3f a, float s) { return {a.x*s, a.y*s, a.z*s}; }
static inline float dotf(V3f a, V3f b) { return a.x*b.x + a.y*b.y + a.z*b.z; }
static inline float lenf(V3f a) { return sqrtf(dotf(a, a)); }
static inline V3f normf(V3f a) { float l = lenf(a); return {a.x/l, a.y/l, a.z/l}; }
static inline V3f crossf(V3f a, V3f b) {
    return {a.y*b.z - a.z*b.y, a.z*b.x - a.x*b.z, a.x*b.y - a.y*b.x};
}
static inline float lerpf(float a, float b, float t) { return a + (b - a) * t; }
static inline V3f lerpv(V3f a, V3f b, float t) { return a + (b - a) * t; }

struct PN { V3f p, n; };

static PN interp_pn(PN v0, PN v1, float t) {
    if (1.0f - dotf(v0.n, v1.n) < 0.001f) {
        return { lerpv(v0.p, v1.p, t), normf(lerpv(v0.n, v1.n, t)) };
    }
    float theta2 = acosf(dotf(v0.n, v1.n));
    float k = 1.0f - t;
    V3f n = normf(v0.n * sinf(k * theta2) + v1.n * sinf(t * theta2));
    float theta = theta2 * 0.5f;
    float gamma = theta - theta2 * t;
    float tan_theta = tanf(theta);
    float x = 1.0f - tanf(gamma) / tan_theta;
    float y = 1.0f / sinf(theta) - 1.0f / (cosf(gamma) * tan_theta);
    V3f v = (v1.p - v0.p) * 0.5f;
    V3f p = v0.p + v * x + n * (y * lenf(v));
    return { p, n };
}

static float tile_sample(const float *tile, int dim, float u, float v) {
    // GL_LINEAR + CLAMP_TO_EDGE, texel centers at (i + 0.5) / dim
    float su = u * dim - 0.5f, sv = v * dim - 0.5f;
    float fu = floorf(su), fv = floorf(sv);
    float ax = su - fu, ay = sv - fv;
    int x0 = (int)fu, y0 = (int)fv;
    int x1 = x0 + 1, y1 = y0 + 1;
    if (x0 < 0) x0 = 0; if (x0 > dim-1) x0 = dim-1;
    if (x1 < 0) x1 = 0; if (x1 > dim-1) x1 = dim-1;
    if (y0 < 0) y0 = 0; if (y0 > dim-1) y0 = dim-1;
    if (y1 < 0) y1 = 0; if (y1 > dim-1) y1 = dim-1;
    float t00 = tile[y0*dim + x0], t10 = tile[y0*dim + x1];
    float t01 = tile[y1*dim + x0], t11 = tile[y1*dim + x1];
    return lerpf(lerpf(t00, t10, ax), lerpf(t01, t11, ax), ay);
}

typedef float M4[4][4];   // math row-major: out = M @ v

static void mat4_mulv(const M4 m, const float v[4], float out[4]) {
    for (int r = 0; r < 4; r++)
        out[r] = m[r][0]*v[0] + m[r][1]*v[1] + m[r][2]*v[2] + m[r][3]*v[3];
}

static void mat4_mul(const M4 a, const M4 b, M4 out) {
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++) {
            out[r][c] = 0.0f;
            for (int k = 0; k < 4; k++) out[r][c] += a[r][k]*b[k][c];
        }
}

// ------------------------------------------------ raster (coverage spec)
//
// Scalar restatement of the exact-coverage raster spec shared with
// planet_tpu/raster/coverage.py (itself the TPU re-expression of the
// reference's GL draw: strip main.cpp:427-474, GL state main.cpp:811-816,
// fragment shade main.cpp:369-381): 1/16-subpixel snapped f32 edge
// functions, top-left fill rule in y-down screen space, CW-front culling,
// perspective-correct normal interpolation, packed (21-bit depth, 10-bit
// shade) LEQUAL depth test.

static const int32_t kEmpty = 0x7fffffff;
static const int kDepthBits = 21, kShadeBits = 10;

static inline float snap16(float v) { return rintf(v * 16.0f) * 0.0625f; }

// snapped screen + varyings; w = clip w (= z_view) for the view-space
// far-straddle test (round 5)
struct RVert { float x, y, z, iw, w; V3f niw; };

// triangle strip of the reference patch (main.cpp:427-474), decoded to a
// parity-normalized triangle list over the 1020-entry vertex list
static std::vector<uint32_t> build_strip(int n) {
    std::vector<uint32_t> idx;
    int quads = n - 1;
    uint32_t v0 = 0, v1 = (uint32_t)(n + 1);
    for (int i = 0; i < n; i++) { idx.push_back(v0++); idx.push_back(v1++); }
    idx.push_back(v1 - 1); idx.push_back(v0);        // degenerate reset
    v1++;
    for (int y = 0; y < quads; y++) {
        for (int i = 0; i < n + 2; i++) { idx.push_back(v0++); idx.push_back(v1++); }
        if (y + 1 < quads) { idx.push_back(v1 - 1); idx.push_back(v0); }
    }
    v0++;
    idx.push_back(v1 - 1); idx.push_back(v0);
    for (int i = 0; i < n; i++) { idx.push_back(v0++); idx.push_back(v1++); }
    return idx;
}

static std::vector<uint32_t> strip_triangles(const std::vector<uint32_t> &s) {
    std::vector<uint32_t> tris;   // flat (T*3)
    for (size_t k = 0; k + 2 < s.size(); k++) {
        uint32_t a = s[k], b = s[k + 1], c = s[k + 2];
        if (k & 1) { uint32_t t = a; a = b; b = t; }   // strip parity
        if (a == b || b == c || a == c) continue;       // degenerate
        tris.push_back(a); tris.push_back(b); tris.push_back(c);
    }
    return tris;
}

static inline bool edge_accept(float e, float dx, float dy) {
    // top-left rule on the orientation-normalized direction (y-down)
    bool topleft = (dy < 0.0f) || (dy == 0.0f && dx > 0.0f);
    return e > 0.0f || (e == 0.0f && topleft);
}

// the reference's far plane (main.cpp:1075); the render-golden scenes
// project with it and raster_tri far-clips against it in view space
static const double kFarPlane = 20000000.0;
// fragments rejected by the far-plane test in raster_tri — the farclip_
// golden asserts the scene actually exercises the far clip
static long g_farclip_rejects = 0;

static int raster_tri(const RVert v[3], int width, int height,
                      int32_t *buf, long *frag_count) {
    // returns 1 iff the triangle survived cull (front-facing, nonempty
    // clamped bbox) and was scanned — the "live" notion the TPU record
    // kernels use
    // GL_CW front in y-up window coords has POSITIVE shoelace area2 in
    // y-down screen numbers (round 5 sign fix — spec derivation:
    // planet_tpu/raster/coverage.py FRONT_SIGN comment)
    const float FS = 1.0f;
    float area2 = ((v[1].x - v[0].x) * (v[2].y - v[0].y)
                   - (v[1].y - v[0].y) * (v[2].x - v[0].x)) * FS;
    if (!(area2 > 0.0f)) return 0;
    float minx = v[0].x, maxx = v[0].x, miny = v[0].y, maxy = v[0].y;
    for (int i = 1; i < 3; i++) {
        if (v[i].x < minx) minx = v[i].x;
        if (v[i].x > maxx) maxx = v[i].x;
        if (v[i].y < miny) miny = v[i].y;
        if (v[i].y > maxy) maxy = v[i].y;
    }
    int px0 = (int)ceilf(minx - 0.5f); if (px0 < 0) px0 = 0;
    int px1 = (int)floorf(maxx - 0.5f); if (px1 > width - 1) px1 = width - 1;
    int py0 = (int)ceilf(miny - 0.5f); if (py0 < 0) py0 = 0;
    int py1 = (int)floorf(maxy - 0.5f); if (py1 > height - 1) py1 = height - 1;
    if (px0 > px1 || py0 > py1) return 0;

    float inv_area = 1.0f / area2;
    // GL far clip (round 5), in VIEW space — NDC z is sub-f32-ulp at
    // far/near = 2e7 (spec: planet_tpu/raster/coverage.py module
    // docstring): a triangle with a vertex at w > far clips fragments
    // where interpolated 1/w < 1/far; fully-inside triangles keep GL's
    // depth-clamp (a fragment rounding past z=1 clamps into the last
    // quantum below, never discards).
    bool farstraddle = v[0].w > (float)kFarPlane || v[1].w > (float)kFarPlane
                       || v[2].w > (float)kFarPlane;
    float ilim = farstraddle ? (float)(1.0 / kFarPlane) : -1.0f;
    const float lx = 0.0f;
    const float ly = (float)(1.0 / sqrt(2.0)), lz = -(float)(1.0 / sqrt(2.0));
    for (int py = py0; py <= py1; py++) {
        for (int px = px0; px <= px1; px++) {
            float pcx = (float)px + 0.5f, pcy = (float)py + 0.5f;
            float e[3]; bool ok = true;
            for (int i = 0; i < 3 && ok; i++) {
                int a = (i + 1) % 3, b = (i + 2) % 3;   // edge opposite i
                float dx = v[b].x - v[a].x, dy = v[b].y - v[a].y;
                e[i] = (dx * (pcy - v[a].y) - dy * (pcx - v[a].x)) * FS;
                ok = edge_accept(e[i], dx * FS, dy * FS);
            }
            if (!ok) continue;
            float l0 = e[0] * inv_area, l1 = e[1] * inv_area, l2 = e[2] * inv_area;
            float z = l0 * v[0].z + l1 * v[1].z + l2 * v[2].z;
            float iw = l0 * v[0].iw + l1 * v[1].iw + l2 * v[2].iw;
            if (!(iw > 0.0f) || z < -1.0f) continue;
            if (!(iw > ilim)) { g_farclip_rejects++; continue; }
            V3f n = v[0].niw * l0 + v[1].niw * l1 + v[2].niw * l2;
            n.x /= iw; n.y /= iw; n.z /= iw;
            float nlen = lenf(n);
            float ndl = (n.x * lx + n.y * ly + n.z * lz) / (nlen > 0 ? nlen : 1.0f);
            float shade = sqrtf(0.001f + fmaxf(0.0f, ndl));
            int32_t zq = (int32_t)((z * 0.5f + 0.5f) * (float)((1 << kDepthBits) - 1));
            if (zq < 0) zq = 0;
            // clamp to 2^21 - 2: the all-ones word is the empty sentinel
            if (zq > (1 << kDepthBits) - 2) zq = (1 << kDepthBits) - 2;
            int32_t sq = (int32_t)(shade * (float)((1 << kShadeBits) - 1));
            if (sq < 0) sq = 0;
            if (sq > (1 << kShadeBits) - 1) sq = (1 << kShadeBits) - 1;
            int32_t packed = (zq << kShadeBits) | sq;
            int32_t &slot = buf[py * width + px];
            if (packed < slot) slot = packed;
            (*frag_count)++;
        }
    }
    return 1;
}

// Near-plane Sutherland-Hodgman clip (spec shared with
// planet_tpu/raster/nearclip.py): with the engine projection (w' = z_view)
// the near plane is the half-space f = z + w >= 0, so clipping there
// yields vertices with w = z_view >= near — always projectable. Clip
// positions and normals interpolate linearly in clip space (GL's rule).
struct CVert { float c[4]; V3f n; };

static int clip_near(const CVert in[3], const float f[3], int cnt,
                     CVert outA[3], CVert outB[3]) {
    // rotate so the distinguished vertex (single inside for cnt==1,
    // single outside for cnt==2) is v0 — winding preserved
    int rot;
    if (cnt == 1) rot = (f[0] > 0.0f) ? 0 : ((f[1] > 0.0f) ? 1 : 2);
    else rot = !(f[0] > 0.0f) ? 0 : (!(f[1] > 0.0f) ? 1 : 2);
    CVert v0 = in[rot], v1 = in[(rot + 1) % 3], v2 = in[(rot + 2) % 3];
    float f0 = f[rot], f1 = f[(rot + 1) % 3], f2 = f[(rot + 2) % 3];
    float t01 = f0 / (f0 - f1);
    float t20 = f2 / (f2 - f0);
    CVert i01, i20;
    for (int k = 0; k < 4; k++) {
        i01.c[k] = v0.c[k] + (v1.c[k] - v0.c[k]) * t01;
        i20.c[k] = v2.c[k] + (v0.c[k] - v2.c[k]) * t20;
    }
    i01.n = v0.n + (v1.n - v0.n) * t01;
    i20.n = v2.n + (v0.n - v2.n) * t20;
    if (cnt == 1) {
        outA[0] = v0; outA[1] = i01; outA[2] = i20;
        return 1;
    }
    outA[0] = i01; outA[1] = v1; outA[2] = v2;
    outB[0] = i01; outB[1] = v2; outB[2] = i20;
    return 2;
}

// Vertex program for one patch vertex (the section-7 math as a function):
// slerp corner interpolation, tile displacement + skirt, TBN normal, clip.
struct VOut { V3f world, normal; float clip[4]; };

static VOut tess_vertex(const V3f P[4], const V3f N[4], const float *tile,
                        int dim, float u, float v, float s, float skirt,
                        const M4 viewproj) {
    PN a = {P[0], N[0]}, b = {P[1], N[1]};
    PN c = {P[2], N[2]}, d = {P[3], N[3]};
    PN p = interp_pn(a, b, u);
    PN qq = interp_pn(c, d, u);
    PN vv = interp_pn(p, qq, v);

    float c0u = 1.5f / dim, c1u = (dim - 1.5f) / dim;
    float px = 1.0f / dim, py = 1.0f / dim;
    float tu = lerpf(c0u, c1u, u);
    float tv = lerpf(c0u, c1u, v);
    float h = tile_sample(tile, dim, tu, tv) - skirt * s;
    float x0 = tile_sample(tile, dim, tu - px, tv);
    float x1 = tile_sample(tile, dim, tu + px, tv);
    float y0 = tile_sample(tile, dim, tu, tv - py);
    float y1 = tile_sample(tile, dim, tu, tv + py);
    float xyscale = lenf(qq.p - p.p) / 29.0f;
    V3f ntan = normf(v3f(x0 - x1, 2.0f * xyscale, y0 - y1));
    V3f tv3 = normf(crossf(vv.n, qq.p - p.p));
    V3f bi = normf(crossf(tv3, vv.n));
    VOut out;
    out.normal = normf(tv3 * ntan.x + vv.n * ntan.y + bi * ntan.z);
    out.world = vv.p + vv.n * h;
    float v4[4] = {out.world.x, out.world.y, out.world.z, 1.0f};
    mat4_mulv(viewproj, v4, out.clip);
    return out;
}

// ----------------------------------------------------------------- goldens

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: oracle OUT_DIR\n"); return 1; }
    std::string dir = argv[1];
    dir += "/";

    // 1. raw noise at unit scale, including negative coords
    {
        Rng rng(0x9E3779B97F4A7C15ULL);
        const size_t N = 4096;
        std::vector<double> pts(N * 3);
        std::vector<float> vals(N);
        for (size_t i = 0; i < N * 3; i++) pts[i] = rng.range(-70.0, 70.0);
        for (size_t i = 0; i < N; i++)
            vals[i] = noise3(pts[3*i], pts[3*i+1], pts[3*i+2]);
        npy_f64(dir + "pts_unit.npy", {N, 3}, pts);
        npy_f32(dir + "perlin3_unit.npy", {N}, vals);
    }

    // 2. special boundary points
    {
        double sp[] = {0.0, -0.0, 1.0, -1.0, -2.0, 2.0, 0.5, -0.5, 2.5, -2.5,
                       255.25, 256.75, -255.25, -256.75, 1e-9, -1e-9,
                       1.9999999, -1.9999999, 63.999999, -63.999999};
        const size_t K = sizeof(sp) / sizeof(sp[0]);
        std::vector<double> pts;
        std::vector<float> vals;
        for (size_t i = 0; i < K; i++)
            for (size_t j = 0; j < K; j++) {
                double x = sp[i], y = sp[j], z = sp[(i + j) % K];
                pts.push_back(x); pts.push_back(y); pts.push_back(z);
                vals.push_back(noise3(x, y, z));
            }
        npy_f64(dir + "pts_special.npy", {K * K, 3}, pts);
        npy_f32(dir + "perlin3_special.npy", {K * K}, vals);
    }

    // 3. octave wrappers
    {
        Rng rng(0xA5A5A5A55A5A5A5AULL);
        const size_t N = 2048;
        std::vector<double> pts(N * 3);
        for (size_t i = 0; i < N * 3; i++) pts[i] = rng.range(-64.0, 64.0);
        npy_f64(dir + "pts_fbm.npy", {N, 3}, pts);

        std::vector<float> a(N), b(N), c(N), d(N), e(N);
        for (size_t i = 0; i < N; i++) {
            double x = pts[3*i], y = pts[3*i+1], z = pts[3*i+2];
            a[i] = fbm(x, y, z, 2.0, 0.5f, 4);
            b[i] = fbm(x, y, z, 2.0, 0.55f, 6);
            c[i] = ridged(x, y, z, 2.0, 0.55f, 6);
            d[i] = ridged(x, y, z, 2.0, 0.55f, 18);
            e[i] = fbm(x, y, z, 1.7, 0.5f, 5);
        }
        npy_f32(dir + "fbm_o4_g05.npy", {N}, a);
        npy_f32(dir + "fbm_o6_g055.npy", {N}, b);
        npy_f32(dir + "ridged_o6_g055.npy", {N}, c);
        npy_f32(dir + "ridged_o18_g055.npy", {N}, d);
        npy_f32(dir + "fbm_lac17_o5.npy", {N}, e);
    }

    // 4. terrain functor at planet scale
    {
        Rng rng(0x1234567812345678ULL);
        const size_t N = 1024;
        std::vector<double> pts(N * 3);
        std::vector<float> h0(N), h6(N), h18(N);
        for (size_t i = 0; i < N; i++) {
            V3d dirv = normalize(v3(rng.range(-1, 1), rng.range(-1, 1), rng.range(-1, 1)));
            double r = rng.range(6.3e6, 6.4e6);
            V3d p = dirv * r;
            pts[3*i] = p.x; pts[3*i+1] = p.y; pts[3*i+2] = p.z;
            h0[i] = terrain_height(p, 0, 1);
            h6[i] = terrain_height(p, 6, 18);
            h18[i] = terrain_height(p, 18, 18);
        }
        npy_f64(dir + "pts_sphere.npy", {N, 3}, pts);
        npy_f32(dir + "terrain_d0_md1.npy", {N}, h0);
        npy_f32(dir + "terrain_d6_md18.npy", {N}, h6);
        npy_f32(dir + "terrain_d18_md18.npy", {N}, h18);
    }

    // 5. heightmap tiles along deterministic quadtree paths
    {
        Rng rng(0xDEADBEEFCAFEF00DULL);
        OQuad roots[6];
        root_quads(roots);

        const int dim = 32;
        std::vector<int64_t> paths;       // (T, 1+18): root, then digits, -1 pad
        std::vector<double> corners;      // (T, 4, 3)
        std::vector<float> tiles;         // (T, dim, dim)
        std::vector<uint64_t> ids;
        size_t T = 0;

        for (int depth = 0; depth <= kMaxLod; depth++) {
            int reps = depth == 0 ? 6 : 2;
            for (int r = 0; r < reps; r++) {
                uint64_t face = depth == 0 ? (uint64_t)r : rng.below(6);
                OQuad q = roots[face];
                paths.push_back((int64_t)face);
                for (int d = 0; d < kMaxLod; d++) {
                    if (d < depth) {
                        uint64_t ci = rng.below(4);
                        OQuad kids[4];
                        subdivide(q, kids);
                        q = kids[ci];
                        paths.push_back((int64_t)ci);
                    } else {
                        paths.push_back(-1);
                    }
                }
                for (int j = 0; j < 4; j++) {
                    corners.push_back(q.p[j].x);
                    corners.push_back(q.p[j].y);
                    corners.push_back(q.p[j].z);
                }
                std::vector<float> tile(dim * dim);
                gen_tile(q, dim, kMaxLod, tile.data());
                tiles.insert(tiles.end(), tile.begin(), tile.end());
                ids.push_back(q.id.v);
                T++;
            }
        }
        npy_i64(dir + "tile_paths.npy", {T, (size_t)(1 + kMaxLod)}, paths);
        npy_f64(dir + "tile_corners.npy", {T, 4, 3}, corners);
        npy_f32(dir + "tiles32.npy", {T, (size_t)dim, (size_t)dim}, tiles);
        npy_u64(dir + "tile_ids.npy", {T}, ids);
    }

    // 6. LOD refinement leaf sets for fixed cameras
    {
        double cams[][3] = {
            {0.0, 0.0, -(kRadius + 10.0)},
            {0.0, 0.0, -(kRadius + 5000.0)},
            {0.0, 0.0, -3.0 * kRadius},
            {kRadius * 0.8, kRadius * 0.75, kRadius * 0.3},
        };
        const size_t C = sizeof(cams) / sizeof(cams[0]);
        std::vector<double> cam_flat;
        std::vector<int64_t> counts;
        std::vector<uint64_t> all_ids;

        OQuad roots[6];
        root_quads(roots);
        for (size_t c = 0; c < C; c++) {
            V3d cam = v3(cams[c][0], cams[c][1], cams[c][2]);
            cam_flat.push_back(cam.x); cam_flat.push_back(cam.y); cam_flat.push_back(cam.z);
            std::vector<OQuad> leaves;
            for (int f = 0; f < 6; f++) refine(roots[f], cam, kMaxLod, leaves);
            counts.push_back((int64_t)leaves.size());
            for (auto &q : leaves) all_ids.push_back(q.id.v);
        }
        npy_f64(dir + "lod_cams.npy", {C, 3}, cam_flat);
        npy_i64(dir + "lod_leaf_counts.npy", {C}, counts);
        npy_u64(dir + "lod_leaf_ids.npy", {all_ids.size()}, all_ids);
    }

    // 7. tessellation vertex-program goldens
    {
        const int dim = 32;
        const int n = 30;                 // patch_size_in_verts
        const int nverts = n*n + 4*n;     // 1020

        // deterministic quad set: fixed paths at several depths
        const int T = 5;
        int depths[T] = {0, 2, 6, 10, 16};
        int digits[T][16] = {
            {},
            {3, 0},
            {0, 1, 2, 3, 1, 2},
            {2, 2, 1, 0, 3, 1, 0, 2, 3, 1},
            {1, 3, 0, 2, 1, 0, 3, 2, 1, 0, 2, 3, 0, 1, 2, 3},
        };

        OQuad roots[6];
        root_quads(roots);
        std::vector<OQuad> quads(T);
        std::vector<int64_t> paths;
        for (int t = 0; t < T; t++) {
            OQuad q = roots[t % 6];
            paths.push_back((int64_t)(t % 6));
            for (int d = 0; d < 18; d++) {
                if (d < depths[t]) {
                    OQuad kids[4];
                    subdivide(q, kids);
                    q = kids[digits[t][d]];
                    paths.push_back((int64_t)digits[t][d]);
                } else {
                    paths.push_back(-1);
                }
            }
            quads[t] = q;
        }

        // camera above quad 0's center
        V3d c0 = normalize(quads[2].p[0] + quads[2].p[1] +
                           quads[2].p[2] + quads[2].p[3]);
        V3d cam_pos = c0 * (kRadius + 2500.0);
        float angles[3] = {0.15f, 0.6f, 0.05f};

        // world rotation: base tangent frame (+Euler Y,X,Z), math row-major
        float rot[3][3];
        {
            V3f up = normf(v3f((float)cam_pos.x, (float)cam_pos.y, (float)cam_pos.z));
            V3f yaxis = v3f(0, 1, 0);
            V3f right = (1.0f - dotf(up, yaxis) < 0.1f)
                ? normf(crossf(up, v3f(0, 0, 1)))
                : normf(crossf(up, yaxis));
            V3f fwd = normf(crossf(right, up));
            float base[3][3] = {
                {right.x, up.x, fwd.x},
                {right.y, up.y, fwd.y},
                {right.z, up.z, fwd.z},
            };
            float sy = sinf(angles[1]), cy = cosf(angles[1]);
            float sx = sinf(angles[0]), cx = cosf(angles[0]);
            float sz = sinf(angles[2]), cz = cosf(angles[2]);
            float ry[3][3] = {{cy,0,sy},{0,1,0},{-sy,0,cy}};
            float rx[3][3] = {{1,0,0},{0,cx,-sx},{0,sx,cx}};
            float rz[3][3] = {{cz,-sz,0},{sz,cz,0},{0,0,1}};
            float tmp[3][3], tmp2[3][3];
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) {
                tmp[r][c] = 0;
                for (int k = 0; k < 3; k++) tmp[r][c] += ry[r][k]*rx[k][c];
            }
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) {
                tmp2[r][c] = 0;
                for (int k = 0; k < 3; k++) tmp2[r][c] += tmp[r][k]*rz[k][c];
            }
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) {
                rot[r][c] = 0;
                for (int k = 0; k < 3; k++) rot[r][c] += base[r][k]*tmp2[k][c];
            }
        }

        M4 proj = {}, view = {}, viewproj;
        {
            double fovy = 50.0 * (3.14159265358979323846 / 180.0);
            float pf = 1.0f / tanf(0.5f * (float)fovy);
            double f = 20000000.0, nr = 1.0;
            proj[0][0] = pf / (800.0f / 600.0f);
            proj[1][1] = pf;
            proj[2][2] = (float)((f + nr) / (f - nr));
            proj[3][2] = 1.0f;
            proj[2][3] = (float)(-2.0 * f * nr / (f - nr));
            for (int r = 0; r < 3; r++)
                for (int c = 0; c < 3; c++) view[r][c] = rot[c][r];  // transpose
            view[3][3] = 1.0f;
            mat4_mul(proj, view, viewproj);
        }

        double max_skirt = (2.0 * 3.14159265358979323846 * kRadius)
                           / (4.0 * 29.0) * 0.00001 * 8.0 * 8848.0;

        // vertex list in reference order (u, v, skirt)
        std::vector<float> vlist;
        {
            double div = 1.0 / (n - 1);
            for (int x = 0; x < n; x++) {
                vlist.push_back((float)(x*div)); vlist.push_back(0.0f); vlist.push_back(1.0f);
            }
            for (int y = 0; y < n; y++) {
                vlist.push_back(0.0f); vlist.push_back((float)(y*div)); vlist.push_back(1.0f);
                for (int x = 0; x < n; x++) {
                    vlist.push_back((float)(x*div)); vlist.push_back((float)(y*div)); vlist.push_back(0.0f);
                }
                vlist.push_back(1.0f); vlist.push_back((float)(y*div)); vlist.push_back(1.0f);
            }
            for (int x = 0; x < n; x++) {
                vlist.push_back((float)(x*div)); vlist.push_back(1.0f); vlist.push_back(1.0f);
            }
        }

        std::vector<float> Ps, Ns, tiles, skirts;
        std::vector<float> world, normal_out, height_out, clip_out, shade_out;

        for (int t = 0; t < T; t++) {
            const OQuad &q = quads[t];
            V3f P[4], N[4];
            for (int j = 0; j < 4; j++) {
                V3d rel = q.p[j] - cam_pos;
                P[j] = v3f((float)rel.x, (float)rel.y, (float)rel.z);
                V3d nd = normalize(q.p[j]);
                N[j] = v3f((float)nd.x, (float)nd.y, (float)nd.z);
                Ps.push_back(P[j].x); Ps.push_back(P[j].y); Ps.push_back(P[j].z);
                Ns.push_back(N[j].x); Ns.push_back(N[j].y); Ns.push_back(N[j].z);
            }

            std::vector<float> tile(dim*dim);
            gen_tile(q, dim, kMaxLod, tile.data());
            tiles.insert(tiles.end(), tile.begin(), tile.end());

            float skirt = (float)max_skirt;
            int d1 = depths[t] - 1;
            if (d1 > 0) skirt /= (float)(2 << d1);
            skirts.push_back(skirt);

            float c0u = 1.5f / dim, c1u = (dim - 1.5f) / dim;
            float px = 1.0f / dim, py = 1.0f / dim;
            V3f l = normf(v3f(0.0f, 1.0f, -1.0f));

            for (int vi = 0; vi < nverts; vi++) {
                float u = vlist[vi*3], v = vlist[vi*3+1], s = vlist[vi*3+2];
                PN a = {P[0], N[0]}, b = {P[1], N[1]};
                PN c = {P[2], N[2]}, d = {P[3], N[3]};
                PN p = interp_pn(a, b, u);
                PN qq = interp_pn(c, d, u);
                PN vv = interp_pn(p, qq, v);

                float tu = lerpf(c0u, c1u, u);
                float tv = lerpf(c0u, c1u, v);
                float h = tile_sample(tile.data(), dim, tu, tv) - skirt * s;
                float x0 = tile_sample(tile.data(), dim, tu - px, tv);
                float x1 = tile_sample(tile.data(), dim, tu + px, tv);
                float y0 = tile_sample(tile.data(), dim, tu, tv - py);
                float y1 = tile_sample(tile.data(), dim, tu, tv + py);
                float xyscale = lenf(qq.p - p.p) / 29.0f;
                V3f ntan = normf(v3f(x0 - x1, 2.0f * xyscale, y0 - y1));
                V3f tv3 = normf(crossf(vv.n, qq.p - p.p));
                V3f bi = normf(crossf(tv3, vv.n));
                V3f nrm = normf(tv3 * ntan.x + vv.n * ntan.y + bi * ntan.z);
                V3f wp = vv.p + vv.n * h;
                float v4[4] = {wp.x, wp.y, wp.z, 1.0f}, clip[4];
                mat4_mulv(viewproj, v4, clip);
                float light = 0.001f + fmaxf(0.0f, dotf(normf(nrm), l));

                world.push_back(wp.x); world.push_back(wp.y); world.push_back(wp.z);
                normal_out.push_back(nrm.x); normal_out.push_back(nrm.y); normal_out.push_back(nrm.z);
                height_out.push_back(h);
                for (int k2 = 0; k2 < 4; k2++) clip_out.push_back(clip[k2]);
                shade_out.push_back(sqrtf(light));
            }
        }

        std::vector<double> camv = {cam_pos.x, cam_pos.y, cam_pos.z};
        std::vector<float> vp_flat, rot_flat;
        for (int r = 0; r < 4; r++) for (int c = 0; c < 4; c++) vp_flat.push_back(viewproj[r][c]);
        for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) rot_flat.push_back(rot[r][c]);

        npy_i64(dir + "tess_paths.npy", {(size_t)T, 19}, paths);
        npy_f64(dir + "tess_cam.npy", {3}, camv);
        npy_f32(dir + "tess_rot.npy", {3, 3}, rot_flat);
        npy_f32(dir + "tess_viewproj.npy", {4, 4}, vp_flat);
        npy_f32(dir + "tess_P.npy", {(size_t)T, 4, 3}, Ps);
        npy_f32(dir + "tess_N.npy", {(size_t)T, 4, 3}, Ns);
        npy_f32(dir + "tess_tiles.npy", {(size_t)T, (size_t)dim, (size_t)dim}, tiles);
        npy_f32(dir + "tess_skirt.npy", {(size_t)T}, skirts);
        npy_f32(dir + "tess_world.npy", {(size_t)T, (size_t)nverts, 3}, world);
        npy_f32(dir + "tess_normal.npy", {(size_t)T, (size_t)nverts, 3}, normal_out);
        npy_f32(dir + "tess_height.npy", {(size_t)T, (size_t)nverts}, height_out);
        npy_f32(dir + "tess_clip.npy", {(size_t)T, (size_t)nverts, 4}, clip_out);
        npy_f32(dir + "tess_shade.npy", {(size_t)T, (size_t)nverts}, shade_out);
    }

    // 8. full-frame render goldens: refine -> generate -> tessellate ->
    //    exact-coverage raster at the engine's default 800x600 viewport
    //    (the reference full frame, RenderPlanet main.cpp:600-683 + GL
    //    draw). Scene 0 ("frame_"): the 20 km camera. Scene 1
    //    ("nearclip_"): camera 0.6 m above the terrain surface so
    //    triangles straddle the near plane (near=1.0, main.cpp:1074) and
    //    the Sutherland-Hodgman clip path is exercised. Scene 2
    //    ("farclip_"): camera at 16,000 km altitude pitched toward the
    //    planet limb — the limb sits ~21,445 km away, beyond far=2e7
    //    (main.cpp:1075), so a band of terrain crosses the far plane and
    //    the z <= 1 fragment clip (round 5) is exercised.
    for (int scene = 0; scene < 3; scene++) {
        const int W = 800, H = 600;
        const int dim = 32, n = 30, nverts = n * n + 4 * n;

        V3d cam_pos;
        float angles[3];
        std::string prefix;
        if (scene == 0) {
            V3d cdir = normalize(v3(0.2, 0.5, -0.8));
            cam_pos = cdir * (kRadius + 20000.0);
            // pitch 0.35 rad: the 50-degree FOV spans sky, horizon (~4.5
            // deg below horizontal at 20 km), and near terrain — the
            // golden exercises silhouette, background, the full depth range
            angles[0] = 0.35f; angles[1] = 0.3f; angles[2] = 0.0f;
            prefix = "frame_";
        } else if (scene == 1) {
            V3d cdir = normalize(v3(0.4, 0.62, -0.3));
            double h = (double)terrain_height(cdir * kRadius, kMaxLod,
                                              kMaxLod);
            // 0.5 m above the surface pitched 0.6 rad down: ground cells
            // spanning z_view <= 0 (behind the camera plane) to > 1 m
            // (beyond near) clip at the near plane with their visible
            // bands inside the FOV — the straddle path draws real pixels
            cam_pos = cdir * (kRadius + h + 0.5);
            angles[0] = 0.6f; angles[1] = 0.8f; angles[2] = 0.0f;
            prefix = "nearclip_";
        } else {
            // 16,000 km up, pitched 1.28 rad down: the planet limb (at
            // asin(R/(R+h)) = 16.55 deg off nadir = 73.45 deg below the
            // horizontal, distance sqrt((R+h)^2 - R^2) = 21,445 km) sits
            // near the view axis with z_view > far = 2e7 — the terrain
            // band beyond the far plane must CLIP to background, not
            // depth-clamp into the last quantum
            V3d cdir = normalize(v3(-0.3, 0.45, 0.7));
            cam_pos = cdir * (kRadius + 16000000.0);
            angles[0] = 1.28f; angles[1] = 0.15f; angles[2] = 0.0f;
            prefix = "farclip_";
        }

        // world rotation: tangent base frame + Euler Y,X,Z (main.cpp:1039-1061)
        float rot[3][3];
        {
            V3f up = normf(v3f((float)cam_pos.x, (float)cam_pos.y, (float)cam_pos.z));
            V3f yaxis = v3f(0, 1, 0);
            V3f right = (1.0f - dotf(up, yaxis) < 0.1f)
                ? normf(crossf(up, v3f(0, 0, 1)))
                : normf(crossf(up, yaxis));
            V3f fwd = normf(crossf(right, up));
            float base[3][3] = {
                {right.x, up.x, fwd.x},
                {right.y, up.y, fwd.y},
                {right.z, up.z, fwd.z},
            };
            float sy = sinf(angles[1]), cy = cosf(angles[1]);
            float sx = sinf(angles[0]), cx = cosf(angles[0]);
            float sz = sinf(angles[2]), cz = cosf(angles[2]);
            float ry[3][3] = {{cy,0,sy},{0,1,0},{-sy,0,cy}};
            float rx[3][3] = {{1,0,0},{0,cx,-sx},{0,sx,cx}};
            float rz[3][3] = {{cz,-sz,0},{sz,cz,0},{0,0,1}};
            float tmp[3][3], tmp2[3][3];
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) {
                tmp[r][c] = 0;
                for (int k = 0; k < 3; k++) tmp[r][c] += ry[r][k]*rx[k][c];
            }
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) {
                tmp2[r][c] = 0;
                for (int k = 0; k < 3; k++) tmp2[r][c] += tmp[r][k]*rz[k][c];
            }
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) {
                rot[r][c] = 0;
                for (int k = 0; k < 3; k++) rot[r][c] += base[r][k]*tmp2[k][c];
            }
        }

        M4 proj = {}, view = {}, viewproj;
        {
            double fovy = 50.0 * (3.14159265358979323846 / 180.0);
            float pf = 1.0f / tanf(0.5f * (float)fovy);
            double f = 20000000.0, nr = 1.0;
            proj[0][0] = pf / ((float)W / (float)H);
            proj[1][1] = pf;
            proj[2][2] = (float)((f + nr) / (f - nr));
            proj[3][2] = 1.0f;
            proj[2][3] = (float)(-2.0 * f * nr / (f - nr));
            for (int r = 0; r < 3; r++)
                for (int c = 0; c < 3; c++) view[r][c] = rot[c][r];
            view[3][3] = 1.0f;
            mat4_mul(proj, view, viewproj);
        }

        // refine
        OQuad roots[6];
        root_quads(roots);
        std::vector<OQuad> leaves;
        for (int f = 0; f < 6; f++) refine(roots[f], cam_pos, kMaxLod, leaves);

        double max_skirt = (2.0 * 3.14159265358979323846 * kRadius)
                           / (4.0 * 29.0) * 0.00001 * 8.0 * 8848.0;

        // vertex list (u, v, skirt) in reference order
        std::vector<float> vlist;
        {
            double div = 1.0 / (n - 1);
            for (int x = 0; x < n; x++) {
                vlist.push_back((float)(x*div)); vlist.push_back(0.0f); vlist.push_back(1.0f);
            }
            for (int y = 0; y < n; y++) {
                vlist.push_back(0.0f); vlist.push_back((float)(y*div)); vlist.push_back(1.0f);
                for (int x = 0; x < n; x++) {
                    vlist.push_back((float)(x*div)); vlist.push_back((float)(y*div)); vlist.push_back(0.0f);
                }
                vlist.push_back(1.0f); vlist.push_back((float)(y*div)); vlist.push_back(1.0f);
            }
            for (int x = 0; x < n; x++) {
                vlist.push_back((float)(x*div)); vlist.push_back(1.0f); vlist.push_back(1.0f);
            }
        }
        std::vector<uint32_t> tris = strip_triangles(build_strip(n));

        std::vector<int32_t> buf((size_t)W * H, kEmpty);
        long frag_count = 0, straddle_count = 0, clipped_drawn = 0;
        g_farclip_rejects = 0;
        std::vector<RVert> rv(nverts);
        std::vector<char> rok(nverts);
        std::vector<VOut> vout(nverts);

        for (size_t li = 0; li < leaves.size(); li++) {
            const OQuad &q = leaves[li];
            int depth = (int)id_depth(q.id);
            float skirt = (float)max_skirt;
            int d1 = depth - 1;
            if (d1 > 0) skirt /= (float)(2 << d1);

            std::vector<float> tile(dim * dim);
            gen_tile(q, dim, kMaxLod, tile.data());

            V3f P[4], N[4];
            for (int j = 0; j < 4; j++) {
                V3d rel = q.p[j] - cam_pos;
                P[j] = v3f((float)rel.x, (float)rel.y, (float)rel.z);
                V3d nd = normalize(q.p[j]);
                N[j] = v3f((float)nd.x, (float)nd.y, (float)nd.z);
            }
            for (int vi = 0; vi < nverts; vi++) {
                VOut o = tess_vertex(P, N, tile.data(), dim,
                                     vlist[vi*3], vlist[vi*3+1], vlist[vi*3+2],
                                     skirt, viewproj);
                vout[vi] = o;
                float w = o.clip[3];
                rok[vi] = w > 1e-9f;
                if (!rok[vi]) continue;
                float iw = 1.0f / w;
                rv[vi].x = snap16((o.clip[0] * iw * 0.5f + 0.5f) * (float)W);
                rv[vi].y = snap16((0.5f - o.clip[1] * iw * 0.5f) * (float)H);
                rv[vi].z = o.clip[2] * iw;
                rv[vi].iw = iw;
                rv[vi].w = w;
                rv[vi].niw = o.normal * iw;
            }
            for (size_t ti = 0; ti + 3 <= tris.size(); ti += 3) {
                uint32_t a = tris[ti], b = tris[ti+1], c = tris[ti+2];
                if (rok[a] && rok[b] && rok[c]) {
                    RVert v[3] = {rv[a], rv[b], rv[c]};
                    raster_tri(v, W, H, buf.data(), &frag_count);
                    continue;
                }
                // near-plane straddler: some vertex at w <= 1e-9;
                // clip against f = z + w >= 0 and draw the visible part
                // (spec: planet_tpu/raster/nearclip.py)
                CVert cv[3];
                const uint32_t vi3[3] = {a, b, c};
                float f[3];
                int cnt = 0;
                for (int k = 0; k < 3; k++) {
                    const VOut &o = vout[vi3[k]];
                    for (int m = 0; m < 4; m++) cv[k].c[m] = o.clip[m];
                    cv[k].n = o.normal;
                    f[k] = cv[k].c[2] + cv[k].c[3];
                    if (f[k] > 0.0f) cnt++;
                }
                if (cnt == 0) continue;      // fully in front of near
                // homogeneous front-face pre-filter (det3 sign is
                // invariant under near clipping; screen winding is
                // meaningless with mixed w signs) — mirrors
                // nearclip.straddle_mask_t
                float det3 =
                    cv[0].c[0] * (cv[1].c[1] * cv[2].c[3]
                                  - cv[2].c[1] * cv[1].c[3])
                    - cv[0].c[1] * (cv[1].c[0] * cv[2].c[3]
                                    - cv[2].c[0] * cv[1].c[3])
                    + cv[0].c[3] * (cv[1].c[0] * cv[2].c[1]
                                    - cv[2].c[0] * cv[1].c[1]);
                if (!(det3 < 0.0f)) continue;
                // lateral-frustum outcode: all three vertices outside the
                // same linear clip plane (w±x, w±y >= 0) -> invisible
                bool all_out = false;
                for (int pl = 0; pl < 4 && !all_out; pl++) {
                    bool out = true;
                    for (int k = 0; k < 3 && out; k++) {
                        float xw = (pl < 2) ? cv[k].c[0] : cv[k].c[1];
                        float s = (pl & 1) ? 1.0f : -1.0f;
                        out = (cv[k].c[3] + s * xw) < 0.0f;
                    }
                    all_out = out;
                }
                if (all_out) continue;
                straddle_count++;
                if (cnt == 3) continue;      // unreachable with w'=z_view
                CVert outA[3], outB[3];
                int nout = clip_near(cv, f, cnt, outA, outB);
                for (int t2 = 0; t2 < nout; t2++) {
                    const CVert *poly = (t2 == 0) ? outA : outB;
                    RVert v[3];
                    for (int k = 0; k < 3; k++) {
                        float w = poly[k].c[3];
                        float iw = 1.0f / w;
                        v[k].x = snap16((poly[k].c[0] * iw * 0.5f + 0.5f)
                                        * (float)W);
                        v[k].y = snap16((0.5f - poly[k].c[1] * iw * 0.5f)
                                        * (float)H);
                        v[k].z = poly[k].c[2] * iw;
                        v[k].iw = iw;
                        v[k].w = w;
                        v[k].niw = poly[k].n * iw;
                    }
                    // count only scanned (front-facing, on-screen) clipped
                    // triangles: the TPU path's clip_run_cap demand
                    clipped_drawn += raster_tri(v, W, H, buf.data(),
                                                &frag_count);
                }
            }
        }

        std::vector<float> image((size_t)W * H), depthb((size_t)W * H);
        long covered = 0;
        for (size_t i = 0; i < buf.size(); i++) {
            if (buf[i] == kEmpty) {
                image[i] = 0.0f;
                depthb[i] = INFINITY;
            } else {
                covered++;
                image[i] = (float)(buf[i] & ((1 << kShadeBits) - 1))
                           / (float)((1 << kShadeBits) - 1);
                depthb[i] = (float)(buf[i] >> kShadeBits)
                            / (float)((1 << kDepthBits) - 1) * 2.0f - 1.0f;
            }
        }

        std::vector<double> camv = {cam_pos.x, cam_pos.y, cam_pos.z};
        std::vector<float> angv = {angles[0], angles[1], angles[2]};
        std::vector<float> vp_flat, rot_flat;
        for (int r = 0; r < 4; r++) for (int c = 0; c < 4; c++) vp_flat.push_back(viewproj[r][c]);
        for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) rot_flat.push_back(rot[r][c]);
        std::vector<int64_t> meta = {(int64_t)leaves.size(), covered,
                                     frag_count, straddle_count,
                                     clipped_drawn,
                                     (int64_t)g_farclip_rejects};

        npy_f64(dir + prefix + "cam.npy", {3}, camv);
        npy_f32(dir + prefix + "angles.npy", {3}, angv);
        npy_f32(dir + prefix + "rot.npy", {3, 3}, rot_flat);
        npy_f32(dir + prefix + "viewproj.npy", {4, 4}, vp_flat);
        npy_f32(dir + prefix + "image.npy", {(size_t)H, (size_t)W}, image);
        npy_f32(dir + prefix + "depth.npy", {(size_t)H, (size_t)W}, depthb);
        npy_i64(dir + prefix + "meta.npy", {6}, meta);
    }

    printf("oracle: goldens written\n");
    return 0;
}
