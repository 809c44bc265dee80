// COLMAP binary model reader (native fast path).
//
// The reference relied on pycolmap (C++ pybind) to parse
// cameras.bin/images.bin (sfm.py:186-238). This module owns the format:
// a one-pass little-endian struct parse that fills flat arrays the
// Python side wraps as numpy (sucre_tpu/io/native.py via ctypes).
//
// Layout (COLMAP write_binary conventions):
//   cameras.bin   u64 n; per camera: i32 id, i32 model, u64 w, u64 h,
//                 f64 params[num_params(model)]
//   images.bin    u64 n; per image: u32 id, f64 q[4], f64 t[3], u32 cam,
//                 name\0, u64 npts; per pt: f64 x, f64 y, u64 p3d
//
// API: colmap_read_model() returns a heap-allocated Model; the caller
// copies what it needs and calls colmap_free_model().

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct Buf {
    const uint8_t* p;
    size_t n;
    size_t off = 0;
    bool ok = true;

    template <typename T>
    T take() {
        T v{};
        if (off + sizeof(T) > n) { ok = false; return v; }
        std::memcpy(&v, p + off, sizeof(T));
        off += sizeof(T);
        return v;
    }
    const char* cstr() {
        size_t start = off;
        while (off < n && p[off] != 0) ++off;
        if (off >= n) { ok = false; return nullptr; }
        ++off;  // consume NUL
        return reinterpret_cast<const char*>(p + start);
    }
    bool skip(size_t k) {
        // off <= n invariant makes n - off safe; comparing k against it
        // (instead of testing off + k) cannot overflow
        if (k > n - off) { ok = false; return false; }
        off += k;
        return true;
    }
    size_t remaining() const { return n - off; }
};

int num_params_for_model(int32_t model_id) {
    switch (model_id) {
        case 0: return 3;   // SIMPLE_PINHOLE
        case 1: return 4;   // PINHOLE
        case 2: return 4;   // SIMPLE_RADIAL
        case 3: return 5;   // RADIAL
        case 4: return 8;   // OPENCV
        case 5: return 8;   // OPENCV_FISHEYE
        case 6: return 12;  // FULL_OPENCV
        case 7: return 5;   // FOV
        case 8: return 4;   // SIMPLE_RADIAL_FISHEYE
        case 9: return 5;   // RADIAL_FISHEYE
        case 10: return 12; // THIN_PRISM_FISHEYE
        default: return -1;
    }
}

uint8_t* read_file(const char* path, size_t* out_n) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (n < 0) { std::fclose(f); return nullptr; }
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(static_cast<size_t>(n)));
    if (!buf) { std::fclose(f); return nullptr; }
    size_t got = std::fread(buf, 1, static_cast<size_t>(n), f);
    std::fclose(f);
    if (got != static_cast<size_t>(n)) { std::free(buf); return nullptr; }
    *out_n = got;
    return buf;
}

}  // namespace

extern "C" {

// Flat model arrays. Cameras: id/model/width/height per camera plus a
// fixed 12-wide params row. Images: id/camera_id/qvec(4)/tvec(3) plus
// names packed NUL-separated.
struct ColmapModel {
    // cameras
    int64_t n_cameras;
    int32_t* cam_ids;
    int32_t* cam_models;
    int64_t* cam_widths;
    int64_t* cam_heights;
    double* cam_params;  // (n_cameras, 12), zero-padded

    // images
    int64_t n_images;
    int32_t* img_ids;
    int32_t* img_camera_ids;
    double* img_qvecs;  // (n_images, 4) w x y z
    double* img_tvecs;  // (n_images, 3)
    char* img_names;    // packed, NUL separated
    int64_t img_names_len;

    char error[256];
};

ColmapModel* colmap_read_model(const char* cameras_path, const char* images_path) {
    auto* m = static_cast<ColmapModel*>(std::calloc(1, sizeof(ColmapModel)));
    if (!m) return nullptr;

    size_t cn = 0;
    uint8_t* cdata = read_file(cameras_path, &cn);
    if (!cdata) {
        std::snprintf(m->error, sizeof(m->error), "cannot read %s", cameras_path);
        return m;
    }
    Buf cb{cdata, cn};
    uint64_t n_cam = cb.take<uint64_t>();
    // A camera record is >= 40 bytes, but the guard divides by a
    // DELIBERATELY SLACK lower bound (24) — it only needs to reject a
    // garbage count BEFORE sizing allocations from it (an error, not a
    // huge/overflowed malloc); per-record bounds checks do the rest.
    if (!cb.ok || n_cam > cn / 24) {
        std::snprintf(m->error, sizeof(m->error), "corrupt cameras.bin");
        std::free(cdata);
        return m;
    }
    m->n_cameras = static_cast<int64_t>(n_cam);
    m->cam_ids = static_cast<int32_t*>(std::malloc(n_cam * sizeof(int32_t)));
    m->cam_models = static_cast<int32_t*>(std::malloc(n_cam * sizeof(int32_t)));
    m->cam_widths = static_cast<int64_t*>(std::malloc(n_cam * sizeof(int64_t)));
    m->cam_heights = static_cast<int64_t*>(std::malloc(n_cam * sizeof(int64_t)));
    m->cam_params = static_cast<double*>(std::calloc(n_cam * 12, sizeof(double)));
    if (n_cam && (!m->cam_ids || !m->cam_models || !m->cam_widths ||
                  !m->cam_heights || !m->cam_params)) {
        std::snprintf(m->error, sizeof(m->error), "out of memory");
        std::free(cdata);
        return m;
    }
    for (uint64_t i = 0; i < n_cam && cb.ok; ++i) {
        m->cam_ids[i] = cb.take<int32_t>();
        int32_t model_id = cb.take<int32_t>();
        m->cam_models[i] = model_id;
        m->cam_widths[i] = static_cast<int64_t>(cb.take<uint64_t>());
        m->cam_heights[i] = static_cast<int64_t>(cb.take<uint64_t>());
        int np = num_params_for_model(model_id);
        if (np < 0) {
            std::snprintf(m->error, sizeof(m->error), "unknown camera model id %d", model_id);
            std::free(cdata);
            return m;
        }
        for (int k = 0; k < np; ++k) m->cam_params[i * 12 + k] = cb.take<double>();
    }
    bool cameras_ok = cb.ok;
    std::free(cdata);
    if (!cameras_ok) {
        std::snprintf(m->error, sizeof(m->error), "truncated cameras.bin");
        return m;
    }

    size_t in = 0;
    uint8_t* idata = read_file(images_path, &in);
    if (!idata) {
        std::snprintf(m->error, sizeof(m->error), "cannot read %s", images_path);
        return m;
    }
    Buf ib{idata, in};
    uint64_t n_img = ib.take<uint64_t>();
    // An image record is >= 74 bytes; same slack-divisor (48) corrupt-
    // count guard as above.
    if (!ib.ok || n_img > in / 48) {
        std::snprintf(m->error, sizeof(m->error), "corrupt images.bin");
        std::free(idata);
        return m;
    }
    m->n_images = static_cast<int64_t>(n_img);
    m->img_ids = static_cast<int32_t*>(std::malloc(n_img * sizeof(int32_t)));
    m->img_camera_ids = static_cast<int32_t*>(std::malloc(n_img * sizeof(int32_t)));
    m->img_qvecs = static_cast<double*>(std::malloc(n_img * 4 * sizeof(double)));
    m->img_tvecs = static_cast<double*>(std::malloc(n_img * 3 * sizeof(double)));
    size_t names_cap = 4096;
    char* names = static_cast<char*>(std::malloc(names_cap));
    size_t names_len = 0;
    if (!names || (n_img && (!m->img_ids || !m->img_camera_ids ||
                             !m->img_qvecs || !m->img_tvecs))) {
        std::snprintf(m->error, sizeof(m->error), "out of memory");
        std::free(idata);
        std::free(names);
        return m;
    }
    for (uint64_t i = 0; i < n_img && ib.ok; ++i) {
        m->img_ids[i] = static_cast<int32_t>(ib.take<uint32_t>());
        for (int k = 0; k < 4; ++k) m->img_qvecs[i * 4 + k] = ib.take<double>();
        for (int k = 0; k < 3; ++k) m->img_tvecs[i * 3 + k] = ib.take<double>();
        m->img_camera_ids[i] = static_cast<int32_t>(ib.take<uint32_t>());
        const char* name = ib.cstr();
        if (!name) break;
        size_t len = std::strlen(name) + 1;
        if (names_len + len > names_cap) {
            while (names_len + len > names_cap) names_cap *= 2;
            char* grown = static_cast<char*>(std::realloc(names, names_cap));
            if (!grown) {  // keep `names` freeable, fail the parse
                ib.ok = false;
                break;
            }
            names = grown;
        }
        std::memcpy(names + names_len, name, len);
        names_len += len;
        uint64_t npts = ib.take<uint64_t>();
        // guard the multiply: a corrupt npts*24 could wrap past the
        // buffer and misparse silently instead of failing
        if (npts > ib.remaining() / 24) {
            ib.ok = false;
            break;
        }
        ib.skip(npts * 24);  // (f64 x, f64 y, u64 p3d) per point
    }
    bool images_ok = ib.ok;
    std::free(idata);
    m->img_names = names;
    m->img_names_len = static_cast<int64_t>(names_len);
    if (!images_ok) {
        std::snprintf(m->error, sizeof(m->error), "truncated images.bin");
        return m;
    }
    return m;
}

void colmap_free_model(ColmapModel* m) {
    if (!m) return;
    std::free(m->cam_ids);
    std::free(m->cam_models);
    std::free(m->cam_widths);
    std::free(m->cam_heights);
    std::free(m->cam_params);
    std::free(m->img_ids);
    std::free(m->img_camera_ids);
    std::free(m->img_qvecs);
    std::free(m->img_tvecs);
    std::free(m->img_names);
    std::free(m);
}

}  // extern "C"
