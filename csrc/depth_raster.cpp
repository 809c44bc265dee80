// Z-buffer depth rasterizer: camera-frame triangles -> (H, W) Z-depth.
//
// Backs sucre_tpu.depth_from_mesh (the in-framework replacement for the
// external mesh ray tracer in the reference's data-processing pipeline,
// README.md steps 3-4). Conventions match the framework's geometry
// (ops/pinhole.py): pixel (u, v) samples the ray through the continuous
// image point (u + 0.5, v + 0.5); the stored value is the camera-frame
// Z of the nearest surface (0 = no hit) — exactly what the 16-bit
// millimeter depth PNGs encode.
//
// Design: triangles parallelize freely across threads into ONE shared
// z-buffer of atomic uint32 cells. For positive IEEE floats the bit
// pattern is monotonic in the value, so "nearest wins" is a lock-free
// fetch-min on the float's bits. 1/z interpolates linearly in screen
// space (perspective-correct Z); triangles are clipped against
// z > znear (Sutherland-Hodgman) so cameras inside the scene volume
// rasterize correctly instead of wrapping behind-camera geometry.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct V3 {
    double x, y, z;
};

// Clip a convex polygon against the plane z > znear; out needs room for
// n_in + 1 vertices. Returns the clipped vertex count (0..n_in + 1).
int clip_near(const V3 *in, int n_in, double znear, V3 *out) {
    int n_out = 0;
    for (int i = 0; i < n_in; i++) {
        const V3 &a = in[i];
        const V3 &b = in[(i + 1) % n_in];
        bool ina = a.z > znear, inb = b.z > znear;
        if (ina) out[n_out++] = a;
        if (ina != inb) {
            double t = (znear - a.z) / (b.z - a.z);
            out[n_out++] = {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), znear};
        }
    }
    return n_out;
}

inline uint32_t float_bits(float f) {
    uint32_t u;
    std::memcpy(&u, &f, 4);
    return u;
}

inline void atomic_min_bits(std::atomic<uint32_t> &cell, uint32_t bits) {
    uint32_t cur = cell.load(std::memory_order_relaxed);
    while (bits < cur &&
           !cell.compare_exchange_weak(cur, bits, std::memory_order_relaxed)) {
    }
}

void raster_tri(const V3 &A, const V3 &B, const V3 &C, double fx, double fy,
                double cx, double cy, int width, int height,
                std::atomic<uint32_t> *zbuf) {
    // Project to continuous pixel coordinates.
    double ax = fx * A.x / A.z + cx, ay = fy * A.y / A.z + cy;
    double bx = fx * B.x / B.z + cx, by = fy * B.y / B.z + cy;
    double gx = fx * C.x / C.z + cx, gy = fy * C.y / C.z + cy;

    double area = (bx - ax) * (gy - ay) - (by - ay) * (gx - ax);
    if (!(std::fabs(area) > 1e-14)) return;  // degenerate (or NaN)

    // Clamp in DOUBLE before the int cast: a near-plane-clipped vertex
    // can project to |px| > INT_MAX, and double->int overflow is UB
    // (x86 yields INT_MIN, silently dropping the on-screen part).
    double xlo = std::clamp(std::floor(std::min({ax, bx, gx}) - 0.5), 0.0, (double)(width - 1));
    double xhi = std::clamp(std::ceil(std::max({ax, bx, gx}) - 0.5), 0.0, (double)(width - 1));
    double ylo = std::clamp(std::floor(std::min({ay, by, gy}) - 0.5), 0.0, (double)(height - 1));
    double yhi = std::clamp(std::ceil(std::max({ay, by, gy}) - 0.5), 0.0, (double)(height - 1));
    if (std::min({ax, bx, gx}) - 0.5 > (double)(width - 1) ||
        std::max({ax, bx, gx}) - 0.5 < 0.0 ||
        std::min({ay, by, gy}) - 0.5 > (double)(height - 1) ||
        std::max({ay, by, gy}) - 0.5 < 0.0)
      return;  // fully off-screen
    int x0 = (int)xlo, x1 = (int)xhi, y0 = (int)ylo, y1 = (int)yhi;
    if (x0 > x1 || y0 > y1) return;

    double inv_area = 1.0 / area;
    double iza = 1.0 / A.z, izb = 1.0 / B.z, izc = 1.0 / C.z;

    for (int v = y0; v <= y1; v++) {
        double py = v + 0.5;
        std::atomic<uint32_t> *row = zbuf + (size_t)v * width;
        for (int u = x0; u <= x1; u++) {
            double px = u + 0.5;
            // Signed edge functions; normalized weights share area's
            // sign, so w >= 0 covers both windings symmetrically.
            double w0 = ((bx - px) * (gy - py) - (by - py) * (gx - px)) * inv_area;
            double w1 = ((gx - px) * (ay - py) - (gy - py) * (ax - px)) * inv_area;
            double w2 = 1.0 - w0 - w1;
            if (w0 < 0 || w1 < 0 || w2 < 0) continue;
            float z = (float)(1.0 / (w0 * iza + w1 * izb + w2 * izc));
            atomic_min_bits(row[u], float_bits(z));
        }
    }
}

}  // namespace

extern "C" {

// verts_cam: (n_verts, 3) float32 camera-frame points (world->cam applied
// by the caller). faces: (n_faces, 3) int32, validated by the caller.
// out_z: (height, width) float32, Z-depth in input units, 0 = no hit.
// Returns 0 on success, -1 on bad arguments.
int sucre_raster_depth(const float *verts_cam, int64_t n_verts,
                       const int32_t *faces, int64_t n_faces, double fx,
                       double fy, double cx, double cy, int32_t width,
                       int32_t height, double znear, int32_t n_threads,
                       float *out_z) {
    if (width <= 0 || height <= 0 || n_verts < 0 || n_faces < 0 ||
        !(znear > 0.0))
        return -1;
    for (int64_t i = 0; i < n_faces * 3; i++)
        if (faces[i] < 0 || faces[i] >= n_verts) return -1;

    size_t n_px = (size_t)width * height;
    std::vector<std::atomic<uint32_t>> zbuf(n_px);
    const uint32_t inf_bits = float_bits(INFINITY);
    for (size_t i = 0; i < n_px; i++)
        zbuf[i].store(inf_bits, std::memory_order_relaxed);

    int threads = std::max(1, (int)n_threads);
    threads = (int)std::min<int64_t>(threads, std::max<int64_t>(1, n_faces));
    std::vector<std::thread> pool;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        const int64_t GRAIN = 256;
        for (;;) {
            int64_t start = next.fetch_add(GRAIN);
            if (start >= n_faces) break;
            int64_t stop = std::min(start + GRAIN, n_faces);
            for (int64_t t = start; t < stop; t++) {
                V3 tri[3];
                for (int k = 0; k < 3; k++) {
                    const float *p = verts_cam + (size_t)faces[3 * t + k] * 3;
                    tri[k] = {p[0], p[1], p[2]};
                }
                V3 clipped[4];
                int n = clip_near(tri, 3, znear, clipped);
                for (int k = 1; k + 1 < n; k++)
                    raster_tri(clipped[0], clipped[k], clipped[k + 1], fx, fy,
                               cx, cy, width, height, zbuf.data());
            }
        }
    };
    for (int i = 1; i < threads; i++) pool.emplace_back(worker);
    worker();
    for (auto &th : pool) th.join();

    for (size_t i = 0; i < n_px; i++) {
        uint32_t b = zbuf[i].load(std::memory_order_relaxed);
        float z;
        std::memcpy(&z, &b, 4);
        out_z[i] = std::isfinite(z) ? z : 0.0f;
    }
    return 0;
}

}  // extern "C"
