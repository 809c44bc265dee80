// Native image decode: 16-bit depth PNG (libpng) + 8-bit RGB JPEG/PNG
// (libjpeg / libpng), with a thread-pool batch API.
//
// The reference decoded on the host through OpenCV inside DataLoader
// worker processes (loader.py:133-180). This module is the framework's
// own decode path: direct libpng/libjpeg calls into caller-provided
// buffers (zero copies beyond the codec), and decode_batch() fans a
// list of files across std::threads — called via ctypes, so the GIL is
// released for the whole batch.

#include <cstddef>
#include <cstdio>

// jpeglib.h requires size_t/FILE to be declared before inclusion.
#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct PngReadCtx {
    FILE* f = nullptr;
    png_structp png = nullptr;
    png_infop info = nullptr;
    ~PngReadCtx() {
        if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
        if (f) std::fclose(f);
    }
};

// libjpeg's default error_exit calls exit(), which would take down the
// whole process (including decode_batch worker threads) on one corrupt
// file. Mirror the png_jmpbuf pattern: longjmp back into the decoder,
// which returns a per-item failure status instead.
struct JpegErrorMgr {
    jpeg_error_mgr pub;
    std::jmp_buf jmp;
};

void jpeg_error_exit_longjmp(j_common_ptr cinfo) {
    std::longjmp(reinterpret_cast<JpegErrorMgr*>(cinfo->err)->jmp, 1);
}

// Opens from an already-open stream positioned at the file start (the
// caller sniffed the signature and rewound) — one fopen per decode, not
// one for the sniff plus one for the parse. ctx adopts the FILE*.
bool open_png_stream(FILE* f, PngReadCtx& ctx, uint32_t* w, uint32_t* h,
                     int* bit_depth, int* color_type) {
    ctx.f = f;
    if (!ctx.f) return false;
    unsigned char sig[8];
    if (std::fread(sig, 1, 8, ctx.f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
    ctx.png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!ctx.png) return false;
    ctx.info = png_create_info_struct(ctx.png);
    if (!ctx.info) return false;
    if (setjmp(png_jmpbuf(ctx.png))) return false;
    png_init_io(ctx.png, ctx.f);
    png_set_sig_bytes(ctx.png, 8);
    png_read_info(ctx.png, ctx.info);
    *w = png_get_image_width(ctx.png, ctx.info);
    *h = png_get_image_height(ctx.png, ctx.info);
    *bit_depth = png_get_bit_depth(ctx.png, ctx.info);
    *color_type = png_get_color_type(ctx.png, ctx.info);
    return true;
}

bool open_png(const char* path, PngReadCtx& ctx, uint32_t* w, uint32_t* h,
              int* bit_depth, int* color_type) {
    return open_png_stream(std::fopen(path, "rb"), ctx, w, h, bit_depth,
                           color_type);
}

// EXIF orientation (TIFF tag 0x0112) from a JPEG APP1 payload; 0 when
// absent/unparseable. The reference decoded through cv2.imread, which
// applies this tag by default (loader.py:157) — the native path must
// match or real-world JPEGs silently decode rotated. Bounds-checked
// byte walk; never reads past len.
int parse_exif_orientation(const JOCTET* data, unsigned int len) {
    if (len < 14 || std::memcmp(data, "Exif\0\0", 6) != 0) return 0;
    const JOCTET* t = data + 6;  // TIFF header
    const unsigned int tlen = len - 6;
    bool le;
    if (t[0] == 'I' && t[1] == 'I') le = true;
    else if (t[0] == 'M' && t[1] == 'M') le = false;
    else return 0;
    auto u16 = [&](size_t off) -> uint32_t {
        if (off + 2 > tlen) return 0;
        return le ? (t[off] | (t[off + 1] << 8)) : ((t[off] << 8) | t[off + 1]);
    };
    auto u32 = [&](size_t off) -> uint32_t {
        if (off + 4 > tlen) return 0;
        return le ? (t[off] | (t[off + 1] << 8) | (t[off + 2] << 16) |
                     (static_cast<uint32_t>(t[off + 3]) << 24))
                  : ((static_cast<uint32_t>(t[off]) << 24) | (t[off + 1] << 16) |
                     (t[off + 2] << 8) | t[off + 3]);
    };
    if (u16(2) != 42) return 0;
    uint32_t ifd = u32(4);
    if (ifd + 2 > tlen) return 0;
    uint32_t n = u16(ifd);
    for (uint32_t i = 0; i < n; ++i) {
        size_t e = ifd + 2 + 12 * static_cast<size_t>(i);
        if (e + 12 > tlen) return 0;
        if (u16(e) == 0x0112) {
            uint32_t v = u16(e + 8);  // SHORT, stored inline
            return (v >= 1 && v <= 8) ? static_cast<int>(v) : 0;
        }
    }
    return 0;
}

int jpeg_exif_orientation(const jpeg_decompress_struct& cinfo) {
    for (jpeg_saved_marker_ptr mk = cinfo.marker_list; mk; mk = mk->next) {
        if (mk->marker != JPEG_APP0 + 1) continue;
        int o = parse_exif_orientation(mk->data, mk->data_length);
        if (o) return o;
    }
    return 0;
}

// Remap a decoded (h0, w0, 3) buffer into its EXIF-displayed layout
// (dims swap for orientations 5-8). Same transforms cv2 applies.
void apply_exif_orientation(const uint8_t* src, uint8_t* dst, int32_t w0,
                            int32_t h0, int orient) {
    const int32_t W = orient >= 5 ? h0 : w0;
    const int32_t H = orient >= 5 ? w0 : h0;
    for (int32_t y = 0; y < H; ++y) {
        for (int32_t x = 0; x < W; ++x) {
            int32_t u, v;
            switch (orient) {
                case 2: u = w0 - 1 - x; v = y; break;             // mirror horizontal
                case 3: u = w0 - 1 - x; v = h0 - 1 - y; break;    // rotate 180
                case 4: u = x; v = h0 - 1 - y; break;             // mirror vertical
                case 5: u = y; v = x; break;                      // transpose
                case 6: u = y; v = h0 - 1 - x; break;             // rotate 90 CW
                case 7: u = w0 - 1 - y; v = h0 - 1 - x; break;    // transverse
                case 8: u = w0 - 1 - y; v = x; break;             // rotate 270 CW
                default: u = x; v = y; break;
            }
            std::memcpy(dst + (static_cast<size_t>(y) * W + x) * 3,
                        src + (static_cast<size_t>(v) * w0 + u) * 3, 3);
        }
    }
}

// Sniff the two-byte container signature and rewind, leaving the stream
// ready for the real parser. Returns 1 = png, 2 = jpeg, 0 = unknown.
int sniff_kind(FILE* f) {
    unsigned char sig[2] = {0, 0};
    size_t got = std::fread(sig, 1, 2, f);
    std::rewind(f);
    if (got != 2) return 0;
    if (sig[0] == 0x89 && sig[1] == 'P') return 1;
    if (sig[0] == 0xFF && sig[1] == 0xD8) return 2;
    return 0;
}

}  // namespace

extern "C" {

// Probe dimensions so Python can allocate the output buffer.
// kind: 0 = unknown/error, 1 = png, 2 = jpeg. Returns 0 on success.
int image_probe(const char* path, int32_t* width, int32_t* height, int32_t* kind) {
    *kind = 0;
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int k = sniff_kind(f);
    if (k == 1) {
        PngReadCtx ctx;  // adopts (and closes) f
        uint32_t w, h;
        int bd, ct;
        if (!open_png_stream(f, ctx, &w, &h, &bd, &ct)) return -1;
        *width = static_cast<int32_t>(w);
        *height = static_cast<int32_t>(h);
        *kind = 1;
        return 0;
    }
    if (k == 2) {
        jpeg_decompress_struct cinfo;
        JpegErrorMgr jerr;
        cinfo.err = jpeg_std_error(&jerr.pub);
        jerr.pub.error_exit = jpeg_error_exit_longjmp;
        if (setjmp(jerr.jmp)) {
            jpeg_destroy_decompress(&cinfo);
            std::fclose(f);
            return -4;
        }
        jpeg_create_decompress(&cinfo);
        jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);
        jpeg_stdio_src(&cinfo, f);
        jpeg_read_header(&cinfo, TRUE);
        // Report DISPLAYED dims: EXIF orientations 5-8 swap width/height
        // at decode (cv2 parity), and callers gate fast paths on the
        // probe matching the camera dims.
        const bool swap = jpeg_exif_orientation(cinfo) >= 5;
        *width = static_cast<int32_t>(swap ? cinfo.image_height : cinfo.image_width);
        *height = static_cast<int32_t>(swap ? cinfo.image_width : cinfo.image_height);
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        *kind = 2;
        return 0;
    }
    std::fclose(f);
    return -1;
}

// 16-bit grayscale PNG -> uint16 row-major (native endianness).
// Returns 0 on success.
int decode_depth_png16(const char* path, uint16_t* out, int32_t width, int32_t height) {
    PngReadCtx ctx;
    uint32_t w, h;
    int bd, ct;
    if (!open_png(path, ctx, &w, &h, &bd, &ct)) return -1;
    if (static_cast<int32_t>(w) != width || static_cast<int32_t>(h) != height) return -2;
    if (ct != PNG_COLOR_TYPE_GRAY) return -3;
    if (setjmp(png_jmpbuf(ctx.png))) return -4;
    if (bd == 16) {
        // PNG stores 16-bit samples big-endian; swap only on LE hosts
        const uint16_t probe = 1;
        if (*reinterpret_cast<const uint8_t*>(&probe) == 1)
            png_set_swap(ctx.png);
    } else if (bd < 8) {
        png_set_expand_gray_1_2_4_to_8(ctx.png);
    }
    png_read_update_info(ctx.png, ctx.info);
    std::vector<png_bytep> rows(h);
    std::vector<uint8_t> tmp8;
    if (bd == 16) {
        for (uint32_t y = 0; y < h; ++y)
            rows[y] = reinterpret_cast<png_bytep>(out + static_cast<size_t>(y) * w);
        png_read_image(ctx.png, rows.data());
    } else {
        tmp8.resize(static_cast<size_t>(w) * h);
        for (uint32_t y = 0; y < h; ++y) rows[y] = tmp8.data() + static_cast<size_t>(y) * w;
        png_read_image(ctx.png, rows.data());
        for (size_t i = 0; i < tmp8.size(); ++i) out[i] = tmp8[i];
    }
    return 0;
}

// uint8 HxWxC row-major (C = 1 or 3) -> PNG file. compress_level 0-9
// (Z_NO_COMPRESSION..Z_BEST_COMPRESSION; artifacts default to 1 —
// lossless either way, encode speed is what matters on the export
// path). Returns 0 on success.
int encode_png8(const char* path, const uint8_t* data, int32_t width,
                int32_t height, int32_t channels, int32_t compress_level) {
    if (channels != 1 && channels != 3) return -3;
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
        std::fclose(f);
        return -2;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        std::fclose(f);
        return -4;
    }
    png_init_io(png, f);
    png_set_compression_level(png, compress_level);
    // Filter selection dominates encode time at low compression; NONE is
    // the fast path. High levels (>= 6) request best size, so let libpng
    // pick adaptive filters there instead of capping the ratio.
    if (compress_level < 6) png_set_filter(png, 0, PNG_FILTER_NONE);
    png_set_IHDR(png, info, static_cast<png_uint_32>(width),
                 static_cast<png_uint_32>(height), 8,
                 channels == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_GRAY,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    const size_t stride = static_cast<size_t>(width) * channels;
    std::vector<png_bytep> rows(height);
    for (int32_t y = 0; y < height; ++y)
        rows[y] = const_cast<png_bytep>(data + static_cast<size_t>(y) * stride);
    png_write_image(png, rows.data());
    png_write_end(png, info);
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return 0;
}

// 8-bit RGB image (JPEG or PNG) -> uint8 HxWx3 row-major. Returns 0 on success.
int decode_rgb8(const char* path, uint8_t* out, int32_t width, int32_t height) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int k = sniff_kind(f);

    if (k == 1) {
        PngReadCtx ctx;  // adopts (and closes) f
        uint32_t w, h;
        int bd, ct;
        if (!open_png_stream(f, ctx, &w, &h, &bd, &ct)) return -1;
        if (static_cast<int32_t>(w) != width || static_cast<int32_t>(h) != height) return -2;
        if (setjmp(png_jmpbuf(ctx.png))) return -4;
        // Normalize every PNG variant to 8-bit RGB: 16-bit strips,
        // palettes expand (tRNS transparency becomes an alpha channel —
        // expand it so the strip below sees it), sub-8-bit gray expands,
        // gray promotes to RGB, and any alpha (original or
        // tRNS-expanded) strips unconditionally.
        if (bd == 16) png_set_strip_16(ctx.png);
        if (ct == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(ctx.png);
        if (ct == PNG_COLOR_TYPE_GRAY && bd < 8)
            png_set_expand_gray_1_2_4_to_8(ctx.png);
        if (png_get_valid(ctx.png, ctx.info, PNG_INFO_tRNS))
            png_set_tRNS_to_alpha(ctx.png);
        if (ct == PNG_COLOR_TYPE_GRAY || ct == PNG_COLOR_TYPE_GRAY_ALPHA)
            png_set_gray_to_rgb(ctx.png);
        png_set_strip_alpha(ctx.png);
        png_read_update_info(ctx.png, ctx.info);
        if (png_get_rowbytes(ctx.png, ctx.info) != static_cast<size_t>(w) * 3) return -5;
        std::vector<png_bytep> rows(h);
        for (uint32_t y = 0; y < h; ++y)
            rows[y] = out + static_cast<size_t>(y) * w * 3;
        png_read_image(ctx.png, rows.data());
        return 0;
    }

    if (k == 2) {
        jpeg_decompress_struct cinfo;
        JpegErrorMgr jerr;
        // Declared BEFORE setjmp: the longjmp error return must still run
        // its destructor (declaring it after would leak on corrupt files).
        std::vector<uint8_t> tmp;
        cinfo.err = jpeg_std_error(&jerr.pub);
        jerr.pub.error_exit = jpeg_error_exit_longjmp;
        if (setjmp(jerr.jmp)) {
            jpeg_destroy_decompress(&cinfo);
            std::fclose(f);
            return -4;
        }
        jpeg_create_decompress(&cinfo);
        jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);
        jpeg_stdio_src(&cinfo, f);
        jpeg_read_header(&cinfo, TRUE);
        const int orient = jpeg_exif_orientation(cinfo);
        cinfo.out_color_space = JCS_RGB;
        jpeg_start_decompress(&cinfo);
        const int32_t w0 = static_cast<int32_t>(cinfo.output_width);
        const int32_t h0 = static_cast<int32_t>(cinfo.output_height);
        // Dims are checked in the DISPLAYED frame (post-orientation).
        const int32_t dw = orient >= 5 ? h0 : w0;
        const int32_t dh = orient >= 5 ? w0 : h0;
        if (dw != width || dh != height || cinfo.output_components != 3) {
            jpeg_abort_decompress(&cinfo);
            jpeg_destroy_decompress(&cinfo);
            std::fclose(f);
            return -2;
        }
        uint8_t* scan_dst = out;
        if (orient > 1) {
            tmp.resize(static_cast<size_t>(w0) * h0 * 3);
            scan_dst = tmp.data();
        }
        while (cinfo.output_scanline < cinfo.output_height) {
            JSAMPROW row = scan_dst + static_cast<size_t>(cinfo.output_scanline) * w0 * 3;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        if (orient > 1) apply_exif_orientation(tmp.data(), out, w0, h0, orient);
        return 0;
    }
    std::fclose(f);
    return -1;
}

// Batched decode across a thread pool. paths: array of n C strings;
// kinds[i]: 1 = depth png16 (out16[i]), 2 = rgb8 (out8[i]).
// Returns the number of failures; per-item status in statuses.
int decode_batch(const char** paths, const int32_t* kinds, uint16_t** out16,
                 uint8_t** out8, const int32_t* widths, const int32_t* heights,
                 int32_t n, int32_t n_threads, int32_t* statuses) {
    std::atomic<int32_t> next{0};
    std::atomic<int> failures{0};
    auto worker = [&]() {
        for (;;) {
            int32_t i = next.fetch_add(1);
            if (i >= n) break;
            int rc;
            if (kinds[i] == 1) {
                rc = decode_depth_png16(paths[i], out16[i], widths[i], heights[i]);
            } else {
                rc = decode_rgb8(paths[i], out8[i], widths[i], heights[i]);
            }
            statuses[i] = rc;
            if (rc != 0) failures.fetch_add(1);
        }
    };
    if (n_threads <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return failures.load();
}

}  // extern "C"
