// Comparison-codec / validator shim: qoi, stb_image, stb_image_write and
// the wuffs PNG decoder, compiled from the reference's vendored copies.
//
// Role parity with the reference harness (fpng_test.cpp:1329-1606): these
// are benchmark baselines and arm's-length correctness oracles for the
// rebuild's outputs -- external binaries, not part of the framework.
// wuffs is the strictest PNG decoder (its strictness forced fpng's
// 2-dist-code rule, fpng.cpp:2058-2074) and serves as the bitstream
// conformance validator (pngcheck-class; README.md:2).

#include <cstdint>
#include <cstdlib>
#include <cstring>

#define QOI_IMPLEMENTATION
#define QOI_NO_STDIO
#include "qoi.h"

#define STB_IMAGE_IMPLEMENTATION
#include "stb_image.h"

#define STB_IMAGE_WRITE_IMPLEMENTATION
#include "stb_image_write.h"

#define WUFFS_IMPLEMENTATION
#define WUFFS_CONFIG__MODULES
#define WUFFS_CONFIG__MODULE__ADLER32
#define WUFFS_CONFIG__MODULE__BASE
#define WUFFS_CONFIG__MODULE__CRC32
#define WUFFS_CONFIG__MODULE__DEFLATE
#define WUFFS_CONFIG__MODULE__PNG
#define WUFFS_CONFIG__MODULE__ZLIB
#include "wuffs-v0.3.c"

extern "C" {

void codecs_free(void* p) { free(p); }

// --- qoi -------------------------------------------------------------------

int codecs_qoi_encode(const uint8_t* img, uint32_t w, uint32_t h,
                      uint32_t ch, uint8_t** out, size_t* out_len) {
    qoi_desc desc;
    desc.width = w;
    desc.height = h;
    desc.channels = uint8_t(ch);
    desc.colorspace = QOI_SRGB;
    int len = 0;
    void* p = qoi_encode(img, &desc, &len);
    if (!p) return 0;
    *out = (uint8_t*)p;
    *out_len = size_t(len);
    return 1;
}

int codecs_qoi_decode(const uint8_t* data, size_t len, uint32_t desired,
                      uint8_t** out, uint32_t* w, uint32_t* h,
                      uint32_t* ch) {
    qoi_desc desc;
    void* p = qoi_decode(data, int(len), &desc, int(desired));
    if (!p) return 0;
    *out = (uint8_t*)p;
    *w = desc.width;
    *h = desc.height;
    *ch = desc.channels;
    return 1;
}

// --- stb -------------------------------------------------------------------

struct WriteCtx {
    uint8_t* buf;
    size_t len, cap;
};

static void stbi_sink(void* context, void* data, int size) {
    WriteCtx* c = (WriteCtx*)context;
    if (c->len + size > c->cap) {
        c->cap = (c->len + size) * 2;
        c->buf = (uint8_t*)realloc(c->buf, c->cap);
    }
    memcpy(c->buf + c->len, data, size);
    c->len += size;
}

int codecs_stbi_write_png(const uint8_t* img, uint32_t w, uint32_t h,
                          uint32_t ch, uint8_t** out, size_t* out_len) {
    WriteCtx c{(uint8_t*)malloc(1 << 16), 0, 1 << 16};
    int ok = stbi_write_png_to_func(stbi_sink, &c, int(w), int(h), int(ch),
                                    img, int(w * ch));
    if (!ok) { free(c.buf); return 0; }
    *out = c.buf;
    *out_len = c.len;
    return 1;
}

int codecs_stbi_load(const uint8_t* png, size_t len, uint32_t desired,
                     uint8_t** out, uint32_t* w, uint32_t* h,
                     uint32_t* ch) {
    int iw, ih, ich;
    stbi_uc* p = stbi_load_from_memory(png, int(len), &iw, &ih, &ich,
                                       int(desired));
    if (!p) return 0;
    *out = p;
    *w = uint32_t(iw);
    *h = uint32_t(ih);
    *ch = uint32_t(ich);
    return 1;
}

// --- wuffs (strict conformance validator + decode benchmark) ---------------

// Returns 0 on success (out = RGBA8, caller frees), nonzero error code
// otherwise.  Any nonzero return means wuffs rejected the bitstream.
int codecs_wuffs_decode(const uint8_t* png, size_t len,
                        uint8_t** out, uint32_t* w, uint32_t* h) {
    wuffs_png__decoder* dec = wuffs_png__decoder__alloc();
    if (!dec) return -1;

    wuffs_base__io_buffer src =
        wuffs_base__ptr_u8__reader((uint8_t*)png, len, true);
    wuffs_base__image_config ic = {0};
    wuffs_base__status st =
        wuffs_png__decoder__decode_image_config(dec, &ic, &src);
    if (!wuffs_base__status__is_ok(&st)) { free(dec); return 1; }

    uint32_t iw = wuffs_base__pixel_config__width(&ic.pixcfg);
    uint32_t ih = wuffs_base__pixel_config__height(&ic.pixcfg);
    if (!iw || !ih || uint64_t(iw) * ih > (1u << 30)) {
        free(dec);
        return 2;
    }
    wuffs_base__pixel_config__set(
        &ic.pixcfg, WUFFS_BASE__PIXEL_FORMAT__RGBA_NONPREMUL,
        WUFFS_BASE__PIXEL_SUBSAMPLING__NONE, iw, ih);

    uint64_t wb_len =
        wuffs_png__decoder__workbuf_len(dec).max_incl;
    uint8_t* workbuf = (uint8_t*)malloc(wb_len ? wb_len : 1);
    uint8_t* pixels = (uint8_t*)malloc(size_t(iw) * ih * 4);
    if (!workbuf || !pixels) {
        free(workbuf); free(pixels); free(dec);
        return -2;
    }

    wuffs_base__pixel_buffer pb = {0};
    st = wuffs_base__pixel_buffer__set_from_slice(
        &pb, &ic.pixcfg,
        wuffs_base__make_slice_u8(pixels, size_t(iw) * ih * 4));
    if (!wuffs_base__status__is_ok(&st)) {
        free(workbuf); free(pixels); free(dec);
        return 3;
    }

    wuffs_base__frame_config fc = {0};
    st = wuffs_png__decoder__decode_frame_config(dec, &fc, &src);
    if (!wuffs_base__status__is_ok(&st)) {
        free(workbuf); free(pixels); free(dec);
        return 4;
    }
    st = wuffs_png__decoder__decode_frame(
        dec, &pb, &src, WUFFS_BASE__PIXEL_BLEND__SRC,
        wuffs_base__make_slice_u8(workbuf, wb_len), NULL);
    free(workbuf);
    free(dec);
    if (!wuffs_base__status__is_ok(&st)) {
        free(pixels);
        return 5;
    }
    *out = pixels;
    *w = iw;
    *h = ih;
    return 0;
}

}  // extern "C"
