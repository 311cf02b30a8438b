// C-linkage shim exposing the reference fpng + lodepng as test oracles.
// Compiled at test time against the read-only reference checkout
// (sources are NOT vendored into this repo); used only by the test suite
// for cross-validation, mirroring how the reference harness uses lodepng.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "fpng.h"
#include "lodepng.h"

static uint8_t* dup_vec(const std::vector<uint8_t>& v, size_t* out_len) {
    uint8_t* p = (uint8_t*)malloc(v.size() ? v.size() : 1);
    if (!v.empty()) memcpy(p, v.data(), v.size());
    *out_len = v.size();
    return p;
}

extern "C" {

void ref_init() { fpng::fpng_init(); }

void ref_free(void* p) { free(p); }

// returns 1 on success
int ref_encode(const uint8_t* img, uint32_t w, uint32_t h, uint32_t ch,
               uint32_t flags, uint8_t** out, size_t* out_len) {
    std::vector<uint8_t> buf;
    if (!fpng::fpng_encode_image_to_memory(img, w, h, ch, buf, flags))
        return 0;
    *out = dup_vec(buf, out_len);
    return 1;
}

// returns fpng decode status
int ref_decode(const uint8_t* png, uint32_t len, uint32_t desired,
               uint8_t** out, size_t* out_len,
               uint32_t* w, uint32_t* h, uint32_t* ch) {
    std::vector<uint8_t> buf;
    int st = fpng::fpng_decode_memory(png, len, buf, *w, *h, *ch, desired);
    *out = dup_vec(buf, out_len);
    return st;
}

int ref_get_info(const uint8_t* png, uint32_t len,
                 uint32_t* w, uint32_t* h, uint32_t* ch) {
    return fpng::fpng_get_info(png, len, *w, *h, *ch);
}

uint32_t ref_crc32(const uint8_t* p, size_t n, uint32_t prev) {
    return fpng::fpng_crc32(p, n, prev);
}

uint32_t ref_adler32(const uint8_t* p, size_t n, uint32_t prev) {
    return fpng::fpng_adler32(p, n, prev);
}

// lodepng oracle: decode to RGBA8; returns lodepng error code (0 = ok)
int ref_lodepng_decode(const uint8_t* png, size_t len,
                       uint8_t** out, unsigned* w, unsigned* h) {
    unsigned char* img = nullptr;
    unsigned err = lodepng_decode_memory(&img, w, h, png, len, LCT_RGBA, 8);
    *out = img;  // lodepng uses malloc
    return (int)err;
}

int ref_lodepng_encode(const uint8_t* img, unsigned w, unsigned h,
                       unsigned ch, uint8_t** out, size_t* out_len) {
    unsigned char* png = nullptr;
    size_t n = 0;
    unsigned err = lodepng_encode_memory(&png, &n, img, w, h,
                                         ch == 3 ? LCT_RGB : LCT_RGBA, 8);
    *out = png;
    *out_len = n;
    return (int)err;
}

}  // extern "C"
