// fpng_tpu native host runtime.
//
// The reference library's host-side layers are C++ (portability/checksum
// kernels fpng.cpp:195-487, container framing :1662-1829, chunk walk
// :2903-3083, dynamic-header parse + LUT build :1954-2105).  This is the
// rebuild's native equivalent: everything O(pixels) runs on the TPU, and
// the O(1)-per-image host work that sits on the batch critical path runs
// here instead of Python -- CRC-32/Adler-32, batched PNG container
// assembly around device-produced deflate payloads, the decode-side chunk
// walk, and the dynamic-block header parse that builds the packed 12-bit
// decode LUT consumed by ops/specdec.py.
//
// Build: g++ -O3 -shared -fPIC (driven by fpng_tpu/runtime/__init__.py);
// binding is plain ctypes -- no external dependencies.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

// ---------------------------------------------------------------------------
// CRC-32 (slice-by-8; semantics of fpng.cpp:199-249's slice-by-4, widened)
// ---------------------------------------------------------------------------

uint32_t g_crc_tab[8][256];
bool g_crc_init = false;

void crc_init() {
    if (g_crc_init) return;
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        g_crc_tab[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; i++)
        for (int s = 1; s < 8; s++)
            g_crc_tab[s][i] =
                g_crc_tab[0][g_crc_tab[s - 1][i] & 0xFF] ^
                (g_crc_tab[s - 1][i] >> 8);
    g_crc_init = true;
}

uint32_t crc32_impl(const uint8_t* p, size_t n, uint32_t prev) {
    crc_init();
    uint32_t c = ~prev;
    while (n >= 8) {
        uint32_t lo, hi;
        memcpy(&lo, p, 4);
        memcpy(&hi, p + 4, 4);
        lo ^= c;
        c = g_crc_tab[7][lo & 0xFF] ^ g_crc_tab[6][(lo >> 8) & 0xFF] ^
            g_crc_tab[5][(lo >> 16) & 0xFF] ^ g_crc_tab[4][lo >> 24] ^
            g_crc_tab[3][hi & 0xFF] ^ g_crc_tab[2][(hi >> 8) & 0xFF] ^
            g_crc_tab[1][(hi >> 16) & 0xFF] ^ g_crc_tab[0][hi >> 24];
        p += 8; n -= 8;
    }
    while (n--) c = g_crc_tab[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
    return ~c;
}

// ---------------------------------------------------------------------------
// Adler-32 (mod-65521 deferral, fpng.cpp:465-487)
// ---------------------------------------------------------------------------

uint32_t adler32_impl(const uint8_t* p, size_t n, uint32_t prev) {
    uint32_t a = prev & 0xFFFF, b = prev >> 16;
    while (n) {
        size_t blk = n < 5552 ? n : 5552;
        n -= blk;
        while (blk--) { a += *p++; b += a; }
        a %= 65521; b %= 65521;
    }
    return (b << 16) | a;
}

// ---------------------------------------------------------------------------
// Shared format constants (fpng_tpu/constants.py parity)
// ---------------------------------------------------------------------------

const uint8_t PNG_SIG[8] = {137, 80, 78, 71, 13, 10, 26, 10};
const uint8_t FDEC_SIG[4] = {82, 36, 147, 227};
enum {
    DEC_SUCCESS = 0, DEC_NOT_FPNG = 1, DEC_INVALID_ARG = 2,
    DEC_NOT_PNG = 3, DEC_HDR_CRC = 4, DEC_BAD_DIMS = 5,
    DEC_CHUNK = 7, DEC_BAD_IDAT = 8,
};
const uint32_t MAX_DIM = 1u << 24;
const uint64_t MAX_PIXELS = 1ull << 30;

uint32_t rd_be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | p[3];
}
void wr_be32(uint8_t* p, uint32_t v) {
    p[0] = uint8_t(v >> 24); p[1] = uint8_t(v >> 16);
    p[2] = uint8_t(v >> 8); p[3] = uint8_t(v);
}

// ---------------------------------------------------------------------------
// Chunk walk (container.get_info_internal / fpng.cpp:2930-3077 parity)
// ---------------------------------------------------------------------------

int get_info_walk(const uint8_t* d, size_t len, int check_crcs,
                  uint32_t* w, uint32_t* h, uint32_t* ch,
                  uint32_t* idat_ofs, uint32_t* idat_len) {
    if (len < 8 + 25 + 12 + 1 + 12) return DEC_NOT_PNG;
    if (memcmp(d, PNG_SIG, 8)) return DEC_NOT_PNG;
    if (rd_be32(d + 8) != 13) return DEC_NOT_PNG;
    if (check_crcs && crc32_impl(d + 12, 17, 0) != rd_be32(d + 29))
        return DEC_HDR_CRC;
    uint32_t W = rd_be32(d + 16), H = rd_be32(d + 20);
    uint8_t bitdepth = d[24], color = d[25], comp = d[26], filt = d[27],
            inter = d[28];
    if (!W || !H || W > MAX_DIM || H > MAX_DIM) return DEC_BAD_DIMS;
    if ((uint64_t)W * H > MAX_PIXELS) return DEC_BAD_DIMS;
    *w = W; *h = H;
    if (comp || filt || inter || bitdepth != 8) return DEC_NOT_FPNG;
    if (color == 2) *ch = 3;
    else if (color == 6) *ch = 4;
    else return DEC_NOT_FPNG;

    size_t ofs = 33;
    bool found_fdec = false;
    for (;;) {
        if (ofs >= len || len - ofs < 12) return DEC_CHUNK;
        uint32_t clen = rd_be32(d + ofs);
        if (ofs + 12 + (uint64_t)clen > len) return DEC_CHUNK;
        const uint8_t* ct = d + ofs + 4;
        for (int i = 0; i < 4; i++) {
            uint8_t c = ct[i];
            if (!((c >= 65 && c <= 90) || (c >= 97 && c <= 122)))
                return DEC_CHUNK;
        }
        bool is_idat = !memcmp(ct, "IDAT", 4);
        if (check_crcs && !is_idat &&
            crc32_impl(d + ofs + 4, 4 + clen, 0) !=
                rd_be32(d + ofs + 8 + clen))
            return DEC_HDR_CRC;
        if (!memcmp(ct, "IEND", 4)) break;
        if (is_idat) {
            if (*idat_ofs || !found_fdec) return DEC_NOT_FPNG;
            *idat_ofs = (uint32_t)ofs;
            *idat_len = clen;
            if (clen < 7) return DEC_BAD_IDAT;
        } else if (!memcmp(ct, "fdEC", 4)) {
            if (found_fdec || clen != 5) return DEC_NOT_FPNG;
            if (memcmp(d + ofs + 8, FDEC_SIG, 4) || d[ofs + 12] != 0)
                return DEC_NOT_FPNG;
            found_fdec = true;
        } else if ((ct[0] & 32) == 0) {
            return DEC_NOT_FPNG;  // unknown critical chunk
        }
        ofs += 12 + clen;
    }
    if (!found_fdec || !*idat_ofs) return DEC_NOT_FPNG;
    return DEC_SUCCESS;
}

// get_info_internal parity: failure paths report idat_ofs/idat_len as 0
int get_info_impl(const uint8_t* d, size_t len, int check_crcs,
                  uint32_t* w, uint32_t* h, uint32_t* ch,
                  uint32_t* idat_ofs, uint32_t* idat_len) {
    *w = *h = *ch = *idat_ofs = *idat_len = 0;
    int st = get_info_walk(d, len, check_crcs, w, h, ch, idat_ofs, idat_len);
    if (st != DEC_SUCCESS) *idat_ofs = *idat_len = 0;
    return st;
}

// ---------------------------------------------------------------------------
// Dynamic-block header parse + packed 12-bit LUT (fpng.cpp:1954-2105 and
// ops/specdec.pack_lut parity)
// ---------------------------------------------------------------------------

struct BitRd {
    const uint8_t* p; size_t len; size_t pos;  // pos in bits
    uint32_t peek(int n) const {
        uint64_t w = 0;
        size_t byte = pos >> 3;
        for (int i = 0; i < 8; i++)
            if (byte + i < len) w |= uint64_t(p[byte + i]) << (8 * i);
        return uint32_t((w >> (pos & 7)) & ((1u << n) - 1));
    }
    uint32_t get(int n) { uint32_t v = peek(n); pos += n; return v; }
};

const int CLEN_ORDER[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4,
                            12, 3, 13, 2, 14, 1, 15};

// build_decoder_table parity (huffman.py:314): entry = sym | len<<9
bool build_table(int num_syms, const uint8_t* sizes, uint32_t* table,
                 int table_bits) {
    int64_t num_codes[17] = {0};
    for (int i = 0; i < num_syms; i++) {
        if (sizes[i] > 15) return false;
        num_codes[sizes[i]]++;
    }
    int64_t next_code[18] = {0};
    int64_t total = 0, nonzero = 0;
    for (int i = 1; i <= 15; i++) {
        nonzero += num_codes[i];
        total = (total + num_codes[i]) << 1;
        next_code[i + 1] = total;
    }
    if (total != 0x10000 && nonzero != 1) return false;
    size_t tsize = size_t(1) << table_bits;
    memset(table, 0, tsize * 4);
    for (int i = 0; i < num_syms; i++) {
        int size = sizes[i];
        if (!size) continue;
        int64_t code = next_code[size]++;
        // bit-reverse
        uint32_t rev = 0;
        for (int b = 0; b < size; b++) rev |= ((code >> b) & 1) << (size - 1 - b);
        if (size > table_bits) continue;  // callers reject >12 lit codes
        uint32_t entry = uint32_t(i) | (uint32_t(size) << 9);
        for (size_t j = rev; j < tsize; j += size_t(1) << size)
            table[j] = entry;
    }
    return true;
}

// deflate length-symbol geometry (constants.py LEN_BASE/EXTRA_BY_SYM)
void len_sym_geometry(int idx, int* base, int* nextra) {
    static int BASE[29], EXTRA[29];
    static bool init = false;
    if (!init) {
        static const int eb[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                   2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
        int length = 3;
        for (int s = 0; s < 28; s++) {
            BASE[s] = length; EXTRA[s] = eb[s];
            length += 1 << eb[s];
        }
        BASE[28] = 258; EXTRA[28] = 0;
        init = true;
    }
    *base = BASE[idx]; *nextra = EXTRA[idx];
}

// Returns DEC_SUCCESS and fills lut (4096 packed entries) + p0 (bit pos of
// the first token) or DEC_NOT_FPNG.
int parse_dyn_header_impl(const uint8_t* src, size_t src_len, int num_chans,
                          uint32_t* lut, int32_t* p0) {
    BitRd r{src, src_len, 0};
    if (src_len < 3 || src[0] != 0x78 || src[1] != 0x01) return DEC_NOT_FPNG;
    r.pos = 16;
    if (r.get(1) != 1 || r.get(2) != 2) return DEC_NOT_FPNG;

    int num_lit = int(r.get(5)) + 257;
    int num_dist = int(r.get(5)) + 1;
    int total = num_lit + num_dist;
    if (total > 288 + 32) return DEC_NOT_FPNG;
    int num_clen = int(r.get(4)) + 4;
    uint8_t clen_sizes[19] = {0};
    for (int i = 0; i < num_clen; i++)
        clen_sizes[CLEN_ORDER[i]] = uint8_t(r.get(3));
    static thread_local uint32_t clen_table[1 << 12];
    if (!build_table(19, clen_sizes, clen_table, 12)) return DEC_NOT_FPNG;

    uint8_t code_sizes[288 + 32] = {0};
    int cur = 0;
    while (cur < total) {
        uint32_t e = clen_table[r.peek(12)];
        int sym_len = (e >> 9) & 15;
        if (!sym_len) return DEC_NOT_FPNG;
        r.pos += sym_len;
        int sym = e & 511;
        if (sym <= 15) {
            if (sym > 12) return DEC_NOT_FPNG;  // fpng code limit
            code_sizes[cur++] = uint8_t(sym);
            continue;
        }
        int rep, val = 0;
        if (sym == 16) {
            if (cur == 0) return DEC_NOT_FPNG;
            rep = int(r.get(2)) + 3;
            val = code_sizes[cur - 1];
        } else if (sym == 17) {
            rep = int(r.get(3)) + 3;
        } else {
            rep = int(r.get(7)) + 11;
        }
        if (cur + rep > total) return DEC_NOT_FPNG;
        memset(code_sizes + cur, val, rep);
        cur += rep;
    }

    // fpng distance-code constraints (fpng.cpp:2058-2074)
    const uint8_t* dist_sizes = code_sizes + num_lit;
    int valid = 0;
    for (int i = 0; i < num_dist; i++) valid += dist_sizes[i] == 1;
    if (valid < 1 || valid > 2) return DEC_NOT_FPNG;
    if (num_chans - 1 >= num_dist || dist_sizes[num_chans - 1] != 1)
        return DEC_NOT_FPNG;
    if (valid == 2 && dist_sizes[num_chans] != 1) return DEC_NOT_FPNG;

    uint8_t lit_sizes[288] = {0};
    memcpy(lit_sizes, code_sizes, num_lit < 288 ? num_lit : 288);
    if (!build_table(288, lit_sizes, lut, 12)) return DEC_NOT_FPNG;

    // pack run geometry (specdec.pack_lut parity).  Reserved syms 286/287
    // keep their sym|clen with zero geometry: walks must keep advancing so
    // a spurious lane never freezes the entry fixpoint (specdec.py:74-78);
    // the record pass rejects them on the true chain.
    for (size_t i = 0; i < 4096; i++) {
        uint32_t e = lut[i];
        int sym = e & 511;
        if (sym > 285) { lut[i] = e & 0x1FFF; continue; }
        if (sym > 256 && e) {
            int base, nextra;
            len_sym_geometry(sym - 257, &base, &nextra);
            lut[i] = (e & 0x1FFF) | (uint32_t(nextra) << 13) |
                     (uint32_t(base) << 16);
        }
    }
    *p0 = int32_t(r.pos);
    return DEC_SUCCESS;
}

// ---------------------------------------------------------------------------
// Batched container assembly (fpng.cpp:1662-1829 driver work, batched)
// ---------------------------------------------------------------------------

void build_header(uint8_t* hdr, uint32_t zlib_size, uint32_t w, uint32_t h,
                  int num_chans) {
    memcpy(hdr, PNG_SIG, 8);
    wr_be32(hdr + 8, 13);
    memcpy(hdr + 12, "IHDR", 4);
    wr_be32(hdr + 16, w);
    wr_be32(hdr + 20, h);
    hdr[24] = 8;
    hdr[25] = num_chans == 3 ? 2 : 6;
    hdr[26] = hdr[27] = hdr[28] = 0;
    wr_be32(hdr + 29, crc32_impl(hdr + 12, 17, 0));
    wr_be32(hdr + 33, 5);
    memcpy(hdr + 37, "fdEC", 4);
    memcpy(hdr + 41, FDEC_SIG, 4);
    hdr[45] = 0;
    wr_be32(hdr + 46, crc32_impl(hdr + 37, 9, 0));
    wr_be32(hdr + 50, zlib_size);
    memcpy(hdr + 54, "IDAT", 4);
}

}  // namespace

extern "C" {

uint32_t fp_crc32(const uint8_t* p, size_t n, uint32_t prev) {
    return crc32_impl(p, n, prev);
}

uint32_t fp_adler32(const uint8_t* p, size_t n, uint32_t prev) {
    return adler32_impl(p, n, prev);
}

int fp_get_info(const uint8_t* d, size_t len, int check_crcs,
                uint32_t* w, uint32_t* h, uint32_t* ch,
                uint32_t* idat_ofs, uint32_t* idat_len) {
    return get_info_impl(d, len, check_crcs, w, h, ch, idat_ofs, idat_len);
}

int fp_parse_dyn_header(const uint8_t* src, size_t src_len, int num_chans,
                        uint32_t* lut, int32_t* p0) {
    return parse_dyn_header_impl(src, src_len, num_chans, lut, p0);
}

// Assemble B PNGs around device-produced deflate payloads.
//   words:      (B, num_words) little-endian uint32 payload buffers
//   total_bits: (B,) deflate stream length in bits (incl. spliced prefix)
//   last_tok:   (B,) bit offset of the last token start (flush-window rule)
//   adler:      (B,) device adler32 of the filtered stream
//   prefix_*:   per-image serialized header prefixes (concatenated)
//   budget:     reference output budget for the deflate stream
// Output: `out` arena of size B*(58+budget+16); out_lens[b] = PNG byte
// length, or 0 when image b needs the stored-block fallback (caller
// handles it; fpng.cpp:1728-1758).
void fp_assemble_batch(
    const uint8_t* words, int64_t num_words,
    const int64_t* total_bits, const int64_t* last_tok,
    const uint32_t* adler,
    const uint8_t* prefix_data, const int64_t* prefix_ofs,
    int64_t b_count, uint32_t w, uint32_t h, int num_chans, int64_t budget,
    uint8_t* out, int64_t out_stride, int64_t* out_lens) {
    for (int64_t b = 0; b < b_count; b++) {
        int64_t tb = total_bits[b];
        int64_t total_bytes = (tb + 7) >> 3;
        int64_t plen = prefix_ofs[b + 1] - prefix_ofs[b];
        bool fail = (last_tok[b] >= 0 && (last_tok[b] >> 3) + 8 > budget) ||
                    total_bytes + 4 > budget || plen > budget;
        if (fail) { out_lens[b] = 0; continue; }
        uint8_t* dst = out + b * out_stride;
        uint32_t zlib_size = uint32_t(total_bytes + 4);
        build_header(dst, zlib_size, w, h, num_chans);
        uint8_t* body = dst + 58;
        memcpy(body, words + b * num_words * 4, total_bytes);
        memcpy(body, prefix_data + prefix_ofs[b], plen);
        wr_be32(body + total_bytes, adler[b]);
        uint32_t idat_crc = crc32_impl(dst + 54, 4 + zlib_size, 0);
        uint8_t* tail = body + zlib_size;
        wr_be32(tail, idat_crc);
        wr_be32(tail + 4, 0);
        memcpy(tail + 8, "IEND", 4);
        wr_be32(tail + 12, crc32_impl(tail + 8, 4, 0));
        out_lens[b] = 58 + zlib_size + 16;
    }
}

}  // extern "C"
