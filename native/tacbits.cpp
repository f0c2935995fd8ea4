// tacbits: host-side bitstream hot loops for the tac codec.
//
// The TPU encode path packs bits on device (tac/ops/bitpack.py); what
// remains host-side and serial is the DECODE of variable-length payloads
// (field walks whose offsets depend on prior fields, and canonical Huffman
// code walks). These are the loops the reference runs in interpreted
// Python bit-by-bit (SURVEY.md §3.2 hot loop); here they are C++ behind a
// ctypes interface (tac/native.py) with a pure-NumPy fallback.
//
// Bit order: MSB-first within the byte stream (SPEC.md §7).
//
// Decoder input is untrusted: every read is bounded by total_bits (reads
// past the end return zero bits and latch an overrun flag; entry points
// report overrun as a negative return so tac/native.py can raise a
// corrupt-stream error instead of decoding garbage).

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
    const uint8_t* data;
    int64_t pos;         // absolute bit index
    int64_t total_bits;  // buffer size bound
    bool overrun;

    inline uint64_t read(int width) {
        uint64_t v = 0;
        for (int i = 0; i < width; ++i) {
            if (pos < total_bits) {
                v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1u);
            } else {
                v <<= 1;
                overrun = true;
            }
            ++pos;
        }
        return v;
    }
};

}  // namespace

extern "C" {

// Sequential variable-width field reads starting at bit_offset.
// Returns the end bit position, or -1 if any read crossed total_bits.
int64_t tac_unpack_fields(const uint8_t* data, int64_t total_bits,
                          int64_t bit_offset, const int32_t* widths,
                          int64_t n, int64_t* out) {
    BitReader br{data, bit_offset, total_bits, false};
    for (int64_t i = 0; i < n; ++i) out[i] = (int64_t)br.read(widths[i]);
    return br.overrun ? -1 : br.pos;
}

// Decode one block's mantissa run: per line a canonical-Huffman symbol
// (peek-LUT) or a raw field.  For line i with m = m_per_line[i]:
//   m == 0        -> skip (mant 0)
//   m < 2 || m > 8 -> raw m bits
//   else          -> LUT walk on table (m - 2); escape emits raw m bits.
// Tables are concatenated peek LUTs: for size m the LUT has (1 << L[m-2])
// entries of (symbol, length) int32 pairs; lut_off gives the entry offset.
// Returns the end bit position, or -1 if any consuming read crossed
// total_bits (the peek loop alone may zero-pad past the end: a codeword
// ending exactly at the buffer end is legal).
int64_t tac_huffman_decode_lines(
    const uint8_t* data, int64_t start_bit, int64_t total_bits,
    const int32_t* m_per_line, int64_t h,
    const int32_t* lut_sym, const int32_t* lut_len,
    const int64_t* lut_off, const int32_t* lut_bits,
    const int32_t* escape_sym, int64_t* out) {
    BitReader br{data, start_bit, total_bits, false};
    for (int64_t i = 0; i < h; ++i) {
        int m = m_per_line[i];
        if (m == 0) { out[i] = 0; continue; }
        if (m < 2 || m > 8) { out[i] = (int64_t)br.read(m); continue; }
        int t = m - 2;
        int L = lut_bits[t];
        // peek L bits without consuming (zero-pad past the end)
        uint64_t peek = 0;
        int64_t p = br.pos;
        for (int j = 0; j < L; ++j) {
            uint64_t bit = (p < total_bits)
                ? ((data[p >> 3] >> (7 - (p & 7))) & 1u) : 0u;
            peek = (peek << 1) | bit;
            ++p;
        }
        int32_t sym = lut_sym[lut_off[t] + peek];
        br.pos += lut_len[lut_off[t] + peek];
        if (br.pos > total_bits) br.overrun = true;
        if (sym == escape_sym[t]) {
            out[i] = (int64_t)br.read(m);
        } else {
            out[i] = sym;
        }
        if (br.overrun) return -1;
    }
    return br.overrun ? -1 : br.pos;
}

// Walk k u16-length-prefixed payloads starting at byte `offset`: the
// decode staging loop (container framing). Returns the end offset, or -1
// if any prefix or payload crosses the buffer end (truncated stream).
int64_t tac_split_blocks(const uint8_t* data, int64_t nbytes, int64_t offset,
                         int64_t k, int64_t* offs, int64_t* lens) {
    int64_t o = offset;
    for (int64_t i = 0; i < k; ++i) {
        if (o + 2 > nbytes) return -1;
        int64_t len = (int64_t)data[o] | ((int64_t)data[o + 1] << 8);
        offs[i] = o + 2;
        lens[i] = len;
        o += 2 + len;
        if (o > nbytes) return -1;
    }
    return o;
}

// MSB-first field packing (host fallback mirror of the device packer).
// Returns total bits written.  out must be zeroed, sized >= ceil(sum/8).
int64_t tac_pack_fields(const int64_t* vals, const int32_t* widths,
                        int64_t n, uint8_t* out) {
    int64_t pos = 0;
    for (int64_t i = 0; i < n; ++i) {
        int w = widths[i];
        uint64_t v = (uint64_t)vals[i];
        for (int b = w - 1; b >= 0; --b) {
            if ((v >> b) & 1u) out[pos >> 3] |= (uint8_t)(0x80u >> (pos & 7));
            ++pos;
        }
    }
    return pos;
}

}  // extern "C"
