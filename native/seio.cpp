// libseio — native audio decode for the speech-enhancement framework.
//
// The reference leans on librosa/torchaudio (and their C deps) for audio
// I/O (/root/reference/dataset.py:114,234). This library provides the
// native decode path for this framework: a full FLAC decoder (the format
// LibriSpeech ships in — see libri-*.txt lists), exposed through a C ABI
// consumed via ctypes (data/flac.py). WAV decoding is a vectorized numpy
// RIFF parser (data/audio_io.py) — already memory-bandwidth-bound there.
//
// FLAC support: STREAMINFO parsing; frames with independent/left-side/
// right-side/mid-side channel assignments; constant/verbatim/fixed(0-4)/
// LPC(<=32) subframes; rice-coded residual partitions (4- and 5-bit
// parameters, escape codes); wasted bits; UTF-8 frame numbers. CRCs are
// parsed but not verified (decode speed over paranoia; lengths are
// validated against STREAMINFO).
//
// Build: make -C native   (produces libseio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Word-buffered MSB-first bit reader. The valid (unconsumed) bits are
// the LOW `nbits` bits of `buf`; the next stream bit is bit `nbits-1`.
// Bits above `nbits` are stale and must be masked/shifted out by every
// consumer. Rice decoding dominates FLAC decode time, so read_unary
// scans buffered words with clz instead of looping per bit (measured
// ~3x decoder throughput vs the per-bit reader, BENCH_MODE=loader).
struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte_pos = 0;   // next byte to pull into the buffer
    uint64_t buf = 0;
    int nbits = 0;         // valid bits in buf (0..63)
    bool error = false;

    BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

    bool at_end() const { return byte_pos >= size && nbits == 0; }

    inline void refill() {
        while (nbits <= 55 && byte_pos < size) {
            buf = (buf << 8) | data[byte_pos++];
            nbits += 8;
        }
        // (a bswap32 bulk load was measured no faster at FLAC's typical
        // refill cadence — the per-byte loop stays)
    }

    uint64_t read_bits(int n) {
        if (n <= 0) return 0;
        refill();
        if (nbits < n) { error = true; nbits = 0; return 0; }
        nbits -= n;
        return (buf >> nbits) & (~0ull >> (64 - n));
    }

    uint32_t read_bit() { return (uint32_t)read_bits(1); }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n == 0) return 0;
        uint64_t sign = 1ull << (n - 1);
        return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        for (;;) {
            refill();
            if (nbits == 0) { error = true; return q; }
            // left-align the valid region; stale high bits shift out
            uint64_t window = buf << (64 - nbits);
            if (window == 0) { q += nbits; nbits = 0; continue; }
            int lz = __builtin_clzll(window);
            if (lz >= nbits) { q += nbits; nbits = 0; continue; }
            q += lz;
            nbits -= lz + 1;  // the zeros plus the terminating 1-bit
            return q;
        }
    }

    // Drop to the next byte boundary of the STREAM and flush the buffer,
    // restoring the invariant byte_pos == stream position (the frame-sync
    // scan reads data[byte_pos] directly between frames).
    void align() {
        nbits -= nbits % 8;
        byte_pos -= nbits / 8;
        nbits = 0;
    }
};

// UTF-8-style coded number (frame header sample/frame index)
uint64_t read_utf8(BitReader& br) {
    uint64_t b0 = br.read_bits(8);
    int extra = 0;
    uint64_t v;
    if ((b0 & 0x80) == 0) return b0;
    else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
    else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
    else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
    else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
    else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
    else if (b0 == 0xFE) { extra = 6; v = 0; }
    else { br.error = true; return 0; }
    for (int i = 0; i < extra; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
    return v;
}

int64_t zigzag(uint64_t v) {
    return (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
}

// One rice-coded residual (unary quotient + param-bit remainder). Fast
// path: quotient run AND remainder both sit inside the buffered word —
// one refill, no per-bit work. Falls back to the general readers when
// the run spans a refill boundary.
inline int64_t read_rice(BitReader& br, int param) {
    br.refill();
    if (br.nbits > 0) {
        uint64_t window = br.buf << (64 - br.nbits);
        if (window != 0) {
            int lz = __builtin_clzll(window);
            if (lz + 1 + param <= br.nbits) {
                br.nbits -= lz + 1;
                uint64_t r = 0;
                if (param) {
                    br.nbits -= param;
                    r = (br.buf >> br.nbits) & (~0ull >> (64 - param));
                }
                return zigzag(((uint64_t)lz << param) | r);
            }
        }
    }
    uint32_t q = br.read_unary();
    uint64_t r = br.read_bits(param);
    return zigzag(((uint64_t)q << param) | r);
}

// rice-coded residual for one subframe
bool read_residual(BitReader& br, int block_size, int pred_order,
                   std::vector<int64_t>& out) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t part_order = (uint32_t)br.read_bits(4);
    uint32_t n_part = 1u << part_order;
    int idx = pred_order;
    for (uint32_t p = 0; p < n_part; ++p) {
        int n = (block_size >> part_order) - (p == 0 ? pred_order : 0);
        if (n < 0) return false;
        uint32_t param = (uint32_t)br.read_bits(param_bits);
        if (param == escape) {
            uint32_t bits = (uint32_t)br.read_bits(5);
            for (int i = 0; i < n; ++i) out[idx++] = br.read_signed(bits);
        } else {
            for (int i = 0; i < n; ++i)
                out[idx++] = read_rice(br, (int)param);
        }
        if (br.error) return false;
    }
    return idx == block_size;
}

// LPC prediction with the order as a compile-time constant so the
// coefficient loop fully unrolls (the runtime-order loop measured ~40%
// slower on order-8 streams — the order real LibriSpeech FLAC uses).
// uint64_t math throughout: corrupt residuals can be huge and signed
// overflow is UB; wraparound matches valid-stream arithmetic.
template <int ORDER>
void lpc_predict_n(uint64_t* o, const uint64_t* c, int block_size,
                   int shift) {
    for (int i = ORDER; i < block_size; ++i) {
        uint64_t pred = 0;
        for (int j = 0; j < ORDER; ++j) pred += c[j] * o[i - 1 - j];
        o[i] += (uint64_t)((int64_t)pred >> shift);
    }
}

void lpc_predict(uint64_t* o, const uint64_t* c, int order, int block_size,
                 int shift) {
    switch (order) {
        case 1: lpc_predict_n<1>(o, c, block_size, shift); return;
        case 2: lpc_predict_n<2>(o, c, block_size, shift); return;
        case 3: lpc_predict_n<3>(o, c, block_size, shift); return;
        case 4: lpc_predict_n<4>(o, c, block_size, shift); return;
        case 5: lpc_predict_n<5>(o, c, block_size, shift); return;
        case 6: lpc_predict_n<6>(o, c, block_size, shift); return;
        case 7: lpc_predict_n<7>(o, c, block_size, shift); return;
        case 8: lpc_predict_n<8>(o, c, block_size, shift); return;
        case 9: lpc_predict_n<9>(o, c, block_size, shift); return;
        case 10: lpc_predict_n<10>(o, c, block_size, shift); return;
        case 11: lpc_predict_n<11>(o, c, block_size, shift); return;
        case 12: lpc_predict_n<12>(o, c, block_size, shift); return;
    }
    for (int i = order; i < block_size; ++i) {
        uint64_t pred = 0;
        for (int j = 0; j < order; ++j) pred += c[j] * o[i - 1 - j];
        o[i] += (uint64_t)((int64_t)pred >> shift);
    }
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
    if (br.read_bit() != 0) return false;  // padding bit
    uint32_t type = (uint32_t)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = 1 + (int)br.read_unary();
    // corrupt input can claim absurd wasted-bit counts; the shift at the
    // end must stay defined and bps must stay positive
    if (wasted >= bps || wasted > 32) return false;
    bps -= wasted;

    out.assign(block_size, 0);
    if (type == 0) {  // constant
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < block_size; ++i) out[i] = v;
    } else if (type == 1) {  // verbatim
        for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {  // fixed, order 0-4
        int order = type - 8;
        if (order > block_size) return false;  // warm-up would overrun out
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        if (!read_residual(br, block_size, order, out)) return false;
        // specialized per order (the inner coefficient loop does not
        // unroll well with a runtime bound); uint64_t accumulation:
        // corrupt residuals can be huge and signed overflow is UB —
        // wraparound matches valid-stream math
        uint64_t* o = (uint64_t*)out.data();
        switch (order) {
            case 1:
                for (int i = 1; i < block_size; ++i) o[i] += o[i - 1];
                break;
            case 2:
                for (int i = 2; i < block_size; ++i)
                    o[i] += 2 * o[i - 1] - o[i - 2];
                break;
            case 3:
                for (int i = 3; i < block_size; ++i)
                    o[i] += 3 * o[i - 1] - 3 * o[i - 2] + o[i - 3];
                break;
            case 4:
                for (int i = 4; i < block_size; ++i)
                    o[i] += 4 * o[i - 1] - 6 * o[i - 2] + 4 * o[i - 3]
                            - o[i - 4];
                break;
            default: break;  // order 0: residuals are the samples
        }
    } else if (type >= 32) {  // LPC, order 1-32
        int order = (int)(type - 31);
        if (order > block_size) return false;  // warm-up would overrun out
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // invalid escape
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;  // negative shift is invalid FLAC
        uint64_t coeffs[32];
        for (int i = 0; i < order; ++i)
            coeffs[i] = (uint64_t)br.read_signed(precision);
        if (!read_residual(br, block_size, order, out)) return false;
        lpc_predict((uint64_t*)out.data(), coeffs, order, block_size,
                    shift);
    } else {
        return false;  // reserved
    }
    if (wasted)
        for (auto& v : out) v = (int64_t)((uint64_t)v << wasted);
    return !br.error;
}

struct StreamInfo {
    uint32_t sample_rate = 0;
    int channels = 0;
    int bps = 0;
    uint64_t total_samples = 0;
};

const int BLOCK_SIZES[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int SAMPLE_RATES[16] = {0, 88200, 176400, 192000, 8000, 16000, 22050,
                              24000, 32000, 44100, 48000, 96000, -1, -2, -3, 0};

}  // namespace

extern "C" {

// Decode a FLAC file into interleaved float32 [-1, 1].
// Returns 0 on success. Caller frees *out with seio_free.
// Negative returns are clean failures; corrupt/hostile input must never
// crash the host process (the decoder runs in-process via ctypes inside
// long-lived training/serving processes — fuzzed in tests/test_flac.py).
static int decode_flac_impl(const uint8_t* data, size_t size, float** out,
                            int64_t* n_samples, int* n_channels,
                            int* sample_rate) {
    if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
    size_t pos = 4;
    StreamInfo info;
    bool last = false;
    while (!last && pos + 4 <= size) {
        uint8_t head = data[pos];
        last = head & 0x80;
        int type = head & 0x7F;
        uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
        pos += 4;
        if (type == 0 && len >= 34 && pos + 34 <= size) {  // STREAMINFO
            const uint8_t* p = data + pos;
            info.sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
            info.channels = ((p[12] >> 1) & 0x7) + 1;
            info.bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
            info.total_samples = ((uint64_t)(p[13] & 0x0F) << 32) |
                ((uint64_t)p[14] << 24) | (p[15] << 16) | (p[16] << 8) | p[17];
        }
        pos += len;  // may pass `size` on a lying metadata length
    }
    if (pos > size) return -2;  // metadata overran the file
    if (info.sample_rate == 0 || info.channels == 0 || info.bps < 4)
        return -2;

    std::vector<std::vector<int64_t>> subs(info.channels);
    std::vector<float> pcm;
    // a lying STREAMINFO must not trigger a giant allocation up front;
    // legit sizes pre-reserve, the vector grows past the cap if needed
    const size_t kReserveCap = (size_t)1 << 26;  // 64 M floats = 256 MB
    if (info.total_samples) {
        size_t want = (size_t)info.total_samples * info.channels;
        pcm.reserve(want < kReserveCap ? want : kReserveCap);
    }

    BitReader br(data + pos, size - pos);
    while (!br.at_end() && !br.error) {
        // find frame sync 11111111 111110xx
        br.align();
        if (br.byte_pos + 2 > br.size) break;
        if (br.data[br.byte_pos] != 0xFF ||
            (br.data[br.byte_pos + 1] & 0xFC) != 0xF8) {
            ++br.byte_pos;
            continue;
        }
        br.read_bits(14);                       // sync
        br.read_bit();                          // reserved
        br.read_bit();                          // blocking strategy
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_code = (uint32_t)br.read_bits(4);
        uint32_t sz_code = (uint32_t)br.read_bits(3);
        br.read_bit();                          // reserved
        read_utf8(br);                          // frame/sample number

        int block_size = BLOCK_SIZES[bs_code];
        if (block_size == -1) block_size = (int)br.read_bits(8) + 1;
        else if (block_size == -2) block_size = (int)br.read_bits(16) + 1;
        else if (block_size == 0) { br.error = true; break; }

        int sr = SAMPLE_RATES[sr_code];
        if (sr == -1) br.read_bits(8);
        else if (sr == -2) br.read_bits(16);
        else if (sr == -3) br.read_bits(16);

        int bps = info.bps;
        switch (sz_code) {
            case 1: bps = 8; break;
            case 2: bps = 12; break;
            case 4: bps = 16; break;
            case 5: bps = 20; break;
            case 6: bps = 24; break;
            case 7: bps = 32; break;
            default: break;
        }
        br.read_bits(8);  // CRC-8 (unverified)

        int nch = info.channels;
        bool left_side = false, right_side = false, mid_side = false;
        if (ch_code <= 7) {
            if ((int)ch_code + 1 != nch) { br.error = true; break; }
        } else if (ch_code <= 10) {
            // stereo decorrelation modes index subs[0]/subs[1], which are
            // only provisioned for a 2-channel stream
            if (nch != 2) { br.error = true; break; }
            left_side = ch_code == 8;
            right_side = ch_code == 9;
            mid_side = ch_code == 10;
        }
        else { br.error = true; break; }

        bool ok = true;
        for (int c = 0; c < nch; ++c) {
            int sub_bps = bps;
            if ((left_side && c == 1) || (right_side && c == 0) ||
                (mid_side && c == 1))
                sub_bps += 1;  // the side channel carries one extra bit
            if (!decode_subframe(br, block_size, sub_bps, subs[c])) {
                ok = false;
                break;
            }
        }
        if (!ok || br.error) break;
        br.align();
        br.read_bits(16);  // CRC-16 (unverified)

        // undo inter-channel decorrelation
        if (left_side) {
            for (int i = 0; i < block_size; ++i)
                subs[1][i] = subs[0][i] - subs[1][i];
        } else if (right_side) {
            for (int i = 0; i < block_size; ++i)
                subs[0][i] = subs[1][i] + subs[0][i];
        } else if (mid_side) {
            for (int i = 0; i < block_size; ++i) {
                int64_t side = subs[1][i];
                int64_t mid = (subs[0][i] << 1) | (side & 1);
                subs[0][i] = (mid + side) >> 1;
                subs[1][i] = (mid - side) >> 1;
            }
        }

        float scale = 1.0f / (float)(1ll << (bps - 1));
        size_t base = pcm.size();
        pcm.resize(base + (size_t)block_size * info.channels);
        float* dst = pcm.data() + base;
        if (info.channels == 1) {
            const int64_t* s0 = subs[0].data();
            for (int i = 0; i < block_size; ++i)
                dst[i] = (float)s0[i] * scale;
        } else {
            for (int i = 0; i < block_size; ++i)
                for (int c = 0; c < info.channels; ++c)
                    *dst++ = (float)subs[c][i] * scale;
        }

        if (info.total_samples &&
            pcm.size() >= info.total_samples * (size_t)info.channels)
            break;
        // unknown-length stream (total_samples == 0): bound the output so
        // a corrupt file full of cheap high-inflation frames (a 15-byte
        // 65536-sample constant frame) cannot grow pcm without limit
        if (!info.total_samples && pcm.size() > ((size_t)1 << 28)) break;
    }

    if (pcm.empty()) return -3;
    if (info.total_samples) {
        size_t want = (size_t)info.total_samples * info.channels;
        if (pcm.size() > want) pcm.resize(want);
    }
    float* buf = (float*)malloc(pcm.size() * sizeof(float));
    if (!buf) return -4;
    memcpy(buf, pcm.data(), pcm.size() * sizeof(float));
    *out = buf;
    *n_samples = (int64_t)(pcm.size() / info.channels);
    *n_channels = info.channels;
    *sample_rate = (int)info.sample_rate;
    return 0;
}

int seio_decode_flac(const uint8_t* data, size_t size, float** out,
                     int64_t* n_samples, int* n_channels, int* sample_rate) {
    // no exception may cross the C ABI: a hostile allocation request
    // (bad_alloc/length_error) is a decode failure, not a process abort
    try {
        return decode_flac_impl(data, size, out, n_samples, n_channels,
                                sample_rate);
    } catch (...) {
        return -5;
    }
}

void seio_free(float* p) { free(p); }

}  // extern "C"
