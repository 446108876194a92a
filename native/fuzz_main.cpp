// Sanitizer fuzz driver for the FLAC decoder (make fuzz SEED=seed.flac).
// Feeds thousands of randomly mutated / truncated / garbage streams into
// seio_decode_flac under ASan+UBSan; the decoder must never report.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" int seio_decode_flac(const uint8_t*, size_t, float**, int64_t*, int*, int*);
extern "C" void seio_free(float*);

int main(int argc, char** argv) {
    FILE* f = fopen(argv[1], "rb");
    fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> base(n);
    if (fread(base.data(), 1, n, f) != (size_t)n) return 1;
    fclose(f);
    std::mt19937 rng(12345);
    int trials = argc > 2 ? atoi(argv[2]) : 5000;
    for (int t = 0; t < trials; ++t) {
        std::vector<uint8_t> d = base;
        int flips = 1 + rng() % 16;
        for (int i = 0; i < flips; ++i) d[rng() % d.size()] = rng() & 0xFF;
        // also occasionally truncate
        size_t len = (t % 5 == 0) ? 4 + rng() % (d.size() - 3) : d.size();
        float* out = nullptr; int64_t ns; int nc, sr;
        int rc = seio_decode_flac(d.data(), len, &out, &ns, &nc, &sr);
        if (rc == 0) seio_free(out);
    }
    // pure garbage streams
    for (int t = 0; t < 2000; ++t) {
        size_t len = 4 + rng() % 8192;
        std::vector<uint8_t> d(len);
        memcpy(d.data(), "fLaC", 4);
        for (size_t i = 4; i < len; ++i) d[i] = rng() & 0xFF;
        float* out = nullptr; int64_t ns; int nc, sr;
        int rc = seio_decode_flac(d.data(), len, &out, &ns, &nc, &sr);
        if (rc == 0) seio_free(out);
    }
    printf("done\n");
    return 0;
}
