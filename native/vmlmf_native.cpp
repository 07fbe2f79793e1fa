// Native host-side data runtime for vmlmf_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native tier of
// the *host* runtime: the ETL / data-loading hot loops that feed the chip.
// In the reference these are np.loadtxt + pandas loops
// (`/root/reference/rnn_compression_factorization_vmlmf/src/preprocess_opp.py:81-394`,
// `src/utils/ucidataloader.py:33-126`, `src/utils/sliding_window.py:34-110`);
// here they are tight C++ kernels exposed over a C ABI and bound via ctypes
// (`vmlmf_tpu/data/_native.py`), with NumPy fallbacks when the library is not
// built.
//
// Build: `make -C native` (g++ -O3 -shared -fPIC, no dependencies).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Fast whitespace-separated float matrix parsing (np.loadtxt replacement).
//
// Grammar: tokens separated by spaces/tabs/CR, rows separated by '\n'.
// Accepts the forms np.loadtxt accepts for OPP/UCI data: [+-]?digits[.digits]
// [eE[+-]digits], "NaN"/"nan", "Inf"/"inf".  Parsing is branch-light and
// single-pass; strtod is avoided (locale + per-call overhead).
// ---------------------------------------------------------------------------

static inline bool is_sep(char c) { return c == ' ' || c == '\t' || c == '\r' || c == ','; }

static inline const char* parse_one(const char* p, const char* end, double* out) {
    bool neg = false;
    if (p < end && (*p == '+' || *p == '-')) { neg = (*p == '-'); ++p; }
    if (p < end && (*p == 'n' || *p == 'N')) {            // NaN
        while (p < end && !is_sep(*p) && *p != '\n') ++p;
        *out = NAN;
        return p;
    }
    if (p < end && (*p == 'i' || *p == 'I')) {            // Inf
        while (p < end && !is_sep(*p) && *p != '\n') ++p;
        *out = neg ? -INFINITY : INFINITY;
        return p;
    }
    double val = 0.0;
    while (p < end && *p >= '0' && *p <= '9') { val = val * 10.0 + (*p - '0'); ++p; }
    if (p < end && *p == '.') {
        ++p;
        double frac = 0.0, scale = 1.0;
        while (p < end && *p >= '0' && *p <= '9') { frac = frac * 10.0 + (*p - '0'); scale *= 10.0; ++p; }
        val += frac / scale;
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        bool eneg = false;
        if (p < end && (*p == '+' || *p == '-')) { eneg = (*p == '-'); ++p; }
        int ex = 0;
        while (p < end && *p >= '0' && *p <= '9') { ex = ex * 10 + (*p - '0'); ++p; }
        double pw = 1.0, base = 10.0;
        while (ex) { if (ex & 1) pw *= base; base *= base; ex >>= 1; }
        val = eneg ? val / pw : val * pw;
    }
    *out = neg ? -val : val;
    return p;
}

// Count tokens and rows (non-empty lines).  Returns token count; *rows_out
// gets the row count.  A second pass with parse_matrix_f64 fills the buffer.
int64_t count_matrix(const char* buf, int64_t len, int64_t* rows_out) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t tokens = 0, rows = 0;
    bool row_has = false;
    while (p < end) {
        if (*p == '\n') { if (row_has) ++rows; row_has = false; ++p; continue; }
        if (is_sep(*p)) { ++p; continue; }
        ++tokens;
        row_has = true;
        while (p < end && !is_sep(*p) && *p != '\n') ++p;
    }
    if (row_has) ++rows;
    *rows_out = rows;
    return tokens;
}

// Parse into out[cap]; returns number of values written (or -1 on overflow).
int64_t parse_matrix_f64(const char* buf, int64_t len, double* out, int64_t cap) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t n = 0;
    while (p < end) {
        if (*p == '\n' || is_sep(*p)) { ++p; continue; }
        if (n >= cap) return -1;
        p = parse_one(p, end, &out[n++]);
    }
    return n;
}

// ---------------------------------------------------------------------------
// Sliding windows: [n, feat] -> [nw, window, feat], stride `step` rows.
// ---------------------------------------------------------------------------
void sliding_window_f32(const float* x, int64_t n, int64_t feat,
                        int64_t window, int64_t step, float* out) {
    if (n < window) return;
    const int64_t nw = (n - window) / step + 1;
    const int64_t row = feat * (int64_t)sizeof(float);
    for (int64_t w = 0; w < nw; ++w)
        std::memcpy(out + w * window * feat, x + w * step * feat, (size_t)(window * row));
}

// ---------------------------------------------------------------------------
// Per-channel linear interpolation of NaNs, in place.
// Semantics match vmlmf_tpu.data.opp_preprocess.interpolate_nan: interior NaNs
// linearly interpolated between nearest finite neighbours, leading NaNs -> 0,
// trailing NaNs held at the last finite value; all-NaN channels -> 0.
// ---------------------------------------------------------------------------
void interp_nan_f32(float* x, int64_t n, int64_t feat) {
    for (int64_t c = 0; c < feat; ++c) {
        int64_t prev = -1;                       // last finite index seen
        int64_t first_good = -1;
        for (int64_t i = 0; i < n; ++i) {
            float v = x[i * feat + c];
            if (std::isnan(v)) continue;
            if (first_good < 0) first_good = i;
            if (prev >= 0 && i - prev > 1) {     // interior gap (prev, i)
                const float a = x[prev * feat + c];
                const float step = (v - a) / (float)(i - prev);
                for (int64_t k = prev + 1; k < i; ++k)
                    x[k * feat + c] = a + step * (float)(k - prev);
            }
            prev = i;
        }
        if (first_good < 0) {                    // all NaN
            for (int64_t i = 0; i < n; ++i) x[i * feat + c] = 0.0f;
            continue;
        }
        for (int64_t i = 0; i < first_good; ++i) x[i * feat + c] = 0.0f;
        const float last = x[prev * feat + c];
        for (int64_t i = prev + 1; i < n; ++i) x[i * feat + c] = last;
    }
}

// ---------------------------------------------------------------------------
// Batch gather: out[b] = src[idx[b]] for [rows, row_elems] f32 sources — the
// shuffled-batch assembly of the training loader (fancy indexing hot path).
// ---------------------------------------------------------------------------
void gather_rows_f32(const float* src, const int64_t* idx, int64_t n_idx,
                     int64_t row_elems, float* out) {
    const size_t row = (size_t)row_elems * sizeof(float);
    for (int64_t b = 0; b < n_idx; ++b)
        std::memcpy(out + b * row_elems, src + idx[b] * row_elems, row);
}

void gather_rows_i32(const int32_t* src, const int64_t* idx, int64_t n_idx,
                     int64_t row_elems, int32_t* out) {
    const size_t row = (size_t)row_elems * sizeof(int32_t);
    for (int64_t b = 0; b < n_idx; ++b)
        std::memcpy(out + b * row_elems, src + idx[b] * row_elems, row);
}

// ---------------------------------------------------------------------------
// Min/max normalize with clamp semantics of the OPP pipeline:
// y = (x - mn) / (mx - mn), then y > 1 -> 0.99, y < 0 -> 0.
// ---------------------------------------------------------------------------
void norm_clamp_f32(float* x, int64_t n, int64_t feat,
                    const float* mn, const float* mx) {
    for (int64_t i = 0; i < n; ++i) {
        float* rowp = x + i * feat;
        for (int64_t c = 0; c < feat; ++c) {
            float v = (rowp[c] - mn[c]) / (mx[c] - mn[c]);
            if (v > 1.0f) v = 0.99f;
            else if (v < 0.0f) v = 0.0f;
            rowp[c] = v;
        }
    }
}

int64_t vmlmf_native_abi_version() { return 1; }

}  // extern "C"
