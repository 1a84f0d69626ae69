// detex_tpu native host library.
//
// The reference framework is pure Python (SURVEY.md section 0: no native
// components exist upstream); detex_tpu adds a small C++ core for the
// host-side data-prep path that feeds the TPU: second-order-section IIR
// filtering (obspy-style zero-phase: forward pass then reversed pass, no
// padding), linear detrending, channel interleaving (multiplexing), and a
// fused prep kernel that does detrend -> bandpass -> interleave in one call
// per chunk. Exposed via a plain C ABI for ctypes.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// SOS filtering (direct form II transposed), matching scipy.signal.sosfilt.
// sos: [nsec][6] = {b0, b1, b2, a0, a1, a2} with a0 == 1.
// ---------------------------------------------------------------------------
static void sosfilt_inplace(const double* sos, int nsec, double* x,
                            int64_t n) {
    std::vector<double> z(2 * nsec, 0.0);
    for (int64_t i = 0; i < n; ++i) {
        double v = x[i];
        for (int s = 0; s < nsec; ++s) {
            const double* c = sos + 6 * s;
            double* zs = z.data() + 2 * s;
            double out = c[0] * v + zs[0];
            zs[0] = c[1] * v - c[4] * out + zs[1];
            zs[1] = c[2] * v - c[5] * out;
            v = out;
        }
        x[i] = v;
    }
}

void detex_sosfilt(const double* sos, int nsec, double* x, int64_t n,
                   int zerophase) {
    sosfilt_inplace(sos, nsec, x, n);
    if (zerophase) {
        // obspy semantics: filter the reversed signal and reverse back
        for (int64_t i = 0, j = n - 1; i < j; ++i, --j) {
            double t = x[i];
            x[i] = x[j];
            x[j] = t;
        }
        sosfilt_inplace(sos, nsec, x, n);
        for (int64_t i = 0, j = n - 1; i < j; ++i, --j) {
            double t = x[i];
            x[i] = x[j];
            x[j] = t;
        }
    }
}

// ---------------------------------------------------------------------------
// Linear detrend (least-squares line removal), matching
// scipy.signal.detrend(type='linear').
// ---------------------------------------------------------------------------
void detex_detrend_linear(double* x, int64_t n) {
    if (n < 2) return;
    // fit y = a + b * t with t = 0..n-1 via closed-form least squares
    const double nn = static_cast<double>(n);
    const double st = (nn - 1.0) * nn / 2.0;             // sum t
    const double stt = (nn - 1.0) * nn * (2.0 * nn - 1.0) / 6.0;  // sum t^2
    double sy = 0.0, sty = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        sy += x[i];
        sty += x[i] * static_cast<double>(i);
    }
    const double det = nn * stt - st * st;
    const double b = (nn * sty - st * sy) / det;
    const double a = (sy - b * st) / nn;
    for (int64_t i = 0; i < n; ++i) {
        x[i] -= a + b * static_cast<double>(i);
    }
}

// ---------------------------------------------------------------------------
// Channel interleave: chans [nc][n] (contiguous row-major) ->
// out [n * nc] multiplexed (Fortran-order flatten of the [nc, n] stack,
// reference construct.py:978).
// ---------------------------------------------------------------------------
void detex_interleave(const double* chans, int nc, int64_t n, double* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t base = i * nc;
        for (int c = 0; c < nc; ++c) {
            out[base + c] = chans[static_cast<int64_t>(c) * n + i];
        }
    }
}

// ---------------------------------------------------------------------------
// Fused chunk prep: for each channel detrend + (zero-phase) bandpass, then
// interleave. chans is modified in place (filtered), out receives the
// multiplexed vector. Returns 0 on success.
// ---------------------------------------------------------------------------
int detex_prep_chunk(double* chans, int nc, int64_t n, const double* sos,
                     int nsec, int zerophase, double* out) {
    for (int c = 0; c < nc; ++c) {
        double* ch = chans + static_cast<int64_t>(c) * n;
        detex_detrend_linear(ch, n);
        if (nsec > 0) {
            detex_sosfilt(sos, nsec, ch, n, zerophase);
        }
    }
    detex_interleave(chans, nc, n, out);
    return 0;
}

// rolling sample std (ddof=1) used by magnitude SNR estimation
// (reference detect.py:465-472); out has length n - win + 1.
void detex_rolling_std(const double* x, int64_t n, int64_t win,
                       double* out) {
    if (win > n || win < 2) return;
    double s = 0.0, s2 = 0.0;
    for (int64_t i = 0; i < win; ++i) {
        s += x[i];
        s2 += x[i] * x[i];
    }
    const double w = static_cast<double>(win);
    out[0] = std::sqrt(std::fmax((s2 - s * s / w) / (w - 1.0), 0.0));
    for (int64_t i = win; i < n; ++i) {
        s += x[i] - x[i - win];
        s2 += x[i] * x[i] - x[i - win] * x[i - win];
        out[i - win + 1] =
            std::sqrt(std::fmax((s2 - s * s / w) / (w - 1.0), 0.0));
    }
}

int detex_abi_version() { return 1; }

}  // extern "C"
