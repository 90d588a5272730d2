// Scalar serial golden implementations (SURVEY.md §2c).
//
// Straight-line C++ ports of the *semantics* of the reference's C inner
// loops (llz_fft / llz_fir / llz_iir / llz_resample — mount empty, spec
// anchors BASELINE.json:5,7-10), used as the bit-faithful "reference
// implementation" for SNR comparison while /root/reference is empty.
// Everything accumulates in double; single-threaded by design.
//
// Build: make -C golden   (produces libgolden.so, loaded via ctypes from
// llzlab_tpu/golden.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Complex FFT: iterative radix-2 Cooley-Tukey with precomputed twiddles —
// the classic serial shape of llz_fft (bit-reverse + butterfly passes).
// n must be a power of two.  inverse!=0 computes the unscaled inverse
// (caller divides by n).
// ---------------------------------------------------------------------------
void golden_fft(double* re, double* im, int64_t n, int inverse) {
    // bit-reversal permutation
    for (int64_t i = 1, j = 0; i < n; ++i) {
        int64_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) {
            std::swap(re[i], re[j]);
            std::swap(im[i], im[j]);
        }
    }
    const double sign = inverse ? 1.0 : -1.0;
    for (int64_t len = 2; len <= n; len <<= 1) {
        const double ang = sign * 2.0 * M_PI / (double)len;
        const double wr0 = std::cos(ang), wi0 = std::sin(ang);
        for (int64_t i = 0; i < n; i += len) {
            double wr = 1.0, wi = 0.0;
            for (int64_t k = 0; k < len / 2; ++k) {
                const int64_t a = i + k, b = i + k + len / 2;
                const double tr = re[b] * wr - im[b] * wi;
                const double ti = re[b] * wi + im[b] * wr;
                re[b] = re[a] - tr;
                im[b] = im[a] - ti;
                re[a] += tr;
                im[a] += ti;
                const double nwr = wr * wr0 - wi * wi0;
                wi = wr * wi0 + wi * wr0;
                wr = nwr;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Causal direct-form FIR: y[n] = sum_k taps[k] x[n-k], zero history.
// The serial semantics of llz_fir's filter path.
// ---------------------------------------------------------------------------
void golden_fir(const float* x, int64_t t, const double* taps, int64_t ntaps,
                double* y) {
    for (int64_t n = 0; n < t; ++n) {
        double acc = 0.0;
        const int64_t kmax = n < ntaps - 1 ? n : ntaps - 1;
        for (int64_t k = 0; k <= kmax; ++k)
            acc += taps[k] * (double)x[n - k];
        y[n] = acc;
    }
}

// ---------------------------------------------------------------------------
// Cascaded biquads, transposed direct-form II — the per-sample serial
// recurrence of llz_iir (SURVEY.md §3.3).  sos rows: b0 b1 b2 a0 a1 a2
// (a0 must be 1).  State z[ns][2] starts at zero.
// ---------------------------------------------------------------------------
void golden_sosfilt(const double* sos, int64_t ns, const float* x, int64_t t,
                    double* y) {
    std::vector<double> z(2 * (size_t)ns, 0.0);
    for (int64_t n = 0; n < t; ++n) {
        double v = (double)x[n];
        for (int64_t s = 0; s < ns; ++s) {
            const double* c = sos + 6 * s;
            double* zs = z.data() + 2 * s;
            const double out = c[0] * v + zs[0];
            zs[0] = c[1] * v - c[4] * out + zs[1];
            zs[1] = c[2] * v - c[5] * out;
            v = out;
        }
        y[n] = v;
    }
}

// ---------------------------------------------------------------------------
// Polyphase rational resampler, serial phase walk (SURVEY.md §3.2):
//   y[m] = sum_j h[up*j + (m*down) % up] * x[(m*down)/up - j]
// Causal, zero history; n_out = ceil(t*up/down) outputs.
// ---------------------------------------------------------------------------
void golden_upfirdn(const double* h, int64_t nh, const float* x, int64_t t,
                    int64_t up, int64_t down, double* y, int64_t n_out) {
    const int64_t k = (nh + up - 1) / up;  // taps per phase
    for (int64_t m = 0; m < n_out; ++m) {
        const int64_t r = (m * down) % up;
        const int64_t q = (m * down) / up;
        double acc = 0.0;
        for (int64_t j = 0; j < k; ++j) {
            const int64_t tap = up * j + r;
            const int64_t src = q - j;
            if (tap < nh && src >= 0 && src < t)
                acc += h[tap] * (double)x[src];
        }
        y[m] = acc;
    }
}

// ---------------------------------------------------------------------------
// STFT analysis of one frame: window + rfft (re/im packed, n/2+1 bins).
// Composes golden_fft; provided so the python golden layer never touches
// numpy.fft for the C-golden path.
// ---------------------------------------------------------------------------
void golden_rfft(const float* x, int64_t n, const double* window, double* out_re,
                 double* out_im) {
    std::vector<double> re((size_t)n), im((size_t)n, 0.0);
    for (int64_t i = 0; i < n; ++i)
        re[(size_t)i] = (double)x[i] * (window ? window[i] : 1.0);
    golden_fft(re.data(), im.data(), n, 0);
    for (int64_t k = 0; k <= n / 2; ++k) {
        out_re[k] = re[(size_t)k];
        out_im[k] = im[(size_t)k];
    }
}

// ---------------------------------------------------------------------------
// Serial WOLA spectral-gain chain (SURVEY.md §3.4, BASELINE.json:10):
// per frame — window, FFT, per-bin REAL gain (conjugate-symmetric),
// inverse FFT, window, overlap-add; window-square envelope divides the
// accumulated output.  The reference frontend's frame loop, in double.
// Frames start at 0 (causal); nf = 1 + (t - n_fft)/hop full frames;
// y has out_len = n_fft + (nf-1)*hop samples.
// ---------------------------------------------------------------------------
void golden_wola_gain(const float* x, int64_t t, int64_t n_fft, int64_t hop,
                      const double* window, const double* gain, double* y,
                      int64_t out_len) {
    const int64_t nf = t < n_fft ? 0 : 1 + (t - n_fft) / hop;
    std::vector<double> env((size_t)out_len, 0.0);
    std::vector<double> re((size_t)n_fft), im((size_t)n_fft);
    for (int64_t i = 0; i < out_len; ++i) y[i] = 0.0;
    for (int64_t f = 0; f < nf; ++f) {
        const int64_t s0 = f * hop;
        for (int64_t i = 0; i < n_fft; ++i) {
            re[(size_t)i] = (double)x[s0 + i] * window[i];
            im[(size_t)i] = 0.0;
        }
        golden_fft(re.data(), im.data(), n_fft, 0);
        for (int64_t k = 0; k < n_fft; ++k) {
            const int64_t kk = k <= n_fft / 2 ? k : n_fft - k;
            re[(size_t)k] *= gain[kk];
            im[(size_t)k] *= gain[kk];
        }
        golden_fft(re.data(), im.data(), n_fft, 1);
        for (int64_t i = 0; i < n_fft; ++i) {
            const double v = re[(size_t)i] / (double)n_fft;  // unscaled inv
            if (s0 + i < out_len) {
                y[s0 + i] += v * window[i];
                env[(size_t)(s0 + i)] += window[i] * window[i];
            }
        }
    }
    for (int64_t i = 0; i < out_len; ++i)
        y[i] /= env[(size_t)i] > 1e-8 ? env[(size_t)i] : 1e-8;
}

}  // extern "C"
