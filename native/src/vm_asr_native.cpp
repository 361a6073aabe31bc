// vm_asr_native — C++ core for the host input pipeline.
//
// The reference runs its degradation DSP through scipy inside DataLoader
// worker processes (reference data_loader/data_loaders.py:309-347, 538-566).
// This library provides the same two primitives as tight C++ loops exposed
// through a C ABI (loaded via ctypes, no pybind11 required):
//
//   * polyphase rational resampling (scipy.signal.resample_poly semantics:
//     Kaiser(5.0)-windowed sinc FIR, 10 half-cycles per side, upfirdn with
//     "constant" zero padding and centre-tap alignment)
//   * zero-phase second-order-section filtering (scipy.signal.sosfiltfilt
//     semantics: odd-reflection padding of 3*(2*n_sections+1) samples,
//     steady-state initial conditions per section, forward+backward pass)
//
// Build: native/build.sh → libvm_asr_native.so
// All buffers are float32 (audio) / float64 (filter coefficients).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <vector>

namespace {

// Modified Bessel function of the first kind, order 0 (for the Kaiser window).
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  const double y = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= y / (static_cast<double>(k) * k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

int gcd_int(int a, int b) {
  while (b) {
    int t = a % b;
    a = b;
    b = t;
  }
  return a;
}

// scipy.signal.resample_poly's default anti-aliasing FIR:
// half_len = 10 * max(up, down); taps = 2*half_len + 1;
// ideal low-pass at cutoff 1/max(up, down), Kaiser beta = 5.0,
// scaled by `up` so the DC gain after zero-stuffing is 1.
//
// Everything except that final `up` scale depends ONLY on max(up, down) —
// and VM-ASR's degradation resamples 48k→sr_in→48k with random integer
// sr_in, so max(up, down) is the constant TARGET_SR for every call while
// (up, down) is a fresh coprime pair each time. Designing the ~1M-tap
// prototype per pair cost ~40 ms/sample (and a per-pair cache would grow
// 7.7 MB per distinct SR); caching the *unscaled* prototype by max_rate
// reduces the per-call work to one O(taps) scale pass (~1 ms).
struct FirPrototype {
  std::vector<double> h;  // unscaled sinc×Kaiser taps
  double dc;              // their sum (firwin's normaliser)
};

const FirPrototype& fir_prototype(int max_rate) {
  static std::map<int, FirPrototype> cache;
  static std::mutex mu;
  std::lock_guard<std::mutex> lock(mu);
  auto& entry = cache[max_rate];
  if (entry.h.empty()) {
    const int half = 10 * max_rate;
    const int n = 2 * half + 1;
    const double fc = 1.0 / max_rate;  // normalised to Nyquist
    const double beta = 5.0;
    const double denom = bessel_i0(beta);
    entry.h.resize(n);
    entry.dc = 0.0;
    for (int i = 0; i < n; ++i) {
      const double m = i - half;
      double v = (m == 0) ? fc : std::sin(M_PI * fc * m) / (M_PI * m);
      const double r = 2.0 * i / (n - 1) - 1.0;
      v *= bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
      entry.h[i] = v;
      entry.dc += v;
    }
  }
  return entry;
}

std::vector<double> design_resample_fir(int up, int down) {
  const FirPrototype& proto = fir_prototype(std::max(up, down));
  // firwin normalises the DC gain to exactly 1; resample_poly then scales
  // by `up` to undo zero-stuffing attenuation. Same single multiply as the
  // previous per-pair design — outputs are bit-identical.
  const double scale = up / proto.dc;
  std::vector<double> h(proto.h.size());
  for (size_t i = 0; i < h.size(); ++i) h[i] = proto.h[i] * scale;
  return h;
}

}  // namespace

extern "C" {

// Output length of resample_poly for the given input length.
int64_t vm_resample_poly_out_len(int64_t n_in, int up, int down) {
  const int g = gcd_int(up, down);
  up /= g;
  down /= g;
  if (up == 1 && down == 1) return n_in;
  return (n_in * static_cast<int64_t>(up) + down - 1) / down;
}

// Polyphase resampling of a float32 signal. Returns the output length.
int64_t vm_resample_poly(const float* x, int64_t n_in, int up_in, int down_in,
                         float* out) {
  const int g = gcd_int(up_in, down_in);
  const int up = up_in / g, down = down_in / g;
  if (up == 1 && down == 1) {
    std::memcpy(out, x, sizeof(float) * n_in);
    return n_in;
  }
  // The expensive design work is cached by max(up, down) inside
  // design_resample_fir; per call we only pay the O(taps) scale. (A
  // per-(up, down) cache would grow without bound under random-SR
  // degradation: 7.7 MB per distinct pair.)
  const std::vector<double> h_vec = design_resample_fir(up, down);
  const double* h = h_vec.data();
  const int64_t n_taps = static_cast<int64_t>(h_vec.size());
  const int64_t half = (n_taps - 1) / 2;
  const int64_t n_out = (n_in * up + down - 1) / down;

  // y[m] = sum_k h[k] * xz[m*down - k + half], where xz is the zero-stuffed
  // input: xz[j] = x[j / up] when j % up == 0. Iterate only over the taps
  // hitting non-zero samples (the polyphase branch of m*down mod up).
  // Interior outputs (every tap in range) skip the bounds checks.
  const int64_t taps_per_branch = (n_taps + up - 1) / up;
  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t pos = m * down + half;  // index into xz of the top tap
    const int64_t k0 = pos % up;
    double acc = 0.0;
    const int64_t j_top = (pos - k0) / up;  // largest input index touched
    if (j_top - taps_per_branch >= 0 && j_top < n_in) {
      const float* xj = x + j_top;
      for (int64_t k = k0; k < n_taps; k += up, --xj) acc += h[k] * *xj;
    } else {
      for (int64_t k = k0; k < n_taps; k += up) {
        const int64_t j = (pos - k) / up;
        if (j >= 0 && j < n_in) acc += h[k] * x[j];
      }
    }
    out[m] = static_cast<float>(acc);
  }
  return n_out;
}

// Steady-state initial conditions for one DF2T biquad (scipy sosfilt_zi).
static void biquad_zi(const double* sos, double* z1, double* z2) {
  const double b0 = sos[0], b1 = sos[1], b2 = sos[2];
  const double a1 = sos[4], a2 = sos[5];
  const double y = (b0 + b1 + b2) / (1.0 + a1 + a2);
  *z2 = b2 - a2 * y;
  *z1 = b1 + b2 - (a1 + a2) * y;
}

// One cascade pass (DF2T) over a double buffer, in place. Sections run in
// the inner loop (one cache-friendly sweep over time, like scipy's sosfilt).
static void sos_forward(const double* sos, int n_sections, double* x,
                        int64_t n, const double* zi_scale) {
  constexpr int kMaxSections = 16;
  double z1[kMaxSections], z2[kMaxSections];
  for (int s = 0; s < n_sections; ++s) {
    biquad_zi(sos + 6 * s, &z1[s], &z2[s]);
    z1[s] *= zi_scale[s];
    z2[s] *= zi_scale[s];
  }
  for (int64_t i = 0; i < n; ++i) {
    double v = x[i];
    for (int s = 0; s < n_sections; ++s) {
      const double* c = sos + 6 * s;
      const double yi = c[0] * v + z1[s];
      z1[s] = c[1] * v - c[4] * yi + z2[s];
      z2[s] = c[2] * v - c[5] * yi;
      v = yi;
    }
    x[i] = v;
  }
}

// Zero-phase SOS filtering (scipy sosfiltfilt semantics, method="pad").
// sos: (n_sections, 6) float64 row-major with a0 == 1. Returns 0 on success.
int vm_sosfiltfilt(const double* sos, int n_sections, const float* x,
                   int64_t n, float* out) {
  if (n_sections > 16) return -2;  // stack-state limit (order ≤ 32 filters)
  const int64_t padlen = 3 * (2 * static_cast<int64_t>(n_sections) + 1);
  if (n <= padlen) return -1;  // scipy raises for too-short inputs
  const int64_t ext_n = n + 2 * padlen;
  std::vector<double> ext(ext_n);
  // odd reflection: 2*x[0] - x[padlen..1], x, 2*x[-1] - x[-2..-padlen-1]
  for (int64_t i = 0; i < padlen; ++i)
    ext[i] = 2.0 * x[0] - x[padlen - i];
  for (int64_t i = 0; i < n; ++i) ext[padlen + i] = x[i];
  for (int64_t i = 0; i < padlen; ++i)
    ext[padlen + n + i] = 2.0 * x[n - 1] - x[n - 2 - i];

  // per-section zi scaling: cascade DC gains times the first sample
  std::vector<double> scale(n_sections);
  {
    double s = ext[0];
    for (int k = 0; k < n_sections; ++k) {
      scale[k] = s;
      const double* c = sos + 6 * k;
      s *= (c[0] + c[1] + c[2]) / (1.0 + c[4] + c[5]);
    }
  }
  sos_forward(sos, n_sections, ext.data(), ext_n, scale.data());

  // backward pass, iterating in reverse (no buffer reversal needed)
  {
    double s = ext[ext_n - 1];
    for (int k = 0; k < n_sections; ++k) {
      scale[k] = s;
      const double* c = sos + 6 * k;
      s *= (c[0] + c[1] + c[2]) / (1.0 + c[4] + c[5]);
    }
  }
  {
    constexpr int kMaxSections = 16;
    double z1[kMaxSections], z2[kMaxSections];
    for (int s = 0; s < n_sections; ++s) {
      biquad_zi(sos + 6 * s, &z1[s], &z2[s]);
      z1[s] *= scale[s];
      z2[s] *= scale[s];
    }
    for (int64_t i = ext_n - 1; i >= 0; --i) {
      double v = ext[i];
      for (int s = 0; s < n_sections; ++s) {
        const double* c = sos + 6 * s;
        const double yi = c[0] * v + z1[s];
        z1[s] = c[1] * v - c[4] * yi + z2[s];
        z2[s] = c[2] * v - c[5] * yi;
        v = yi;
      }
      ext[i] = v;
    }
  }

  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(ext[padlen + i]);
  return 0;
}

// int16 PCM → float32 in [-1, 1) (wav decode hot loop).
void vm_pcm16_to_f32(const int16_t* x, int64_t n, float* out) {
  constexpr float k = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = x[i] * k;
}

// float32 → int16 PCM with clipping (wav encode).
void vm_f32_to_pcm16(const float* x, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i];
    v = std::max(-1.0f, std::min(1.0f, v));
    out[i] = static_cast<int16_t>(std::lrintf(v * 32767.0f));
  }
}

}  // extern "C"
