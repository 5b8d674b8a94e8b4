// ttsdsp: native host-side DSP for the data pipeline.
//
// The vocoder dataset's CPU hot path is Griffin-Lim reference-template
// generation (reference: retunegan/data.py:74-84 runs librosa's GL per
// utterance inside DataLoader workers).  This library implements the same
// STFT/iSTFT/Griffin-Lim conventions (center=True, reflect padding, hann,
// librosa momentum update) in C++ with an iterative radix-2 FFT, exposed
// through a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build:  make -C native   (produces libttsdsp.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// iterative radix-2 complex FFT (in-place, double precision)
// ---------------------------------------------------------------------------
void fft_inplace(std::vector<double>& re, std::vector<double>& im, bool inverse) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * kPi / double(len) * (inverse ? 1.0 : -1.0);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cur_r = 1.0, cur_i = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double xr = re[b] * cur_r - im[b] * cur_i;
        const double xi = re[b] * cur_i + im[b] * cur_r;
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
        const double nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
  if (inverse) {
    const double inv = 1.0 / double(n);
    for (size_t i = 0; i < n; ++i) {
      re[i] *= inv;
      im[i] *= inv;
    }
  }
}

struct Plan {
  int n_fft, hop, win_length;
  std::vector<double> window;  // padded to n_fft

  Plan(int n_fft_, int hop_, int win_) : n_fft(n_fft_), hop(hop_), win_length(win_) {
    window.assign(n_fft, 0.0);
    const int lpad = (n_fft - win_length) / 2;
    for (int i = 0; i < win_length; ++i)  // periodic hann
      window[lpad + i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / win_length);
  }

  int n_frames(int64_t n_samples) const { return int(1 + n_samples / hop); }
};

// reflect-pad then frame; out[frame][n_fft]
void frame_signal(const float* y, int64_t n, const Plan& p,
                  std::vector<std::vector<double>>& frames) {
  const int pad = p.n_fft / 2;
  const int nf = p.n_frames(n);
  frames.assign(nf, std::vector<double>(p.n_fft));
  auto sample = [&](int64_t idx) -> double {
    // reflect (librosa 'reflect' == numpy reflect, no edge duplication)
    if (idx < 0) idx = -idx;
    if (idx >= n) idx = 2 * (n - 1) - idx;
    if (idx < 0) idx = 0;           // degenerate tiny signals
    if (idx >= n) idx = n - 1;
    return double(y[idx]);
  };
  for (int f = 0; f < nf; ++f) {
    const int64_t start = int64_t(f) * p.hop - pad;
    for (int i = 0; i < p.n_fft; ++i)
      frames[f][i] = sample(start + i) * p.window[i];
  }
}

// complex spectrum per frame: re/im arrays sized n_fft/2+1
void stft(const float* y, int64_t n, const Plan& p,
          std::vector<std::vector<double>>& sre,
          std::vector<std::vector<double>>& sim) {
  std::vector<std::vector<double>> frames;
  frame_signal(y, n, p, frames);
  const int nf = int(frames.size());
  const int half = p.n_fft / 2 + 1;
  sre.assign(nf, std::vector<double>(half));
  sim.assign(nf, std::vector<double>(half));
  std::vector<double> re(p.n_fft), im(p.n_fft);
  for (int f = 0; f < nf; ++f) {
    std::copy(frames[f].begin(), frames[f].end(), re.begin());
    std::fill(im.begin(), im.end(), 0.0);
    fft_inplace(re, im, false);
    for (int k = 0; k < half; ++k) {
      sre[f][k] = re[k];
      sim[f][k] = im[k];
    }
  }
}

// inverse STFT with synthesis window + OLA normalization; writes `length`
// samples into out
void istft(const std::vector<std::vector<double>>& sre,
           const std::vector<std::vector<double>>& sim, const Plan& p,
           int64_t length, float* out) {
  const int nf = int(sre.size());
  const int half = p.n_fft / 2 + 1;
  const int64_t total = p.n_fft + int64_t(p.hop) * (nf - 1);
  std::vector<double> acc(total, 0.0), norm(total, 0.0);
  std::vector<double> re(p.n_fft), im(p.n_fft);
  for (int f = 0; f < nf; ++f) {
    // hermitian expansion
    for (int k = 0; k < half; ++k) {
      re[k] = sre[f][k];
      im[k] = sim[f][k];
    }
    for (int k = half; k < p.n_fft; ++k) {
      re[k] = sre[f][p.n_fft - k];
      im[k] = -sim[f][p.n_fft - k];
    }
    fft_inplace(re, im, true);
    const int64_t off = int64_t(f) * p.hop;
    for (int i = 0; i < p.n_fft; ++i) {
      acc[off + i] += re[i] * p.window[i];
      norm[off + i] += p.window[i] * p.window[i];
    }
  }
  const int pad = p.n_fft / 2;
  for (int64_t i = 0; i < length; ++i) {
    const int64_t j = i + pad;
    double v = (j < total) ? acc[j] : 0.0;
    const double w = (j < total && norm[j] > 1e-11) ? norm[j] : 1.0;
    out[i] = float(v / w);
  }
}

}  // namespace

extern "C" {

// magnitude STFT: y[n] -> mag[(n/hop+1) * (n_fft/2+1)], frame-major
int ttsdsp_stft_mag(const float* y, int64_t n, int n_fft, int hop, int win,
                    float* mag_out) {
  Plan p(n_fft, hop, win);
  std::vector<std::vector<double>> sre, sim;
  stft(y, n, p, sre, sim);
  const int half = n_fft / 2 + 1;
  for (size_t f = 0; f < sre.size(); ++f)
    for (int k = 0; k < half; ++k)
      mag_out[f * half + k] =
          float(std::sqrt(sre[f][k] * sre[f][k] + sim[f][k] * sim[f][k]));
  return int(sre.size());
}

// Griffin-Lim with librosa momentum update.  mag: frame-major
// [n_frames x (n_fft/2+1)] magnitudes (already power-raised by the caller).
// Writes `length` samples to out.  Seeded phase init.
int ttsdsp_griffin_lim(const float* mag, int n_frames, int n_fft, int hop,
                       int win, int n_iter, double momentum, int64_t length,
                       uint64_t seed, float* out) {
  Plan p(n_fft, hop, win);
  const int half = n_fft / 2 + 1;
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  std::vector<std::vector<double>> pr(n_frames, std::vector<double>(half));
  std::vector<std::vector<double>> pi(n_frames, std::vector<double>(half));
  for (int f = 0; f < n_frames; ++f)
    for (int k = 0; k < half; ++k) {
      const double th = 2.0 * kPi * uni(rng);
      pr[f][k] = std::cos(th);
      pi[f][k] = std::sin(th);
    }

  std::vector<std::vector<double>> tr(n_frames, std::vector<double>(half, 0.0));
  std::vector<std::vector<double>> ti(n_frames, std::vector<double>(half, 0.0));
  std::vector<std::vector<double>> sre, sim;
  std::vector<float> wav(size_t(length > 0 ? length : 1));
  const double alpha = momentum / (1.0 + momentum);

  auto project = [&](std::vector<std::vector<double>>& cre,
                     std::vector<std::vector<double>>& cim) {
    for (int f = 0; f < n_frames; ++f)
      for (int k = 0; k < half; ++k) {
        cre[f][k] = double(mag[size_t(f) * half + k]) * pr[f][k];
        cim[f][k] = double(mag[size_t(f) * half + k]) * pi[f][k];
      }
  };

  std::vector<std::vector<double>> cre(n_frames, std::vector<double>(half));
  std::vector<std::vector<double>> cim(n_frames, std::vector<double>(half));
  for (int it = 0; it < n_iter; ++it) {
    project(cre, cim);
    istft(cre, cim, p, length, wav.data());
    stft(wav.data(), length, p, sre, sim);
    const int nf = std::min<int>(n_frames, int(sre.size()));
    for (int f = 0; f < nf; ++f)
      for (int k = 0; k < half; ++k) {
        const double ur = sre[f][k] - alpha * tr[f][k];
        const double ui = sim[f][k] - alpha * ti[f][k];
        const double inv = 1.0 / (std::sqrt(ur * ur + ui * ui) + 1e-16);
        pr[f][k] = ur * inv;
        pi[f][k] = ui * inv;
        tr[f][k] = sre[f][k];
        ti[f][k] = sim[f][k];
      }
  }
  project(cre, cim);
  istft(cre, cim, p, length, out);
  return 0;
}

// frame-level RMS (centered frames, reflect padding): n/hop+1 values
int ttsdsp_rms(const float* y, int64_t n, int frame, int hop, float* out) {
  const int nf = int(1 + n / hop);
  const int pad = frame / 2;
  for (int f = 0; f < nf; ++f) {
    double acc = 0.0;
    const int64_t start = int64_t(f) * hop - pad;
    for (int i = 0; i < frame; ++i) {
      int64_t idx = start + i;
      if (idx < 0) idx = -idx;
      if (idx >= n) idx = 2 * (n - 1) - idx;
      if (idx < 0 || idx >= n) continue;
      acc += double(y[idx]) * double(y[idx]);
    }
    out[f] = float(std::sqrt(acc / frame));
  }
  return nf;
}

int ttsdsp_version() { return 1; }

}  // extern "C"
