// Literal O(N^4) direct-DFT oracle — the native runtime port of the
// reference's CPU "theory" path (FFTMesh.cs:192-280, see SURVEY.md C12).
//
// The Python oracle (tpu_ocean/oracle.py) collapses the Tessendorf sum into
// matrix products (O(N^3)); this file keeps the reference's literal
// per-vertex x per-wavevector double loop so the factorized oracle is itself
// validated against an independent straight-line implementation, and parity
// sweeps at 256^2 run at native speed across all cores.
//
// Build: make -C native      (produces libtpuocean_native.so)
// Bind:  tpu_ocean/native.py (ctypes)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kG = 9.81;          // FFTMesh.cs:52
constexpr double kPi = 3.1415926536; // float32 pi used by the reference (FFTMesh.cs:50)
constexpr double kEpsilon = 1e-4;    // FFTMesh.cs:54

inline double smoothstep01(double t) { // Unity Mathf.SmoothStep (FFTMesh.cs:273)
  if (t < 0.0) t = 0.0;
  if (t > 1.0) t = 1.0;
  return t * t * (3.0 - 2.0 * t);
}

struct Complex {
  double re, im;
};

inline Complex cmul(Complex a, Complex b) {
  return {a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re};
}
inline Complex cadd(Complex a, Complex b) { return {a.re + b.re, a.im + b.im}; }

// Per-wavevector tables shared by every vertex and every worker:
// k = 2pi(i - N/2)/L (FFTMesh.cs:201,204), htilde(k,t) at the quantized
// dispersion omega = floor(sqrt(g|k|)/w0)*w0 (FFTMesh.cs:141-147).
// Computed ONCE in fftmesh_oracle_fields — every worker previously rebuilt
// the identical O(N^2) tables, num_threads times the heap and trig for the
// same values (review finding, r5).
struct Tables {
  std::vector<double> k1, kxv, kzv, invk;
  std::vector<Complex> ht;
};

Tables make_tables(int64_t n, double length, double t,
                   const double* h0_re, const double* h0_im,
                   const double* h0c_re, const double* h0c_im) {
  const double w0 = 2.0 * kPi / length;
  Tables tb;
  tb.k1.resize(n);
  tb.kxv.resize(n * n);
  tb.kzv.resize(n * n);
  tb.invk.resize(n * n);
  tb.ht.resize(n * n);
  for (int64_t i = 0; i < n; ++i)
    tb.k1[i] = 2.0 * kPi * (i - n / 2.0) / length;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      const int64_t idx = i * n + j;
      const double kx = tb.k1[i], kz = tb.k1[j];
      const double km = std::sqrt(kx * kx + kz * kz);
      tb.kxv[idx] = kx;
      tb.kzv[idx] = kz;
      tb.invk[idx] = (km < kEpsilon) ? 0.0 : 1.0 / km;
      const double om = std::floor(std::sqrt(kG * km) / w0) * w0;
      // htilde(k,t) = h0 e^{i om t} + h0* e^{-i om t} (FFTMesh.cs:178-190)
      const double c = std::cos(om * t), s = std::sin(om * t);
      const Complex e = {c, s}, ec = {c, -s};
      tb.ht[idx] = cadd(cmul({h0_re[idx], h0_im[idx]}, e),
                        cmul({h0c_re[idx], h0c_im[idx]}, ec));
    }
  }
  return tb;
}

void run_rows(int64_t n, double unit_width, const Tables* tb,
              double* height, double* disp_x, double* disp_z,
              double* nrm_x, double* nrm_z,
              int64_t row_begin, int64_t row_end) {
  const std::vector<double>& k1 = tb->k1;
  const std::vector<double>& kxv = tb->kxv;
  const std::vector<double>& kzv = tb->kzv;
  const std::vector<double>& invk = tb->invk;
  const std::vector<Complex>& ht = tb->ht;

  // x_i = (i - N/2) * w (+ half-cell offset for even N: FFTMesh.cs:107,111).
  // x_i = (i - halfResolution) * w (+ half-cell offset for even N):
  // FFTMesh.cs:104 uses the INTEGER halfResolution = N/2 for positions
  // (the float N/2.0 belongs to the wavevectors only, :201/:204) — the
  // old float form shifted every odd-N sample half a cell (45% height
  // error vs the Python oracle at N = 15; review finding, r5)
  auto coord = [&](int64_t i) {
    double x = static_cast<double>(i - n / 2) * unit_width;
    if (n % 2 == 0) x += unit_width * 0.5;
    return x;
  };

  for (int64_t vi = row_begin; vi < row_end; ++vi) {
    const double x = coord(vi);
    for (int64_t vj = 0; vj < n; ++vj) {
      const double z = coord(vj);
      double h = 0.0, dx = 0.0, dz = 0.0, nx = 0.0, nz = 0.0;
      for (int64_t i = 0; i < n; ++i) {
        const double px = k1[i] * x;
        const double cx = std::cos(px), sx = std::sin(px);
        for (int64_t j = 0; j < n; ++j) {
          const int64_t idx = i * n + j;
          const double pz = k1[j] * z;
          // e^{+i k.x} (FFTMesh.cs:205-208) via angle addition
          const double cz = std::cos(pz), sz = std::sin(pz);
          const double c = cx * cz - sx * sz;
          const double s = sx * cz + cx * sz;
          const Complex v = cmul(ht[idx], {c, s});
          h += v.re;                            // :211
          dx += kxv[idx] * invk[idx] * v.im;    // :215 (+kx/|k|)
          dz += -kzv[idx] * invk[idx] * v.im;   // :215 (-kz sign quirk)
          nx += -kxv[idx] * v.im;               // :212
          nz += -kzv[idx] * v.im;
        }
      }
      const int64_t o = vi * n + vj;
      height[o] = h;
      disp_x[o] = dx;
      disp_z[o] = dz;
      nrm_x[o] = nx;
      nrm_z[o] = nz;
    }
  }
}

}  // namespace

extern "C" {

// Evaluate the full oracle field set at absolute time t.
// All arrays are length n*n doubles, row-major [i (x), j (z)].
// normal/foam post-processing matches FFTMesh.cs:218,253-276.
void fftmesh_oracle_fields(int64_t n, double length, double unit_width,
                           double choppiness, double t, int64_t num_threads,
                           const double* h0_re, const double* h0_im,
                           const double* h0c_re, const double* h0c_im,
                           double* height, double* disp_x, double* disp_z,
                           double* pos_x, double* pos_z,
                           double* normal /* n*n*3 */, double* foam,
                           double* jacobian) {
  if (num_threads <= 0) {
    num_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  std::vector<double> nrm_x(n * n), nrm_z(n * n);
  const Tables tables = make_tables(n, length, t, h0_re, h0_im,
                                    h0c_re, h0c_im);
  {
    std::vector<std::thread> workers;
    const int64_t chunk = (n + num_threads - 1) / num_threads;
    for (int64_t w = 0; w < num_threads; ++w) {
      const int64_t b = w * chunk;
      const int64_t e = std::min(n, b + chunk);
      if (b >= e) break;
      workers.emplace_back(run_rows, n, unit_width, &tables,
                           height, disp_x, disp_z,
                           nrm_x.data(), nrm_z.data(), b, e);
    }
    for (auto& th : workers) th.join();
  }

  // integer halfResolution, as in run_rows (FFTMesh.cs:104)
  auto coord = [&](int64_t i) {
    double x = static_cast<double>(i - n / 2) * unit_width;
    if (n % 2 == 0) x += unit_width * 0.5;
    return x;
  };

  // normal = normalize((0,1,0) - (nx,0,nz)) (FFTMesh.cs:218)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      const int64_t o = i * n + j;
      const double vx = -nrm_x[o], vy = 1.0, vz = -nrm_z[o];
      const double inv = 1.0 / std::sqrt(vx * vx + vy * vy + vz * vz);
      normal[o * 3 + 0] = vx * inv;
      normal[o * 3 + 1] = vy * inv;
      normal[o * 3 + 2] = vz * inv;
      pos_x[o] = coord(i) - disp_x[o] * choppiness;  // :245
      pos_z[o] = coord(j) - disp_z[o] * choppiness;  // :244
    }
  }

  // Jacobian foam: one-sided differences, zero at far boundary (:253-276).
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      const int64_t o = i * n + j;
      double ddx0 = 0.0, ddx1 = 0.0, ddy0 = 0.0, ddy1 = 0.0;
      if (i + 1 < n) {
        ddx0 = 0.5 * (disp_x[o] - disp_x[o + n]);   // :262
        ddx1 = 0.5 * (disp_z[o] - disp_z[o + n]);
      }
      if (j + 1 < n) {
        ddy0 = 0.5 * (disp_x[o] - disp_x[o + 1]);   // :266
        ddy1 = 0.5 * (disp_z[o] - disp_z[o + 1]);
      }
      const double jac = (1.0 + ddx0) * (1.0 + ddy1) - ddx1 * ddy0;  // :268
      jacobian[o] = jac;
      const double noise_x = 0.3 * std::fabs(normal[o * 3 + 0]);
      const double noise_z = 0.3 * std::fabs(normal[o * 3 + 2]);
      const double turb = std::max(
          1.0 - jac + std::sqrt(noise_x * noise_x + noise_z * noise_z), 0.0);
      foam[o] = smoothstep01(turb);                 // :270-273
    }
  }
}

}  // extern "C"
