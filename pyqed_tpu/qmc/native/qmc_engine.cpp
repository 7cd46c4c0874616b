// Native CPU walker engine for diffusion Monte Carlo.
//
// TPU-native framework counterpart of the reference's native QMC layer
// (reference: pyqed/qmc/MC_exchange/ — "QSATS v1.0" Fortran+MPI
// variational/path-integral QMC: walker update kernels qpot.f/eloc.f,
// replica sweeps odd.f/even.f, RNG ran1.f/gasdev.f, reductions reduce.f).
//
// This C++ engine mirrors those kernels for the CPU path: drift-diffusion
// walker updates, local-energy accumulation, population control by comb
// resampling — OpenMP-parallel over walkers (the shared-memory analogue of
// the reference's MPI replica farm; the TPU path is the sharded JAX DMC in
// ../dmc.py behind the same API).
//
// Built as a shared library via ctypes (no pybind11 in this environment):
//   g++ -O3 -march=native -fopenmp -shared -fPIC qmc_engine.cpp -o libqmc_engine.so
//
// Supported potentials (id): 0 = harmonic sum_i x_i^2/2,
// 1 = Morse D(1-e^{-a x})^2 with p0=D, p1=a, 2 = quartic x^4/4 + p0 x^2/2.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

double potential(int pot_id, const double* x, int ndim, double p0, double p1) {
  double v = 0.0;
  switch (pot_id) {
    case 0:
      for (int d = 0; d < ndim; ++d) v += 0.5 * x[d] * x[d];
      return v;
    case 1:
      for (int d = 0; d < ndim; ++d) {
        double u = 1.0 - std::exp(-p1 * x[d]);
        v += p0 * u * u;
      }
      return v;
    case 2:
      for (int d = 0; d < ndim; ++d)
        v += 0.25 * x[d] * x[d] * x[d] * x[d] + 0.5 * p0 * x[d] * x[d];
      return v;
    default:
      return 0.0;
  }
}

}  // namespace

extern "C" {

// Pure DMC (no importance sampling): diffuse + birth/death by comb
// resampling on branching weights. Returns the growth-estimator energy
// averaged over the last (nsteps - nequil) steps; e_trace (nsteps) and the
// final walker array are written in place.
double dmc_run(double* walkers,       // (nwalkers, ndim), in/out
               int nwalkers, int ndim,
               int nsteps, int nequil, double dt, double mass,
               int pot_id, double p0, double p1,
               double eref0, uint64_t seed,
               double* e_trace) {
  std::vector<double> xnew(static_cast<size_t>(nwalkers) * ndim);
  std::vector<double> w(nwalkers);
  std::vector<double> eloc(nwalkers);
  double eref = eref0;
  const double sigma = std::sqrt(dt / mass);

  std::mt19937_64 master(seed);

  for (int step = 0; step < nsteps; ++step) {
    const uint64_t step_seed = master();

#ifdef _OPENMP
#pragma omp parallel
#endif
    {
#ifdef _OPENMP
      const int tid = omp_get_thread_num();
#else
      const int tid = 0;
#endif
      std::mt19937_64 rng(step_seed + 0x9e3779b97f4a7c15ULL * (tid + 1));
      std::normal_distribution<double> gauss(0.0, 1.0);
#ifdef _OPENMP
#pragma omp for
#endif
      for (int i = 0; i < nwalkers; ++i) {
        const double* xi = walkers + static_cast<size_t>(i) * ndim;
        double* xo = xnew.data() + static_cast<size_t>(i) * ndim;
        double v_old = potential(pot_id, xi, ndim, p0, p1);
        for (int d = 0; d < ndim; ++d) xo[d] = xi[d] + sigma * gauss(rng);
        double v_new = potential(pot_id, xo, ndim, p0, p1);
        w[i] = std::exp(-dt * (0.5 * (v_old + v_new) - eref));
        eloc[i] = v_new;
      }
    }

    double W = 0.0, EW = 0.0;
    for (int i = 0; i < nwalkers; ++i) {
      W += w[i];
      EW += w[i] * eloc[i];
    }
    const double E_est = EW / W;
    e_trace[step] = E_est;
    eref = E_est - 0.5 * std::log(W / nwalkers) / dt;

    // systematic (comb) resampling — the branching step
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    const double u0 = uni(master);
    double cum = 0.0;
    int i_src = 0;
    double target = (u0) / nwalkers * W;
    std::vector<double> resampled(static_cast<size_t>(nwalkers) * ndim);
    cum = w[0];
    for (int j = 0; j < nwalkers; ++j) {
      target = (u0 + j) / nwalkers * W;
      while (cum < target && i_src < nwalkers - 1) {
        ++i_src;
        cum += w[i_src];
      }
      std::memcpy(resampled.data() + static_cast<size_t>(j) * ndim,
                  xnew.data() + static_cast<size_t>(i_src) * ndim,
                  sizeof(double) * ndim);
    }
    std::memcpy(walkers, resampled.data(),
                sizeof(double) * static_cast<size_t>(nwalkers) * ndim);
  }

  double E = 0.0;
  int count = 0;
  for (int step = nequil; step < nsteps; ++step) {
    E += e_trace[step];
    ++count;
  }
  return count > 0 ? E / count : e_trace[nsteps - 1];
}

int engine_version() { return 1; }

}  // extern "C"
