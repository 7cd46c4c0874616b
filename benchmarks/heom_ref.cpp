// Honest CPU denominator for the HEOM flagship benchmark (BASELINE #3).
//
// Single-thread complex128 transcription of the reference DEOM hot loop
// (/root/reference/pyqed/heom/deom.py:641-673 generate_dot_element /
// rem_cal, driven by the rk4 at :725): per-ADO loop, dense H/Q matmuls,
// up (+) and down (-) hierarchy couplings. The reference decorates its
// hash helpers with @njit; numba is NOT installed in this environment, so
// this C++ build (-O3 -march=native, single thread, O(1) precomputed
// neighbor tables instead of the reference's per-call hash computation)
// is a *strict upper bound* on the numba-jitted reference's speed — using
// it as the denominator makes the reported TPU speedup conservative.
//
// Convention matches pyqed_tpu.open.heom (unscaled ADOs):
//   d rho_N/dt = -i[H, rho_N] - (N·nu) rho_N
//              - i sum_m ( [Q_m, rho_{N+e_m}]
//                        + n_m (c_m Q_m rho_{N-e_m}
//                               - conj(c_m) rho_{N-e_m} Q_m) )
// Numerical parity with the reference's scaled rem_cal (rho0 trajectory)
// is asserted in tests/test_bench_parity.py.
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

using cplx = std::complex<double>;

namespace {

inline void matmul(const cplx* a, const cplx* b, cplx* out, int n) {
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < n; ++j) out[i * n + j] = cplx(0.0, 0.0);
        for (int k = 0; k < n; ++k) {
            const cplx aik = a[i * n + k];
            const cplx* bk = b + k * n;
            cplx* oi = out + i * n;
            for (int j = 0; j < n; ++j) oi[j] += aik * bk[j];
        }
    }
}

struct Work {
    std::vector<cplx> t1, t2;
    Work(int n) : t1(n * n), t2(n * n) {}
};

// dot = RHS(a) for the full hierarchy
void rhs(const cplx* H, const std::vector<std::vector<cplx>>& Q,
         const cplx* cvec, const double* damp,
         const int64_t* keys, const int64_t* plus_idx,
         const int64_t* minus_idx, int nado, int M, int n,
         const cplx* a, cplx* dot, Work& w) {
    const int V = n * n;
    const cplx mi(0.0, -1.0);
    for (int N = 0; N < nado; ++N) {
        const cplx* aN = a + (size_t)N * V;
        cplx* dN = dot + (size_t)N * V;
        // -i (H a - a H) - damp a
        matmul(H, aN, w.t1.data(), n);
        matmul(aN, H, w.t2.data(), n);
        const double dmp = damp[N];
        for (int e = 0; e < V; ++e)
            dN[e] = mi * (w.t1[e] - w.t2[e]) - dmp * aN[e];
        for (int m = 0; m < M; ++m) {
            const cplx* Qm = Q[m].data();
            const int64_t up = plus_idx[(size_t)N * M + m];
            if (up >= 0 && up < nado) {
                const cplx* aU = a + (size_t)up * V;
                matmul(Qm, aU, w.t1.data(), n);
                matmul(aU, Qm, w.t2.data(), n);
                for (int e = 0; e < V; ++e)
                    dN[e] += mi * (w.t1[e] - w.t2[e]);
            }
            const int64_t dn = minus_idx[(size_t)N * M + m];
            const int64_t nk = keys[(size_t)N * M + m];
            if (dn >= 0 && dn < nado && nk > 0) {
                const cplx* aD = a + (size_t)dn * V;
                matmul(Qm, aD, w.t1.data(), n);
                matmul(aD, Qm, w.t2.data(), n);
                const cplx cm = cvec[m] * (double)nk;
                const cplx cc = std::conj(cvec[m]) * (double)nk;
                for (int e = 0; e < V; ++e)
                    dN[e] += mi * (cm * w.t1[e] - cc * w.t2[e]);
            }
        }
    }
}

}  // namespace

extern "C" void heom_ref_rk4(
    const double* h_re, const double* h_im, int n,
    const int64_t* keys, const int64_t* plus_idx, const int64_t* minus_idx,
    int nado, int M,
    const double* q,            // (M, n, n) real
    const double* c_re, const double* c_im,
    const double* damp,         // (nado,)
    double dt, int nsteps,
    double* a_re, double* a_im) /* (nado, n, n) in/out */ {
    const int V = n * n;
    const size_t tot = (size_t)nado * V;
    std::vector<cplx> H(V);
    for (int e = 0; e < V; ++e) H[e] = cplx(h_re[e], h_im[e]);
    std::vector<std::vector<cplx>> Q(M, std::vector<cplx>(V));
    for (int m = 0; m < M; ++m)
        for (int e = 0; e < V; ++e) Q[m][e] = cplx(q[(size_t)m * V + e], 0.0);
    std::vector<cplx> cvec(M);
    for (int m = 0; m < M; ++m) cvec[m] = cplx(c_re[m], c_im[m]);

    std::vector<cplx> a(tot), k1(tot), k2(tot), k3(tot), k4(tot), y(tot);
    for (size_t e = 0; e < tot; ++e) a[e] = cplx(a_re[e], a_im[e]);
    Work w(n);

    for (int s = 0; s < nsteps; ++s) {
        rhs(H.data(), Q, cvec.data(), damp, keys, plus_idx, minus_idx,
            nado, M, n, a.data(), k1.data(), w);
        for (size_t e = 0; e < tot; ++e) y[e] = a[e] + k1[e] * (dt / 2);
        rhs(H.data(), Q, cvec.data(), damp, keys, plus_idx, minus_idx,
            nado, M, n, y.data(), k2.data(), w);
        for (size_t e = 0; e < tot; ++e) y[e] = a[e] + k2[e] * (dt / 2);
        rhs(H.data(), Q, cvec.data(), damp, keys, plus_idx, minus_idx,
            nado, M, n, y.data(), k3.data(), w);
        for (size_t e = 0; e < tot; ++e) y[e] = a[e] + k3[e] * dt;
        rhs(H.data(), Q, cvec.data(), damp, keys, plus_idx, minus_idx,
            nado, M, n, y.data(), k4.data(), w);
        for (size_t e = 0; e < tot; ++e)
            a[e] += (dt / 6) * (k1[e] + 2.0 * k2[e] + 2.0 * k3[e] + k4[e]);
    }
    for (size_t e = 0; e < tot; ++e) {
        a_re[e] = a[e].real();
        a_im[e] = a[e].imag();
    }
}
