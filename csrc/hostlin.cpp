// hostlin: native host-side sparse/linear-algebra runtime for helmholtz_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native
// *runtime* layer around it (SURVEY.md section 2.2: the reference's native
// layer is numba + scipy.sparse C++ + SuperLU).  It provides, without any
// scipy dependency:
//
//   * stencil -> CSR materialization (5-diagonal layer fields straight to
//     compressed rows; no dense intermediate, O(nnz))
//   * COO -> CSR compression (counting sort by row)
//   * complex block-tridiagonal factor+solve (block-Thomas with partial-
//     pivoted dense block LU) — the host-grade oracle that replaces
//     SuperLU for verification and host-side pre/solve work
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Complex numbers cross the boundary as interleaved double pairs
// (re, im) — the standard C99/NumPy complex128 layout.

#include <cstdint>
#include <cstring>
#include <complex>
#include <vector>
#include <algorithm>

using cdouble = std::complex<double>;

extern "C" {

// ---------------------------------------------------------------------------
// stencil (L x n fields: cc, cw, ce, cs, cn) -> CSR, reference unknown
// ordering k = j*n + i (SURVEY.md Appendix B item 1).  Returns nnz.
// indptr: size L*n+1; indices/data sized for 5*L*n (upper bound).
// ---------------------------------------------------------------------------
int64_t stencil_to_csr(const cdouble* cc, const cdouble* cw,
                       const cdouble* ce, const cdouble* cs,
                       const cdouble* cn,
                       int64_t L, int64_t n,
                       int32_t* indptr, int32_t* indices, cdouble* data) {
    int64_t nnz = 0;
    indptr[0] = 0;
    for (int64_t j = 0; j < L; ++j) {
        for (int64_t i = 0; i < n; ++i) {
            const int64_t k = j * n + i;
            const cdouble vs = cs[k], vw = cw[k], vc = cc[k],
                          ve = ce[k], vn = cn[k];
            if (j > 0 && vs != 0.0) { indices[nnz] = (int32_t)(k - n); data[nnz++] = vs; }
            if (i > 0 && vw != 0.0) { indices[nnz] = (int32_t)(k - 1); data[nnz++] = vw; }
            indices[nnz] = (int32_t)k; data[nnz++] = vc;
            if (i + 1 < n && ve != 0.0) { indices[nnz] = (int32_t)(k + 1); data[nnz++] = ve; }
            if (j + 1 < L && vn != 0.0) { indices[nnz] = (int32_t)(k + n); data[nnz++] = vn; }
            indptr[k + 1] = (int32_t)nnz;
        }
    }
    return nnz;
}

// ---------------------------------------------------------------------------
// COO -> CSR (rows need not be sorted; within-row order preserved stably)
// ---------------------------------------------------------------------------
void coo_to_csr(const int32_t* row, const int32_t* col, const cdouble* val,
                int64_t nnz, int64_t nrows,
                int32_t* indptr, int32_t* indices, cdouble* data) {
    std::vector<int32_t> count(nrows + 1, 0);
    for (int64_t p = 0; p < nnz; ++p) count[row[p] + 1]++;
    for (int64_t r = 0; r < nrows; ++r) count[r + 1] += count[r];
    std::memcpy(indptr, count.data(), (nrows + 1) * sizeof(int32_t));
    std::vector<int32_t> cursor(count.begin(), count.end() - 1);
    for (int64_t p = 0; p < nnz; ++p) {
        const int32_t dst = cursor[row[p]]++;
        indices[dst] = col[p];
        data[dst] = val[p];
    }
}

// ---------------------------------------------------------------------------
// CSR SpMV (complex): y = A x — host oracle / post-processing
// ---------------------------------------------------------------------------
void csr_spmv(const int32_t* indptr, const int32_t* indices,
              const cdouble* data, const cdouble* x,
              int64_t nrows, cdouble* y) {
    for (int64_t r = 0; r < nrows; ++r) {
        cdouble acc = 0.0;
        for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p)
            acc += data[p] * x[indices[p]];
        y[r] = acc;
    }
}

// ---------------------------------------------------------------------------
// Dense complex LU with partial pivoting (in place), n x n.
// Returns 0 on success, -1 on exact singularity.
// ---------------------------------------------------------------------------
static int lu_factor_inplace(cdouble* A, int32_t* piv, int64_t n) {
    for (int64_t k = 0; k < n; ++k) {
        int64_t p = k;
        double best = std::abs(A[k * n + k]);
        for (int64_t r = k + 1; r < n; ++r) {
            const double v = std::abs(A[r * n + k]);
            if (v > best) { best = v; p = r; }
        }
        if (best == 0.0) return -1;
        piv[k] = (int32_t)p;
        if (p != k)
            for (int64_t c = 0; c < n; ++c)
                std::swap(A[k * n + c], A[p * n + c]);
        const cdouble pivot = A[k * n + k];
        for (int64_t r = k + 1; r < n; ++r) {
            const cdouble m = A[r * n + k] / pivot;
            A[r * n + k] = m;
            if (m != 0.0)
                for (int64_t c = k + 1; c < n; ++c)
                    A[r * n + c] -= m * A[k * n + c];
        }
    }
    return 0;
}

static void lu_solve_inplace(const cdouble* A, const int32_t* piv,
                             int64_t n, cdouble* x) {
    for (int64_t k = 0; k < n; ++k) {
        if (piv[k] != k) std::swap(x[k], x[piv[k]]);
        for (int64_t r = k + 1; r < n; ++r) x[r] -= A[r * n + k] * x[k];
    }
    for (int64_t k = n - 1; k >= 0; --k) {
        x[k] /= A[k * n + k];
        for (int64_t r = 0; r < k; ++r) x[r] -= A[r * n + k] * x[k];
    }
}

// ---------------------------------------------------------------------------
// Block-tridiagonal factorization (block-Thomas / block LU):
//   diagonal blocks D_l (L x n x n dense, from tridiagonal fields),
//   couplings diag(cs_l) below, diag(cn_l) above.
// factor: overwrites workspace with the LU of each Schur complement S_l
// (S_1 = D_1, S_l = D_l - diag(cs_l) S_{l-1}^{-1} diag(cn_{l-1})).
// work: L*n*n cdoubles; piv: L*n int32.  Returns 0 on success.
// ---------------------------------------------------------------------------
int block_thomas_factor(const cdouble* cw, const cdouble* cc,
                        const cdouble* ce, const cdouble* cs,
                        const cdouble* cn,
                        int64_t L, int64_t n,
                        cdouble* work, int32_t* piv) {
    std::vector<cdouble> Tprev(n * n), col(n);
    for (int64_t l = 0; l < L; ++l) {
        cdouble* S = work + l * n * n;
        std::memset(S, 0, n * n * sizeof(cdouble));
        const cdouble* wcc = cc + l * n;
        const cdouble* wcw = cw + l * n;
        const cdouble* wce = ce + l * n;
        for (int64_t i = 0; i < n; ++i) {
            S[i * n + i] = wcc[i];
            if (i > 0) S[i * n + i - 1] = wcw[i];
            if (i + 1 < n) S[i * n + i + 1] = wce[i];
        }
        if (l > 0) {
            // S -= diag(cs_l) * inv(S_{l-1}) * diag(cn_{l-1}):
            // solve S_{l-1} X = I column-by-column, scale rows/cols.
            const cdouble* prevLU = work + (l - 1) * n * n;
            const int32_t* prevPiv = piv + (l - 1) * n;
            const cdouble* csl = cs + l * n;
            const cdouble* cnl = cn + (l - 1) * n;
            for (int64_t c = 0; c < n; ++c) {
                if (cnl[c] == 0.0) continue;
                std::fill(col.begin(), col.end(), cdouble(0.0));
                col[c] = cnl[c];
                lu_solve_inplace(prevLU, prevPiv, n, col.data());
                for (int64_t r = 0; r < n; ++r)
                    S[r * n + c] -= csl[r] * col[r];
            }
        }
        if (lu_factor_inplace(S, piv + l * n, n) != 0) return -1;
    }
    return 0;
}

// solve with the factorization: rhs (L x n) overwritten with the solution
// (forward eliminate, diagonal, back substitute — algo2_2 scheme).
void block_thomas_solve(const cdouble* cs, const cdouble* cn,
                        const cdouble* work, const int32_t* piv,
                        int64_t L, int64_t n, cdouble* rhs) {
    std::vector<cdouble> tmp(n);
    for (int64_t l = 1; l < L; ++l) {
        // rhs_l -= diag(cs_l) * S_{l-1}^{-1} rhs_{l-1}
        std::memcpy(tmp.data(), rhs + (l - 1) * n, n * sizeof(cdouble));
        lu_solve_inplace(work + (l - 1) * n * n, piv + (l - 1) * n, n,
                         tmp.data());
        const cdouble* csl = cs + l * n;
        for (int64_t i = 0; i < n; ++i) rhs[l * n + i] -= csl[i] * tmp[i];
    }
    // u_{L-1} = S_{L-1}^{-1} rhs_{L-1}
    lu_solve_inplace(work + (L - 1) * n * n, piv + (L - 1) * n, n,
                     rhs + (L - 1) * n);
    for (int64_t l = L - 2; l >= 0; --l) {
        // u_l = S_l^{-1} (rhs_l - diag(cn_l) u_{l+1})
        const cdouble* cnl = cn + l * n;
        for (int64_t i = 0; i < n; ++i)
            rhs[l * n + i] -= cnl[i] * rhs[(l + 1) * n + i];
        lu_solve_inplace(work + l * n * n, piv + l * n, n, rhs + l * n);
    }
}

}  // extern "C"
