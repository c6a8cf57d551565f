// Minimal MKL sparse-BLAS shim for the serial reference build: the live
// code path uses only mkl_dcsrmultcsr (fast_mm case-1 base case,
// saena_object_setup_matmat.cpp:214); the inspector-executor API appears
// only inside `#if 0` regions, so types are declared for completeness but
// never used. Implementation in mkl_stub.cpp (1-based Gustavson CSR
// product, same interface contract as the MKL routine).
#ifndef SAENA_MKL_SPBLAS_STUB_H
#define SAENA_MKL_SPBLAS_STUB_H

#define MKL_INT int

#ifdef __cplusplus
extern "C" {
#endif

// C (m x k, 1-based CSR) = A (m x n) * B (n x k); request=0 single call,
// sort is advisory. info: 0 ok, >0 insufficient nzmax.
void mkl_dcsrmultcsr(const char *trans, const MKL_INT *request,
                     const MKL_INT *sort, const MKL_INT *m, const MKL_INT *n,
                     const MKL_INT *k, double *a, MKL_INT *ja, MKL_INT *ia,
                     double *b, MKL_INT *jb, MKL_INT *ib, double *c,
                     MKL_INT *jc, MKL_INT *ic, const MKL_INT *nzmax,
                     MKL_INT *info);

#ifdef __cplusplus
}
#endif

// inspector-executor types (referenced only from #if 0 blocks)
typedef void *sparse_matrix_t;
typedef enum { SPARSE_STATUS_SUCCESS = 0, SPARSE_STATUS_NOT_SUPPORTED = 6 } sparse_status_t;
typedef enum { SPARSE_INDEX_BASE_ZERO = 0, SPARSE_INDEX_BASE_ONE = 1 } sparse_index_base_t;
typedef enum { SPARSE_OPERATION_NON_TRANSPOSE = 10 } sparse_operation_t;

#endif  // SAENA_MKL_SPBLAS_STUB_H
