// mkl_dcsrmultcsr stand-in: 1-based Gustavson CSR x CSR with a stamped
// dense accumulator, ascending column order per row. Serial; the reference
// sorts and duplicate-adds C afterwards, so only the VALUES matter here.
#include "mkl_spblas.h"

#include <cstdint>
#include <cstddef>
#include <vector>

extern "C" void mkl_dcsrmultcsr(const char *trans, const MKL_INT *request,
                                const MKL_INT *sort, const MKL_INT *m_,
                                const MKL_INT *n_, const MKL_INT *k_,
                                double *a, MKL_INT *ja, MKL_INT *ia,
                                double *b, MKL_INT *jb, MKL_INT *ib,
                                double *c, MKL_INT *jc, MKL_INT *ic,
                                const MKL_INT *nzmax, MKL_INT *info) {
    (void)trans; (void)request; (void)sort; (void)n_;
    const MKL_INT m = *m_;
    const MKL_INT k = *k_;
    const long cap = (long)*nzmax;

    std::vector<double> acc((size_t)k, 0.0);
    std::vector<int32_t> stamp((size_t)k, -1);
    long out = 0;
    ic[0] = 1;
    for (MKL_INT i = 0; i < m; ++i) {
        for (MKL_INT p = ia[i] - 1; p < ia[i + 1] - 1; ++p) {
            const MKL_INT col = ja[p] - 1;      // row of B
            const double av = a[p];
            for (MKL_INT q = ib[col] - 1; q < ib[col + 1] - 1; ++q) {
                const MKL_INT j = jb[q] - 1;
                if (stamp[j] != (int32_t)i) {
                    stamp[j] = (int32_t)i;
                    acc[j] = av * b[q];
                } else {
                    acc[j] += av * b[q];
                }
            }
        }
        for (MKL_INT j = 0; j < k; ++j) {
            if (stamp[j] == (int32_t)i) {
                if (out >= cap) { *info = (MKL_INT)(i + 1); return; }
                jc[out] = j + 1;
                c[out] = acc[j];
                ++out;
            }
        }
        ic[i + 1] = (MKL_INT)(out + 1);
    }
    *info = 0;
}
