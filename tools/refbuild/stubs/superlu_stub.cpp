// Implementation of the serial SuperLU_DIST stub over LAPACK (system
// liblapack: dgetrf_/dgetrs_). See superlu_ddefs.h for the contract.
#include "superlu_ddefs.h"

#include <cstring>
#include <vector>

extern "C" {
void dgetrf_(const int *m, const int *n, double *a, const int *lda, int *ipiv,
             int *info);
void dgetrs_(const char *trans, const int *n, const int *nrhs,
             const double *a, const int *lda, const int *ipiv, double *b,
             const int *ldb, int *info);
}

extern "C" {

void superlu_gridinit(int, int nprow, int npcol, gridinfo_t *grid) {
    grid->iam = 0;
    grid->nprow = nprow;
    grid->npcol = npcol;
}
void superlu_gridexit(gridinfo_t *) {}
void superlu_dist_GetVersionNumber(int *major, int *minor, int *bugfix) {
    if (major) *major = 5;
    if (minor) *minor = 4;
    if (bugfix) *bugfix = 0;
}
void set_default_options_dist(superlu_dist_options_t *o) {
    o->Fact = DOFACT;
    o->Equil = YES;
    o->ParSymbFact = NO;
    o->ColPerm = METIS_AT_PLUS_A;
    o->RowPerm = LargeDiag_MC64;
    o->ReplaceTinyPivot = NO;
    o->IterRefine = SLU_DOUBLE;
    o->Trans = NOTRANS;
    o->SolveInitialized = NO;
    o->RefineInitialized = NO;
    o->PrintStat = NO;
    o->SymPattern = NO;
}
void dCreate_CompRowLoc_Matrix_dist(SuperMatrix *A, int m, int n, int nnz_loc,
                                    int m_loc, int fst_row, double *nzval,
                                    int *colind, int *rowptr, Stype_t stype,
                                    Dtype_t dtype, Mtype_t mtype) {
    A->Stype = stype;
    A->Dtype = dtype;
    A->Mtype = mtype;
    A->nrow = m;
    A->ncol = n;
    auto *st = new NRformat_loc();
    st->nnz_loc = nnz_loc;
    st->m_loc = m_loc;
    st->fst_row = fst_row;
    st->nzval = nzval;
    st->rowptr = rowptr;
    st->colind = colind;
    A->Store = st;
}
void Destroy_CompRowLoc_Matrix_dist(SuperMatrix *A) {
    auto *st = static_cast<NRformat_loc *>(A->Store);
    if (st) {
        free(st->nzval);
        free(st->rowptr);
        free(st->colind);
        delete st;
        A->Store = nullptr;
    }
}
void ScalePermstructInit(int, int, ScalePermstruct_t *) {}
void ScalePermstructFree(ScalePermstruct_t *) {}
void LUstructInit(int n, LUstruct_t *lu) {
    lu->lu = nullptr;
    lu->ipiv = nullptr;
    lu->n = n;
}
void LUstructFree(LUstruct_t *lu) {
    free(lu->lu);
    free(lu->ipiv);
    lu->lu = nullptr;
    lu->ipiv = nullptr;
}
void Destroy_LU(int, gridinfo_t *, LUstruct_t *lu) { LUstructFree(lu); }
void PStatInit(SuperLUStat_t *) {}
void PStatFree(SuperLUStat_t *) {}
void PStatPrint(const superlu_dist_options_t *, const SuperLUStat_t *,
                const gridinfo_t *) {}
void print_sp_ienv_dist(const superlu_dist_options_t *) {}
void print_options_dist(const superlu_dist_options_t *) {}
void dSolveFinalize(superlu_dist_options_t *, SOLVEstruct_t *) {}
int *intMalloc_dist(long n) { return (int *)malloc(sizeof(int) * (n > 0 ? n : 1)); }
double *doubleMalloc_dist(long n) { return (double *)malloc(sizeof(double) * (n > 0 ? n : 1)); }

void pdgssvx(superlu_dist_options_t *options, SuperMatrix *A,
             ScalePermstruct_t *, double *B, int ldb, int nrhs,
             gridinfo_t *, LUstruct_t *LUstruct, SOLVEstruct_t *,
             double *berr, SuperLUStat_t *, int *info) {
    auto *st = static_cast<NRformat_loc *>(A->Store);
    const int n = A->nrow;
    *info = 0;
    if (options->Fact != FACTORED || LUstruct->lu == nullptr) {
        // densify the local CSR (at nprocs == 1 this is the whole matrix)
        // into a column-major buffer and factorize once
        free(LUstruct->lu);
        free(LUstruct->ipiv);
        LUstruct->lu = (double *)calloc((size_t)n * n, sizeof(double));
        LUstruct->ipiv = (int *)malloc(sizeof(int) * n);
        LUstruct->n = n;
        const double *v = (const double *)st->nzval;
        for (int i = 0; i < st->m_loc; ++i) {
            for (int p = st->rowptr[i]; p < st->rowptr[i + 1]; ++p) {
                const int j = st->colind[p];
                LUstruct->lu[(size_t)j * n + (st->fst_row + i)] = v[p];
            }
        }
        dgetrf_(&n, &n, LUstruct->lu, &n, LUstruct->ipiv, info);
        if (*info != 0) return;
    }
    const char trans = 'N';
    dgetrs_(&trans, &n, &nrhs, LUstruct->lu, &n, LUstruct->ipiv, B, &ldb,
            info);
    for (int r = 0; r < nrhs; ++r) berr[r] = 0.0;
}

}  // extern "C"
