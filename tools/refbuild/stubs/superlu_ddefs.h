// Serial SuperLU_DIST stub: pdgssvx at nprocs == 1 backed by LAPACK's
// dense dgetrf/dgetrs (the coarsest AMG operator is small by
// construction — least_row_threshold = 100 default). The factorization
// caches in LUstruct_t exactly like SuperLU's options.Fact = FACTORED
// reuse contract (solve.cpp:922-926), so repeated coarse solves reuse it.
// An exact dense LU solve is numerically equivalent (to roundoff) to
// SuperLU's sparse LU for the purposes of AMG convergence counts.
#ifndef SAENA_SUPERLU_DDEFS_STUB_H
#define SAENA_SUPERLU_DDEFS_STUB_H

#include <cstdio>
#include <cstdlib>

typedef enum { NO = 0, YES = 1 } yes_no_t;
typedef enum { DOFACT = 0, SamePattern = 1, SamePattern_SameRowPerm = 2,
               FACTORED = 3 } fact_t;
typedef enum { NOROWPERM = 0, LargeDiag_MC64 = 1, MY_PERMR = 2 } rowperm_t;
typedef enum { NATURAL = 0, MMD_ATA = 1, MMD_AT_PLUS_A = 2, COLAMD = 3,
               METIS_AT_PLUS_A = 4, PARMETIS = 5, MY_PERMC = 6 } colperm_t;
typedef enum { NOTRANS = 0, TRANS = 1, CONJ = 2 } trans_t;
typedef enum { NOREFINE = 0, SLU_SINGLE = 1, SLU_DOUBLE = 2 } IterRefine_t;
#define DOUBLE SLU_DOUBLE
#ifndef TRUE
#define TRUE 1
#define FALSE 0
#endif

typedef enum { SLU_NR_loc = 0, SLU_NC = 1, SLU_NR = 2 } Stype_t;
typedef enum { SLU_S = 0, SLU_D = 1, SLU_C = 2, SLU_Z = 3 } Dtype_t;
typedef enum { SLU_GE = 0, SLU_TRLU = 1, SLU_SYL = 2 } Mtype_t;

typedef struct {
    fact_t Fact;
    yes_no_t Equil;
    colperm_t ColPerm;
    rowperm_t RowPerm;
    yes_no_t ReplaceTinyPivot;
    IterRefine_t IterRefine;
    trans_t Trans;
    yes_no_t SolveInitialized;
    yes_no_t RefineInitialized;
    yes_no_t PrintStat;
    yes_no_t ParSymbFact;
    yes_no_t SymPattern;
} superlu_dist_options_t;

typedef struct {
    int nnz_loc;
    int m_loc;
    int fst_row;
    void *nzval;
    int *rowptr;
    int *colind;
} NRformat_loc;

typedef struct {
    Stype_t Stype;
    Dtype_t Dtype;
    Mtype_t Mtype;
    int nrow;
    int ncol;
    void *Store;            // NRformat_loc*
} SuperMatrix;

typedef struct {
    int iam;
    int nprow;
    int npcol;
} gridinfo_t;

typedef struct { int unused; } ScalePermstruct_t;

typedef struct {
    // cached dense factorization (this stub's state)
    double *lu;     // n x n column-major LU factors from dgetrf
    int *ipiv;
    int n;
} LUstruct_t;

typedef struct { int unused; } SOLVEstruct_t;
typedef struct { int unused; } SuperLUStat_t;

#ifdef __cplusplus
extern "C" {
#endif

void superlu_gridinit(int comm, int nprow, int npcol, gridinfo_t *grid);
void superlu_gridexit(gridinfo_t *grid);
void superlu_dist_GetVersionNumber(int *major, int *minor, int *bugfix);
void set_default_options_dist(superlu_dist_options_t *options);
void dCreate_CompRowLoc_Matrix_dist(SuperMatrix *A, int m, int n, int nnz_loc,
                                    int m_loc, int fst_row, double *nzval,
                                    int *colind, int *rowptr, Stype_t stype,
                                    Dtype_t dtype, Mtype_t mtype);
void Destroy_CompRowLoc_Matrix_dist(SuperMatrix *A);
void ScalePermstructInit(int m, int n, ScalePermstruct_t *s);
void ScalePermstructFree(ScalePermstruct_t *s);
void LUstructInit(int n, LUstruct_t *lu);
void LUstructFree(LUstruct_t *lu);
void Destroy_LU(int n, gridinfo_t *grid, LUstruct_t *lu);
void PStatInit(SuperLUStat_t *stat);
void PStatFree(SuperLUStat_t *stat);
void PStatPrint(const superlu_dist_options_t *options,
                const SuperLUStat_t *stat, const gridinfo_t *grid);
void print_sp_ienv_dist(const superlu_dist_options_t *options);
void print_options_dist(const superlu_dist_options_t *options);
void pdgssvx(superlu_dist_options_t *options, SuperMatrix *A,
             ScalePermstruct_t *ScalePermstruct, double *B, int ldb, int nrhs,
             gridinfo_t *grid, LUstruct_t *LUstruct, SOLVEstruct_t *SOLVEstruct,
             double *berr, SuperLUStat_t *stat, int *info);
void dSolveFinalize(superlu_dist_options_t *options, SOLVEstruct_t *s);
int *intMalloc_dist(long n);
double *doubleMalloc_dist(long n);

#ifdef __cplusplus
}
#endif

#define SUPERLU_FREE(p) free(p)
#define ABORT(msg) do { std::fprintf(stderr, "%s\n", msg); std::exit(1); } while (0)

#endif  // SAENA_SUPERLU_DDEFS_STUB_H
