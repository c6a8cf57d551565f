// Shadow of the reference's ietl_saena.h (which needs boost::ublas + the
// vendored IETL). The build's include order puts this stub first. The
// reference's eigenvalue path calls find_eig_lamlan (lambda_lanczos,
// header-only, no boost) — find_eig_ietl is declared-but-unused; this stub
// keeps the symbol compilable without boost.
#ifndef IETL_SAENA_H
#define IETL_SAENA_H

#include "saena_matrix.h"

inline int find_eig_ietl(saena_matrix &A) {
    (void)A;
    fprintf(stderr, "find_eig_ietl: IETL/boost not available in the serial "
                    "stub build; use find_eig_lamlan\n");
    return 1;
}

#endif  // IETL_SAENA_H
