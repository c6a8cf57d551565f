// Golden recorder for the SERIAL reference build (see Makefile): runs the
// BASELINE.md parity configs through the reference's own public API
// (saena.hpp) and lets solve_pCG print its iteration counts / residuals
// (saena_object_solve.cpp:2502 ff.). run_goldens.py parses the output into
// tests/goldens/reference_convergence.json.
#include "saena.hpp"
#include "aux_functions2.h"
#include "data_struct.h"

#include <cstdio>
#include <string>
#include <vector>

static void poisson(int m) {
    MPI_Comm comm = MPI_COMM_WORLD;
    printf("\n=== CONFIG poisson3d_%d ===\n", m);
    saena::matrix A(comm);
    saena::laplacian3D(&A, m, m, m);
    A.set_remove_boundary(true);
    double t0 = MPI_Wtime();
    A.assemble(false);
    double t_asm = MPI_Wtime() - t0;

    value_t *rhs_std = nullptr;
    index_t orig_sz = saena::laplacian3D_set_rhs(rhs_std, m, m, m, comm);
    index_t my_split = 0;
    saena::find_split(orig_sz, my_split, comm);
    saena::vector rhs(comm);
    rhs.set(&rhs_std[0], orig_sz, my_split);
    rhs.assemble();

    saena::options opts;   // reference public defaults
    saena::amg solver;
    t0 = MPI_Wtime();
    solver.set_matrix(&A, &opts);
    solver.set_rhs(rhs);
    double t_setup = MPI_Wtime() - t0;
    printf("TIMING assemble=%.3f setup=%.3f\n", t_asm, t_setup);
    value_t *u = nullptr;
    t0 = MPI_Wtime();
    solver.solve_pCG(u, &opts);
    printf("TIMING solve=%.3f\n", MPI_Wtime() - t0);
    solver.destroy();
    A.destroy();
    saena_free(rhs_std);
    saena_free(u);
}

static void banded(int M, int bw, int max_iter) {
    MPI_Comm comm = MPI_COMM_WORLD;
    printf("\n=== CONFIG banded_%d_%d ===\n", M, bw);
    saena::matrix A(comm);
    // saena::band_matrix's assemble_band_matrix path skips
    // repartition_nnz_initial in this snapshot (its experiment driver
    // never matvecs/solves — banded.cpp's solve block is commented out),
    // so feed the SAME entry formula (aux_functions2.cpp:1296-1374)
    // through the standard set()/assemble() path instead.
    for (index_t i = 0; i < (index_t)M; ++i) {
        index_t d = 0;
        for (index_t j = i; j <= i + (index_t)bw; ++j) {
            if (i == j) {
                A.set(i, j, 1.0 / (i + j + 1));
            } else {
                if (j < (index_t)M) A.set(i, j, 1.0 / (i + j + 1));
                if (j >= 2 * d)
                    A.set(i, j - 2 * d, 1.0 / (i + j - 2 * d + 1));
            }
            ++d;
        }
    }
    A.assemble(false);

    std::vector<value_t> ones((size_t)A.get_num_local_rows(), 1.0);
    std::vector<value_t> b(ones.size(), 0.0);
    A.matvec(ones, b);

    saena::vector rhs(comm);
    rhs.set(&b[0], (index_t)b.size(), 0);
    rhs.assemble();

    saena::options opts;
    opts.set_max_iter(max_iter);
    saena::amg solver;
    solver.set_matrix(&A, &opts);
    solver.set_rhs(rhs);
    value_t *u = nullptr;
    solver.solve_pCG(u, &opts);
    solver.destroy();
    A.destroy();
    saena_free(u);
}

static void florida(const char *name, const char *path, bool scale) {
    MPI_Comm comm = MPI_COMM_WORLD;
    printf("\n=== CONFIG %s ===\n", name);
    saena::matrix A(comm);
    if (A.read_file(path) != 0) {
        printf("SKIP %s (read failed)\n", name);
        return;
    }
    A.assemble(scale);

    std::vector<value_t> ones((size_t)A.get_num_local_rows(), 1.0);
    std::vector<value_t> b(ones.size(), 0.0);
    A.matvec(ones, b);

    saena::vector rhs(comm);
    rhs.set(&b[0], (index_t)b.size(), 0);
    rhs.assemble();

    saena::options opts;
    opts.set_max_iter(300);
    const char *tol_env = getenv("REF_TOL");
    if (tol_env) opts.set_relative_tolerance(atof(tol_env));
    saena::amg solver;
    solver.set_scale(scale);
    solver.set_matrix(&A, &opts);
    solver.set_rhs(rhs);
    value_t *u = nullptr;
    solver.solve_pCG(u, &opts);
    solver.destroy();
    A.destroy();
    saena_free(u);
}

int main(int argc, char **argv) {
    MPI_Init(&argc, &argv);
    // one config per invocation (run_goldens.py drives each in its own
    // process: the reference frees imperfectly across repeated setups)
    std::string cfg = argc > 1 ? argv[1] : "";
    if (cfg == "poisson3d_16") poisson(16);
    else if (cfg == "poisson3d_24") poisson(24);
    else if (cfg == "poisson3d_32") poisson(32);
    else if (cfg == "poisson3d_48") poisson(48);
    else if (cfg == "banded_3000_16") banded(3000, 16, 30);
    else if (cfg == "bcsstk16")
        // no bundled .bin; the mtx->bin converter writes next to the file,
        // so run from a writable copy (see run_goldens.py)
        florida("bcsstk16", "/tmp/refdata/bcsstk16.mtx", false);
    else if (cfg == "sih4")
        // UNSCALED: the reference's scale=true path dereferences
        // inv_sq_diag_orig, which only scale_matrix(full_scale=true) --
        // never called anywhere -- populates (saena_object_repart_shrink
        // .cpp:350, saena_matrix_setup.cpp:1412); the shipped drivers all
        // hardcode scale=false, so unscaled is the only configuration the
        // reference itself can run
        florida("sih4", "/tmp/refdata/SiH4.bin", false);
    else {
        printf("usage: record_goldens <config>\n"
               "configs: poisson3d_16 poisson3d_24 poisson3d_32 "
               "banded_3000_16 bcsstk16 sih4\n");
        return 2;
    }
    printf("\n=== DONE ===\n");
    MPI_Finalize();
    return 0;
}
