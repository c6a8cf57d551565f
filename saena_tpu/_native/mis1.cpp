// Sequential lexicographic MIS(1) aggregation pass.
//
// Native-code counterpart of the reference's aggregation_1_dist
// (saena_object_setup1.cpp:724-995): the reference iterates a min-index
// propagation fixpoint (undecided nodes watch their minimum eligible
// strength-neighbor; roots stay eligible forever, joined nodes drop out)
// until global convergence. That fixpoint has a closed form — it is the
// LEXICOGRAPHICALLY FIRST maximal independent set:
//
//   root(i)  <=>  no strength-neighbor j < i is a root
//   agg(i)   =   min{ j < i : j neighbor of i, root(j) }, else i
//
// because a node's decision only ever depends on strictly smaller indices
// (jm < i is required for both waiting and joining), so resolving nodes in
// ascending index order reproduces the parallel fixpoint exactly. The
// vectorized host fixpoint in amg/strength.py needs O(wavefront-depth)
// rounds of O(nnz) work (~140x nnz on a 96^3 Poisson grid); this pass is a
// single O(nnz) sweep. Equivalence with the fixpoint is asserted by
// tests/test_amg.py::test_mis1_native_matches_fixpoint.
//
// Exposed via a C ABI for ctypes; no Python headers needed.

#include <cstdint>

extern "C" {

// indptr: n+1 int64 row offsets; indices: int32 column indices (the strength
// graph is < 2^31 wide by construction — device formats are int32 too).
// Outputs: agg[i] = fine index of i's root, is_root[i] in {0,1}.
void mis1_aggregate(int64_t n, const int64_t *indptr, const int32_t *indices,
                    int64_t *agg, uint8_t *is_root) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t best = -1;
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            const int64_t j = indices[p];
            if (j < i && is_root[j] && (best < 0 || j < best)) best = j;
        }
        if (best >= 0) {
            agg[i] = best;
            is_root[i] = 0;
        } else {
            agg[i] = i;
            is_root[i] = 1;
        }
    }
}

}  // extern "C"
