from saena_tpu.parallel.partition import nnz_balanced_split, equal_row_split
from saena_tpu.parallel.halo import HaloPlan, build_halo_plan
from saena_tpu.parallel.sharded import (
    ShardedEll,
    ShardedLevel,
    ShardedHierarchy,
    shard_hierarchy,
    sharded_solve_pCG,
    make_mesh,
)
