from saena_tpu.amg.hierarchy import Hierarchy, Level, setup
from saena_tpu.amg.solvers import solve, solve_CG, solve_pCG, solve_smoother, solve_GMRES
