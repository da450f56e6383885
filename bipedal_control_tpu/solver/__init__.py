from .riccati import RiccatiSolution, solve_lqr
from .sqp import (
    SqpSolution,
    build_refs,
    eq_mask_from_flags,
    initial_trajectory,
    sqp_solve,
    warm_start_from_solution,
)
