from .linalg import solve_saddle_kkt, gauss_jordan_solve
