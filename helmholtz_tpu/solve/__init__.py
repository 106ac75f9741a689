from .batched import solve_multi_problem, solve_multi_rhs
from .bicgstab import bicgstab
from .gmres import KrylovResult, gmres
