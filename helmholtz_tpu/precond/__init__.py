from .exact import ExactFactorization, factor_exact, rebuild_error
from .sweeping import (SweepingPreconditioner, apply_fixed_rhs,
                       apply_preconditioner, setup_preconditioner)
