from .exact import ExactFactorization, factor_exact, rebuild_error
from .sweeping import (SweepingPreconditioner, apply_fixed_rhs,
                       apply_preconditioner, apply_preconditioner_multi,
                       batchable_operator, setup_preconditioner)
