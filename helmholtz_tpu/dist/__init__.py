from .factor import distributed_assemble, distributed_setup
from .partition import (DistSweepState, LAYER_AXIS,
                        dist_state_from_preconditioner, make_mesh,
                        shard_problem)
from .solve import distributed_solve
from .spmv import halo_stencil_matvec
from .sweep import dist_apply_preconditioner
