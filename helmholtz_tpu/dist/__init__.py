from .factor import (distributed_assemble, distributed_assemble9,
                     distributed_setup, distributed_setup9)
from .partition import (DistSweepState, DistSweepState9, LAYER_AXIS,
                        dist_state_from_preconditioner, make_mesh,
                        shard_problem)
from .solve import distributed_solve
from .spmv import halo_stencil9_matvec, halo_stencil_matvec
from .sweep import dist_apply_preconditioner, dist_apply_preconditioner9
