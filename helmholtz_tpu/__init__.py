"""helmholtz_tpu — a TPU-native sparse linear-algebra framework.

Built from scratch in JAX/XLA/Pallas covering the workload of the reference
`bocchs/helmholtz-preconditioner` (see SURVEY.md): complex 2-D finite-
difference Helmholtz assembly with PML, sparse formats (stencil/DIA, COO,
CSR, BSR), SpMV/SpMM/SpGEMM, batched block factorizations, GMRES/BiCGStab,
and the Engquist-Ying sweeping preconditioner with moving PML — distributed
over TPU device meshes with halo-exchange collectives.
"""

from .config import (HelmholtzConfig, PartitionConfig, PrecisionConfig,
                     PrecondConfig, SolverConfig)
from .core.sparse import BSR, COO, CSR, Stencil5
from .fd.assembly import Problem, assemble_problem, interlayer_couplings
from .fd import problems
from .core.complexlib import CArray, complexify, pairify
from .ops.spmv import (bsr_matmat, bsr_matvec, coo_matvec, csr_matmat,
                       csr_matvec, stencil_matvec, stencil_matvec_flat)
from .solve import KrylovResult, bicgstab, gmres

__version__ = "0.1.0"
