"""Configuration dataclasses for the helmholtz_tpu framework.

The reference (`/root/reference/code.py:424-432`) exposes its tunables as the
positional arguments of ``run_solver(n, b, wave_num, const, alpha, init_func,
plot_solution)`` plus comment-fenced feature blocks.  Here every reference
tunable is preserved 1:1 in typed config objects so reference experiment
configurations are expressible verbatim (SURVEY.md section 5, "Config / flag
system").
"""
from __future__ import annotations

import dataclasses
import math
from typing import Literal, Optional

Fidelity = Literal["as-shipped", "corrected"]


@dataclasses.dataclass(frozen=True)
class HelmholtzConfig:
    """Continuous + discrete problem definition.

    Mirrors the knobs of the reference driver (code.py:424-444):
      n        : interior grid size (N = n**2 unknowns), code.py:443
      b        : PML width in grid points; eta = b*h, code.py:444
      wave_num : omega / (2*pi), code.py:442
      const    : PML damping amplitude "C" (report p.2), code.py:442-444
      alpha    : imaginary frequency shift; omega = 2*pi*wave_num + i*alpha
    """

    n: int = 127
    b: int = 12
    wave_num: float = 16.0
    const: float = 81.0
    alpha: float = 2.0
    #: "corrected" (default, SURVEY.md section 7.3 item 4) samples c at the
    #: true stencil point (x1=i*h, x2=j*h).  "as-shipped" reproduces the
    #: reference's velocity-sampling orientation (c_mat[i-1, j-1],
    #: transposed + shifted one grid point — SURVEY.md Appendix B item 3,
    #: code.py:108,270) and is bit-comparable with the reference matrix —
    #: oracle-parity tests pin it explicitly.
    fidelity: Fidelity = "corrected"

    @property
    def h(self) -> float:
        return 1.0 / (self.n + 1)

    @property
    def eta(self) -> float:
        return self.b * self.h

    @property
    def omega(self) -> complex:
        return 2.0 * math.pi * self.wave_num + 1j * self.alpha

    @property
    def num_unknowns(self) -> int:
        return self.n * self.n


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Krylov solver settings (reference: scipy gmres defaults, code.py:516).

    rtol semantics follow legacy scipy `tol`: convergence is declared on the
    *preconditioned* residual norm relative to the preconditioned RHS norm.
    """

    method: Literal["gmres", "bicgstab"] = "gmres"
    restart: int = 20          # scipy default used by the reference
    rtol: float = 1e-3         # code.py:516 tol=1e-3
    maxiter: int = 10_000
    #: record the per-iteration (preconditioned) residual history — the
    #: reference's `gmres_counter` (code.py:413-420) and the BASELINE fidelity
    #: artifact.
    record_history: bool = True


@dataclasses.dataclass(frozen=True)
class PrecondConfig:
    """Sweeping-preconditioner settings (SURVEY.md section 0, Appendix A)."""

    kind: Literal["none", "moving_pml", "exact"] = "moving_pml"
    #: "corrected" implements Engquist-Ying Algorithms 2.3/2.4 as published
    #: (2-3 GMRES iterations). "as-shipped" reproduces the reference's D2/D3
    #: deviations (code.py:178-183, code.py:375) for emulation/testing; D1
    #: (preconditioning a constant vector, code.py:510-511) is never
    #: reproduced inside the solver because it is not a linear operator —
    #: it is available as `sweeping.apply_fixed_rhs` for direct comparison.
    algorithm_fidelity: Fidelity = "corrected"
    #: chunk size for the batched Schur recursion over the m axis during
    #: setup (bounds peak memory: chunk * n^2 complex words per buffer).
    setup_chunk: int = 128


@dataclasses.dataclass(frozen=True)
class PartitionConfig:
    """1-D layer partitioning over a device mesh (SURVEY.md sections 2.3, 5)."""

    num_devices: int = 1
    axis_name: str = "layers"


@dataclasses.dataclass(frozen=True)
class PrecisionConfig:
    """Dtype policy (SURVEY.md section 7.3 item 3).

    TPU has no native complex type and fp64 is software-emulated; the
    framework computes in complex64 (split f32 pairs inside Pallas kernels)
    on TPU by default and complex128 on CPU for oracle/fidelity runs.
    """

    complex_dtype: Literal["complex64", "complex128"] = "complex64"

    @property
    def real_dtype(self) -> str:
        return {"complex64": "float32", "complex128": "float64"}[self.complex_dtype]
