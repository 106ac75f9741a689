"""Pallas TPU kernels (interpret-mode runnable on CPU for the oracle suite).

  spmv_stencil — fused 5-point complex stencil SpMV (the solve-path A@v)
  sweep        — the sweeping-preconditioner recursions, single- and
                 batched-RHS, streaming the factor stack at the HBM roofline
  bsr_spmm     — block-sparse (BSR) x dense on the MXU via scalar-prefetched
                 block indices
  gj_inverse   — batched VMEM-resident unpivoted complex Gauss-Jordan panel
                 inverse (k <= 128)
"""
from .spmv_stencil import pallas_stencil_matvec
from .sweep import pallas_sweep
from .bsr_spmm import pallas_bsr_matmat
from .gj_inverse import pallas_gj_inverse
