"""Capacity planner: memory budget and device count for a target grid.

The reference hit its memory wall blind (15 GB and an OS OOM-kill at
n=1023 on a 16 GB desktop, PDF p.2, code.py:590).  This module makes the
budget explicit before any device allocation: the dominant at-rest object
is the corner-inverse stack G — 2 * (n-b) * n_pad^2 * 4 bytes as split-real
f32 (precond.sweeping) — so a single 16 GB chip caps out near n ~ 1100, and
BASELINE config 5's 2048^2 grid NEEDS the row-sharded distributed path
(~4.3 GB of G per chip on 16 chips; dist.partition shards G with the rows).

    python -m helmholtz_tpu plan --n 2047 --batch 4
"""
from __future__ import annotations

import argparse
import json
import sys


def plan(n: int, b: int = 12, batch: int = 1, restart: int = 20,
         hbm_gb: float = 16.0, pad_lanes: bool = True,
         setup_chunk: int = 128, g_dtype: str = "f32",
         g_compress_stride: int = 0) -> dict:
    """`g_compress_stride` > 0 budgets the sample-compressed factor stack
    (setup_preconditioner g_compress): G holds (M-1)//R + 2 sampled corner
    inverses instead of M — the layout that fits 2047^2 on one chip at
    bf16 stride 8.  `precond='recompute'` needs no plan at all: its
    at-rest state is O(n^2)."""
    n_pad = -(-n // 128) * 128 if pad_lanes else n
    M = n - b
    f32 = 4
    g_item = {"f32": 4, "working": 4, "bf16": 2}[g_dtype]
    c64 = 8                                   # split-real complex64 pair
    N = n * n

    Mg = ((M - 1) // g_compress_stride + 2) if g_compress_stride else M
    g_bytes = 2 * Mg * n_pad * n_pad * g_item  # the factor stack (re+im)
    tf_bytes = 2 * b * n * n * f32
    stencil_bytes = 2 * 5 * N * f32           # A fields
    hm_bytes = 2 * 5 * M * b * n * f32        # subgrid family fields
    chunk = max(4, min(setup_chunk, int(9.0e7) // (n * n)))
    setup_ws = 3 * 2 * chunk * n * n * f32    # batched-inverse workspace
    krylov = (restart + 2) * N * c64 * batch  # V + x/r per RHS
    total = g_bytes + tf_bytes + stencil_bytes + hm_bytes + krylov
    peak_setup = (g_bytes + tf_bytes + stencil_bytes + hm_bytes + setup_ws)

    hbm = hbm_gb * 1e9
    fits = max(total, peak_setup) < 0.92 * hbm
    # row-sharded: G/A/hm/vectors split across D devices, TF replicated
    sharded = lambda D: (g_bytes + stencil_bytes + hm_bytes + krylov) / D \
        + tf_bytes + setup_ws
    min_dev = 1
    while sharded(min_dev) >= 0.92 * hbm and min_dev < 4096:
        min_dev *= 2

    return {
        "n": n, "b": b, "batch": batch, "n_pad": n_pad, "g_dtype": g_dtype,
        "g_compress_stride": g_compress_stride,
        "g_blocks_stored": Mg,
        "g_stack_gb": round(g_bytes / 1e9, 2),
        "operator_gb": round((stencil_bytes + hm_bytes) / 1e9, 2),
        "krylov_gb": round(krylov / 1e9, 2),
        "setup_workspace_gb": round(setup_ws / 1e9, 2),
        "peak_gb": round(max(total, peak_setup) / 1e9, 2),
        "hbm_gb": hbm_gb,
        "fits_single_chip": bool(fits),
        "min_devices_row_sharded": int(min_dev),
        "per_device_gb_at_min": round(sharded(min_dev) / 1e9, 2),
        "note": ("G shards with the grid rows (dist.partition); the F-band "
                 "factors are replicated"),
    }


def plan9(n: int, b: int | None = None, batch: int = 1, restart: int = 20,
          hbm_gb: float = 16.0, pad_lanes: bool = True,
          g_dtype: str = "bf16", factor_stride: int = 8,
          g_compress: bool = True) -> dict:
    """Capacity plan for the 9-POINT path (round 5): b defaults to the
    enforced ~n/14 recipe, the block-Thomas TF stack is budgeted at the
    G dtype (it is 2 * b * n^2 — the term that OOM'd the first n=2047
    flagship attempt at f32), the sampled nine-field family is a
    TRANSIENT chunk (the fused/host-chunked setups assemble inside the
    factor loop), and the compressed sample panels are the at-rest G.
    Also reports whether the size falls in the hostloop/host-chunked
    envelope (driver._hostloop_min_n default)."""
    if b is None:
        b = max(12, -(-n // 14))
    n_pad = -(-n // 128) * 128 if pad_lanes else n
    M = n - b
    R = max(1, factor_stride)
    g_item = {"f32": 4, "working": 4, "bf16": 2}[g_dtype]
    f32 = 4
    c64 = 8
    N = n * n
    Ms = (M - 1) // R + 2 if R > 1 else M
    panels = Ms if (R > 1 and g_compress) else M
    g_bytes = 2 * panels * n_pad * n_pad * g_item
    tf_bytes = 2 * b * n * n * g_item
    a9_bytes = 2 * 9 * N * f32
    # fused/host-chunked setup: one chunk of the sampled family + the
    # batched-inverse workspace are transient (precond.sweeping
    # setup_workspace_words clamp, floor 16)
    from ..precond.sweeping import setup_workspace_words
    chunk = max(4, min(128, max(16, setup_workspace_words() // N)))
    asm_chunk = 9 * chunk * b * n * c64
    setup_ws = 3 * chunk * N * c64
    krylov = (restart + 2) * N * c64 * batch
    at_rest = g_bytes + tf_bytes + a9_bytes + krylov
    peak_setup = g_bytes + tf_bytes + a9_bytes + asm_chunk + setup_ws
    hbm = hbm_gb * 1e9
    fits = max(at_rest, peak_setup) < 0.92 * hbm
    return {
        "n": n, "b": b, "batch": batch, "n_pad": n_pad,
        "g_dtype": g_dtype, "factor_stride": R,
        "g_compress": bool(g_compress), "g_panels_stored": int(panels),
        "g_stack_gb": round(g_bytes / 1e9, 2),
        "tf_stack_gb": round(tf_bytes / 1e9, 2),
        "operator_gb": round(a9_bytes / 1e9, 2),
        "krylov_gb": round(krylov / 1e9, 2),
        "setup_transient_gb": round((asm_chunk + setup_ws) / 1e9, 2),
        "peak_gb": round(max(at_rest, peak_setup) / 1e9, 2),
        "hbm_gb": hbm_gb,
        "fits_single_chip": bool(fits),
        "hostloop_envelope": bool(n >= 1407),
        "note": ("b defaults to the enforced ~n/14 recipe "
                 "(driver.min_pml_width9); TF budgeted at g_dtype "
                 "(round-5 layout); at n >= 1407 setup runs host-chunked "
                 "and solves host-driven (miscompile envelope)"),
    }


def plan_distributed(n: int, b: int = 12, devices: int = 8,
                     factor_stride: int = 8, g_dtype: str = "bf16",
                     g_compress: bool = True, pad_lanes: bool = True,
                     hbm_gb: float = 16.0) -> dict:
    """Per-device budget of the distributed strided/compressed setup
    (dist.factor.distributed_setup): how much G each device stores and how
    many subgrid factorizations it pays, vs the dense stride-1 per-band
    setup.  Mirrors the exact sample-window geometry of dist/factor.py
    (globally-anchored samples, one-sample band overlap)."""
    n_pad = -(-n // 128) * 128 if pad_lanes else n
    M = n - b
    R = max(1, factor_stride)
    # distributed_setup requires devices | n; when the target n (e.g. 2047)
    # is not divisible, budget the padded-rows band ceil(n/D) — the
    # runnable grid is the next multiple of D
    n_loc = -(-n // devices)
    g_item = {"f32": 4, "working": 4, "bf16": 2}[g_dtype]

    if R > 1:
        from ..precond.sweeping import band_sample_window

        widths = []
        for d in range(devices):
            s0, s1 = band_sample_window(M, R, max(d * n_loc, b) - b,
                                        (d + 1) * n_loc - 1 - b)
            widths.append(s1 - s0 + 1)
        ms_loc = max(widths)
    else:
        ms_loc = n_loc
    subgrids_per_dev = ms_loc if R > 1 else n_loc
    panels_per_dev = ms_loc if (R > 1 and g_compress) else n_loc
    per_dev_g = 2 * panels_per_dev * n_pad * n_pad * g_item
    dense_per_dev_g = 2 * n_loc * n_pad * n_pad * g_item
    return {
        "n": n, "b": b, "devices": devices, "factor_stride": R,
        "g_dtype": g_dtype, "g_compress": bool(g_compress),
        "rows_per_device": n_loc,
        "subgrids_factored_per_device": subgrids_per_dev,
        "setup_flop_fraction_vs_dense": round(subgrids_per_dev / n_loc, 4),
        "g_panels_per_device": panels_per_dev,
        "per_device_g_gb": round(per_dev_g / 1e9, 3),
        "per_device_g_gb_dense": round(dense_per_dev_g / 1e9, 3),
        "hbm_gb": hbm_gb,
        "fits_per_device": bool(per_dev_g < 0.92 * hbm_gb * 1e9),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--b", type=int, default=12)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--restart", type=int, default=20)
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    ap.add_argument("--g-dtype", default="f32",
                    choices=["f32", "bf16", "working"])
    ap.add_argument("--g-compress-stride", type=int, default=0)
    ap.add_argument("--devices", type=int, default=0,
                    help="report the distributed per-device budget too")
    ap.add_argument("--factor-stride", type=int, default=1)
    ap.add_argument("--stencil", default="5pt", choices=["5pt", "9pt"])
    args = ap.parse_args(argv)
    if args.stencil == "9pt":
        out = plan9(args.n, None if args.b == 12 else args.b, args.batch,
                    args.restart, args.hbm_gb, g_dtype=args.g_dtype,
                    factor_stride=(args.factor_stride
                                   if args.factor_stride > 1 else 8))
        print(json.dumps(out, indent=1))
        return 0
    out = plan(args.n, args.b, args.batch, args.restart,
               args.hbm_gb, g_dtype=args.g_dtype,
               g_compress_stride=args.g_compress_stride)
    if args.devices:
        out["distributed"] = plan_distributed(
            args.n, args.b, args.devices, args.factor_stride,
            g_dtype=args.g_dtype,
            g_compress=args.g_compress_stride > 0 or args.factor_stride > 1,
            hbm_gb=args.hbm_gb)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
