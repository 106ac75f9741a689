"""Checkpoint/resume for long Krylov runs (SURVEY.md section 5 'failure
detection / checkpoint-resume'; VERDICT round 1 item 9).

The reference recomputes everything on every run and loses all progress on
its OOM kills (PDF p.2, code.py:590).  Two resume granularities here:

  * `resumable_gmres` — checkpoints the in-flight solver state (x,
    iteration count, residual history) every K restart cycles.  Because
    GMRES(m) carries only x between cycles and recomputes the
    preconditioned residual at each cycle boundary (solve.gmres.outer_step)
    — the same computation `x0`-resume performs — a killed-and-resumed run
    retraces the uninterrupted iteration sequence exactly (same machine,
    same compiled executable => bitwise).
  * multi-frequency sweeps: `run_multisolve` callers checkpoint per
    completed frequency via `SweepCheckpoint` (cli.cmd_multisolve
    --checkpoint), skipping finished frequencies on restart.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Optional

import numpy as np

import jax.numpy as jnp

from .gmres import KrylovResult, gmres


def save_krylov_state(path: str, x, iterations: int, history,
                      meta: dict | None = None) -> str:
    """Persist in-flight solver state (split-real, TPU-fetchable)."""
    np.savez_compressed(
        path, x_re=np.real(np.asarray(x)), x_im=np.imag(np.asarray(x)),
        iterations=np.asarray(iterations), history=np.asarray(history),
        _meta=np.frombuffer(json.dumps(meta or {}).encode(), np.uint8))
    return path


def load_krylov_state(path: str):
    z = np.load(path)
    meta = json.loads(bytes(z["_meta"]).decode())
    x = z["x_re"] + 1j * z["x_im"]
    return x, int(z["iterations"]), z["history"], meta


def resumable_gmres(matvec: Callable, b, *, M: Optional[Callable] = None,
                    checkpoint_path: str,
                    restart: int = 20, rtol: float = 1e-3,
                    maxiter: int = 200, cycles_per_checkpoint: int = 1,
                    resume: bool = True,
                    meta: dict | None = None) -> KrylovResult:
    """Restarted GMRES that checkpoints at restart-cycle boundaries.

    Runs `cycles_per_checkpoint` restart cycles per device dispatch, saves
    (x, total iterations, history) after each, and resumes from
    `checkpoint_path` if it exists.  The final result is identical to one
    uninterrupted `gmres` call with the same parameters (iteration counts
    align because checkpoints coincide with restart boundaries — the only
    state GMRES(m) carries across a boundary is x).
    """
    x0 = None
    iters_done = 0
    hist_parts = []
    if resume and os.path.exists(checkpoint_path):
        x_np, iters_done, hist, _ = load_krylov_state(checkpoint_path)
        x0 = jnp.asarray(x_np.astype(np.asarray(b).dtype))
        hist_parts.append(hist)

    seg_iters = restart * cycles_per_checkpoint
    res = None
    while iters_done < maxiter:
        budget = min(seg_iters, maxiter - iters_done)
        res = gmres(matvec, b, M=M, x0=x0, restart=restart, rtol=rtol,
                    maxiter=budget)
        seg_hist = np.asarray(res.history)
        seg_hist = seg_hist[~np.isnan(seg_hist)][:int(res.iterations)]
        hist_parts.append(seg_hist)
        iters_done += int(res.iterations)
        x0 = res.x
        save_krylov_state(checkpoint_path, np.asarray(res.x), iters_done,
                          np.concatenate(hist_parts) if hist_parts
                          else np.zeros(0), meta)
        if bool(res.converged) or bool(res.breakdown) \
                or int(res.iterations) == 0:
            break

    history = (np.concatenate(hist_parts) if hist_parts
               else np.zeros(0, np.float64))
    return KrylovResult(x=x0, iterations=jnp.asarray(iters_done),
                        converged=res.converged if res is not None
                        else jnp.asarray(False),
                        breakdown=res.breakdown if res is not None
                        else jnp.asarray(False),
                        residual_norm=res.residual_norm if res is not None
                        else jnp.asarray(np.inf),
                        history=jnp.asarray(history))


class SweepCheckpoint:
    """Per-frequency progress record for multi-frequency sweeps.

    Records key on the FULL solve configuration — grid, PML width, problem,
    frequency, C, tolerance, batch size, AND every solver-defining knob
    (stencil/gamma, preconditioner, precision/refine, G dtype/stride/
    compression, anchor spacing, mesh) — so a resumed sweep with ANY
    changed configuration re-solves instead of silently replaying a record
    computed under a different discretization or path (advisor round 4).
    The authoritative template comes from `driver.multisolve_key_config`;
    records from other configs sharing the file are ignored via
    `matching`.  Records written before round 5 lack the new keys and
    therefore never match a new template — they re-solve, which is the
    safe direction."""

    _KEY = ("n", "b", "problem", "wave_num", "const", "rtol", "n_sources",
            "fidelity", "stencil", "stencil_gamma", "precond", "precision",
            "precond_refine", "g_dtype", "factor_stride", "g_compress",
            "freq_anchor_every", "mesh_devices")

    def __init__(self, path: str):
        self.path = path
        self.records = []
        if path and os.path.exists(path):
            with open(path) as fh:
                self.records = [json.loads(l) for l in fh if l.strip()]

    @classmethod
    def key_of(cls, record: dict) -> tuple:
        return tuple(record.get(k) for k in cls._KEY)

    def done_keys(self) -> set:
        return {self.key_of(r) for r in self.records}

    def matching(self, template: dict) -> list:
        """Records whose non-frequency config matches `template`."""
        fixed = [k for k in self._KEY if k not in ("wave_num", "const")]
        return [r for r in self.records
                if all(r.get(k) == template.get(k) for k in fixed)]

    def add(self, record: dict):
        self.records.append(record)
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(record) + "\n")
