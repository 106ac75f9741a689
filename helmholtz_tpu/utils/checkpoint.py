"""Checkpoint / resume of factored state and solver artifacts.

The reference recomputes every factorization on every run (SURVEY.md
section 5 'checkpoint/resume': none).  Here the expensive setup products —
the G stack and H_F factors — serialize to a single .npz (split-real arrays
are plain numpy), so a multi-frequency sweep or a restarted job reuses
setup across process restarts.
"""
from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from ..core.complexlib import CArray
from ..precond.sweeping import SweepingPreconditioner

_FIELDS = ["G", "TF", "hf_cs", "hf_cn", "a_cs", "a_cn"]


def save_preconditioner(path: str, P: SweepingPreconditioner) -> str:
    arrays = {}
    for name in _FIELDS:
        c: CArray = getattr(P, name)
        arrays[f"{name}_re"] = np.asarray(c.re)
        arrays[f"{name}_im"] = np.asarray(c.im)
    if P.g_stride:
        arrays["g_w"] = np.asarray(P.g_w)
        arrays["g_lo"] = np.asarray(P.g_lo)
    arrays["_meta"] = np.frombuffer(
        json.dumps({"b": P.b, "d2_replace": P.d2_replace,
                    "g_stride": int(P.g_stride)}).encode(),
        dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_preconditioner(path: str) -> SweepingPreconditioner:
    z = np.load(path)
    meta = json.loads(bytes(z["_meta"]).decode())
    kw = {}
    for name in _FIELDS:
        kw[name] = CArray(jnp.asarray(z[f"{name}_re"]),
                          jnp.asarray(z[f"{name}_im"]))
    g_stride = int(meta.get("g_stride", 0))
    g_w = g_lo = None
    if g_stride:
        if "g_lo" in z.files and np.asarray(z["g_w"]).ndim == 2:
            g_w = jnp.asarray(z["g_w"])
            g_lo = jnp.asarray(z["g_lo"])
        else:
            # round-3 format: 1-D interpolation weights, no lo table —
            # the tables are static given (M, stride), so rebuild them
            # instead of failing on the old layout (code-review round 4)
            from ..precond.sweeping import compress_tables

            M = kw["a_cs"].re.shape[0] - int(meta["b"])
            g_w, g_lo = compress_tables(M, g_stride)
    return SweepingPreconditioner(
        **kw, b=int(meta["b"]), d2_replace=bool(meta["d2_replace"]),
        g_stride=g_stride, g_w=g_w, g_lo=g_lo)


def save_report(path: str, report) -> str:
    """Persist a SolveReport: solution + residual history + metrics."""
    np.savez_compressed(
        path,
        u_re=np.real(report.u), u_im=np.imag(report.u),
        history=report.history,
        _meta=np.frombuffer(json.dumps(report.metrics()).encode(),
                            dtype=np.uint8))
    return path


def load_report_arrays(path: str):
    z = np.load(path)
    meta = json.loads(bytes(z["_meta"]).decode())
    return z["u_re"] + 1j * z["u_im"], z["history"], meta
