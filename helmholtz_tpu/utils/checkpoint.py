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
    return SweepingPreconditioner(
        **kw, b=int(meta["b"]), d2_replace=bool(meta["d2_replace"]),
        g_stride=g_stride,
        g_w=(jnp.asarray(z["g_w"]) if g_stride else None),
        g_lo=(jnp.asarray(z["g_lo"]) if g_stride else None))


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
