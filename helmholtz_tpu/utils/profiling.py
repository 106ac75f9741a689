"""Profiling hooks (SURVEY.md section 5 'tracing/profiling': the reference
has wall-clock prints only).

  * `trace(dir)` — capture a `jax.profiler` trace (TensorBoard-loadable)
    around any region;
  * `annotate(name)` — host-side trace annotation for phase attribution
    (assembly / factor / sweep / krylov);
  * the jitted stages in `driver` carry `jax.named_scope` labels so HLO
    ops attribute to their phase inside the trace viewer.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield log_dir


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def phase(name: str):
    """Combined host annotation + XLA named scope for a pipeline phase."""
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield
