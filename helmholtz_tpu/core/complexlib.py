"""Complex-number convention for TPU: split real/imaginary storage.

This TPU backend does not support complex-typed *buffers* (device arrays,
host transfers) at all, but XLA happily compiles complex *arithmetic* inside
a jitted computation (it lowers to split-real ops on the VPU/MXU anyway).
The framework-wide convention is therefore (SURVEY.md section 2.2 "Complex
numbers everywhere"):

    complex at rest  -> a `CArray` pair of real arrays (pytree leaves);
    complex in flight -> native `jnp` complex values inside `jit`.

Every public jitted stage converts its inputs with `complexify` on entry and
its outputs with `pairify` on exit.  CPU oracle paths may keep complex128
leaves end to end (the CPU backend supports them); `pairify`/`complexify`
are no-ops on real leaves so the same code serves both.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["re", "im"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class CArray:
    """A complex array stored as two real arrays (TPU-storable)."""

    re: jax.Array
    im: jax.Array

    @property
    def cplx(self) -> jax.Array:
        """Native complex view — use inside jit only on TPU."""
        return jax.lax.complex(self.re, self.im)

    @classmethod
    def of(cls, z) -> "CArray":
        z = jnp.asarray(z)
        return cls(jnp.real(z), jnp.imag(z))

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    def to_np(self) -> np.ndarray:
        return np.asarray(self.re) + 1j * np.asarray(self.im)


def _is_carray(x) -> bool:
    return isinstance(x, CArray)


def pairify(tree):
    """Convert every complex leaf of a pytree into a CArray pair."""
    return jax.tree.map(
        lambda x: CArray.of(x) if jnp.iscomplexobj(x) else x, tree)


def complexify(tree):
    """Convert every CArray leaf of a pytree back to a native complex array."""
    return jax.tree.map(
        lambda x: x.cplx if _is_carray(x) else x, tree, is_leaf=_is_carray)


def tree_to_np(tree):
    """Host-side: CArray leaves -> numpy complex, others -> numpy."""
    return jax.tree.map(
        lambda x: x.to_np() if _is_carray(x) else np.asarray(x),
        tree, is_leaf=_is_carray)
