"""Linear-operator protocol.

TPU-native equivalent of the reference's abstract ``Operator<T>`` interface
(Operator.h:16-29). Instead of virtual dispatch on a C++ base class, an
operator here is a *pytree dataclass* with an ``apply`` method: it can be
closed over by jit, vmapped, sharded, and passed as a leaf-carrying argument
to solvers. Solvers themselves expose ``as_preconditioner`` callables, which
is how the reference's "a solver is an Operator" composition
(GCR.h:62-68, MG.h:125-129) is reproduced functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


def operator_dataclass(cls=None, *, meta: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a jax pytree.

    Fields named in ``meta`` are static (hashed into the jit cache key);
    everything else is a dynamic array leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        data_fields = [n for n in names if n not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


class LinearOperator:
    """Mixin giving operators the callable-apply interface of the reference's
    ``Operator::operator()`` (Operator.h:21)."""

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(x)

    @property
    def shape(self) -> tuple[int, int]:  # pragma: no cover
        raise NotImplementedError

    @property
    def dim(self) -> int:
        """Square-operator dimension (Operator::get_dim, Operator.h:24)."""
        return self.shape[0]


class FunctionOperator(LinearOperator):
    """Wrap an arbitrary jittable function as an operator (matrix-free)."""

    def __init__(self, fn: Callable[[jnp.ndarray], jnp.ndarray], dim: int):
        self._fn = fn
        self._dim = dim

    def apply(self, x):
        return self._fn(x)

    @property
    def shape(self):
        return (self._dim, self._dim)
