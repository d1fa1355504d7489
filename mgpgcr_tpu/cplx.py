"""Split re/im complex arrays — the TPU-native complex representation.

TPUs have no complex registers: the MXU multiplies real matrices and the
backend used here does not implement complex host<->device transfers or
complex ``dot_general`` at all. The TPU-first representation of the
reference's ``std::complex<double>`` fields (Fields.h) is therefore a pair
of real arrays ``CF(re, im)`` — a pytree that jits/vmaps/shards like any
array pair, keeps the last axis fully dense for the 8x128 vector lanes
(a trailing interleaved (..., 2) axis would waste them), and feeds Pallas
kernels directly (which carry split re/im anyway, SURVEY.md §7).

Complex products use 3-multiplication Karatsuba on the MXU for contractions
(``einsum2``) and plain 4-mult on the VPU elementwise. Every public helper
in this module also accepts native complex jnp arrays and passes them
through to the jnp implementation, so one solver codebase serves both the
complex128 CPU validation path and the split-real TPU path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CF:
    """Complex array as two equally-shaped real arrays."""

    re: jnp.ndarray
    im: jnp.ndarray

    # ---- array-protocol-ish surface ----
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        """The *real* component dtype (f32/f64)."""
        return self.re.dtype

    def reshape(self, *shape) -> "CF":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return CF(self.re.reshape(shape), self.im.reshape(shape))

    def astype(self, dtype) -> "CF":
        return CF(self.re.astype(dtype), self.im.astype(dtype))

    def transpose(self, *axes) -> "CF":
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        axes = axes or None
        return CF(jnp.transpose(self.re, axes), jnp.transpose(self.im, axes))

    def conj(self) -> "CF":
        return CF(self.re, -self.im)

    def __getitem__(self, idx) -> "CF":
        return CF(self.re[idx], self.im[idx])

    @property
    def at(self) -> "_CFAt":
        return _CFAt(self)

    # ---- arithmetic ----
    def __neg__(self) -> "CF":
        return CF(-self.re, -self.im)

    def __add__(self, other):
        if isinstance(other, CF):
            return CF(self.re + other.re, self.im + other.im)
        if _is_reallike(other):
            return CF(self.re + other, self.im)
        return NotImplemented

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, CF):
            return CF(self.re - other.re, self.im - other.im)
        if _is_reallike(other):
            return CF(self.re - other, self.im)
        return NotImplemented

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __mul__(self, other):
        if isinstance(other, CF):
            return CF(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        if isinstance(other, complex):
            return self * from_scalar(other, self.dtype)
        if _is_reallike(other):
            return CF(self.re * other, self.im * other)
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, CF):
            d = other.re * other.re + other.im * other.im
            return CF(
                (self.re * other.re + self.im * other.im) / d,
                (self.im * other.re - self.re * other.im) / d,
            )
        if isinstance(other, complex):
            return self / from_scalar(other, self.dtype)
        if _is_reallike(other):
            return CF(self.re / other, self.im / other)
        return NotImplemented


class _CFAt:
    def __init__(self, cf: CF):
        self._cf = cf

    def __getitem__(self, idx):
        cf = self._cf
        return _CFAtIdx(cf, idx)


class _CFAtIdx:
    def __init__(self, cf: CF, idx):
        self._cf, self._idx = cf, idx

    def set(self, value) -> CF:
        v = ascf(value)
        return CF(
            self._cf.re.at[self._idx].set(v.re),
            self._cf.im.at[self._idx].set(v.im),
        )

    def add(self, value) -> CF:
        v = ascf(value)
        return CF(
            self._cf.re.at[self._idx].add(v.re),
            self._cf.im.at[self._idx].add(v.im),
        )


def _is_reallike(x) -> bool:
    if isinstance(x, (int, float)):
        return True
    if isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, "dtype"):
        return not jnp.issubdtype(x.dtype, jnp.complexfloating)
    return False


def is_cf(x) -> bool:
    return isinstance(x, CF)


def ascf(x, dtype=None) -> CF:
    """Coerce scalar / complex array / CF to CF."""
    if isinstance(x, CF):
        return x if dtype is None else x.astype(dtype)
    if isinstance(x, (int, float, complex)):
        return from_scalar(complex(x), dtype or jnp.float32)
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        rdt = dtype or x.real.dtype
        return CF(x.real.astype(rdt), x.imag.astype(rdt))
    return CF(x if dtype is None else x.astype(dtype), jnp.zeros_like(x, dtype))


def from_scalar(z: complex, dtype=jnp.float32) -> CF:
    return CF(jnp.asarray(z.real, dtype), jnp.asarray(z.imag, dtype))


def from_numpy(z: np.ndarray, dtype=jnp.float32) -> CF:
    """Host complex ndarray -> device CF (the only way onto a TPU that
    cannot transfer complex buffers)."""
    z = np.asarray(z)
    return CF(
        jnp.asarray(np.ascontiguousarray(z.real), dtype),
        jnp.asarray(np.ascontiguousarray(z.imag), dtype),
    )


def to_numpy(x) -> np.ndarray:
    """Device CF or complex array -> host complex ndarray (fetches the two
    real buffers separately; complex transfers are unimplemented on TPU)."""
    if isinstance(x, CF):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)


# ---------------------------------------------------------------------------
# dual-representation helpers: accept CF or native complex jnp arrays
# ---------------------------------------------------------------------------
def real_dtype(x) -> Any:
    if isinstance(x, CF):
        return x.dtype
    return jnp.zeros((), x.dtype).real.dtype


def zeros_like(x):
    if isinstance(x, CF):
        return CF(jnp.zeros_like(x.re), jnp.zeros_like(x.im))
    return jnp.zeros_like(x)


def conj(x):
    return x.conj() if isinstance(x, CF) else jnp.conj(x)


def abs2(x):
    """|x|^2 elementwise, real array."""
    if isinstance(x, CF):
        return x.re * x.re + x.im * x.im
    return jnp.real(x) ** 2 + jnp.imag(x) ** 2


def abs2_sum(x):
    """||x||^2 as a real scalar (Fields.h:229-235)."""
    return jnp.sum(abs2(x))


def vdot(a, b):
    """<a, b> = sum conj(a)*b; CF scalar for CF inputs (Fields.h:217-226)."""
    if isinstance(a, CF):
        return CF(
            jnp.sum(a.re * b.re + a.im * b.im),
            jnp.sum(a.re * b.im - a.im * b.re),
        )
    return jnp.vdot(a, b)


def scale_real(x, s):
    """Multiply by a real scalar/array (broadcast)."""
    if isinstance(x, CF):
        return CF(x.re * s, x.im * s)
    return x * s


def where(cond, a, b):
    if isinstance(a, CF) or isinstance(b, CF):
        a, b = ascf(a), ascf(b)
        return CF(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))
    return jnp.where(cond, a, b)


def stack_zeros(n: int, like):
    """Buffer of n copies-of-shape of ``like``, zeroed — the GCR direction
    ring storage (GCR.h:207-210) for either representation."""
    if isinstance(like, CF):
        z = jnp.zeros((n,) + like.shape, like.dtype)
        return CF(z, z)
    return jnp.zeros((n,) + like.shape, like.dtype)


def conj_contract_stack(stack, v):
    """beta_s = <stack_s, v> for a stacked buffer: einsum('s...,...->s',
    conj(stack), v) — the GCR beta-correction dots (GCR.h:251-262) batched.

    CF path reads each large stack component exactly once (the stacks are
    the dominant traffic of a GCR iteration): contract against both v
    components in one einsum."""
    if isinstance(stack, CF):
        v2 = jnp.stack([v.re, v.im])  # (2, ...) — small relative to stack
        e = jnp.einsum("s...,c...->sc", stack.re, v2)  # [R.vr, R.vi]
        f = jnp.einsum("s...,c...->sc", stack.im, v2)  # [I.vr, I.vi]
        return CF(e[:, 0] + f[:, 1], e[:, 1] - f[:, 0])
    return jnp.einsum("s...,...->s", jnp.conj(stack), v)


def weighted_stack_sum(coeffs, stack):
    """sum_s coeffs_s * stack_s (complex coeffs) — the GCR direction update
    (GCR.h:265-266) batched over the storage axis. CF path reads each
    stack component once."""
    if isinstance(stack, CF):
        c = ascf(coeffs)
        c2 = jnp.stack([c.re, c.im])  # (2, S)
        gr = jnp.tensordot(c2, stack.re, axes=1)  # [cre.R, cim.R]
        gi = jnp.tensordot(c2, stack.im, axes=1)  # [cre.I, cim.I]
        return CF(gr[0] - gi[1], gi[0] + gr[1])
    return jnp.tensordot(coeffs, stack, axes=1)


def einsum2(subscripts: str, a, b):
    """Two-operand complex einsum.

    For CF operands: 3-multiplication Karatsuba — p1 = re*re, p2 = im*im,
    p3 = (re+im)*(re+im); out = (p1 - p2) + i(p3 - p1 - p2). One fewer MXU
    pass than the naive 4; bilinearity of einsum makes it exact.
    """
    if isinstance(a, CF) or isinstance(b, CF):
        a, b = ascf(a), ascf(b)
        p1 = jnp.einsum(subscripts, a.re, b.re)
        p2 = jnp.einsum(subscripts, a.im, b.im)
        p3 = jnp.einsum(subscripts, a.re + a.im, b.re + b.im)
        return CF(p1 - p2, p3 - p1 - p2)
    return jnp.einsum(subscripts, a, b)


def sum_axis(x, axis):
    if isinstance(x, CF):
        return CF(jnp.sum(x.re, axis=axis), jnp.sum(x.im, axis=axis))
    return jnp.sum(x, axis=axis)


def roll(x, shift, axis):
    if isinstance(x, CF):
        return CF(jnp.roll(x.re, shift, axis), jnp.roll(x.im, shift, axis))
    return jnp.roll(x, shift, axis)


def concatenate(xs, axis=0):
    if xs and isinstance(xs[0], CF):
        return CF(
            jnp.concatenate([x.re for x in xs], axis=axis),
            jnp.concatenate([x.im for x in xs], axis=axis),
        )
    return jnp.concatenate(xs, axis=axis)


def stack(xs, axis=0):
    if xs and isinstance(xs[0], CF):
        return CF(
            jnp.stack([x.re for x in xs], axis=axis),
            jnp.stack([x.im for x in xs], axis=axis),
        )
    return jnp.stack(xs, axis=axis)


def transpose(x, axes):
    if isinstance(x, CF):
        return CF(jnp.transpose(x.re, axes), jnp.transpose(x.im, axes))
    return jnp.transpose(x, axes)


def swapaxes(x, a, b):
    if isinstance(x, CF):
        return CF(jnp.swapaxes(x.re, a, b), jnp.swapaxes(x.im, a, b))
    return jnp.swapaxes(x, a, b)


def take(x, indices, axis):
    if isinstance(x, CF):
        return CF(
            jnp.take(x.re, indices, axis=axis), jnp.take(x.im, indices, axis=axis)
        )
    return jnp.take(x, indices, axis=axis)


def random(key: jax.Array, shape, dtype=jnp.float32):
    """Random CF with re, im ~ U[-1, 1) (Field::init_rand, Fields.h:126-135)."""
    kr, ki = jax.random.split(key)
    return CF(
        jax.random.uniform(kr, shape, dtype, minval=-1.0, maxval=1.0),
        jax.random.uniform(ki, shape, dtype, minval=-1.0, maxval=1.0),
    )
