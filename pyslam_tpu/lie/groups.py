"""Object API over the functional Lie cores — parity with the ``liegroups``
package the reference depends on (SURVEY.md §1 L0, §2.1 "Lie groups").

These classes are thin pytree wrappers around ``(..., n, n)`` matrix arrays;
the hot path (factor kernels, solver) uses the functional modules directly.
They exist so user code written against the reference's API —
``SE3.exp(xi)``, ``T.dot(other)``, ``T.inv()``, ``T.adjoint()``,
``T.perturb(xi)`` — ports over unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se2, se3, sim3, so2, so3


class _LieGroupBase:
    """Shared wrapper machinery; subclasses bind ``_ops`` / ``dim`` / ``dof``."""

    _ops = None
    dim = None
    dof = None

    def __init__(self, mat):
        mat = getattr(mat, "mat", mat)
        self.mat = jnp.asarray(mat)

    # --- constructors -----------------------------------------------------
    @classmethod
    def exp(cls, xi):
        return cls(cls._ops.exp(jnp.asarray(xi)))

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32):
        return cls(cls._ops.identity(dtype=dtype, batch_shape=batch_shape))

    @classmethod
    def from_matrix(cls, mat, normalize: bool = False):
        out = cls(mat)
        return out.normalize() if normalize else out

    @classmethod
    def wedge(cls, xi):
        return cls._ops.wedge(jnp.asarray(xi))

    @classmethod
    def vee(cls, Xi):
        return cls._ops.vee(jnp.asarray(Xi))

    @classmethod
    def left_jacobian(cls, xi):
        return cls._ops.left_jacobian(jnp.asarray(xi))

    @classmethod
    def inv_left_jacobian(cls, xi):
        return cls._ops.inv_left_jacobian(jnp.asarray(xi))

    # --- group ops ---------------------------------------------------------
    def log(self):
        return self._ops.log(self.mat)

    def inv(self):
        return type(self)(self._ops.inv(self.mat))

    def dot(self, other):
        if isinstance(other, _LieGroupBase):
            return type(self)(self.mat @ other.mat)
        other = jnp.asarray(other)
        # act on points: (..., d) or (N, d)
        return self._ops.act(self.mat, other)

    def __mul__(self, other):
        return self.dot(other)

    def perturb(self, xi):
        return type(self)(self._ops.perturb(self.mat, jnp.asarray(xi)))

    def as_matrix(self):
        return self.mat

    def normalize(self):
        if hasattr(self._ops, "normalize"):
            return type(self)(self._ops.normalize(self.mat))
        return self

    def __repr__(self):
        return f"{type(self).__name__}({self.mat})"

    # --- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


class SO2(_LieGroupBase):
    _ops = so2
    dim = 2
    dof = 1


class SO3(_LieGroupBase):
    _ops = so3
    dim = 3
    dof = 3


class _RigidBase(_LieGroupBase):
    def adjoint(self):
        return self._ops.adjoint(self.mat)

    @classmethod
    def odot(cls, p, **kw):
        return cls._ops.odot(jnp.asarray(p), **kw)

    @property
    def rot(self):
        d = self.dim - 1
        rot_cls = SO2 if d == 2 else SO3
        return rot_cls(self.mat[..., :d, :d])

    @property
    def trans(self):
        d = self.dim - 1
        return self.mat[..., :d, d]


class SE2(_RigidBase):
    _ops = se2
    dim = 3
    dof = 3


class SE3(_RigidBase):
    _ops = se3
    dim = 4
    dof = 6


class Sim3(_LieGroupBase):
    """Similarity transforms [[s*R, t], [0, 1]] — beyond-reference (the
    liegroups dep stops at SE3); see lie/sim3.py."""

    _ops = sim3
    dim = 4
    dof = 7

    def adjoint(self):
        return self._ops.adjoint(self.mat)

    @property
    def rot(self):
        return SO3(self._ops.rot(self.mat))

    @property
    def trans(self):
        return self.mat[..., :3, 3]

    @property
    def scale(self):
        return self._ops.scale(self.mat)


for _cls in (SO2, SO3, SE2, SE3, Sim3):
    jax.tree_util.register_pytree_node(
        _cls, _cls.tree_flatten, _cls.tree_unflatten
    )
