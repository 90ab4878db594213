"""Lie-group layer (L0 of SURVEY.md §1).

Functional cores (hot path): ``so2``, ``se2``, ``so3``, ``se3``, ``sim3``
— pure functions over ``(..., n, n)`` arrays, broadcast-batched,
jit/vmap/grad-safe.

Object wrappers (API parity with the reference's ``liegroups`` dependency,
plus the beyond-reference ``Sim3``): ``SO2``, ``SE2``, ``SO3``, ``SE3``,
``Sim3``.
"""

from . import se2, se3, sim3, so2, so3
from .groups import SE2, SE3, SO2, SO3, Sim3

__all__ = ["so2", "se2", "so3", "se3", "sim3", "SO2", "SE2", "SO3", "SE3", "Sim3"]
