"""Trajectory evaluation & visualization (reference L6 parity, SURVEY.md §3.5)."""

from .metrics import TrajectoryMetrics
from .sync import associate, interpolate_poses
from .viz import TrajectoryVisualizer

__all__ = [
    "TrajectoryMetrics",
    "TrajectoryVisualizer",
    "associate",
    "interpolate_poses",
]
