"""Trajectory visualization — parity with the reference's
``TrajectoryVisualizer`` (pyslam/visualizers.py per SURVEY.md §2.1):
top-down trajectory plots, segment-error plots, and cumulative/per-pose norm
error plots.  Pure host-side matplotlib over metrics computed on-device.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


class TrajectoryVisualizer:
    """Plots for one or more TrajectoryMetrics ({label: tm} or a single tm)."""

    def __init__(self, tm_dict):
        from .metrics import TrajectoryMetrics

        if isinstance(tm_dict, TrajectoryMetrics):
            tm_dict = {"est": tm_dict}
        self.tm_dict = dict(tm_dict)

    def _first(self):
        return next(iter(self.tm_dict.values()))

    def plot_topdown(self, which_plane: str = "xy", outfile: str | None = None, **fig_kw):
        """Top-down (plane projection) of ground truth + all estimates."""
        plt = _plt()
        axes = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}[which_plane]
        fig, ax = plt.subplots(**fig_kw)
        gt = np.asarray(self._first().positions_gt)
        a = axes[0] % gt.shape[-1]
        b = axes[1] % gt.shape[-1]
        ax.plot(gt[:, a], gt[:, b], "k--", linewidth=1.5, label="Ground truth")
        for label, tm in self.tm_dict.items():
            p = np.asarray(tm.positions_est)
            ax.plot(p[:, a], p[:, b], linewidth=1.0, label=label)
        ax.set_xlabel(which_plane[0] + " (m)")
        ax.set_ylabel(which_plane[1] + " (m)")
        ax.axis("equal")
        ax.legend()
        ax.grid(True, alpha=0.3)
        if outfile:
            fig.savefig(outfile, dpi=150, bbox_inches="tight")
            plt.close(fig)
        return fig, ax

    def plot_segment_errors(self, segment_lengths, outfile: str | None = None, **fig_kw):
        """Mean translational/rotational error vs segment length (KITTI)."""
        plt = _plt()
        fig, (ax_t, ax_r) = plt.subplots(1, 2, **{"figsize": (10, 4), **fig_kw})
        for label, tm in self.tm_dict.items():
            segs = tm.mean_segment_errors(segment_lengths, rot_unit="deg")
            if not len(segs):
                continue
            ax_t.plot(segs[:, 0], segs[:, 1] * 100.0, marker="o", label=label)
            ax_r.plot(segs[:, 0], segs[:, 2], marker="o", label=label)
        ax_t.set_xlabel("Segment length (m)")
        ax_t.set_ylabel("Translational error (%)")
        ax_r.set_xlabel("Segment length (m)")
        ax_r.set_ylabel("Rotational error (deg/m)")
        for ax in (ax_t, ax_r):
            ax.legend()
            ax.grid(True, alpha=0.3)
        if outfile:
            fig.savefig(outfile, dpi=150, bbox_inches="tight")
            plt.close(fig)
        return fig, (ax_t, ax_r)

    def plot_norm_err(self, outfile: str | None = None, rel: bool = False, **fig_kw):
        """Per-pose translational/rotational error norms along the path."""
        plt = _plt()
        fig, (ax_t, ax_r) = plt.subplots(2, 1, sharex=True, **{"figsize": (8, 6), **fig_kw})
        for label, tm in self.tm_dict.items():
            trans, rot = (tm.rel_errors if rel else tm.traj_errors)("all")
            x = np.asarray(tm.cum_dists())[: len(np.asarray(trans))]
            ax_t.plot(x, np.asarray(trans), label=label)
            ax_r.plot(x, np.degrees(np.asarray(rot)), label=label)
        ax_t.set_ylabel("Trans err (m)")
        ax_r.set_ylabel("Rot err (deg)")
        ax_r.set_xlabel("Distance traveled (m)")
        for ax in (ax_t, ax_r):
            ax.legend()
            ax.grid(True, alpha=0.3)
        if outfile:
            fig.savefig(outfile, dpi=150, bbox_inches="tight")
            plt.close(fig)
        return fig, (ax_t, ax_r)

    def plot_cum_norm_err(self, outfile: str | None = None, **fig_kw):
        """Cumulative error norms along the path."""
        plt = _plt()
        fig, (ax_t, ax_r) = plt.subplots(2, 1, sharex=True, **{"figsize": (8, 6), **fig_kw})
        for label, tm in self.tm_dict.items():
            trans, rot = tm.traj_errors("all")
            x = np.asarray(tm.cum_dists())
            ax_t.plot(x, np.cumsum(np.asarray(trans)), label=label)
            ax_r.plot(x, np.degrees(np.cumsum(np.asarray(rot))), label=label)
        ax_t.set_ylabel("Cum. trans err (m)")
        ax_r.set_ylabel("Cum. rot err (deg)")
        ax_r.set_xlabel("Distance traveled (m)")
        for ax in (ax_t, ax_r):
            ax.legend()
            ax.grid(True, alpha=0.3)
        if outfile:
            fig.savefig(outfile, dpi=150, bbox_inches="tight")
            plt.close(fig)
        return fig, (ax_t, ax_r)
