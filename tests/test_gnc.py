"""GNC (graduated non-convexity) outlier-robust solving tests
(solver/gnc.py).

The load-bearing check: on a pose graph with planted gross-outlier loop
closures, plain L2 is dragged far from ground truth, a fixed robust kernel
helps but still biases, and GNC (a) classifies exactly the planted edges
as outliers and (b) recovers the trajectory to near the outlier-free
optimum's accuracy."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve_auto, solve_gnc


def _plant_outliers(data, n_out, seed=0):
    """Replace the measurements of n_out loop-closure edges (never odometry
    chain edges) with random garbage; returns (data, outlier_edge_ids)."""
    rng = np.random.default_rng(seed)
    n = data.T_gt.shape[0]
    n_edges = len(data.edges_i)
    loop_ids = np.arange(n - 1, n_edges)  # chain edges come first in synth
    out = rng.choice(loop_ids, size=n_out, replace=False)
    T_meas = np.array(data.T_meas)
    for k in out:
        if data.dim == 2:
            th = rng.uniform(-np.pi, np.pi)
            c, s = np.cos(th), np.sin(th)
            T = np.eye(3)
            T[:2, :2] = [[c, -s], [s, c]]
            T[:2, 2] = rng.uniform(-8, 8, 2)
        else:
            from scipy.spatial.transform import Rotation

            T = np.eye(4)
            T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
            T[:3, 3] = rng.uniform(-8, 8, 3)
        T_meas[k] = T
    return dataclasses.replace(data, T_meas=T_meas), out


def _ate(solved, data):
    dim = data.dim
    T = np.asarray(solved.blocks["poses"].values, np.float64)
    return float(
        np.sqrt(np.mean(np.sum((T[:, :dim, dim] - data.T_gt[:, :dim, dim]) ** 2, axis=1)))
    )


class TestGNCse2:
    def test_tls_recovers_under_heavy_outliers(self):
        clean = synth.se2_manhattan(n_poses=200, seed=11)
        data, out_ids = _plant_outliers(clean, n_out=20, seed=1)
        opts = Options(method="lm", max_iters=30, min_cost_decrease=0.999)

        g_clean = build.pose_graph(clean, dtype=jnp.float64)
        s_clean, _ = solve_auto(g_clean, opts)
        ate_clean = _ate(s_clean, clean)

        g_bad = build.pose_graph(data, dtype=jnp.float64)
        s_l2, _ = solve_auto(g_bad, opts)
        ate_l2 = _ate(s_l2, data)

        s_gnc, info = solve_gnc(build.pose_graph(data, dtype=jnp.float64), opts)
        ate_gnc = _ate(s_gnc, data)

        # L2 is wrecked; GNC-TLS lands within 3x of the outlier-free accuracy
        assert ate_l2 > 5 * ate_clean
        assert ate_gnc < 3 * ate_clean + 1e-3
        assert ate_gnc < 0.2 * ate_l2

        # classification: a planted edge CAN be quasi-consistent (the map
        # can bend to absorb it when its endpoints are weakly cross
        # -constrained), so allow one survivor
        (mask,) = info.inlier_masks
        assert mask[out_ids].sum() <= 1, "planted outliers kept as inliers"
        inl = np.ones(len(mask), bool)
        inl[out_ids] = False
        # a ~1% false-rejection rate is inherent to the 0.99 chi-square
        # gate (~380 true edges -> a handful clipped); accuracy is already
        # asserted via ATE above
        assert (~mask[inl]).sum() <= 0.03 * inl.sum()

    def test_gm_recovers_under_mild_outliers(self):
        # GM's convex start IS plain L2, and the measured behavior (see
        # gnc.py docstring) is that heavy contamination locks it in the L2
        # basin — TLS is the default for a reason.  Mild contamination it
        # handles exactly.
        clean = synth.se2_manhattan(n_poses=200, seed=11)
        data, out_ids = _plant_outliers(clean, n_out=4, seed=1)
        opts = Options(method="lm", max_iters=30, min_cost_decrease=0.999)
        g_clean = build.pose_graph(clean, dtype=jnp.float64)
        s_clean, _ = solve_auto(g_clean, opts)
        ate_clean = _ate(s_clean, clean)
        s_gnc, info = solve_gnc(
            build.pose_graph(data, dtype=jnp.float64), opts, surrogate="gm"
        )
        (mask,) = info.inlier_masks
        assert not mask[out_ids].any()
        assert _ate(s_gnc, data) < 3 * ate_clean + 1e-3

    def test_no_outliers_keeps_everything(self):
        clean = synth.se2_loop(n_poses=80, seed=3)
        opts = Options(method="gn", max_iters=25, min_cost_decrease=0.999)
        # 0.9999 confidence: with ~a hundred clean edges the 0.99 quantile
        # is EXPECTED to clip one — the gate must sit above the noise
        s_gnc, info = solve_gnc(
            build.pose_graph(clean, dtype=jnp.float64), opts, confidence=0.9999
        )
        (mask,) = info.inlier_masks
        assert mask.all()
        s_plain, _ = solve_auto(build.pose_graph(clean, dtype=jnp.float64), opts)
        np.testing.assert_allclose(
            np.asarray(s_gnc.blocks["poses"].values),
            np.asarray(s_plain.blocks["poses"].values),
            atol=1e-6,
        )


class TestGNCse3:
    def test_recovers_under_outliers_3d(self):
        clean = synth.se3_sphere(n_poses=100, seed=9)
        data, out_ids = _plant_outliers(clean, n_out=12, seed=2)
        opts = Options(method="lm", max_iters=25, min_cost_decrease=0.999)

        g_clean = build.pose_graph(clean, dtype=jnp.float64)
        s_clean, _ = solve_auto(g_clean, opts)
        ate_clean = _ate(s_clean, clean)

        s_l2, _ = solve_auto(build.pose_graph(data, dtype=jnp.float64), opts)
        s_gnc, info = solve_gnc(build.pose_graph(data, dtype=jnp.float64), opts)

        assert _ate(s_gnc, data) < 3 * ate_clean + 1e-3
        assert _ate(s_gnc, data) < _ate(s_l2, data)
        (mask,) = info.inlier_masks
        assert not mask[out_ids].any()

    def test_chordal_plus_gnc(self):
        """The intended production stack: chordal init + GNC solve."""
        clean = synth.se3_sphere(n_poses=80, seed=4)
        data, out_ids = _plant_outliers(clean, n_out=8, seed=5)
        # NOTE: chordal init itself is least-squares and outlier-sensitive;
        # with modest contamination it still lands close enough for GNC.
        g = build.pose_graph(data, dtype=jnp.float64, init="chordal")
        opts = Options(method="lm", max_iters=25, min_cost_decrease=0.999)
        s_gnc, info = solve_gnc(g, opts)
        (mask,) = info.inlier_masks
        assert mask[out_ids].sum() <= 1
        assert np.isfinite(info.chi2)


class TestGNCSim3:
    def test_rejects_wrong_scale_loop_closures(self):
        # monocular scale-drift graph where 2 of the loop closures are
        # corrupted (wrong pose AND wrong scale ratio) — the classic
        # wrong-loop-closure failure; TLS-GNC must zero them out
        from pyslam_tpu.lie import sim3

        data = synth.sim3_loop(
            n_poses=80, n_loops=6, scale_drift=0.005, odo_scale_std=0.005, seed=5
        )
        n_odo = 79
        bad = np.array([n_odo + 1, n_odo + 3])  # two mid-trajectory closures
        T_bad = data.T_meas.copy()
        rng = np.random.default_rng(7)
        for e in bad:
            xi = rng.normal(size=7)
            xi[6] = 0.8  # ~2.2x wrong scale ratio
            T_bad[e] = np.asarray(sim3.exp(jnp.asarray(xi)))
        data.T_meas = T_bad

        opts = Options(method="lm", max_iters=30, min_cost_decrease=0.999)
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        s_l2, _ = solve_auto(g, opts)
        s_gnc, info = solve_gnc(
            build.sim3_pose_graph(data, dtype=jnp.float64), opts
        )
        (mask,) = info.inlier_masks
        assert not mask[bad].any()  # planted closures classified outlier
        # scales stay near 1 under GNC; plain L2 is dragged off by the
        # wrong scale ratios
        sc_gnc = np.asarray(sim3.scale(s_gnc.blocks["poses"].values))
        sc_l2 = np.asarray(sim3.scale(s_l2.blocks["poses"].values))
        assert np.abs(np.log(sc_gnc)).max() < 0.2
        assert np.abs(np.log(sc_gnc)).max() < np.abs(np.log(sc_l2)).max()
