"""TrajectoryMetrics / TrajectoryVisualizer (reference L6 parity,
SURVEY.md §3.5): error definitions, segment errors, serialization, plots."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.eval import TrajectoryMetrics, TrajectoryVisualizer
from pyslam_tpu.lie import se3


def straight_traj(n=50, step=1.0):
    """Ground truth going straight down +x."""
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, 0, 3] = step * np.arange(n)
    return T


class TestTrajectoryMetrics:
    def test_zero_error_on_identical(self):
        T = straight_traj()
        tm = TrajectoryMetrics(T, T.copy())
        trans, rot = tm.traj_errors()
        assert float(np.max(np.asarray(trans))) < 1e-12
        assert float(np.max(np.asarray(rot))) < 1e-12
        assert float(tm.endpoint_error()) < 1e-12
        assert float(tm.armse("trans")) < 1e-12

    def test_known_offset(self):
        T = straight_traj()
        T_est = T.copy()
        T_est[:, 1, 3] += 0.5  # constant 0.5 m lateral offset
        tm = TrajectoryMetrics(T, T_est)
        trans = tm.traj_errors("trans")
        np.testing.assert_allclose(np.asarray(trans), 0.5, atol=1e-12)
        np.testing.assert_allclose(float(tm.mean_err("trans")), 0.5, atol=1e-12)
        np.testing.assert_allclose(float(tm.rms_err("trans")), 0.5, atol=1e-12)
        np.testing.assert_allclose(float(tm.cum_err("trans")), 25.0, atol=1e-10)
        np.testing.assert_allclose(float(tm.armse("trans")), 0.5, atol=1e-12)

    def test_error_is_se3_log(self):
        rng = np.random.default_rng(0)
        T_gt = np.asarray(se3.exp(rng.normal(0, 0.3, (10, 6))))
        xi_true = rng.normal(0, 0.1, (10, 6))
        T_est = np.asarray(se3.exp(xi_true)) @ T_gt  # wait: log(Tgt^-1 Test)
        tm = TrajectoryMetrics(T_gt, T_est)
        xi = np.asarray(tm.error())
        expect = np.asarray(se3.log(se3.inv(T_gt) @ T_est))
        np.testing.assert_allclose(xi, expect, atol=1e-12)

    def test_convention_inversion(self):
        T = straight_traj(10)
        T_est = T.copy()
        T_est[:, 1, 3] += 0.3
        a = TrajectoryMetrics(T, T_est, convention="Twv")
        b = TrajectoryMetrics(
            np.linalg.inv(T), np.linalg.inv(T_est), convention="Tvw"
        )
        np.testing.assert_allclose(
            np.asarray(a.error()), np.asarray(b.error()), atol=1e-10
        )

    def test_rel_errors_perfect_odometry(self):
        # A trajectory with constant offset has ZERO relative error.
        T = straight_traj()
        T_est = T.copy()
        T_est[:, 1, 3] += 5.0
        tm = TrajectoryMetrics(T, T_est)
        trans, rot = tm.rel_errors()
        assert float(np.max(np.asarray(trans))) < 1e-12

    def test_segment_errors(self):
        T = straight_traj(101, step=1.0)  # 100 m path
        T_est = T.copy()
        # drift: 1% along-track error
        T_est[:, 0, 3] *= 1.01
        tm = TrajectoryMetrics(T, T_est)
        mse = tm.mean_segment_errors([10.0, 50.0])
        assert mse.shape[0] == 2
        # 1% drift -> ~0.01 per unit length (leading-order)
        np.testing.assert_allclose(mse[:, 1], 0.01, rtol=0.05)

    def test_cum_dists(self):
        T = straight_traj(11, step=2.0)
        tm = TrajectoryMetrics(T, T)
        np.testing.assert_allclose(
            np.asarray(tm.cum_dists()), 2.0 * np.arange(11), atol=1e-12
        )

    def test_se2_support(self):
        from pyslam_tpu.lie import se2

        rng = np.random.default_rng(1)
        T_gt = np.asarray(se2.exp(rng.normal(0, 0.3, (8, 3))))
        T_est = np.asarray(se2.exp(rng.normal(0, 0.3, (8, 3))))
        tm = TrajectoryMetrics(T_gt, T_est)
        assert tm.dim == 2
        xi = np.asarray(tm.error())
        expect = np.asarray(se2.log(se2.inv(T_gt) @ T_est))
        np.testing.assert_allclose(xi, expect, atol=1e-12)

    def test_align_rigid(self):
        # est = rigid transform of gt (+ nothing): se3 alignment zeroes ATE
        rng = np.random.default_rng(5)
        T = np.array(se3.exp(rng.normal(0, 0.3, (40, 6))))
        T[:, :3, 3] += np.cumsum(rng.normal(0, 1.0, (40, 3)), axis=0)
        A = np.asarray(se3.exp(np.array([3.0, -1.0, 2.0, 0.4, 0.2, -0.3])))
        tm = TrajectoryMetrics(T, A[None] @ T)
        assert float(tm.armse("trans")) > 1.0
        tm_a = tm.align("se3")
        assert float(tm_a.armse("trans")) < 1e-5
        assert abs(float(tm_a.alignment["scale"]) - 1.0) < 1e-12

    def test_align_similarity_recovers_scale(self):
        # est = scaled+rigid transform (monocular scale ambiguity):
        # se3 alignment cannot zero the error, sim3 can and finds the scale
        rng = np.random.default_rng(6)
        T = straight_traj(40)
        T[:, :3, 3] += rng.normal(0, 0.5, (40, 3))
        scale = 2.5
        T_est = T.copy()
        T_est[:, :3, 3] *= scale
        tm = TrajectoryMetrics(T, T_est)
        assert float(tm.align("se3").armse("trans")) > 1.0
        tm_a = tm.align("sim3")
        assert float(tm_a.armse("trans")) < 1e-6
        np.testing.assert_allclose(float(tm_a.alignment["scale"]), 1 / scale, rtol=1e-9)

    def test_align_none_and_unknown(self):
        T = straight_traj(10)
        tm = TrajectoryMetrics(T, T.copy())
        assert tm.align("none") is tm
        with pytest.raises(ValueError, match="unknown alignment"):
            tm.align("procrustes")

    @pytest.mark.parametrize("ext", ["pkl", "mat"])
    def test_save_load(self, tmp_path, ext):
        T = straight_traj(10)
        T_est = T.copy()
        T_est[:, 1, 3] += 0.1
        tm = TrajectoryMetrics(T, T_est)
        path = str(tmp_path / f"tm.{ext}")
        tm.saveas(path)
        back = TrajectoryMetrics.loadfrom(path)
        np.testing.assert_allclose(np.asarray(back.Twv_gt), T, atol=1e-12)
        np.testing.assert_allclose(np.asarray(back.Twv_est), T_est, atol=1e-12)


class TestVisualizer:
    def test_all_plots_render(self, tmp_path):
        T = straight_traj(60)
        rng = np.random.default_rng(2)
        T_est = np.asarray(se3.exp(rng.normal(0, 0.02, (60, 6)))) @ T
        tm = TrajectoryMetrics(T, T_est)
        viz = TrajectoryVisualizer({"run": tm})
        viz.plot_topdown(outfile=str(tmp_path / "topdown.png"))
        viz.plot_segment_errors([10.0, 20.0], outfile=str(tmp_path / "seg.png"))
        viz.plot_norm_err(outfile=str(tmp_path / "norm.png"))
        viz.plot_cum_norm_err(outfile=str(tmp_path / "cum.png"))
        for name in ["topdown.png", "seg.png", "norm.png", "cum.png"]:
            assert (tmp_path / name).stat().st_size > 1000


class TestTrajectorySync:
    """Timestamp association + SE(3) interpolation (eval/sync.py;
    evo-style trajectory sync — beyond-reference)."""

    def test_associate_nearest_within_tolerance(self):
        from pyslam_tpu.eval import associate

        t_ref = np.arange(0.0, 1.0, 0.1)
        rng = np.random.default_rng(0)
        t_est = t_ref + rng.uniform(-0.015, 0.015, t_ref.shape)
        i, j = associate(t_ref, t_est, max_dt=0.02)
        assert len(i) == len(t_ref)
        np.testing.assert_array_equal(i, j)

    def test_associate_respects_max_dt_and_uniqueness(self):
        from pyslam_tpu.eval import associate

        t_ref = np.array([0.0, 1.0, 2.0])
        t_est = np.array([0.005, 0.009, 5.0])  # two near 0.0, one far
        i, j = associate(t_ref, t_est, max_dt=0.02)
        # only ONE est stamp may claim ref 0.0; the far stamp matches nothing
        assert len(i) == 1 and i[0] == 0 and j[0] == 0

    def test_associate_offset(self):
        from pyslam_tpu.eval import associate

        t_ref = np.array([10.0, 11.0])
        t_est = np.array([0.0, 1.0])  # 10 s clock skew
        i, j = associate(t_ref, t_est, max_dt=0.01, offset=10.0)
        assert len(i) == 2

    def test_interpolate_midpoint_geodesic(self):
        from pyslam_tpu.eval import interpolate_poses
        from pyslam_tpu.lie import se3

        xi = jnp.asarray([0.3, -0.2, 0.5, 0.2, -0.1, 0.15], jnp.float64)
        Ta = np.asarray(se3.exp(jnp.zeros((1, 6), jnp.float64)))[0]
        Tb = np.asarray(se3.exp(xi[None]))[0]
        T = np.stack([Ta, Tb])
        Tm = interpolate_poses(T, [0.0, 1.0], [0.5])[0]
        T_expect = np.asarray(se3.exp(0.5 * xi[None]))[0]
        np.testing.assert_allclose(Tm, T_expect, atol=1e-9)

    def test_interpolate_at_knots_exact(self):
        from pyslam_tpu.eval import interpolate_poses
        from pyslam_tpu.lie import se3

        rng = np.random.default_rng(1)
        T = np.asarray(se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.3)))
        t = np.array([0.0, 0.5, 1.1, 2.0, 3.5])
        Tq = interpolate_poses(T, t, t)
        np.testing.assert_allclose(Tq, T, atol=1e-9)

    def test_interpolate_out_of_range_raises(self):
        from pyslam_tpu.eval import interpolate_poses

        T = np.tile(np.eye(4), (2, 1, 1))
        with pytest.raises(ValueError, match="outside"):
            interpolate_poses(T, [0.0, 1.0], [2.0])
        # clamped when extrapolate=True
        Tq = interpolate_poses(T, [0.0, 1.0], [2.0], extrapolate=True)
        np.testing.assert_allclose(Tq[0], np.eye(4), atol=1e-12)

    def test_end_to_end_sync_then_metrics(self):
        """Different-rate trajectories: interpolate gt at est stamps, then
        ATE — the full real-dataset evaluation recipe."""
        from pyslam_tpu.eval import TrajectoryMetrics, interpolate_poses
        from pyslam_tpu.lie import se3

        t_gt = np.linspace(0.0, 10.0, 101)  # 10 Hz ground truth
        xi_rate = jnp.asarray([0.1, 0.02, 0.0, 0.0, 0.0, 0.05], jnp.float64)
        T_gt = np.asarray(se3.exp(jnp.asarray(t_gt)[:, None] * xi_rate[None]))
        t_est = np.linspace(0.3, 9.7, 48)  # ~5 Hz estimates, offset window
        T_est = np.asarray(se3.exp(jnp.asarray(t_est)[:, None] * xi_rate[None]))
        T_gt_at_est = interpolate_poses(T_gt, t_gt, t_est)
        tm = TrajectoryMetrics(T_gt_at_est, T_est, convention="Twv")
        assert float(tm.armse("trans")) < 1e-6
