"""Schur-complement BA path (SURVEY.md §7 M3; BASELINE.json config #4).

Covers: BAL factor-kernel Jacobians vs jax.jacfwd, Schur-eliminated solves
(dense S and implicit PCG) vs the monolithic dense path on the same graph,
constant-parameter handling, and BAL file round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FACTOR_KERNELS, FactorGraph
from pyslam_tpu.io import bal, synth
from pyslam_tpu.losses import HuberLoss
from pyslam_tpu.solver import Options, ba_assemble, solve, solve_schur
from pyslam_tpu.solver.schur import schur_solve_dense, schur_solve_pcg
from pyslam_tpu.solver.assemble import assemble_dense
from pyslam_tpu.solver.lm import _dense_solve


def tiny_ba(n_cams=6, n_pts=40, seed=0, loss=None, model="stereo"):
    if model == "stereo":
        data = synth.ba_synthetic(n_cams=n_cams, n_pts=n_pts, seed=seed)
        return build.ba_graph(data, loss=loss, dtype=jnp.float64)
    data = bal.perturbed(bal.synthetic_bal(n_cams=n_cams, n_pts=n_pts, seed=seed))
    return build.bal_graph(data, loss=loss, dtype=jnp.float64)


class TestBALKernel:
    def test_jacobians_vs_autodiff(self, rng):
        from pyslam_tpu.lie import se3

        kern = FACTOR_KERNELS["reprojection_bal"]
        F = 5
        T = jnp.asarray(
            np.stack([np.eye(4)] * F), jnp.float64
        )
        T = se3.exp(jnp.asarray(rng.normal(0, 0.2, (F, 6))))
        pt = jnp.asarray(rng.normal(0, 1.0, (F, 3)))
        # push points in front of the -z axis
        pt = pt.at[:, 2].set(-jnp.abs(pt[:, 2]) - 2.0)
        data = dict(
            obs=jnp.asarray(rng.normal(0, 100.0, (F, 2))),
            sqrt_info=jnp.broadcast_to(jnp.eye(2, dtype=jnp.float64), (F, 2, 2)),
            f=jnp.full((F,), 800.0),
            k1=jnp.full((F,), -1e-3),
            k2=jnp.full((F,), 1e-5),
        )
        r, (J_T, J_pt) = kern(data, T, pt, compute_jacobians=True)

        def r_of_eps(eps, i):
            Ti = se3.exp(eps[None])[0] @ T[i]
            ri, _ = kern(
                jax.tree_util.tree_map(lambda a: a[i : i + 1], data),
                Ti[None],
                pt[i : i + 1],
                compute_jacobians=False,
            )
            return ri[0]

        def r_of_pt(p, i):
            ri, _ = kern(
                jax.tree_util.tree_map(lambda a: a[i : i + 1], data),
                T[i : i + 1],
                p[None],
                compute_jacobians=False,
            )
            return ri[0]

        for i in range(F):
            J_num = jax.jacfwd(r_of_eps)(jnp.zeros(6, jnp.float64), i)
            np.testing.assert_allclose(J_T[i], J_num, rtol=1e-7, atol=1e-9)
            J_num = jax.jacfwd(r_of_pt)(pt[i], i)
            np.testing.assert_allclose(J_pt[i], J_num, rtol=1e-7, atol=1e-9)


class TestSchurEqualsDense:
    """Eliminating the landmarks must give the SAME step as solving the full
    system monolithically — Schur complement is algebra, not approximation."""

    @pytest.mark.parametrize("model", ["stereo", "bal"])
    def test_one_step_matches(self, model):
        g = tiny_ba(model=model)
        opts = Options(method="lm")
        parts, grad, chi2_s = ba_assemble(g)
        H, grad_d, chi2_d = assemble_dense(g)
        np.testing.assert_allclose(float(chi2_s), float(chi2_d), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_d), rtol=1e-9, atol=1e-9)

        lam = jnp.asarray(1e-4, jnp.float64)
        dx_dense = _dense_solve(H, grad_d, lam, opts)
        dx_schur = schur_solve_dense(parts, grad, lam, opts)
        dx_pcg = schur_solve_pcg(parts, grad, lam, opts, rtol=1e-12, max_iters=500)
        np.testing.assert_allclose(
            np.asarray(dx_schur), np.asarray(dx_dense), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(dx_pcg), np.asarray(dx_dense), rtol=1e-5, atol=1e-7
        )

    def test_marquardt_damping_note(self):
        # dense-path damping is lam*diag(H) on the FULL matrix; the Schur path
        # damps Hpp/Hll blockwise — identical diagonals, so steps match above.
        pass


class TestSolveSchur:
    @pytest.mark.parametrize("mode", ["dense", "pcg"])
    def test_converges_near_gt_chi2(self, mode):
        data = synth.ba_synthetic(n_cams=8, n_pts=60, seed=3)
        g = build.ba_graph(data, dtype=jnp.float64)
        g_gt = build.ba_graph(data, dtype=jnp.float64, init="gt")
        chi2_gt = float(g_gt.chi2())
        solved, info = solve_schur(g, Options(method="lm", max_iters=30), mode=mode)
        assert float(info.chi2) <= chi2_gt * 1.05
        # gauge camera must not have moved
        np.testing.assert_allclose(
            np.asarray(solved.blocks["poses"].values[0]),
            np.asarray(g.blocks["poses"].values[0]),
            atol=1e-12,
        )

    def test_robust_loss(self):
        g = tiny_ba(loss=HuberLoss(1.0))
        solved, info = solve_schur(g, Options(method="lm", max_iters=20))
        assert float(info.chi2) < float(g.chi2())

    def test_matches_monolithic_converged_cost(self):
        data = synth.ba_synthetic(n_cams=5, n_pts=30, seed=7)
        g = build.ba_graph(data, dtype=jnp.float64)
        opts = Options(method="lm", max_iters=40)
        _, info_schur = solve_schur(g, opts, mode="dense")
        _, info_dense = solve(g, opts)
        np.testing.assert_allclose(
            float(info_schur.chi2), float(info_dense.chi2), rtol=1e-6
        )


class TestBALIO:
    def test_roundtrip(self, tmp_path):
        data = bal.synthetic_bal(n_cams=4, n_pts=20, seed=0)
        path = str(tmp_path / "test.bal")
        bal.write_bal(path, data)
        back = bal.read_bal(path)
        np.testing.assert_allclose(back.T, data.T, atol=1e-12)
        np.testing.assert_allclose(back.intrinsics, data.intrinsics, atol=1e-12)
        np.testing.assert_allclose(back.pts, data.pts, atol=1e-12)
        np.testing.assert_array_equal(back.cam_idx, data.cam_idx)
        np.testing.assert_array_equal(back.pt_idx, data.pt_idx)
        np.testing.assert_allclose(back.obs, data.obs, atol=1e-12)

    def test_synthetic_consistency(self):
        # ground-truth geometry must reproject to the observations (to noise)
        data = bal.synthetic_bal(n_cams=4, n_pts=30, pixel_std=0.0, seed=1)
        g = build.bal_graph(data, dtype=jnp.float64)
        assert float(g.chi2()) < 1e-10


class TestFullSlamGraph:
    """Full-SLAM graphs (odometry/loop-closure between factors + landmark
    observations in ONE graph) through the Schur path — round-2 capability:
    ba_assemble previously rejected (pose, pose) batches, so such graphs
    crashed solve_auto."""

    def _slam_graph(self):
        from pyslam_tpu.lie import se3 as se3_ops

        data = synth.ba_synthetic(n_cams=8, n_pts=50, obs_per_pt=4, seed=12)
        g = build.ba_graph(data, dtype=jnp.float64)
        # odometry chain between consecutive ground-truth poses
        Ti = np.arange(7, dtype=np.int32)
        Tj = Ti + 1
        T_obs = np.stack(
            [data.T_gt[j] @ np.linalg.inv(data.T_gt[i]) for i, j in zip(Ti, Tj)]
        )
        from pyslam_tpu.graph.core import FactorBatch
        from pyslam_tpu.losses import L2Loss

        between = FactorBatch.create(
            kind="between_se3",
            slots=("poses", "poses"),
            indices=(Ti, Tj),
            data={
                "T_obs": jnp.asarray(T_obs, jnp.float64),
                "sqrt_info": jnp.broadcast_to(
                    10.0 * jnp.eye(6, dtype=jnp.float64), (7, 6, 6)
                ),
            },
            loss=L2Loss(),
        )
        return FactorGraph(dict(g.blocks), [g.batches[0], between])

    @pytest.mark.parametrize("mode", ["dense", "pcg"])
    def test_matches_monolithic_dense(self, mode):
        g = self._slam_graph()
        opts = Options(method="lm", max_iters=25)
        _, i_ref = solve(g, opts)
        _, i_s = solve_schur(g, opts, mode=mode, pcg_rtol=1e-12, pcg_max_iters=400)
        np.testing.assert_allclose(float(i_s.chi2), float(i_ref.chi2), rtol=1e-6)

    def test_solve_auto_routes_mixed_graph(self):
        from pyslam_tpu.solver import solve_auto

        g = self._slam_graph()
        solved, info = solve_auto(g, Options(method="lm", max_iters=15))
        assert float(info.chi2) < float(g.chi2())


class TestBal9Cameras:
    """Full BAL cameras: intrinsics [f, k1, k2] optimized jointly with the
    pose as one 9-dof bal_cam9 product-manifold block (the real BAL
    problem; the benchmark configs hold intrinsics fixed)."""

    def test_kernel_jacobians_vs_autodiff(self, rng):
        import jax

        from pyslam_tpu.graph.core import FACTOR_KERNELS
        from pyslam_tpu.lie import se3

        T = se3.exp(jnp.asarray(rng.normal(size=(4, 6)) * 0.2))
        T = T.at[:, 2, 3].add(4.0)  # points in front (negative-z convention ok)
        intr = jnp.asarray(
            np.stack([[700.0, -1e-3, 1e-5]] * 4) * (1 + rng.normal(size=(4, 3)) * 0.05)
        )
        cam = jnp.concatenate([T.reshape(4, 16), intr], axis=1)
        pt = jnp.asarray(rng.normal(size=(4, 3)))
        data = {
            "obs": jnp.asarray(rng.normal(size=(4, 2)) * 5),
            "sqrt_info": jnp.broadcast_to(jnp.eye(2), (4, 2, 2)),
        }
        kern = FACTOR_KERNELS["reprojection_bal9"]
        r, (J_cam, J_pt) = kern(data, cam, pt)

        from pyslam_tpu.graph.core import MANIFOLDS

        retract = MANIFOLDS["bal_cam9"]["retract"]

        def f_cam(eps):
            return kern(data, retract(cam, eps[None]), pt, False)[0]

        def f_pt(eps):
            return kern(data, cam, pt + eps[None], False)[0]

        J_cam_auto = jax.jacfwd(f_cam)(jnp.zeros(9))
        J_pt_auto = jax.jacfwd(f_pt)(jnp.zeros(3))
        np.testing.assert_allclose(J_cam, J_cam_auto, atol=1e-6)
        np.testing.assert_allclose(J_pt, J_pt_auto, atol=1e-6)

    def test_recovers_perturbed_intrinsics(self):
        # exact observations; init with wrong focal lengths/distortion:
        # joint optimization must recover them where the fixed-intrinsics
        # model cannot reach the optimum
        data = bal.synthetic_bal(n_cams=6, n_pts=60, pixel_std=0.0, seed=3)
        rng = np.random.default_rng(5)
        wrong = data.intrinsics.copy()
        # ALL intrinsics perturbed, including the anchor camera's: the
        # gauge is a pose-only prior (prior_balcam_pose), so camera 0's
        # intrinsics are free to recover too
        wrong[:, 0] *= 1 + rng.normal(0, 0.05, len(wrong))
        bad = bal.BALData(
            data.T.copy(), wrong, data.pts.copy(), data.cam_idx, data.pt_idx, data.obs
        )
        g_fixed = build.bal_graph(bal.perturbed(bad), dtype=jnp.float64)
        g_joint = build.bal_graph(
            bal.perturbed(bad), dtype=jnp.float64, optimize_intrinsics=True
        )
        s_f, i_f = solve(g_fixed, Options(method="lm", max_iters=40))
        s_j, i_j = solve(g_joint, Options(method="lm", max_iters=60))
        assert float(i_j.chi2) < 1e-6  # exact data: joint model reaches 0
        assert float(i_j.chi2) < float(i_f.chi2) * 1e-3  # fixed model cannot
        est = np.asarray(s_j.blocks["poses"].values)[:, 16]
        # every camera's focal recovers, including the pose-anchored one
        np.testing.assert_allclose(est, data.intrinsics[:, 0], rtol=1e-4)

    def test_schur_matches_dense(self):
        from pyslam_tpu.solver.schur import solve_schur

        data = bal.perturbed(bal.synthetic_bal(n_cams=5, n_pts=40, seed=7))
        g = build.bal_graph(data, dtype=jnp.float64, optimize_intrinsics=True)
        opts = Options(method="lm", max_iters=30)
        _, i_dense = solve(g, opts)
        _, i_schur = solve_schur(g, opts, mode="dense")
        np.testing.assert_allclose(
            float(i_schur.chi2), float(i_dense.chi2), rtol=1e-6
        )

    def test_anchor_prior_jacobian_vs_autodiff(self, rng):
        import jax

        from pyslam_tpu.graph.core import FACTOR_KERNELS, MANIFOLDS
        from pyslam_tpu.lie import se3

        T = se3.exp(jnp.asarray(rng.normal(size=(3, 6)) * 0.3))
        intr = jnp.asarray(np.tile([700.0, -1e-3, 1e-5], (3, 1)))
        cam = jnp.concatenate([T.reshape(3, 16), intr], axis=1)
        data = {
            "T_obs": se3.exp(jnp.asarray(rng.normal(size=(3, 6)) * 0.2)),
            "sqrt_info": jnp.broadcast_to(jnp.eye(6), (3, 6, 6)),
        }
        kern = FACTOR_KERNELS["prior_balcam_pose"]
        r, (J,) = kern(data, cam)
        retract = MANIFOLDS["bal_cam9"]["retract"]

        def f(eps):
            return kern(data, retract(cam, jnp.broadcast_to(eps, (3, 9))), False)[0]

        J_auto = jax.jacfwd(f)(jnp.zeros(9))
        # jacfwd over the shared eps gives (3, 6, 9) per-factor blocks
        np.testing.assert_allclose(J, J_auto, atol=1e-8)
        # intrinsics columns are exactly zero (pose-only prior)
        np.testing.assert_allclose(J[..., 6:], 0.0, atol=0)
