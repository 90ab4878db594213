"""Chordal-initialization tests (graph/initialize.py chordal_init + the
chordal_rot / chordal_trans linear kernels).

The relaxation is exact on noise-free graphs (the LS optimum IS the ground
truth), so exactness there is the load-bearing check; on noisy graphs the
check is basin quality: chi2 at the chordal init must crush the odometry
init and LM must reach the same optimum in no more iterations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FACTOR_KERNELS, VariableBlock
from pyslam_tpu.graph.initialize import chordal_init
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve


def _with_init(data, T0):
    n = T0.shape[0]
    kind = "se2" if data.dim == 2 else "se3"
    const = np.zeros(n, bool)
    const[0] = True
    g = build.pose_graph(data, dtype=jnp.float64)
    return g.with_values(
        {"poses": VariableBlock.create(kind, jnp.asarray(T0, jnp.float64), const)}
    )


class TestChordalKernels:
    @pytest.mark.parametrize("d", [2, 3])
    def test_rot_jacobians_vs_autodiff(self, d):
        rng = np.random.default_rng(0)
        F = 5
        A = rng.normal(size=(F, d, d))
        U, _, Vt = np.linalg.svd(A)
        R = jnp.asarray(U @ Vt)
        data = {"R_meas": R}
        x1 = jnp.asarray(rng.normal(size=(F, d * d)))
        x2 = jnp.asarray(rng.normal(size=(F, d * d)))
        kern = FACTOR_KERNELS["chordal_rot"]
        r, (J1, J2) = kern(data, x1, x2)
        J1n = jax.jacfwd(lambda a: kern(data, a, x2, compute_jacobians=False)[0])(x1)
        J2n = jax.jacfwd(lambda a: kern(data, x1, a, compute_jacobians=False)[0])(x2)
        idx = jnp.arange(F)
        np.testing.assert_allclose(J1, J1n[idx, :, idx, :], atol=1e-12)
        np.testing.assert_allclose(J2, J2n[idx, :, idx, :], atol=1e-12)

    def test_trans_jacobians_vs_autodiff(self):
        rng = np.random.default_rng(1)
        F, d = 4, 3
        A = rng.normal(size=(F, d, d))
        U, _, Vt = np.linalg.svd(A)
        data = {"R_meas": jnp.asarray(U @ Vt), "t_meas": jnp.asarray(rng.normal(size=(F, d)))}
        t1 = jnp.asarray(rng.normal(size=(F, d)))
        t2 = jnp.asarray(rng.normal(size=(F, d)))
        kern = FACTOR_KERNELS["chordal_trans"]
        r, (J1, J2) = kern(data, t1, t2)
        J1n = jax.jacfwd(lambda a: kern(data, a, t2, compute_jacobians=False)[0])(t1)
        idx = jnp.arange(F)
        np.testing.assert_allclose(J1, J1n[idx, :, idx, :], atol=1e-12)
        np.testing.assert_allclose(r, t2 - jnp.einsum("fij,fj->fi", data["R_meas"], t1) - data["t_meas"])


class TestChordalInit:
    @pytest.mark.parametrize("gen,n", [(synth.se2_loop, 60), (synth.se3_sphere, 50)])
    def test_exact_on_noise_free_graphs(self, gen, n):
        # ~zero noise (the generators build sqrt_info = 1/std, so exactly
        # zero is not representable)
        data = gen(n_poses=n, odo_trans_std=1e-10, odo_rot_std=1e-10, seed=0)
        T0 = chordal_init(
            data.edges_i, data.edges_j, data.T_meas, n, T_anchor=data.T_gt[0]
        )
        np.testing.assert_allclose(T0, data.T_gt, atol=5e-5)

    def test_se2_basin_and_convergence(self):
        data = synth.se2_manhattan(n_poses=250, seed=3)
        T0 = chordal_init(data.edges_i, data.edges_j, data.T_meas, 250)
        g_odo = build.pose_graph(data, dtype=jnp.float64)
        g_ch = _with_init(data, T0)
        assert float(g_ch.chi2()) < 0.05 * float(g_odo.chi2())
        opts = Options(method="gn", max_iters=30, min_cost_decrease=0.999)
        _, info_odo = solve(g_odo, opts)
        _, info_ch = solve(g_ch, opts)
        np.testing.assert_allclose(float(info_ch.chi2), float(info_odo.chi2), rtol=1e-4)
        assert int(info_ch.iterations) <= int(info_odo.iterations)

    def test_se3_basin_and_convergence(self):
        data = synth.se3_sphere(n_poses=120, seed=2)
        T0 = chordal_init(data.edges_i, data.edges_j, data.T_meas, 120)
        g_odo = build.pose_graph(data, dtype=jnp.float64)
        g_ch = _with_init(data, T0)
        assert float(g_ch.chi2()) < 0.25 * float(g_odo.chi2())
        opts = Options(method="lm", max_iters=40, min_cost_decrease=0.999)
        _, info_odo = solve(g_odo, opts)
        _, info_ch = solve(g_ch, opts)
        np.testing.assert_allclose(float(info_ch.chi2), float(info_odo.chi2), rtol=1e-3)
        assert int(info_ch.iterations) <= int(info_odo.iterations)

    def test_rotations_are_orthonormal(self):
        data = synth.se3_sphere(n_poses=60, seed=7)
        T0 = chordal_init(data.edges_i, data.edges_j, data.T_meas, 60)
        R = T0[:, :3, :3]
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2), np.tile(np.eye(3), (60, 1, 1)), atol=1e-10
        )
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)

    def test_anchor_respected(self):
        data = synth.se2_loop(n_poses=30, seed=4)
        T_anchor = data.T_gt[0]
        T0 = chordal_init(
            data.edges_i, data.edges_j, data.T_meas, 30, T_anchor=T_anchor
        )
        np.testing.assert_allclose(T0[0], T_anchor, atol=1e-12)

    def test_build_pose_graph_init_option(self):
        data = synth.se2_loop(n_poses=40, seed=5)
        g_ch = build.pose_graph(data, dtype=jnp.float64, init="chordal")
        g_odo = build.pose_graph(data, dtype=jnp.float64)
        assert float(g_ch.chi2()) < float(g_odo.chi2())
        g_st = build.pose_graph(data, dtype=jnp.float64, init="spanning_tree")
        assert np.isfinite(float(g_st.chi2()))
