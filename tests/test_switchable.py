"""Switchable loop-closure constraints (Suenderhauf & Protzel ICRA 2012;
beyond-reference): analytic Jacobians vs autodiff, outlier loops turning
themselves off during optimization, and routing (2-block poses+switches
graphs must NOT enter the Schur paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FACTOR_KERNELS
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se2, se3
from pyslam_tpu.solver import Options, route_auto, solve


class TestSwitchKernelJacobians:
    @pytest.mark.parametrize("ops,dof,kind", [(se3, 6, "between_se3_switch"),
                                              (se2, 3, "between_se2_switch")])
    def test_vs_autodiff(self, ops, dof, kind):
        rng = np.random.default_rng(3)
        F = 4
        T1 = ops.exp(jnp.asarray(rng.normal(size=(F, dof))))
        T2 = ops.exp(jnp.asarray(rng.normal(size=(F, dof))))
        s = jnp.asarray(rng.uniform(0.2, 1.1, size=(F, 1)))
        data = {
            "T_obs": ops.exp(jnp.asarray(rng.normal(size=(F, dof)) * 0.1)),
            "sqrt_info": jnp.asarray(
                np.stack([np.diag(rng.uniform(0.5, 2, dof)) for _ in range(F)])
            ),
            "xi": jnp.asarray(rng.uniform(0.5, 2, size=F)),
        }
        kern = FACTOR_KERNELS[kind]
        r, (J1, J2, Js) = kern(data, T1, T2, s, compute_jacobians=True)
        assert r.shape == (F, dof + 1)

        f1 = lambda e: kern(data, ops.exp(e[None]) @ T1, T2, s,
                            compute_jacobians=False)[0]
        f2 = lambda e: kern(data, T1, ops.exp(e[None]) @ T2, s,
                            compute_jacobians=False)[0]
        fs = lambda e: kern(data, T1, T2, s + e[None], compute_jacobians=False)[0]
        for J, f, d in [(J1, f1, dof), (J2, f2, dof), (Js, fs, 1)]:
            # shared-eps trick: every factor perturbed at once; row f of the
            # residual depends only on row f of each slot
            Jn = jax.jacfwd(f)(jnp.zeros(d, jnp.float64))
            np.testing.assert_allclose(np.asarray(J), np.asarray(Jn), atol=1e-9)

    def test_prior_row_zero_at_s_one(self):
        T = se2.exp(jnp.zeros((1, 3), jnp.float64))
        data = {
            "T_obs": se2.exp(jnp.zeros((1, 3), jnp.float64)),
            "sqrt_info": jnp.eye(3, dtype=jnp.float64)[None],
            "xi": jnp.ones(1, jnp.float64),
        }
        r, _ = FACTOR_KERNELS["between_se2_switch"](
            data, T, T, jnp.ones((1, 1), jnp.float64), compute_jacobians=False
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


def _outlier_graph(seed=0, n_bad=3):
    """se2 loop with n_bad WRONG loop-closure measurements appended (the
    production synth.with_outliers helper — same code users call)."""
    data = synth.se2_loop(n_poses=60, n_loops=8, seed=seed)
    data2, _mask = synth.with_outliers(data, n_bad, magnitude=2.0, seed=seed + 1)
    n_real_loops = int(
        (np.abs(np.asarray(data.edges_i) - np.asarray(data.edges_j)) != 1).sum()
    )
    return data, data2, n_real_loops, n_bad


class TestSwitchableOutlierRejection:
    def test_wrong_loops_switch_off(self):
        clean, poisoned, n_real, n_bad = _outlier_graph()
        g = build.switchable_pose_graph(poisoned, dtype=jnp.float64, xi=5.0)
        solved, info = solve(g, Options(method="lm", max_iters=60))
        s = np.asarray(solved.blocks["switches"].values)[:, 0]
        # switch variables are ordered: real loops first, injected last
        assert s[-n_bad:].max() < 0.25, f"outlier switches stayed on: {s[-n_bad:]}"
        assert s[:n_real].min() > 0.75, f"inlier switches turned off: {s[:n_real]}"
        # trajectory must match the clean-graph solution despite the poison
        g_clean = build.pose_graph(clean, dtype=jnp.float64)
        solved_c, _ = solve(g_clean, Options(method="lm", max_iters=60))
        T_sw = np.asarray(solved.blocks["poses"].values)
        T_cl = np.asarray(solved_c.blocks["poses"].values)
        err = np.abs(T_sw[:, :2, 2] - T_cl[:, :2, 2]).max()
        assert err < 0.05, f"poisoned-graph trajectory off by {err}"

    def test_clean_graph_keeps_switches_on(self):
        clean, _, n_real, _ = _outlier_graph()
        g = build.switchable_pose_graph(clean, dtype=jnp.float64, xi=5.0)
        solved, _ = solve(g, Options(method="lm", max_iters=60))
        s = np.asarray(solved.blocks["switches"].values)[:, 0]
        assert s.min() > 0.8


class TestSwitchableRouting:
    def test_single_chip_routes_dense_not_schur(self):
        clean, _, _, _ = _outlier_graph()
        g = build.switchable_pose_graph(clean, dtype=jnp.float64)
        # 2-block lie+euclidean graph with NO (pose, landmark) batch must
        # not be mistaken for BA
        assert route_auto(g) == "dense"

    def test_mesh_routes_factor_parallel(self):
        from pyslam_tpu.dist import make_mesh
        from pyslam_tpu.solver import solve_auto

        clean, _, _, _ = _outlier_graph()
        g = build.switchable_pose_graph(clean, dtype=jnp.float64, xi=5.0)
        mesh = make_mesh(8, axis_name="f")
        assert route_auto(g, mesh=mesh) == "factor_parallel"
        solved, hist = solve_auto(g, Options(method="lm", max_iters=40), mesh=mesh)
        _, info_ref = solve_auto(g, Options(method="lm", max_iters=40))
        np.testing.assert_allclose(
            float(hist[-1]), float(info_ref.chi2), rtol=1e-5
        )


class TestVertigoG2o:
    """Vertigo-format g2o round trip (VERTEX_SWITCH / EDGE_SWITCH_PRIOR /
    EDGE_SE2_SWITCHABLE) and file -> solve end-to-end."""

    def test_round_trip(self, tmp_path):
        from pyslam_tpu.io.g2o import read_g2o_switchable, write_g2o_switchable

        _, poisoned, n_real, n_bad = _outlier_graph()
        ei = np.asarray(poisoned.edges_i)
        ej = np.asarray(poisoned.edges_j)
        loop_mask = np.abs(ei - ej) != 1
        rng = np.random.default_rng(2)
        xi = rng.uniform(2.0, 8.0, int(loop_mask.sum()))
        s0 = rng.uniform(0.5, 1.0, int(loop_mask.sum()))
        path = str(tmp_path / "vertigo.g2o")
        write_g2o_switchable(path, poisoned, loop_mask, xi=xi, s_init=s0)
        data, sw = read_g2o_switchable(path)
        assert int(sw["loop_mask"].sum()) == int(loop_mask.sum())
        np.testing.assert_allclose(sw["xi"], xi, rtol=1e-6)
        np.testing.assert_allclose(sw["s_init"], s0, rtol=1e-6)
        # edge sets match (file reorders loops after odometry)
        np.testing.assert_allclose(
            np.sort(np.asarray(data.edges_i)), np.sort(ei)
        )
        # measurements of the switchable edges survive the text round trip
        lm_file = np.asarray(data.T_meas)[sw["loop_mask"]]
        lm_orig = np.asarray(poisoned.T_meas)[loop_mask]
        key = lambda A: A[np.lexsort(A.reshape(len(A), -1).T)]
        np.testing.assert_allclose(key(lm_file), key(lm_orig), atol=1e-6)

    def test_file_to_solve_end_to_end(self, tmp_path):
        from pyslam_tpu.io.g2o import read_g2o_switchable, write_g2o_switchable

        _, poisoned, n_real, n_bad = _outlier_graph()
        ei = np.asarray(poisoned.edges_i)
        ej = np.asarray(poisoned.edges_j)
        loop_mask = np.abs(ei - ej) != 1
        path = str(tmp_path / "vertigo.g2o")
        write_g2o_switchable(path, poisoned, loop_mask, xi=5.0)
        data, sw = read_g2o_switchable(path)
        g = build.switchable_pose_graph(data, dtype=jnp.float64, **sw)
        solved, _ = solve(g, Options(method="lm", max_iters=60))
        s = np.asarray(solved.blocks["switches"].values)[:, 0]
        # the 3 injected outliers are the LAST loop edges written
        assert s[-n_bad:].max() < 0.25
        assert np.sort(s)[n_bad:].min() > 0.75


class TestWithOutliersHelper:
    def test_se3_poisoning_shapes_and_mask(self):
        data = synth.se3_sphere(n_poses=50, n_loops=6, seed=2)
        poisoned, mask = synth.with_outliers(data, 4, seed=3)
        E0 = len(np.asarray(data.edges_i))
        assert len(np.asarray(poisoned.edges_i)) == E0 + 4
        assert mask.sum() == 4 and mask[E0:].all()
        assert poisoned.T_meas.shape == (E0 + 4, 4, 4)
        assert poisoned.sqrt_info.shape[0] == E0 + 4
        # outlier edges span distant pose pairs, never self-loops
        oi = np.asarray(poisoned.edges_i)[mask]
        oj = np.asarray(poisoned.edges_j)[mask]
        assert (oi != oj).all()

    def test_se2_poisoned_graph_recovers_with_switchables(self):
        clean = synth.se2_loop(n_poses=50, n_loops=6, seed=4)
        poisoned, mask = synth.with_outliers(clean, 3, seed=5)
        g = build.switchable_pose_graph(poisoned, dtype=jnp.float64, xi=5.0)
        solved, _ = solve(g, Options(method="lm", max_iters=60))
        s = np.asarray(solved.blocks["switches"].values)[:, 0]
        n_out = int(mask.sum())
        assert s[-n_out:].max() < 0.25


class TestSwitchableSE3:
    def test_se3_outliers_switch_off(self):
        """3D path end-to-end: poisoned sphere graph recovers with the
        se3 switch kernel (the 2D tests cover se2)."""
        clean = synth.se3_sphere(n_poses=40, n_loops=8, seed=6)
        poisoned, mask = synth.with_outliers(clean, 3, seed=7)
        g = build.switchable_pose_graph(poisoned, dtype=jnp.float64, xi=5.0)
        solved, _ = solve(g, Options(method="lm", max_iters=60))
        s = np.asarray(solved.blocks["switches"].values)[:, 0]
        n_out = int(mask.sum())
        assert s[-n_out:].max() < 0.25, f"se3 outlier switches on: {s[-n_out:]}"
        # trajectory close to the clean-graph solve
        g_clean, _ = solve(build.pose_graph(clean, dtype=jnp.float64),
                           Options(method="lm", max_iters=60))
        T_sw = np.asarray(solved.blocks["poses"].values)
        T_cl = np.asarray(g_clean.blocks["poses"].values)
        err = np.abs(T_sw[:, :3, 3] - T_cl[:, :3, 3]).max()
        assert err < 0.1, f"se3 poisoned trajectory off by {err}"


class TestSwitchableProblemApi:
    def test_problem_api_switch_rejects_outlier(self):
        """Ceres-style API: PoseToPoseSwitchableResidual with a (1,)
        switch parameter — the wrong loop's switch converges to ~0."""
        from pyslam_tpu import (
            Options as POptions,
            PoseToPoseResidual,
            PoseToPoseSwitchableResidual,
            Problem,
            SE2,
        )

        data = synth.se2_loop(n_poses=14, n_loops=4, seed=8)
        names = [f"T_{i}" for i in range(14)]
        prob = Problem(POptions(method="lm", max_iters=60))
        ei = np.asarray(data.edges_i)
        ej = np.asarray(data.edges_j)
        n_sw = 0
        for k in range(len(ei)):
            i, j = int(ei[k]), int(ej[k])
            if abs(i - j) == 1:
                prob.add_residual_block(
                    PoseToPoseResidual(data.T_meas[k], data.sqrt_info[k]),
                    [names[i], names[j]],
                )
            else:
                prob.add_residual_block(
                    PoseToPoseSwitchableResidual(
                        data.T_meas[k], data.sqrt_info[k], xi=5.0
                    ),
                    [names[i], names[j], f"s_{n_sw}"],
                )
                n_sw += 1
        # one WRONG loop closure with its own switch
        bad_T = np.asarray(se2.exp(jnp.asarray([[1.5, -2.0, 2.5]], jnp.float64)))[0]
        prob.add_residual_block(
            PoseToPoseSwitchableResidual(bad_T, data.sqrt_info[0], xi=5.0),
            [names[2], names[11], f"s_{n_sw}"],
        )
        params = {n: SE2(jnp.asarray(T, jnp.float64)) for n, T in zip(names, data.T_init)}
        for k in range(n_sw + 1):
            params[f"s_{k}"] = np.ones(1)
        prob.initialize_params(params)
        prob.set_parameters_constant(names[0])
        out = prob.solve()
        s_bad = float(np.asarray(out[f"s_{n_sw}"])[0])
        s_good = [float(np.asarray(out[f"s_{k}"])[0]) for k in range(n_sw)]
        assert s_bad < 0.25, f"outlier switch stayed on: {s_bad}"
        assert min(s_good) > 0.75, f"inlier switch off: {s_good}"
