"""Differentiable solving (solver/diff.py): implicit-function-theorem
gradients through the converged solution, checked against central finite
differences."""

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorBatch, FactorGraph
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options
from pyslam_tpu.solver.diff import solve_implicit

OPTS = Options(method="lm", max_iters=60, min_cost_decrease=1 - 1e-13, min_update_norm=1e-14)


def make_objective(g):
    def objective(T_obs):
        fb = g.batches[0]
        fb2 = FactorBatch(
            fb.kind, fb.slots, fb.indices, {**fb.data, "T_obs": T_obs}, fb.loss, fb.weight
        )
        values, chi2 = solve_implicit(FactorGraph(g.blocks, [fb2]), OPTS)
        return jnp.sum(values["poses"][-1, :2, 2]) + 0.1 * chi2

    return objective


class TestImplicitDiff:
    def test_grad_matches_finite_differences(self):
        data = synth.se2_loop(n_poses=10, n_loops=2, seed=0)
        g = build.pose_graph(data, dtype=jnp.float64)
        objective = make_objective(g)
        T0 = g.batches[0].data["T_obs"]
        grad = np.asarray(jax.grad(objective)(T0))
        rng = np.random.default_rng(1)
        eps = 1e-5
        for _ in range(5):
            e = int(rng.integers(0, T0.shape[0]))
            i = int(rng.integers(0, 2))
            j = int(rng.integers(0, 3))
            fp = float(objective(T0.at[e, i, j].add(eps)))
            fm = float(objective(T0.at[e, i, j].add(-eps)))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(grad[e, i, j], fd, atol=2e-3, rtol=1e-2)

    def test_chi2_envelope_gradient(self):
        # chi2-only objective: gradient is the direct partial (envelope thm)
        data = synth.se2_loop(n_poses=8, n_loops=1, seed=2)
        g = build.pose_graph(data, dtype=jnp.float64)

        def chi2_of(T_obs):
            fb = g.batches[0]
            fb2 = FactorBatch(
                fb.kind, fb.slots, fb.indices, {**fb.data, "T_obs": T_obs}, fb.loss, fb.weight
            )
            _, chi2 = solve_implicit(FactorGraph(g.blocks, [fb2]), OPTS)
            return chi2

        T0 = g.batches[0].data["T_obs"]
        grad = np.asarray(jax.grad(chi2_of)(T0))
        eps = 1e-5
        e, i, j = 2, 0, 2
        fd = (float(chi2_of(T0.at[e, i, j].add(eps))) - float(chi2_of(T0.at[e, i, j].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(grad[e, i, j], fd, atol=2e-3, rtol=1e-2)

    def test_constant_params_zero_grad_path(self):
        # gradients propagate even with the anchored first pose; output is finite
        data = synth.se2_loop(n_poses=8, n_loops=1, seed=3)
        g = build.pose_graph(data, dtype=jnp.float64)
        objective = make_objective(g)
        grad = np.asarray(jax.grad(objective)(g.batches[0].data["T_obs"]))
        assert np.isfinite(grad).all()
        assert np.linalg.norm(grad) > 0
