"""Shared host-side LM loop (solver/host_loop.py): its accept/reject and
stopping semantics must match solver/lm.solve's device-resident loop, and
every sharded path that uses it must produce a monotone accepted-cost
history."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.solver import Options, host_lm_loop
from pyslam_tpu.solver import lm as _lm


def scripted_step(costs, dx_norms=None):
    """A fake step following a scripted trial-cost sequence.  State is the
    current cost; chi2 returned is the current state's cost."""
    dx_norms = dx_norms or [1.0] * len(costs)
    calls = dict(k=0)

    def step(state, lam):
        k = calls["k"]
        calls["k"] += 1
        trial = costs[min(k, len(costs) - 1)]
        return trial, state, trial, dx_norms[min(k, len(dx_norms) - 1)]

    return step


class TestHostLoopSemantics:
    def test_lm_rejects_increases_and_tracks_best(self):
        # trial costs: down, UP (rejected), down — history only has accepts
        step = scripted_step([50.0, 80.0, 20.0])
        best, hist, info = host_lm_loop(
            step, 100.0, Options(method="lm", max_iters=3, min_cost_decrease=1.0)
        )
        assert hist == [100.0, 50.0, 20.0]
        assert best == 20.0 and info["chi2"] == 20.0
        assert info["status"] == _lm.MAX_ITERS

    def test_lambda_raises_on_reject(self):
        lams = []

        def step(state, lam):
            lams.append(lam)
            return state, state, float("nan"), 1.0  # NaN: always rejected

        opts = Options(method="lm", max_iters=4, lambda_init=1e-4, lambda_up=10.0)
        _, hist, info = host_lm_loop(step, 10.0, opts)
        np.testing.assert_allclose(lams, [1e-4, 1e-3, 1e-2, 1e-1])
        assert hist == [10.0]  # nothing accepted
        assert info["status"] == _lm.MAX_ITERS

    def test_converged_cost_decrease(self):
        # accepted step with insufficient relative decrease stops with the
        # reference's min_cost_decrease status
        step = scripted_step([99.9])
        _, _, info = host_lm_loop(
            step, 100.0, Options(method="lm", max_iters=10, min_cost_decrease=0.99)
        )
        assert info["status"] == _lm.CONVERGED_COST_DECREASE
        assert info["iterations"] == 1

    def test_converged_update_norm(self):
        step = scripted_step([50.0, 40.0], dx_norms=[1.0, 1e-12])
        _, _, info = host_lm_loop(
            step, 100.0,
            Options(method="lm", max_iters=10, min_update_norm=1e-10,
                    min_cost_decrease=1.0),
        )
        assert info["status"] == _lm.CONVERGED_UPDATE_NORM
        assert info["iterations"] == 2

    def test_converged_min_cost(self):
        step = scripted_step([1e-40])
        _, _, info = host_lm_loop(
            step, 100.0, Options(method="lm", max_iters=10, min_cost=1e-30)
        )
        assert info["status"] == _lm.CONVERGED_MIN_COST

    def test_gn_nondecreasing_budget(self):
        # GN accepts unconditionally; with allow_nondecreasing_steps the
        # loop tolerates max_nondecreasing_steps before stopping
        step = scripted_step([50.0, 60.0, 70.0, 80.0, 90.0])
        _, hist, info = host_lm_loop(
            step, 100.0,
            Options(method="gn", max_iters=10, allow_nondecreasing_steps=True,
                    max_nondecreasing_steps=3, min_cost_decrease=1.0),
        )
        assert info["status"] == _lm.STOPPED_NONDECREASING
        # best state is the cost-50 one despite later accepted increases
        assert info["chi2"] == 50.0

    def test_checkpoint_hook_called_on_accepts_only(self):
        step = scripted_step([50.0, 80.0, 20.0, 10.0])
        calls = []
        host_lm_loop(
            step, 100.0, Options(method="lm", max_iters=4, min_cost_decrease=1.0),
            on_accept=lambda s, lam, n: calls.append((s, n)),
        )
        assert calls == [(50.0, 1), (20.0, 2), (10.0, 3)]


class TestShardedPathsMonotone:
    """Every host-loop consumer yields a strictly decreasing accepted-cost
    history on a well-posed problem (LM-monotonicity)."""

    def _ba(self, seed=3):
        from pyslam_tpu.graph import build
        from pyslam_tpu.io import synth

        data = synth.ba_synthetic(n_cams=8, n_pts=64, seed=seed)
        return build.ba_graph(data, dtype=jnp.float64)

    def test_factor_parallel(self):
        from pyslam_tpu.dist import make_mesh, solve_factor_parallel
        from pyslam_tpu.graph import build
        from pyslam_tpu.io import synth

        data = synth.se2_loop(n_poses=40, seed=0)
        g = build.pose_graph(data, dtype=jnp.float64)
        _, chi2, hist = solve_factor_parallel(
            g, make_mesh(8, axis_name="f"), Options(method="lm", max_iters=15)
        )
        assert all(b < a for a, b in zip(hist, hist[1:]))
        assert chi2 <= hist[0]

    def test_schur_sharded(self):
        from pyslam_tpu.dist import make_mesh, solve_schur_sharded

        _, chi2, hist = solve_schur_sharded(
            self._ba(), make_mesh(8, axis_name="l"),
            Options(method="lm", max_iters=12),
        )
        assert all(b < a for a, b in zip(hist, hist[1:]))

    def test_schur_cm(self):
        from pyslam_tpu.dist import make_mesh
        from pyslam_tpu.dist.schur_cm import solve_schur_cm

        _, chi2, hist = solve_schur_cm(
            self._ba(), make_mesh(8, axis_name="l"),
            Options(method="lm", max_iters=12),
        )
        assert all(b < a for a, b in zip(hist, hist[1:]))

    def test_schur_large(self):
        from pyslam_tpu.solver.schur_large import solve_schur_large

        _, chi2, hist = solve_schur_large(
            self._ba(), Options(method="lm", max_iters=12)
        )
        assert all(b < a for a, b in zip(hist, hist[1:]))
