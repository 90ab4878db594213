"""IncrementalSmoother (solver/incremental.py): growing-graph smoothing
with bucketed static shapes — per-step updates must match the batch solve
while compiling only O(log N) times."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se2
from pyslam_tpu.solver import Options, solve
from pyslam_tpu.solver.incremental import IncrementalSmoother


def _feed(sm, data, upto):
    """Feed poses/edges of a PoseGraphData into the smoother up to pose
    ``upto`` (odometry init for new poses; all edges within range)."""
    while sm.n < upto:
        i = sm.n
        if i == 0:
            sm.add_pose(data.T_init[0])
        else:
            sm.add_pose(data.T_meas[i - 1] @ sm.poses()[i - 1])
            sm.add_between(i - 1, i, data.T_meas[i - 1], data.sqrt_info[i - 1])
    n_odo = data.T_init.shape[0] - 1
    for e in range(n_odo, len(data.edges_i)):
        i, j = int(data.edges_i[e]), int(data.edges_j[e])
        if max(i, j) < upto and (i, j) not in sm._added_loops:
            sm.add_between(i, j, data.T_meas[e], data.sqrt_info[e])
            sm._added_loops.add((i, j))


class TestIncremental:
    def test_matches_batch_with_log_compiles(self):
        data = synth.se2_loop(n_poses=60, n_loops=8, seed=2)
        sm = IncrementalSmoother(kind="se2", options=Options(method="lm", max_iters=15))
        sm._added_loops = set()
        for k in range(2, 61):
            _feed(sm, data, k)
            est, info = sm.update()
        # final incremental estimate == batch solve over the same factors
        g = build.pose_graph(data, dtype=jnp.float64)
        batch, _ = solve(g, Options(method="lm", max_iters=40))
        err = jnp.abs(
            se2.log(
                jnp.asarray(est) @ se2.inv(batch.blocks["poses"].values)
            )
        )
        assert float(jnp.max(err)) < 1e-3
        # 59 updates, geometric buckets: far fewer fresh executables than steps
        assert sm.compiles <= 14, sm.compiles

    def test_warm_start_converges_in_few_iters(self):
        data = synth.se2_loop(n_poses=40, n_loops=5, seed=3)
        sm = IncrementalSmoother(kind="se2", options=Options(method="lm", max_iters=15))
        sm._added_loops = set()
        iters = []
        for k in range(2, 41):
            _feed(sm, data, k)
            _, info = sm.update()
            iters.append(int(info.iterations))
        # warm starts keep per-step work well under the 15-iteration cap
        assert np.median(iters[5:]) <= 8

    def test_marginalize_oldest_keeps_tracking(self):
        data = synth.se2_loop(n_poses=50, n_loops=0, seed=4)  # pure odometry
        sm = IncrementalSmoother(kind="se2", options=Options(method="lm", max_iters=10))
        sm._added_loops = set()
        for k in range(2, 31):
            _feed(sm, data, k)
        sm.update()
        before = sm.poses()[-5:]
        sm.marginalize_oldest(keep_last=10)
        assert sm.n == 11  # gauge anchor + newest 10
        # FEJ prior preserves the kept estimates through a re-solve
        est, _ = sm.update()
        np.testing.assert_allclose(est[-5:], before, atol=1e-8)
        # the smoother keeps working after retirement
        base = sm.n
        off = 30  # absolute id of the next data pose
        for k in range(off, 36):
            i = sm.add_pose(data.T_meas[k - 1] @ sm.poses()[sm.n - 1])
            sm.add_between(i - 1, i, data.T_meas[k - 1], data.sqrt_info[k - 1])
        est, info = sm.update()
        assert sm.n == base + 6
        assert np.isfinite(float(info.chi2))
