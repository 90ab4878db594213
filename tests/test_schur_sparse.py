"""SPARSE_SCHUR (solver/schur_sparse.py): exact sparse direct solves of
the Schur-reduced camera system.

The load-bearing claims: identical results to the dense-S path (same
elimination, different factorization) on every supported graph shape —
2D landmark SLAM with odometry (PP couplings), stereo BA, duplicate
observations (where SCHUR_JACOBI's diagonal is only approximate) — plus
the route_auto gate picking it for many-poses/few-landmarks graphs
beyond the dense ceiling.
"""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorBatch, FactorGraph
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, route_auto, solve_schur
from pyslam_tpu.solver.schur_sparse import (
    build_schur_sparse_plan,
    coobservation_stats,
    solve_schur_sparse,
)


def test_matches_dense_schur_landmark_slam():
    data = synth.landmark_slam_2d(n_poses=40, n_landmarks=25, max_range=8.0, seed=3)
    g = build.landmark_slam_2d(data, dtype=jnp.float64)  # has between factors
    plan = build_schur_sparse_plan(g)
    assert plan.n_pairs > 0 and plan.n_edges > 0
    s1, i1 = solve_schur_sparse(g, Options(method="lm", max_iters=20), plan=plan)
    s2, i2 = solve_schur(g, Options(method="lm", max_iters=20), mode="dense")
    np.testing.assert_allclose(float(i1.chi2), float(i2.chi2), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s1.blocks["poses"].values),
        np.asarray(s2.blocks["poses"].values),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(s1.blocks["landmarks"].values),
        np.asarray(s2.blocks["landmarks"].values),
        atol=1e-10,
    )


def test_matches_dense_schur_stereo_ba():
    data = synth.ba_synthetic(n_cams=12, n_pts=200, seed=0)
    g = build.ba_graph(data, dtype=jnp.float64)
    s1, i1 = solve_schur_sparse(g, Options(method="lm", max_iters=15))
    s2, i2 = solve_schur(g, Options(method="lm", max_iters=15), mode="dense")
    np.testing.assert_allclose(float(i1.chi2), float(i2.chi2), rtol=1e-10)


def test_exact_under_duplicate_observations():
    """A camera observing the same landmark twice: the pair enumeration
    includes the cross terms SCHUR_JACOBI's diagonal drops, so the sparse
    path stays EXACTLY equal to dense."""
    data = synth.ba_synthetic(n_cams=8, n_pts=60, seed=1)
    g = build.ba_graph(data, dtype=jnp.float64)
    fb = g.batches[0]
    dup = slice(0, 15)
    idx = (
        jnp.concatenate([fb.indices[0], fb.indices[0][dup]]),
        jnp.concatenate([fb.indices[1], fb.indices[1][dup]]),
    )
    data2 = {
        k: (jnp.concatenate([v, v[dup]]) if hasattr(v, "ndim") and getattr(v, "ndim", 0) and v.shape[0] == fb.n else v)
        for k, v in fb.data.items()
    }
    g2 = FactorGraph(
        dict(g.blocks),
        [FactorBatch(fb.kind, fb.slots, idx, data2, fb.loss,
                     jnp.concatenate([fb.weight, fb.weight[dup]]))],
    )
    s1, i1 = solve_schur_sparse(g2, Options(method="gn", max_iters=8))
    s2, i2 = solve_schur(g2, Options(method="gn", max_iters=8), mode="dense")
    np.testing.assert_allclose(float(i1.chi2), float(i2.chi2), rtol=1e-10)


def test_route_auto_picks_sparse_schur():
    # 2000 poses x 3 dof = 6000 > dense ceiling; few landmarks -> sparse S
    data = synth.landmark_slam_2d(
        n_poses=2000, n_landmarks=300, max_range=10.0, odo_rot_std=0.005, seed=0
    )
    g = build.landmark_slam_2d(data)
    assert route_auto(g) == "schur_sparse"
    pairs_sq, max_deg = coobservation_stats(g)
    assert pairs_sq <= 96 * 2000


def test_route_auto_keeps_pcg_for_dense_coobservation():
    """Many cameras all sharing landmarks: S is dense — stay on PCG."""
    rng = np.random.default_rng(0)
    C, L, M = 1500, 40, 9000  # 40 landmarks seen ~225x each: pairs_sq huge
    blocks = {
        "poses": __import__("pyslam_tpu").graph.core.VariableBlock.create(
            "se3", jnp.asarray(np.tile(np.eye(4), (C, 1, 1))), None
        ),
        "landmarks": __import__("pyslam_tpu").graph.core.VariableBlock.create(
            "euclidean", jnp.asarray(rng.normal(size=(L, 3)))
        ),
    }
    from pyslam_tpu.losses import L2Loss
    from pyslam_tpu.sensors import StereoCamera

    batch = FactorBatch.create(
        "reprojection", ("poses", "landmarks"),
        (rng.integers(0, C, M), rng.integers(0, L, M)),
        {
            "obs": jnp.asarray(rng.normal(size=(M, 3))),
            "sqrt_info": jnp.eye(3),
            "camera": StereoCamera(cu=0.0, cv=0.0, fu=1.0, fv=1.0, b=0.1),
        },
        L2Loss(),
    )
    g = FactorGraph(blocks, [batch])
    assert route_auto(g) == "schur_pcg"


def test_route_survives_zero_observation_batches():
    """BA-shaped graph (pose + landmark blocks) with only pose batches:
    the router must not crash on the empty observation list (regression:
    np.concatenate([]) in coobservation_stats).  Since round 5 a 2-block
    graph with NO pose-landmark batch is not considered BA at all
    (switchable graphs and this degenerate case both lack Schur
    structure) and routes through the generic dense path instead of the
    Schur gate."""
    from pyslam_tpu.graph.core import VariableBlock
    from pyslam_tpu.losses import L2Loss

    rng = np.random.default_rng(0)
    C = 1500  # > dense ceiling so the gate is actually reached
    blocks = {
        "poses": VariableBlock.create("se3", jnp.asarray(np.tile(np.eye(4), (C, 1, 1)))),
        "landmarks": VariableBlock.create("euclidean", jnp.asarray(rng.normal(size=(5, 3)))),
    }
    batch = FactorBatch.create(
        "between_se3", ("poses", "poses"),
        (np.arange(C - 1), np.arange(1, C)),
        {
            "T_obs": jnp.asarray(np.tile(np.eye(4), (C - 1, 1, 1))),
            "sqrt_info": jnp.asarray(np.tile(np.eye(6), (C - 1, 1, 1))),
        },
        L2Loss(),
    )
    g = FactorGraph(blocks, [batch])
    assert route_auto(g) == "dense"


def test_plan_survives_single_camera_graph():
    """All observations from ONE pose (no cross-pose co-observation, no
    between factors): S has no off-diagonal edges at all (regression:
    IndexError in build_ell_direct's lookup on an empty edge list)."""
    from pyslam_tpu.graph.core import VariableBlock
    from pyslam_tpu.losses import L2Loss

    rng = np.random.default_rng(1)
    L = 12
    lm_gt = rng.normal(size=(L, 2)) + np.array([4.0, 0.0])
    obs = lm_gt + rng.normal(0, 0.01, (L, 2))
    blocks = {
        "poses": VariableBlock.create(
            "se2", jnp.asarray(np.eye(3)[None], jnp.float64), np.array([True])
        ),
        "landmarks": VariableBlock.create(
            "euclidean", jnp.asarray(lm_gt + rng.normal(0, 0.3, (L, 2)), jnp.float64)
        ),
    }
    batch = FactorBatch.create(
        "landmark_xy_se2", ("poses", "landmarks"),
        (np.zeros(L, np.int32), np.arange(L)),
        {
            "obs": jnp.asarray(obs, jnp.float64),
            "sqrt_info": jnp.asarray(np.tile(np.eye(2) * 10, (L, 1, 1)), jnp.float64),
        },
        L2Loss(),
    )
    g = FactorGraph(blocks, [batch])
    plan = build_schur_sparse_plan(g)
    assert plan.n_edges == 0
    s1, i1 = solve_schur_sparse(g, Options(method="gn", max_iters=8), plan=plan)
    s2, i2 = solve_schur(g, Options(method="gn", max_iters=8), mode="dense")
    np.testing.assert_allclose(float(i1.chi2), float(i2.chi2), rtol=1e-10)


def test_sparse_S_covariances_match_dense_inverse():
    """method='sparse' S-solves: exact covariances through the factored
    sparse S (no PCG tolerance) — pose marginals, landmark marginals, and
    cross blocks all equal the dense inverse."""
    from pyslam_tpu.solver import full_covariance, solve_auto
    from pyslam_tpu.solver.covariance import (
        landmark_marginal_covariances,
        pose_covariance_block,
        pose_marginal_covariances,
    )

    data = synth.landmark_slam_2d(n_poses=15, n_landmarks=10, max_range=9.0, seed=2)
    g = build.landmark_slam_2d(data, dtype=jnp.float64)
    solved, _ = solve_auto(g, Options(method="gn", max_iters=20))
    Sig = np.asarray(full_covariance(solved))
    # canonical layout: landmarks (10*2) first, then poses
    P = np.asarray(pose_marginal_covariances(solved, method="sparse"))
    np.testing.assert_allclose(P[3], Sig[20 + 9 : 20 + 12, 20 + 9 : 20 + 12], rtol=1e-9)
    L = np.asarray(landmark_marginal_covariances(solved, np.arange(10), method="sparse"))
    np.testing.assert_allclose(L[4], Sig[8:10, 8:10], rtol=1e-9)
    B = np.asarray(pose_covariance_block(solved, 2, 5, method="sparse"))
    np.testing.assert_allclose(B, Sig[20 + 6 : 20 + 9, 20 + 15 : 20 + 18], rtol=1e-9)


def test_all_pose_marginals_via_selinv_on_S():
    """pose_marginal_covariances(method='sparse', indices=None) routes to
    the Takahashi sweep over the factored sparse S — every diagonal block
    of S^-1 equals the dense inverse."""
    from pyslam_tpu.solver import full_covariance, solve_auto
    from pyslam_tpu.solver.covariance import pose_marginal_covariances

    data = synth.landmark_slam_2d(n_poses=15, n_landmarks=10, max_range=9.0, seed=2)
    g = build.landmark_slam_2d(data, dtype=jnp.float64)
    solved, _ = solve_auto(g, Options(method="gn", max_iters=20))
    Sig = np.asarray(full_covariance(solved))
    P = np.asarray(pose_marginal_covariances(solved, method="sparse"))
    for i in range(15):
        np.testing.assert_allclose(
            P[i], Sig[20 + 3 * i : 20 + 3 * i + 3, 20 + 3 * i : 20 + 3 * i + 3],
            atol=1e-11,
        )


def test_gnc_composes_with_one_plan_build():
    """GNC outer iterations reweight but never move indices: the content-
    keyed plan cache must build the sparse-Schur plan exactly once, and
    the planted wrong associations must still be caught."""
    import dataclasses

    from pyslam_tpu.solver import solve_gnc
    from pyslam_tpu.solver.schur_sparse import _PLANS

    data = synth.landmark_slam_2d(n_poses=120, n_landmarks=50, max_range=9.0, seed=11)
    rng = np.random.default_rng(0)
    bad = rng.choice(len(data.obs_pose), size=5, replace=False)
    obs_lm = np.array(data.obs_lm)
    L = int(obs_lm.max()) + 1
    for m in bad:
        obs_lm[m] = (obs_lm[m] + 1 + rng.integers(L - 1)) % L
    g = build.landmark_slam_2d(
        dataclasses.replace(data, obs_lm=obs_lm), dtype=jnp.float64
    )
    n_before = len(_PLANS)
    _, info = solve_gnc(
        g, Options(method="lm", max_iters=8), robustify=[0],
        solve_fn=lambda gg, oo: solve_schur_sparse(gg, oo),
    )
    assert len(_PLANS) - n_before <= 1  # one sparsity -> one plan
    w = np.asarray(info.weights[0])
    assert set(bad.tolist()) <= set(np.flatnonzero(w < 0.5).tolist())
