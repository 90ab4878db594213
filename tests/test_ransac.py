"""Frame-to-frame stereo RANSAC (reference ransac-pipeline coverage,
SURVEY.md §2.1): batched Kabsch correctness, outlier rejection, pose
recovery."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.lie import se3
from pyslam_tpu.pipelines.ransac import FrameToFrameRANSAC, kabsch
from pyslam_tpu.sensors import StereoCamera

CAM = StereoCamera(cu=320.0, cv=240.0, fu=500.0, fv=500.0, b=0.3, w=640, h=480)


def make_scene(n=120, seed=0, outlier_frac=0.0, pix_noise=0.0):
    rng = np.random.default_rng(seed)
    # points 2-8 m in front of both cameras
    P1 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 8, n)],
        axis=-1,
    )
    xi = np.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.05])
    T_21 = np.asarray(se3.exp(jnp.asarray(xi)))
    P2 = P1 @ T_21[:3, :3].T + T_21[:3, 3]
    obs_1 = np.asarray(CAM.project(jnp.asarray(P1)))
    obs_2 = np.asarray(CAM.project(jnp.asarray(P2)))
    vis = np.asarray(CAM.is_valid_measurement(jnp.asarray(obs_1))) & np.asarray(
        CAM.is_valid_measurement(jnp.asarray(obs_2))
    )
    obs_1, obs_2 = obs_1[vis], obs_2[vis]
    n = len(obs_1)
    if pix_noise > 0:
        obs_1 += rng.normal(0, pix_noise, obs_1.shape)
        obs_2 += rng.normal(0, pix_noise, obs_2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs_2[idx, :2] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return obs_1, obs_2, T_21, n_out


class TestKabsch:
    def test_exact_recovery(self, rng):
        P = rng.normal(0, 2, (40, 3))
        xi = rng.normal(0, 0.5, 6)
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        Q = P @ T[:3, :3].T + T[:3, 3]
        T_est = np.asarray(kabsch(jnp.asarray(P), jnp.asarray(Q)))
        np.testing.assert_allclose(T_est, T, atol=1e-9)

    def test_batched(self, rng):
        P = rng.normal(0, 2, (7, 5, 3))
        xi = rng.normal(0, 0.3, (7, 6))
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        Q = np.einsum("bij,bnj->bni", T[:, :3, :3], P) + T[:, None, :3, 3]
        T_est = np.asarray(kabsch(jnp.asarray(P), jnp.asarray(Q)))
        np.testing.assert_allclose(T_est, T, atol=1e-8)

    def test_reflection_guard(self, rng):
        # coplanar points can tempt a reflection; det(R) must stay +1
        P = rng.normal(0, 2, (30, 3))
        P[:, 2] = 0.0
        xi = rng.normal(0, 0.4, 6)
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        Q = P @ T[:3, :3].T + T[:3, 3]
        T_est = np.asarray(kabsch(jnp.asarray(P), jnp.asarray(Q)))
        assert np.linalg.det(T_est[:3, :3]) > 0.99


class TestFrameToFrameRANSAC:
    def test_clean_recovery(self):
        obs_1, obs_2, T_true, _ = make_scene()
        T, mask = FrameToFrameRANSAC(CAM).compute_transform(obs_1, obs_2)
        np.testing.assert_allclose(np.asarray(T.mat), T_true, atol=1e-6)
        assert mask.sum() == len(obs_1)

    def test_rejects_outliers(self):
        obs_1, obs_2, T_true, n_out = make_scene(outlier_frac=0.35, pix_noise=0.3, seed=4)
        T, mask = FrameToFrameRANSAC(CAM, num_iters=512).compute_transform(obs_1, obs_2)
        xi_err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true)) @ T.mat))
        assert np.linalg.norm(xi_err[:3]) < 0.02
        assert np.linalg.norm(xi_err[3:]) < 0.01
        # inlier mask excludes (nearly) all corrupted matches
        assert mask.sum() >= len(obs_1) - n_out - 3
        assert mask.sum() <= len(obs_1) - n_out + 3
