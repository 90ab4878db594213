"""Sensor-model tests (reference test_sensors.py category, SURVEY.md §4):
project/triangulate round trips, analytic Jacobians vs autodiff, validity
masks, batched == looped."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.sensors import RGBDCamera, StereoCamera

STEREO = StereoCamera(cu=320.0, cv=240.0, fu=500.0, fv=480.0, b=0.25, w=640, h=480)
RGBD = RGBDCamera(cu=320.0, cv=240.0, fu=500.0, fv=480.0, w=640, h=480)


def sample_points(rng, n=64):
    return jnp.asarray(
        np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(0.8, 10, n)],
            axis=-1,
        )
    )


@pytest.mark.parametrize("cam", [STEREO, RGBD], ids=["stereo", "rgbd"])
class TestCameras:
    def test_project_triangulate_roundtrip(self, cam, rng):
        pts = sample_points(rng)
        np.testing.assert_allclose(cam.triangulate(cam.project(pts)), pts, atol=1e-6)

    def test_triangulate_project_roundtrip(self, cam, rng):
        pts = sample_points(rng)
        obs = cam.project(pts)
        np.testing.assert_allclose(cam.project(cam.triangulate(obs)), obs, atol=1e-6)

    def test_project_jacobian_vs_autodiff(self, cam, rng):
        pts = sample_points(rng, 8)
        _, J = cam.project(pts, compute_jacobians=True)
        J_auto = jax.vmap(jax.jacfwd(lambda p: cam.project(p)))(pts)
        np.testing.assert_allclose(J, J_auto, atol=1e-6, rtol=1e-6)

    def test_triangulate_jacobian_vs_autodiff(self, cam, rng):
        obs = cam.project(sample_points(rng, 8))
        _, J = cam.triangulate(obs, compute_jacobians=True)
        J_auto = jax.vmap(jax.jacfwd(lambda o: cam.triangulate(o)))(obs)
        np.testing.assert_allclose(J, J_auto, atol=1e-6, rtol=1e-6)

    def test_batched_equals_looped(self, cam, rng):
        pts = sample_points(rng, 16)
        batched = cam.project(pts)
        looped = jnp.stack([cam.project(pts[i]) for i in range(16)])
        np.testing.assert_allclose(batched, looped, atol=1e-12)

    def test_validity(self, cam, rng):
        pts = sample_points(rng)
        obs = cam.project(pts)
        manual = (
            (obs[:, 0] >= 0)
            & (obs[:, 0] < cam.w)
            & (obs[:, 1] >= 0)
            & (obs[:, 1] < cam.h)
            & (obs[:, 2] > 0)
        )
        np.testing.assert_array_equal(cam.is_valid_measurement(obs), manual)
        assert bool(jnp.any(manual))  # sample isn't degenerate
        behind = cam.project(jnp.asarray([[0.0, 0.0, -1.0]]))
        assert not bool(cam.is_valid_measurement(behind)[0])

    def test_pytree_jit(self, cam, rng):
        pts = sample_points(rng, 4)
        out = jax.jit(lambda c, p: c.project(p))(cam, pts)
        np.testing.assert_allclose(out, cam.project(pts), atol=1e-12)


class TestStereoSpecifics:
    def test_disparity_positive_in_front(self, rng):
        pts = sample_points(rng)
        obs = STEREO.project(pts)
        assert bool(jnp.all(obs[:, 2] > 0))

    def test_known_projection(self):
        # point on the optical axis at z = fu*b  -> disparity exactly 1 px
        z = STEREO.fu * STEREO.b
        obs = STEREO.project(jnp.asarray([0.0, 0.0, z]))
        np.testing.assert_allclose(obs, [STEREO.cu, STEREO.cv, 1.0], atol=1e-6)
