"""Numeric utilities (reference pyslam/utils.py parity, SURVEY.md §1 L1)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.utils import bilinear_interpolate, invsqrt, stackmul


class TestInvsqrt:
    def test_scalar(self):
        np.testing.assert_allclose(float(invsqrt(jnp.asarray(4.0))), 0.5)

    def test_spd_matrix(self, rng):
        A = rng.normal(size=(5, 5))
        S = A @ A.T + 5 * np.eye(5)
        W = np.asarray(invsqrt(jnp.asarray(S)))
        # W S W^T == I  (stiffness whitens the covariance)
        np.testing.assert_allclose(W @ S @ W.T, np.eye(5), atol=1e-9)
        # symmetric
        np.testing.assert_allclose(W, W.T, atol=1e-10)

    def test_batched(self, rng):
        A = rng.normal(size=(7, 3, 3))
        S = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3)
        W = np.asarray(invsqrt(jnp.asarray(S)))
        np.testing.assert_allclose(
            np.einsum("bij,bjk,blk->bil", W, S, W),
            np.broadcast_to(np.eye(3), S.shape),
            atol=1e-9,
        )


class TestStackmul:
    def test_matches_numpy(self, rng):
        A = rng.normal(size=(6, 3, 4))
        B = rng.normal(size=(6, 4, 2))
        np.testing.assert_allclose(
            np.asarray(stackmul(jnp.asarray(A), jnp.asarray(B))), A @ B, atol=1e-12
        )


class TestBilinearInterpolate:
    def test_exact_at_integer_coords(self, rng):
        im = jnp.asarray(rng.normal(size=(8, 10)))
        u = jnp.asarray([0.0, 3.0, 8.0])
        v = jnp.asarray([0.0, 2.0, 6.0])
        vals = bilinear_interpolate(im, u, v)
        expect = np.asarray(im)[np.asarray(v, int), np.asarray(u, int)]
        np.testing.assert_allclose(np.asarray(vals), expect, atol=1e-12)

    def test_linear_surface_is_exact(self):
        # on a linear ramp interpolation is exact everywhere, and the
        # analytic gradients equal the ramp slopes
        H, W = 12, 16
        vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        im = jnp.asarray(2.0 * uu + 3.0 * vv + 1.0)
        u = jnp.asarray([1.25, 7.5, 14.9])
        v = jnp.asarray([0.5, 3.75, 10.2])
        vals, gu, gv = bilinear_interpolate(im, u, v, compute_gradients=True)
        np.testing.assert_allclose(
            np.asarray(vals), 2.0 * np.asarray(u) + 3.0 * np.asarray(v) + 1.0, atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(gu), 2.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(gv), 3.0, atol=1e-9)

    def test_gradients_match_autodiff(self, rng):
        im = jnp.asarray(rng.normal(size=(9, 9)))

        def val(uv):
            return bilinear_interpolate(im, uv[0], uv[1])

        uv0 = jnp.asarray([3.3, 4.7])
        _, gu, gv = bilinear_interpolate(im, uv0[0], uv0[1], compute_gradients=True)
        g = jax.grad(val)(uv0)
        np.testing.assert_allclose(float(gu), float(g[0]), atol=1e-9)
        np.testing.assert_allclose(float(gv), float(g[1]), atol=1e-9)

    def test_multichannel(self, rng):
        im = jnp.asarray(rng.normal(size=(6, 7, 3)))
        vals = bilinear_interpolate(im, jnp.asarray([2.5]), jnp.asarray([3.5]))
        assert vals.shape == (1, 3)
        manual = 0.25 * (
            np.asarray(im)[3, 2] + np.asarray(im)[3, 3]
            + np.asarray(im)[4, 2] + np.asarray(im)[4, 3]
        )
        np.testing.assert_allclose(np.asarray(vals[0]), manual, atol=1e-12)


class TestKahanSum:
    def test_matches_f64_on_adversarial_f32(self):
        import jax.numpy as jnp
        from pyslam_tpu.utils import kahan_sum

        rng = np.random.default_rng(0)
        # large similarly-signed values: plain f32 sequential sum drifts
        x64 = rng.uniform(0.1, 1.0, 200_000)
        x32 = jnp.asarray(x64, jnp.float32)
        exact = float(np.sum(x64))
        ks = float(kahan_sum(x32))
        assert abs(ks - exact) / exact < 1e-6

    def test_empty_and_small(self):
        import jax.numpy as jnp
        from pyslam_tpu.utils import kahan_sum

        assert float(kahan_sum(jnp.zeros(0, jnp.float32))) == 0.0
        np.testing.assert_allclose(float(kahan_sum(jnp.asarray([1.5, 2.5]))), 4.0)
