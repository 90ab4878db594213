"""Robust-loss algebra (reference test_losses.py category, SURVEY.md §4):
rho/psi/weight consistency, autodiff cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.losses import (
    CauchyLoss,
    HuberLoss,
    L1Loss,
    L2Loss,
    TDistributionLoss,
    TukeyLoss,
)

ALL_LOSSES = [
    L2Loss(),
    L1Loss(),
    CauchyLoss(1.3),
    HuberLoss(0.8),
    TukeyLoss(2.5),
    TDistributionLoss(nu=5.0, scale=1.0),
]


@pytest.mark.parametrize("loss", ALL_LOSSES, ids=lambda l: type(l).__name__)
class TestLossConsistency:
    def test_weight_times_e_is_influence(self, loss, rng):
        e = jnp.asarray(rng.normal(0, 2.0, 200))
        np.testing.assert_allclose(
            loss.weight(e) * e, loss.influence(e), atol=1e-9, rtol=1e-6
        )

    def test_influence_is_dloss(self, loss, rng):
        if isinstance(loss, L1Loss):
            pytest.skip("L1 not differentiable at 0; checked pointwise below")
        e = jnp.asarray(rng.normal(0, 2.0, 50))
        dloss = jax.vmap(jax.grad(lambda x: loss.loss(x)))(e)
        np.testing.assert_allclose(dloss, loss.influence(e), atol=1e-6, rtol=1e-5)

    def test_loss_nonnegative_and_zero_at_zero(self, loss):
        assert float(loss.loss(jnp.asarray(0.0))) == pytest.approx(0.0, abs=1e-12)
        e = jnp.linspace(-5, 5, 101)
        assert bool(jnp.all(loss.loss(e) >= -1e-12))

    def test_weights_in_unit_interval(self, loss, rng):
        if isinstance(loss, (L1Loss, TDistributionLoss)):
            pytest.skip("weights can exceed 1 near zero by construction")
        e = jnp.asarray(rng.normal(0, 3.0, 200))
        w = loss.weight(e)
        assert bool(jnp.all((w >= 0) & (w <= 1.0 + 1e-9)))


class TestSpecific:
    def test_l2_weights_identity(self, rng):
        e = jnp.asarray(rng.normal(size=32))
        np.testing.assert_array_equal(L2Loss().weight(e), jnp.ones_like(e))

    def test_huber_quadratic_inside(self):
        loss = HuberLoss(1.0)
        np.testing.assert_allclose(loss.loss(jnp.asarray(0.5)), 0.125)
        np.testing.assert_allclose(loss.loss(jnp.asarray(2.0)), 1.0 * (2.0 - 0.5))

    def test_tukey_zero_influence_outside(self):
        loss = TukeyLoss(1.0)
        assert float(loss.weight(jnp.asarray(1.5))) == 0.0
        assert float(loss.influence(jnp.asarray(1.5))) == 0.0

    def test_cauchy_downweights_outliers(self):
        loss = CauchyLoss(1.0)
        assert float(loss.weight(jnp.asarray(10.0))) < 0.02

    def test_tdistribution_scale_estimation(self, rng):
        # with online scale estimation, weights adapt to residual spread
        loss = TDistributionLoss(nu=5.0)
        e_small = jnp.asarray(rng.normal(0, 0.1, 500))
        e_with_outliers = jnp.concatenate([e_small, jnp.asarray([3.0, -4.0, 5.0])])
        w = loss.weight(e_with_outliers)
        assert float(jnp.mean(w[:500])) > 5 * float(jnp.mean(w[500:]))

    def test_jit_compatible(self, rng):
        e = jnp.asarray(rng.normal(size=64))
        for loss in ALL_LOSSES:
            w = jax.jit(lambda x, l=loss: l.weight(x))(e)
            assert w.shape == e.shape
