"""Graph validation lint + NaN-debug toggles (SURVEY.md §5 sanitizer row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu import debug
from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorBatch, FactorGraph
from pyslam_tpu.io import synth


def clean_graph():
    data = synth.se2_loop(n_poses=10, n_loops=2, seed=0)
    return build.pose_graph(data, dtype=jnp.float64)


class TestValidateGraph:
    def test_clean(self):
        assert debug.validate_graph(clean_graph()) == []
        debug.assert_graph_valid(clean_graph())

    def test_out_of_range_index(self):
        g = clean_graph()
        fb = g.batches[0]
        bad_idx = (fb.indices[0].at[0].set(999), fb.indices[1])
        bad = FactorBatch(fb.kind, fb.slots, bad_idx, fb.data, fb.loss, fb.weight)
        problems = debug.validate_graph(FactorGraph(g.blocks, [bad]))
        assert any("out of range" in p for p in problems)

    def test_nonfinite_measurement(self):
        g = clean_graph()
        fb = g.batches[0]
        data = dict(fb.data)
        data["T_obs"] = data["T_obs"].at[0, 0, 0].set(jnp.nan)
        bad = FactorBatch(fb.kind, fb.slots, fb.indices, data, fb.loss, fb.weight)
        problems = debug.validate_graph(FactorGraph(g.blocks, [bad]))
        assert any("non-finite" in p for p in problems)
        with pytest.raises(ValueError):
            debug.assert_graph_valid(FactorGraph(g.blocks, [bad]))

    def test_negative_weight(self):
        g = clean_graph()
        fb = g.batches[0]
        bad = FactorBatch(
            fb.kind, fb.slots, fb.indices, fb.data, fb.loss, fb.weight.at[0].set(-1.0)
        )
        problems = debug.validate_graph(FactorGraph(g.blocks, [bad]))
        assert any("weights" in p for p in problems)


class TestNanDebug:
    def test_toggle_restores(self):
        before = jax.config.jax_debug_nans
        with debug.nan_debug(True):
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == before
