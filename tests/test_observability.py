"""Observability & checkpoint/resume (SURVEY.md §5)."""

import json

import jax.numpy as jnp
import numpy as np

from pyslam_tpu import observability as obs
from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve


def small_solve():
    data = synth.se2_loop(n_poses=30, seed=0)
    g = build.pose_graph(data, dtype=jnp.float64)
    solved, info = solve(g, Options(method="lm", max_iters=15))
    return g, solved, info


class TestIterationLog:
    def test_records_and_jsonl(self, tmp_path):
        _, _, info = small_solve()
        recs = obs.iteration_records(info)
        assert len(recs) == int(info.iterations) >= 1
        assert recs[0]["cost_before"] > recs[-1]["cost_after"]
        assert all(r["lambda"] > 0 for r in recs)
        path = str(tmp_path / "solve.jsonl")
        obs.write_iteration_log(info, path, extra={"config": "se2_loop"})
        lines = [json.loads(l) for l in open(path)]
        assert lines[-1]["summary"] is True
        assert lines[0]["config"] == "se2_loop"
        assert len(lines) == len(recs) + 1


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        state = {"a": jnp.arange(5.0), "b": (jnp.eye(3), jnp.zeros(2))}
        p = str(tmp_path / "state.npz")
        obs.save_state(p, state)
        back = obs.load_state(p, state)
        np.testing.assert_allclose(np.asarray(back["a"]), np.arange(5.0))
        np.testing.assert_allclose(np.asarray(back["b"][0]), np.eye(3))

    def test_graph_checkpoint_resume_exact(self, tmp_path):
        g, solved, info = small_solve()
        # checkpoint mid-state (use the solved graph as the "snapshot")
        ckpt = obs.graph_checkpoint(solved)
        p = str(tmp_path / "g.npz")
        obs.save_state(p, ckpt)
        restored = obs.graph_restore(g, obs.load_state(p, ckpt))
        # deterministic resume: chi2 identical, further solving is a no-op step
        np.testing.assert_allclose(
            float(restored.chi2()), float(solved.chi2()), rtol=1e-12
        )
        resumed, info2 = solve(restored, Options(method="lm", max_iters=5))
        assert float(info2.chi2) <= float(info.chi2) * (1 + 1e-9)

    def test_profile_trace_smoke(self, tmp_path):
        with obs.profile_trace(str(tmp_path / "trace")):
            jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
        assert any((tmp_path / "trace").rglob("*"))
