"""Repo-policy lints (VERDICT r2 next #7): persistent caches must be
content-keyed, never id()-keyed — and plan caches must not grow without
bound when callers pass fresh plans of identical content."""

import pathlib
import re

import jax.numpy as jnp
import numpy as np

PKG = pathlib.Path(__file__).resolve().parents[1] / "pyslam_tpu"


class TestNoIdKeyedCaches:
    def test_no_id_calls_in_package(self):
        """``id(x)`` must not appear anywhere in the package source: every
        previous use was a cache key, and the policy (graph/core.py
        register_closed_kernel, solver/plan_cache.py) is content hashing.
        Docstring mentions of ``id()`` (empty parens) are allowed."""
        pat = re.compile(r"\bid\([^)]+\)")
        offenders = []
        for f in PKG.rglob("*.py"):
            if f.name == "plan_cache.py":
                # the one sanctioned use: its id->key memo is evicted by a
                # weakref finalizer, so a recycled id can never alias
                continue
            for ln, line in enumerate(f.read_text().splitlines(), 1):
                if pat.search(line):
                    offenders.append(f"{f.relative_to(PKG.parent)}:{ln}: {line.strip()}")
        assert not offenders, "id()-keyed code found:\n" + "\n".join(offenders)


class TestContentKey:
    def test_same_content_same_key(self):
        from pyslam_tpu.graph import build
        from pyslam_tpu.io import synth
        from pyslam_tpu.solver.bcsr import build_ell_direct
        from pyslam_tpu.solver.plan_cache import content_key

        data = synth.se2_loop(n_poses=12, n_loops=2, seed=3)
        g = build.pose_graph(data, dtype=jnp.float64)
        p1 = build_ell_direct(g)
        p2 = build_ell_direct(g)
        assert p1 is not p2
        assert content_key(p1) == content_key(p2)
        # memoized: second call on the same object is the cached digest
        assert content_key(p1) == content_key(p1)

    def test_different_content_different_key(self):
        from pyslam_tpu.graph import build
        from pyslam_tpu.io import synth
        from pyslam_tpu.solver.bcsr import build_ell_direct
        from pyslam_tpu.solver.plan_cache import content_key

        g1 = build.pose_graph(synth.se2_loop(n_poses=12, n_loops=2, seed=3), dtype=jnp.float64)
        g2 = build.pose_graph(synth.se2_loop(n_poses=13, n_loops=2, seed=3), dtype=jnp.float64)
        assert content_key(build_ell_direct(g1)) != content_key(build_ell_direct(g2))

    def test_memo_does_not_pin_and_never_staleness(self):
        """After an object dies, a recycled id must re-hash, not reuse."""
        import dataclasses

        from pyslam_tpu.solver.plan_cache import _MEMO, content_key

        @dataclasses.dataclass
        class P:
            a: np.ndarray

        p = P(np.arange(4.0))
        k = content_key(p)
        oid = id(p)
        assert _MEMO.get(oid) == k
        del p
        assert oid not in _MEMO  # finalizer evicted the memo entry

    def test_closure_cache_bounded(self):
        from pyslam_tpu.solver.plan_cache import ClosureCache

        c = ClosureCache(maxsize=4)
        for i in range(10):
            c[("k", i)] = i
        assert len(c) == 4
        assert ("k", 9) in c and ("k", 5) not in c


class TestPlanCacheReuse:
    def test_fresh_identical_plans_share_one_entry(self):
        """Repeated solve_schur_sqrt calls WITHOUT an explicit plan (each
        call builds a fresh plan) must not grow the closure cache — the
        ADVICE r2 leak."""
        from pyslam_tpu.graph import build
        from pyslam_tpu.io import synth
        from pyslam_tpu.solver import Options
        from pyslam_tpu.solver import schur_sqrt as ss

        data = synth.ba_synthetic(n_cams=4, n_pts=12, obs_per_pt=3, seed=5)
        g = build.ba_graph(data, dtype=jnp.float64)
        opts = Options(method="lm", max_iters=3)
        ss.solve_schur_sqrt(g, opts)
        n_after_first = len(ss._CLOSURES)
        for _ in range(3):
            ss.solve_schur_sqrt(g, opts)
        assert len(ss._CLOSURES) == n_after_first
