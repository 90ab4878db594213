"""Incremental smoothing with bucketed static shapes — the TPU iSAM answer.

iSAM2 exists because CPU solvers must avoid refactoring the whole system
per update, so they maintain a Bayes tree incrementally.  On this hardware
the economics are different: a full batch solve of a 2k-pose graph is
milliseconds once compiled (bench.py measurements), and the expensive
resource is COMPILATION, which XLA charges per shape.  So the TPU-native
incremental design is not incremental factorization but SHAPE REUSE:

  * variables and factors live in padded arrays whose capacity grows
    geometrically (x1.5 buckets); padding variables are const-masked and
    padding factors carry weight 0 (both proven inert — the padding
    metamorphic tests in tests/test_solver.py);
  * every update between capacity changes re-enters the SAME jitted solve
    executable (same shapes, same factor-batch structure) warm-started
    from the previous estimate, so per-step cost is one cached dispatch;
  * compilation happens O(log N) times over a whole trajectory instead of
    once per step.

Old state can be retired with ``marginalize_oldest`` (graph/marginalize.py
dense FEJ priors), which keeps the active dof bounded like a fixed-lag
window but under the caller's control.  The reference has no incremental
story at all (batch Problem only, SURVEY.md §2.1); fixed_lag.py covers the
constant-window case — this class covers the growing-graph case.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph.core import FactorBatch, FactorGraph, VariableBlock
from ..losses import L2Loss
from . import lm as _lm


def _bucket(n: int, cap: int, grow: float = 1.5) -> int:
    while cap < n:
        cap = int(np.ceil(cap * grow))
    return cap


class IncrementalSmoother:
    """Growing pose-graph smoother with geometric capacity buckets.

    kind: 'se3' | 'se2' | 'sim3'.  Factors are between-factors of that
    kind plus optional unary priors; the first pose is the gauge anchor.
    ``update()`` solves the current graph warm-started from the previous
    estimate and returns (values, SolveInfo).
    """

    def __init__(self, kind: str = "se3", options: _lm.Options | None = None,
                 init_capacity: int = 16, dtype=jnp.float64):
        from ..graph.core import MANIFOLDS

        if kind not in ("se3", "se2", "sim3"):
            raise ValueError(f"unsupported kind {kind!r}")
        self.kind = kind
        self.dtype = dtype
        self.opts = options or _lm.Options(method="lm", max_iters=15)
        m = MANIFOLDS[kind]
        self._mat = m["shape"][0]
        self._dof = m["dof"]
        self.n = 0  # live poses
        self.cap = init_capacity
        eye = np.eye(self._mat)
        self._T = np.tile(eye, (self.cap, 1, 1))
        self._const = np.ones(self.cap, bool)  # padding slots frozen
        # factor storage (between factors)
        self.m = 0
        self.fcap = init_capacity
        self._fi = np.zeros(self.fcap, np.int32)
        self._fj = np.zeros(self.fcap, np.int32)
        self._T_obs = np.tile(eye, (self.fcap, 1, 1))
        self._S = np.tile(np.eye(self._dof), (self.fcap, 1, 1))
        self._w = np.zeros(self.fcap)
        self.compiles = 0  # fresh-executable count (structure-key changes)
        self._prior_batches: list = []  # carried marginalization priors
        self._handed_off = False  # host arrays aliased by device since last copy

    # ------------------------------------------------------------ building
    def add_pose(self, T_init) -> int:
        if self.n == self.cap:
            new = _bucket(self.n + 1, self.cap)
            padT = np.tile(np.eye(self._mat), (new - self.cap, 1, 1))
            self._T = np.concatenate([self._T, padT])
            self._const = np.concatenate([self._const, np.ones(new - self.cap, bool)])
            self.cap = new
        i = self.n
        if self._handed_off:
            # copy-on-write ONCE per device handoff (CLAUDE.md zero-copy
            # aliasing rule) — copying on every add would be O(N^2)
            self._T = self._T.copy()
            self._const = self._const.copy()
            for name in ("_fi", "_fj", "_T_obs", "_S", "_w"):
                setattr(self, name, getattr(self, name).copy())
            self._handed_off = False
        self._T[i] = np.asarray(T_init)
        self._const[i] = i == 0  # anchor stays const
        self.n += 1
        return i

    def add_between(self, i: int, j: int, T_obs, sqrt_info):
        if self.m == self.fcap:
            new = _bucket(self.m + 1, self.fcap)
            g = new - self.fcap
            self._fi = np.concatenate([self._fi, np.zeros(g, np.int32)])
            self._fj = np.concatenate([self._fj, np.zeros(g, np.int32)])
            self._T_obs = np.concatenate(
                [self._T_obs, np.tile(np.eye(self._mat), (g, 1, 1))]
            )
            self._S = np.concatenate([self._S, np.tile(np.eye(self._dof), (g, 1, 1))])
            self._w = np.concatenate([self._w, np.zeros(g)])
            self.fcap = new
        k = self.m
        if self._handed_off:
            self._T = self._T.copy()
            self._const = self._const.copy()
            for name in ("_fi", "_fj", "_T_obs", "_S", "_w"):
                setattr(self, name, getattr(self, name).copy())
            self._handed_off = False
        self._fi[k], self._fj[k] = i, j
        self._T_obs[k] = np.asarray(T_obs)
        self._S[k] = np.asarray(sqrt_info)
        self._w[k] = 1.0
        self.m += 1

    def _graph(self) -> FactorGraph:
        blocks = {
            "poses": VariableBlock(
                self.kind,
                jnp.asarray(self._T, self.dtype),
                jnp.asarray(self._const),
            )
        }
        batches = [
            FactorBatch(
                f"between_{self.kind}",
                ("poses", "poses"),
                (jnp.asarray(self._fi), jnp.asarray(self._fj)),
                {
                    "T_obs": jnp.asarray(self._T_obs, self.dtype),
                    "sqrt_info": jnp.asarray(self._S, self.dtype),
                },
                L2Loss(),
                jnp.asarray(self._w, self.dtype),
            )
        ] + self._prior_batches
        return FactorGraph(blocks, batches)

    # ------------------------------------------------------------- solving
    def update(self):
        """Solve the current graph warm-started from the last estimate.
        Same-capacity updates hit the jit cache (one dispatch); capacity
        growth triggers one fresh compile and is counted in .compiles."""
        g = self._graph()
        self._handed_off = True
        # the jit cache keys on shapes + pytree structure: capacities AND
        # every carried prior batch's data shapes
        key = (
            self.cap,
            self.fcap,
            tuple(
                (fb.kind, tuple(sorted((k, np.shape(v)) for k, v in fb.data.items())))
                for fb in self._prior_batches
            ),
        )
        if key != getattr(self, "_last_key", None):
            self.compiles += 1
            self._last_key = key
        solved, info = _lm.solve(g, self.opts)
        self._T = np.array(solved.blocks["poses"].values)  # host mirror copy
        self._handed_off = False  # _T is a fresh copy; factor arrays unchanged
        return self._T[: self.n], info

    def poses(self):
        return self._T[: self.n].copy()

    # -------------------------------------------------------- marginalizing
    def marginalize_oldest(self, keep_last: int):
        """Retire old poses into a dense FEJ prior (graph/marginalize.py),
        keeping the gauge anchor (pose 0) plus the newest ``keep_last``
        poses.  Note: this REINDEXES poses (1 becomes the oldest kept
        non-anchor pose) and changes the graph structure, so the next
        update compiles fresh."""
        from ..graph.marginalize import marginalize

        if self.n <= keep_last:
            return
        # compact to live sizes first (marginalize works on exact arrays)
        live = FactorGraph(
            {
                "poses": VariableBlock(
                    self.kind,
                    jnp.asarray(self._T[: self.n], self.dtype),
                    jnp.asarray(self._const[: self.n]),
                )
            },
            [
                FactorBatch(
                    f"between_{self.kind}",
                    ("poses", "poses"),
                    (jnp.asarray(self._fi[: self.m]), jnp.asarray(self._fj[: self.m])),
                    {
                        "T_obs": jnp.asarray(self._T_obs[: self.m], self.dtype),
                        "sqrt_info": jnp.asarray(self._S[: self.m], self.dtype),
                    },
                    L2Loss(),
                    jnp.asarray(self._w[: self.m], self.dtype),
                )
            ]
            + self._prior_batches,
        )
        # the anchor must survive (marginalize refuses const targets): retire
        # poses 1 .. n-keep_last-1, keeping 0 plus the newest keep_last
        targets = list(range(1, self.n - keep_last))
        g2 = marginalize(live, {"poses": targets})
        blk = g2.blocks["poses"]
        n_new = blk.n
        self.n = n_new
        self.cap = _bucket(n_new, 16)
        eye = np.eye(self._mat)
        self._T = np.tile(eye, (self.cap, 1, 1))
        self._T[:n_new] = np.asarray(blk.values)
        self._const = np.ones(self.cap, bool)
        self._const[:n_new] = np.asarray(blk.const_mask)
        # split surviving batches back into between storage + priors
        self._prior_batches = []
        bi, bj, bT, bS, bw = [], [], [], [], []
        for fb in g2.batches:
            if fb.kind == f"between_{self.kind}":
                bi.append(np.asarray(fb.indices[0]))
                bj.append(np.asarray(fb.indices[1]))
                bT.append(np.asarray(fb.data["T_obs"]))
                bS.append(np.asarray(fb.data["sqrt_info"]))
                bw.append(np.asarray(fb.weight))
            else:
                self._prior_batches.append(fb)
        self.m = sum(len(x) for x in bi)
        self.fcap = _bucket(max(self.m, 1), 16)
        self._fi = np.zeros(self.fcap, np.int32)
        self._fj = np.zeros(self.fcap, np.int32)
        self._T_obs = np.tile(eye, (self.fcap, 1, 1))
        self._S = np.tile(np.eye(self._dof), (self.fcap, 1, 1))
        self._w = np.zeros(self.fcap)
        if self.m:
            self._fi[: self.m] = np.concatenate(bi)
            self._fj[: self.m] = np.concatenate(bj)
            self._T_obs[: self.m] = np.concatenate(bT)
            self._S[: self.m] = np.concatenate(bS)
            self._w[: self.m] = np.concatenate(bw)
