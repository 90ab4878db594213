"""Fixed-lag smoother: sliding-window GN with dense marginalization prior.

Online estimation the batch API can't give you: a bounded window of the
most recent poses is optimized every frame, and poses leaving the window
are MARGINALIZED (not dropped) — their information is folded into a dense
Gaussian prior on the remaining window via a Schur complement, with
first-estimate (frozen) linearization points.  The reference has no
counterpart (pyslam solves batch problems only, SURVEY.md §2.1); this is
the fixed-lag design of production smoothers (iSAM2-style fixed-lag /
OKVIS / VIO sliding windows).

TPU shape
---------
* Static shapes everywhere: the window is padded to exactly ``window``
  poses and ``capacity`` factors (weight 0 = hole), so ONE compiled update
  and ONE compiled marginalization serve the entire sequence — two device
  dispatches per frame regardless of trajectory length (dispatch count,
  not flops, is what matters at this scale — CLAUDE.md VO lessons).
* The window GN step reuses the standard kernel + ``assemble_dense`` path
  (graph/factor_defs.py, solver/assemble.py): at window scale (W*dof of a
  few hundred) the dense Hessian factorization is pure MXU work.
* Factor bookkeeping (slot ids, insert pointers) lives on host in numpy —
  it is O(window) per frame and shapes the device call, never rides in it.

Prior convention: cost_p(x) = 1/2 eta^T Hp eta + bp^T eta with
eta_i = log(T_i * Tlin_i^-1) the LEFT tangent offset from the frozen
linearization point — matching the left-perturbation convention of every
kernel in graph/factor_defs.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.core import FactorBatch, FactorGraph, VariableBlock
from ..lie import se2, se3, sim3
from ..losses import L2Loss
from .assemble import assemble_dense

_OPS = {"se3": se3, "se2": se2, "sim3": sim3}
_DOF = {"se3": 6, "se2": 3, "sim3": 7}
_MAT = {"se3": 4, "se2": 3, "sim3": 4}


class FixedLagSmoother:
    """Sliding-window pose smoother with dense marginalization.

    window:    number of poses kept live.
    capacity:  max factors simultaneously in the window (default 6/pose).
    kind:      'se3' | 'se2' | 'sim3' (scale-drift-aware windows).
    gn_iters:  GN iterations per ``update`` call (static; one dispatch).
    anchor_sqrt_info: the world frame is fixed by a strong unary prior on
        the first pose folded into the marginalization prior (a constant
        first pose would leave the prior rank-deficient after it leaves
        the window).
    """

    def __init__(
        self,
        window: int = 16,
        kind: str = "se3",
        capacity: int | None = None,
        gn_iters: int = 3,
        anchor_sqrt_info: float = 1e3,
        damping: float = 1e-9,
        dtype=jnp.float32,
    ):
        if kind not in _OPS:
            raise ValueError(f"kind must be one of {sorted(_OPS)}")
        self.window = int(window)
        self.kind = kind
        self.capacity = int(capacity if capacity is not None else 6 * window)
        self.gn_iters = int(gn_iters)
        self.damping = float(damping)
        self.dtype = dtype
        W, d, m = self.window, _DOF[kind], _MAT[kind]
        self._d, self._m = d, m

        # device state
        eye = np.tile(np.eye(m), (W, 1, 1))
        self.T = jnp.asarray(eye, dtype)
        self.Tlin = jnp.asarray(eye, dtype)
        self.Hp = jnp.zeros((W * d, W * d), dtype)
        self.bp = jnp.zeros(W * d, dtype)
        C = self.capacity
        self.T_obs = jnp.tile(jnp.eye(m, dtype=dtype), (C, 1, 1))
        self.sqrt_info = jnp.tile(jnp.eye(d, dtype=dtype), (C, 1, 1))
        self.fw = jnp.zeros(C, dtype)

        # host mirrors (shape the device call; never ride in it)
        self.fi = np.zeros(C, np.int32)
        self.fj = np.zeros(C, np.int32)
        self._slot_free = np.ones(C, bool)
        self.count = 0  # live poses
        self.first_id = 0  # absolute id of window slot 0
        self._anchor_si = float(anchor_sqrt_info)
        self._update_jit = None
        self._marg_jit = None

    # ------------------------------------------------------------------
    # host-side bookkeeping
    # ------------------------------------------------------------------
    @property
    def next_id(self) -> int:
        """Absolute id the next added pose will get."""
        return self.first_id + self.count

    def window_ids(self):
        return range(self.first_id, self.first_id + self.count)

    def poses(self) -> np.ndarray:
        """(count, m, m) current window estimates, oldest first."""
        return np.asarray(self.T[: self.count])

    def pose(self, abs_id: int) -> np.ndarray:
        s = abs_id - self.first_id
        if not 0 <= s < self.count:
            raise KeyError(f"pose {abs_id} not in window [{self.first_id}, {self.next_id})")
        return np.asarray(self.T[s])

    def _alloc_slot(self) -> int:
        free = np.flatnonzero(self._slot_free)
        if free.size == 0:
            raise RuntimeError(
                f"factor capacity {self.capacity} exhausted; raise `capacity`"
            )
        return int(free[0])

    def _set_pose(self, slot: int, T_new):
        self.T = self.T.at[slot].set(jnp.asarray(T_new, self.dtype))
        self.Tlin = self.Tlin.at[slot].set(jnp.asarray(T_new, self.dtype))

    # ------------------------------------------------------------------
    # graph construction API
    # ------------------------------------------------------------------
    def add_pose(self, T_init) -> int:
        """Append a pose at an explicit initial estimate; returns its
        absolute id.  Marginalizes the oldest pose first if the window is
        full.  The first pose is anchored (world frame) via the prior."""
        if self.count == self.window:
            self._marginalize_oldest()
        slot = self.count
        self._set_pose(slot, T_init)
        if self.first_id == 0 and slot == 0:
            d = self._d
            si = self._anchor_si
            self.Hp = self.Hp.at[:d, :d].set(
                jnp.eye(d, dtype=self.dtype) * (si * si)
            )
        self.count += 1
        return self.next_id - 1

    def add_odometry(self, T_meas, sqrt_info) -> int:
        """Append a pose predicted by composing the measurement onto the
        newest pose (T_new = T_meas @ T_last) and connect them with a
        between factor.  Returns the new pose's absolute id."""
        if self.count == 0:
            raise RuntimeError("add the initial pose first (add_pose)")
        last = self.next_id - 1
        T_pred = jnp.asarray(T_meas, self.dtype) @ self.T[last - self.first_id]
        new = self.add_pose(T_pred)
        self.add_factor(last, new, T_meas, sqrt_info)
        return new

    def add_factor(self, i: int, j: int, T_meas, sqrt_info):
        """Between factor (absolute pose ids, both inside the window):
        measurement T_j_i with the standard kernel convention
        T_est = T_j @ T_i^-1."""
        si, sj = i - self.first_id, j - self.first_id
        if not (0 <= si < self.count and 0 <= sj < self.count):
            raise KeyError(
                f"factor ({i},{j}) outside window [{self.first_id}, {self.next_id})"
            )
        k = self._alloc_slot()
        self._slot_free[k] = False
        # COPY-ON-WRITE, never in-place: on the CPU backend jnp.asarray
        # aliases numpy buffers zero-copy, so mutating an array a previous
        # (possibly still-pending, async) device call received corrupts
        # that call's input — measured as nondeterministic metre-scale
        # window jumps before this was found.
        fi, fj = self.fi.copy(), self.fj.copy()
        fi[k], fj[k] = si, sj
        self.fi, self.fj = fi, fj
        self.T_obs = self.T_obs.at[k].set(jnp.asarray(T_meas, self.dtype))
        self.sqrt_info = self.sqrt_info.at[k].set(jnp.asarray(sqrt_info, self.dtype))
        self.fw = self.fw.at[k].set(1.0)

    # ------------------------------------------------------------------
    # device math
    # ------------------------------------------------------------------
    def _graph(self, T, valid, fi, fj, fw, T_obs, sqrt_info):
        blocks = {
            "poses": VariableBlock(self.kind, T, ~valid)  # invalid slots frozen
        }
        batch = FactorBatch(
            kind=f"between_{self.kind}",
            slots=("poses", "poses"),
            indices=(fi, fj),
            data={"T_obs": T_obs, "sqrt_info": sqrt_info},
            loss=L2Loss(),
            weight=fw,
        )
        return FactorGraph(blocks, [batch])

    def _build_update(self):
        W, d = self.window, self._d
        iters = self.gn_iters
        lam = self.damping

        def run(T, valid, fi, fj, fw, T_obs, sqrt_info, Hp, bp, Tlin):
            ops = _OPS[self.kind]
            free = jnp.repeat(valid, d).astype(T.dtype)

            def body(_, T):
                g = self._graph(T, valid, fi, fj, fw, T_obs, sqrt_info)
                H, grad, _ = assemble_dense(g)
                eta = ops.log(T @ ops.inv(Tlin)).reshape(-1)
                grad = grad - (Hp @ eta + bp) * free
                H = H + Hp * free[:, None] * free[None, :]
                H = H + lam * jnp.eye(W * d, dtype=T.dtype)
                dx = jnp.linalg.solve(H, grad)
                dx = (dx * free).reshape(W, d)
                return ops.perturb(T, dx)

            return jax.lax.fori_loop(0, iters, body, T)

        return jax.jit(run)

    def _build_marg(self):
        W, d = self.window, self._d

        def run(T, valid, fi, fj, fw_adj, T_obs, sqrt_info, Hp, bp, Tlin):
            """Consume the prior + the factors in fw_adj (those touching
            slot 0), Schur-eliminate slot 0, shift the window down one."""
            ops = _OPS[self.kind]
            g = self._graph(T, valid, fi, fj, fw_adj, T_obs, sqrt_info)
            H_a, grad_a, _ = assemble_dense(g)
            # assemble_dense puts a unit diagonal on frozen rows — remove
            # it: the prior must stay exactly the consumed information
            free = jnp.repeat(valid, d).astype(T.dtype)
            H_a = H_a - jnp.diag(1.0 - free)
            eta = ops.log(T @ ops.inv(Tlin)).reshape(-1)
            grad = grad_a - (Hp @ eta + bp) * free
            H = H_a + Hp * free[:, None] * free[None, :]

            Cm = H[:d, :d]
            B = H[d:, :d]
            A = H[d:, d:]
            g_m, g_r = grad[:d], grad[d:]
            CmI = jnp.linalg.inv(Cm)
            Hp_r = A - B @ CmI @ B.T
            g_rp = g_r - B @ (CmI @ g_m)

            Hp_new = jnp.zeros_like(Hp).at[: (W - 1) * d, : (W - 1) * d].set(Hp_r)
            bp_new = jnp.zeros_like(bp).at[: (W - 1) * d].set(-g_rp)
            T_new = jnp.roll(T, -1, axis=0)
            return Hp_new, bp_new, T_new

        return jax.jit(run)

    # ------------------------------------------------------------------
    # the two per-frame entry points
    # ------------------------------------------------------------------
    def update(self):
        """Run the window GN (one device dispatch); returns (count, m, m)
        estimates, oldest first."""
        if self._update_jit is None:
            self._update_jit = self._build_update()
        valid = jnp.arange(self.window) < self.count
        self.T = self._update_jit(
            self.T,
            valid,
            jnp.asarray(self.fi),
            jnp.asarray(self.fj),
            self.fw,
            self.T_obs,
            self.sqrt_info,
            self.Hp,
            self.bp,
            self.Tlin,
        )
        return self.poses()

    def _marginalize_oldest(self):
        if self._marg_jit is None:
            self._marg_jit = self._build_marg()
        live = ~self._slot_free
        adj = live & ((self.fi == 0) | (self.fj == 0))
        valid = jnp.arange(self.window) < self.count
        fw_adj = self.fw * jnp.asarray(adj.astype(np.float32))
        self.Hp, self.bp, self.T = self._marg_jit(
            self.T,
            valid,
            jnp.asarray(self.fi),
            jnp.asarray(self.fj),
            fw_adj,
            self.T_obs,
            self.sqrt_info,
            self.Hp,
            self.bp,
            self.Tlin,
        )
        # relinearize the prior at the (shifted) current estimates
        self.Tlin = self.T
        # drop consumed factors; shift the rest down one slot (copy-on
        # -write — see add_factor)
        self.fw = self.fw * jnp.asarray((~adj).astype(np.float32))
        self._slot_free |= adj
        keep = ~self._slot_free
        fi, fj = self.fi.copy(), self.fj.copy()
        fi[keep] -= 1
        fj[keep] -= 1
        self.fi, self.fj = fi, fj
        self.count -= 1
        self.first_id += 1


__all__ = ["FixedLagSmoother"]
