"""Shared host-side LM trust-region loop for sharded / streamed solvers.

The fully device-resident loop (solver/lm.py, lax.while_loop) is right for
single-program solves, but the sharded paths (dist/factor_parallel.py,
dist/schur_reduce.py, dist/schur_cm.py) and the segment-streamed Venice path
(solver/schur_large.py) drive one jitted *step* per iteration from the host —
either because checkpointing hooks live between iterations or because a
single XLA program must stay time-bounded on this TPU runtime.  Round 1 gave
each of those its own hand-rolled accept/reject loop with drifting stopping
semantics; this module is the single implementation, mirroring
solver/lm.solve's semantics (reference Options fields per SURVEY.md §2.1:
max_iters, min_update_norm, min_cost, min_cost_decrease,
allow_nondecreasing_steps, max_nondecreasing_steps) field-for-field.
"""

from __future__ import annotations

from . import lm as _lm


def host_lm_loop(step, state, options: _lm.Options, on_accept=None):
    """Run the GN/LM accept-reject loop over a host-driven step.

    ``step(state, lam) -> (trial_state, chi2, cost_new, dx_norm)`` where
    ``chi2`` is the cost at the linearization point (current state) and
    ``cost_new`` the trial-state cost.  ``state`` is any pytree the caller
    threads through; ``lam`` arrives as a python float.

    ``on_accept(state, lam, n_accepted)`` is called after every accepted
    step (checkpoint hook).

    Returns ``(best_state, history, info)`` with ``history`` the accepted
    cost sequence (initial cost first) and ``info`` a dict with ``status``
    (solver.lm stop code), ``iterations``, and ``chi2`` (best cost).

    Semantics match solver/lm.solve exactly:
      * LM accepts iff cost_new < chi2 (NaN-safe: NaN comparisons are False,
        so failed factorizations are rejections, not crashes); GN always
        accepts (reference behavior).
      * best-state tracking across rejected steps.
      * stopping: update-norm (accepted steps only), min_cost, insufficient
        relative decrease (accepted steps in LM; improved steps in GN), and
        the GN nondecreasing-step budget.
    """
    lam = options.lambda_init
    best_state, best_cost = state, float("inf")
    nondec = 0
    history: list[float] = []
    status = _lm.RUNNING
    it = 0
    n_accepted = 0
    max_nondec = (
        options.max_nondecreasing_steps if options.allow_nondecreasing_steps else 1
    )
    for it in range(1, options.max_iters + 1):
        trial, chi2, cost_new, dx_norm = step(state, lam)
        chi2 = float(chi2)
        cost_new = float(cost_new)
        dx_norm = float(dx_norm)
        if not history:
            history.append(chi2)
            best_cost = chi2

        accept = (options.method == "gn") or (cost_new < chi2)
        if accept:
            state = trial
            history.append(cost_new)
            lam = max(lam * options.lambda_down, options.lambda_min)
            n_accepted += 1
            if on_accept is not None:
                on_accept(state, lam, n_accepted)
        else:
            lam = min(lam * options.lambda_up, options.lambda_max)

        improved = cost_new < best_cost
        if improved:
            best_state, best_cost = trial, cost_new
            nondec = 0
        else:
            nondec += 1

        # --- stopping logic (solver/lm.py order and conditions) ---
        if accept and dx_norm < options.min_update_norm:
            status = _lm.CONVERGED_UPDATE_NORM
            break
        if cost_new < options.min_cost:
            status = _lm.CONVERGED_MIN_COST
            break
        decrease_ok = cost_new < chi2 * options.min_cost_decrease
        if options.method == "gn":
            if improved and not decrease_ok:
                status = _lm.CONVERGED_COST_DECREASE
                break
            if nondec >= max_nondec:
                status = _lm.STOPPED_NONDECREASING
                break
        else:
            if accept and not decrease_ok:
                status = _lm.CONVERGED_COST_DECREASE
                break

    if status == _lm.RUNNING:
        status = _lm.MAX_ITERS
    return best_state, history, dict(status=status, iterations=it, chi2=best_cost)


__all__ = ["host_lm_loop"]
