"""Headline benchmark: sphere2500-class SE(3) pose graph (BASELINE.json:2,5).

Measures time-to-reference-chi2 of the TPU solver (block-sparse BCSR + PCG,
fully jitted LM) against the pySLAM-CPU architectural stand-in
(bench/pyslam_standin.py — per-block Python loop + scipy bmat/spsolve; the
reference mount is empty, see SURVEY.md §0/§6, so the stand-in is the
measured baseline and is labeled as such).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
where value is the wall-clock speedup (x) over the CPU stand-in for solving
to the same converged chi2 (parity enforced within 1%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench"))

BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench", "baseline_cache.json"
)


def measure_baseline(data, force=False):
    """pySLAM-CPU stand-in wall clock + converged chi2 (cached on disk)."""
    if not force and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    from pyslam_standin import solve_pose_graph_standin

    _, chi2, iters, wall, per_iter = solve_pose_graph_standin(data, max_iters=20)
    result = {
        "chi2": chi2,
        "wall_s": wall,
        "iters": iters,
        "per_iter_s": per_iter,
        "label": "pyslam-cpu-standin (per-block python + scipy spsolve, f64)",
    }
    with open(BASELINE_CACHE, "w") as f:
        json.dump(result, f)
    return result


def _watchdog(timeout_s, phase):
    """The axon TPU tunnel has been observed to hang backend init
    indefinitely when the remote service is down (r3: >20 min without
    returning), and a killed-mid-compile client can wedge it for the next
    process.  If the guarded phase does not complete within the timeout,
    emit an honest zero-result JSON line and exit nonzero so the driver
    records a failed bench instead of hanging the round."""
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "sphere2500_time_to_chi2_speedup_vs_pyslam_cpu_standin",
                        "value": 0.0,
                        "unit": "x",
                        "vs_baseline": 0.0,
                        "error": f"tpu {phase} exceeded {timeout_s}s (tunnel down/wedged)",
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.pyslam_tpu_jax_cache"))
    wd = _watchdog(900, "backend init")
    jax.devices()  # force backend init under the watchdog
    wd.set()

    from pyslam_tpu.graph import build
    from pyslam_tpu.io import synth
    from pyslam_tpu.solver import Options
    from pyslam_tpu.solver.bcsr import build_ell_direct, solve_ell

    data = synth.se3_sphere(n_poses=2500, seed=0)
    baseline = measure_baseline(data)  # CPU scipy; NOT under the TPU guard

    # second guard, armed only around the TPU compile + measured run: a
    # killed-mid-compile client can wedge the tunnel AFTER init succeeded
    # (observed r3).  45 min covers two cold compiles even at the measured
    # worst-case remote-compile slowdown (~280 s per fresh shape).
    wd_run = _watchdog(2700, "bench compile+run")

    g = build.pose_graph(data)  # f32, the TPU-native production path
    plan = build_ell_direct(g)
    opts = Options(method="lm", max_iters=30, min_cost_decrease=0.999)

    def run():
        # measured-best config on this chip: direct-to-ELL assembly,
        # slice-damping, closed-form block-Jacobi, inexact-Newton PCG.
        # rtol 3e-6 / 120 its is the measured knee (round 2): EXACT f64
        # parity (7310.78, == the x64 optimum to 5e-7 relative) at the same
        # wall as the loose round-1 config — tighter CG cuts an LM iteration
        s, info = solve_ell(g, opts, plan=plan, pcg_rtol=3e-6, pcg_max_iters=120)
        # scalar readback, NOT block_until_ready: on the axon runtime
        # block_until_ready can return before execution completes
        # (measured round 5 — docs/PERFORMANCE.md), which would fake the
        # timing; a float() host readback cannot return early
        float(info.chi2)
        return s, info

    run()  # compile
    t0 = time.perf_counter()
    s, info = run()
    wall = time.perf_counter() - t0

    wd_run.set()
    chi2 = float(info.chi2)
    iters = int(info.iterations)
    # 0.1% gate (tightened from 1% in round 2: the f32 solve reaches the
    # f64 optimum exactly, so the gate no longer needs slack for CG
    # truncation — see docs/PERFORMANCE.md "Precision")
    parity = chi2 <= baseline["chi2"] * 1.001
    speedup = baseline["wall_s"] / wall if parity else 0.0

    print(
        json.dumps(
            {
                "metric": "sphere2500_time_to_chi2_speedup_vs_pyslam_cpu_standin",
                "value": round(speedup, 2),
                "unit": "x",
                "vs_baseline": round(speedup, 2),
            }
        )
    )
    # diagnostics on stderr (the driver reads the single stdout line)
    print(
        f"tpu: {wall*1000:.0f}ms / {iters} LM iters ({iters/wall:.1f} it/s), "
        f"chi2 {chi2:.2f} | baseline[{baseline['label']}]: {baseline['wall_s']:.1f}s, "
        f"chi2 {baseline['chi2']:.2f} | parity: {parity}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
