"""IO tokenizer benchmark: native C++ fast path vs pure-Python readers.

The runtime question this answers: at Venice scale (4.65M observations,
~25M float tokens) how long does the framework sit in host-side parsing
before the first device dispatch?  The reference's readers are pure Python
(SURVEY.md §2.2 — it authored no native code); ours keep a Python fallback
but route through pyslam_tpu/native/fastio.cpp when the toolchain exists.

Usage:  python bench/io_bench.py [--obs 1000000] [--poses 20000]
Emits one JSON line per case to stdout and appends to bench/results.jsonl.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pyslam_tpu import native  # noqa: E402
from pyslam_tpu.io import bal, g2o, synth  # noqa: E402


def _time(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def bench_bal(n_obs: int, results):
    # Size the synthetic problem so the observation count lands near n_obs.
    n_pts = max(1000, n_obs // 4)
    data = bal.synthetic_bal(n_cams=200, n_pts=n_pts, obs_per_pt=4, seed=0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "big.bal")
        bal.write_bal(path, data)
        size_mb = os.path.getsize(path) / 1e6
        t_native, fast = (_time(lambda: bal.read_bal(path))
                          if native.available() else (float("nan"), None))
        lib, tried = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            t_py, slow = _time(lambda: bal.read_bal(path))
        finally:
            native._lib, native._tried = lib, tried
        if fast is not None:
            np.testing.assert_array_equal(fast.obs, slow.obs)
    row = {
        "config": "io_bal_parse",
        "n_obs": int(len(data.obs)),
        "file_mb": round(size_mb, 1),
        "native_s": round(t_native, 3),
        "python_s": round(t_py, 3),
        "speedup": round(t_py / t_native, 1) if native.available() else None,
    }
    print(json.dumps(row))
    results.append(row)


def bench_g2o(n_poses: int, results):
    data = synth.se3_sphere(n_poses, seed=0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "big.g2o")
        g2o.write_g2o(path, data)
        size_mb = os.path.getsize(path) / 1e6
        t_native, fast = (_time(lambda: g2o.read_g2o(path))
                          if native.available() else (float("nan"), None))
        lib, tried = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            t_py, slow = _time(lambda: g2o.read_g2o(path))
        finally:
            native._lib, native._tried = lib, tried
        if fast is not None:
            np.testing.assert_array_equal(fast.T_meas, slow.T_meas)
    row = {
        "config": "io_g2o_parse",
        "n_poses": int(len(data.T_init)),
        "n_edges": int(len(data.edges_i)),
        "file_mb": round(size_mb, 1),
        "native_s": round(t_native, 3),
        "python_s": round(t_py, 3),
        "speedup": round(t_py / t_native, 1) if native.available() else None,
    }
    print(json.dumps(row))
    results.append(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=1_000_000)
    ap.add_argument("--poses", type=int, default=20_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.jsonl"))
    args = ap.parse_args()
    if not native.available():
        print(json.dumps({"config": "io_bench", "note": "native unavailable; "
                          "timing Python paths only"}))
    results = []
    bench_bal(args.obs, results)
    bench_g2o(args.poses, results)
    with open(args.out, "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
