#!/bin/bash
# One-command real-TPU measurement refresh (run when the tunnel is back):
#   bash scripts/tpu_rerun.sh
# Sequential (two processes sharing the tunnel is flaky — CLAUDE.md).
set -e
cd "$(dirname "$0")/.."
echo "== probe =="
timeout 300 python -c "
import time; t0=time.time()
import jax, jax.numpy as jnp
x = jnp.ones((139, 251)); print('probe OK', float((x@x.T).sum()), '%.1fs'%(time.time()-t0), jax.devices())
" || { echo "TUNNEL STILL DOWN"; exit 3; }
echo "== headline (bench.py) =="
timeout 1800 python bench.py
echo "== all configs (bench/run.py 1-8) =="
timeout 7200 python bench/run.py --configs 1,2,3,4,5,6,7,8
echo "== SPARSE_SCHUR vs PCG =="
timeout 1800 python bench/sparse_schur_compare.py
echo "== covariance: selinv vs column solves =="
timeout 1800 python bench/covariance_bench.py
echo "== done; results in bench/results.jsonl =="
