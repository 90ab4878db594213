#!/bin/bash
# Re-warm the test-suite compilation cache chunk-wise (one pytest process
# per test file).  Needed after purging /root/repo/.jax_cache: XLA:CPU's
# compiler segfaults after ~200 fresh compiles in a single process, so a
# cold single-process suite run cannot finish — but per-file processes stay
# well under the threshold and write the cache cleanly, after which the
# normal `python -m pytest tests/ -q` run is all cache hits.
set -u
cd "$(dirname "$0")/.."
for f in tests/test_*.py; do
  echo "== $f"
  python -m pytest "$f" -q --no-header | tail -1
done
