#!/bin/bash
# Round-4 follow-up TPU measurements: build_probes=2 at GloVe scale.
# The bp=1 exact-mode coverage ceiling is 0.981 (docs/PERFORMANCE.md:
# ~1.9% of true neighbors live outside the query's ten nearest lists);
# build-time spill is the only lever past it. Waits for r4_queue.sh to
# drain (ONE TPU job at a time), then sweeps bp=1..2 through both the
# PQ path and the exact engine, caching the bp=2 archive for reuse.
cd "$(dirname "$0")/.." || exit 1

# wait for the main queue (if running) to print its completion line
if [ -f /tmp/r4_queue_main.log ]; then
  until grep -q "all jobs processed" /tmp/r4_queue_main.log 2>/dev/null; do
    sleep 60
  done
fi

wait_chip() {
  local n=0
  until timeout 600 python -c \
    "import jax, jax.numpy as jnp; \
     assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0" \
    >/dev/null 2>&1; do
    n=$((n+1))
    echo "[queue2] chip probe $n failed; sleeping 60s" >&2
    sleep 60
  done
  echo "[queue2] chip up" >&2
}

run_job() {  # run_job <name> <cmd...>
  local name=$1; shift
  if [ -f "/tmp/r4_${name}.done" ]; then
    echo "[queue2] $name already done, skipping" >&2
    return
  fi
  wait_chip
  echo "[queue2] === $name: $* (started $(date -u +%H:%M:%S))" >&2
  if timeout 5400 "$@" > "/tmp/r4_${name}.log" 2>&1; then
    touch "/tmp/r4_${name}.done"
    echo "[queue2] $name OK" >&2
  else
    echo "[queue2] $name FAILED rc=$? (see /tmp/r4_${name}.log)" >&2
  fi
}

run_job bp2_pq    python examples/bench.py clustered-1183514-100 \
                    --metric angular --n-queries 10000 --max-build-probes 3
run_job bp2_exact python examples/bench.py clustered-1183514-100 \
                    --metric angular --n-queries 10000 --max-build-probes 3 \
                    --scan-impl exact
echo "[queue2] all jobs processed" >&2
