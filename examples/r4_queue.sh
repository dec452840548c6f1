#!/bin/bash
# Round-4 TPU measurement queue: run every pending measurement job
# sequentially (ONE TPU process at a time — concurrent jobs corrupt
# each other's timings through the relay), with a wait-for-chip loop
# between jobs so an outage stalls the queue instead of killing it.
# Logs land in /tmp/r4_*.log; tail them to follow progress.
cd "$(dirname "$0")/.." || exit 1

wait_chip() {
  local n=0
  until timeout 600 python -c \
    "import jax, jax.numpy as jnp; \
     assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0" \
    >/dev/null 2>&1; do
    n=$((n+1))
    echo "[queue] chip probe $n failed; sleeping 60s" >&2
    sleep 60
  done
  echo "[queue] chip up" >&2
}

run_job() {  # run_job <name> <cmd...>
  local name=$1; shift
  if [ -f "/tmp/r4_${name}.done" ]; then
    echo "[queue] $name already done, skipping" >&2
    return
  fi
  wait_chip
  echo "[queue] === $name: $* (started $(date -u +%H:%M:%S))" >&2
  if timeout 5400 "$@" > "/tmp/r4_${name}.log" 2>&1; then
    touch "/tmp/r4_${name}.done"
    echo "[queue] $name OK" >&2
  else
    echo "[queue] $name FAILED rc=$? (see /tmp/r4_${name}.log)" >&2
  fi
}

run_job bench    python bench.py
run_job exact    python examples/exact_frontier.py
run_job p1       python examples/p1_frontier.py --table-dtypes int8 bf16
run_job euclid   python examples/bench.py clustered-1000000-128 \
                   --metric euclidean --n-queries 10000 --max-build-probes 2
run_job latency  python examples/latency.py
run_job wall     python examples/wall_probe.py
run_job stream   python examples/stream_guidance.py
echo "[queue] all jobs processed" >&2
