#!/bin/bash
# Round-5 TPU queue #2 (healthy-relay re-captures; ONE job at a time).
# The morning queue ran through a degraded relay — absolute QPS was
# ~2-5x low. Re-capture rescore_rows A/B + the latency table + the
# euclidean sustained sweep with today's relay as the reference run.
cd "$(dirname "$0")/.." || exit 1

wait_chip() {
  local n=0
  until timeout 600 python -c \
    "import jax, jax.numpy as jnp; \
     assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0" \
    >/dev/null 2>&1; do
    n=$((n+1))
    echo "[r5q2] chip probe $n failed; sleeping 60s" >&2
    sleep 60
  done
}

run_job() {  # run_job <timeout_s> <name> <cmd...>
  local tmo=$1 name=$2; shift 2
  if [ -f "/tmp/r5b_${name}.done" ]; then
    echo "[r5q2] $name already done, skipping" >&2
    return
  fi
  wait_chip
  echo "[r5q2] === $name: $* (started $(date -u +%H:%M:%S))" >&2
  if timeout "$tmo" "$@" > "/tmp/r5b_${name}.log" 2>&1; then
    touch "/tmp/r5b_${name}.done"
    echo "[r5q2] $name OK ($(date -u +%H:%M:%S))" >&2
  else
    echo "[r5q2] $name FAILED rc=$? (see /tmp/r5b_${name}.log)" >&2
  fi
}

run_job 3600 rescore   python examples/r5_rescore_probe.py
run_job 2400 lat_pq_p1    python examples/latency.py --probes 1
run_job 2400 lat_pq_p10   python examples/latency.py --probes 10
run_job 2400 lat_exact_p1 python examples/latency.py --probes 1 \
                            --scan-impl exact
run_job 9000 euclid    python examples/bench.py clustered-1000000-128 \
                         --metric euclidean --n-queries 10000 \
                         --max-build-probes 2
echo "[r5q2] all jobs processed" >&2
