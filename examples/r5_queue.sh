#!/bin/bash
# Round-5 TPU measurement queue (ONE TPU job at a time; each job waits
# for the chip, logs to /tmp/r5_<name>.log, marks /tmp/r5_<name>.done).
# Order = VERDICT r4 priority: build_probes=2 GloVe frontier (PQ +
# exact engines), rescore_rows A/B, the latency table, then the
# euclidean-at-scale sustained sweep.
cd "$(dirname "$0")/.." || exit 1

wait_chip() {
  local n=0
  until timeout 600 python -c \
    "import jax, jax.numpy as jnp; \
     assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0" \
    >/dev/null 2>&1; do
    n=$((n+1))
    echo "[r5queue] chip probe $n failed; sleeping 60s" >&2
    sleep 60
  done
}

run_job() {  # run_job <timeout_s> <name> <cmd...>
  local tmo=$1 name=$2; shift 2
  if [ -f "/tmp/r5_${name}.done" ]; then
    echo "[r5queue] $name already done, skipping" >&2
    return
  fi
  wait_chip
  echo "[r5queue] === $name: $* (started $(date -u +%H:%M:%S))" >&2
  if timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1; then
    touch "/tmp/r5_${name}.done"
    echo "[r5queue] $name OK ($(date -u +%H:%M:%S))" >&2
  else
    echo "[r5queue] $name FAILED rc=$? (see /tmp/r5_${name}.log)" >&2
  fi
}

run_job 7200 bp2_pq    python examples/bench.py clustered-1183514-100 \
                         --metric angular --n-queries 10000 \
                         --max-build-probes 3
run_job 7200 bp2_exact python examples/bench.py clustered-1183514-100 \
                         --metric angular --n-queries 10000 \
                         --max-build-probes 3 --scan-impl exact
run_job 3600 rescore   python examples/r5_rescore_probe.py
run_job 2400 lat_pq_p1    python examples/latency.py --probes 1
run_job 2400 lat_pq_p10   python examples/latency.py --probes 10
run_job 2400 lat_exact_p1 python examples/latency.py --probes 1 \
                            --scan-impl exact
run_job 9000 euclid    python examples/bench.py clustered-1000000-128 \
                         --metric euclidean --n-queries 10000 \
                         --max-build-probes 2
echo "[r5queue] all jobs processed" >&2
