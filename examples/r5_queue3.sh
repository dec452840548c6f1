#!/bin/bash
# Round-5 TPU queue #3 (relay went down ~15:20 UTC mid-A/B).
# Decides the exact-engine rescore_rows default: the select-variants
# probe showed the dominant exact-P=1 stage is the (Q, p1) csr_ids
# survivor DECODE gather (approx_max_k itself is ~free at p1=40) —
# exactly the gather rescore_rows removes. Also attributes the
# ~16 ms composition overhead via the exact-mode prefix probe.
cd "$(dirname "$0")/.." || exit 1

wait_chip() {
  local n=0
  until timeout 600 python -c \
    "import jax, jax.numpy as jnp; \
     assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0" \
    >/dev/null 2>&1; do
    n=$((n+1))
    echo "[r5q3] chip probe $n failed; sleeping 120s" >&2
    sleep 120
  done
}

run_job() {  # run_job <timeout_s> <name> <cmd...>
  local tmo=$1 name=$2; shift 2
  if [ -f "/tmp/r5c_${name}.done" ]; then
    echo "[r5q3] $name already done, skipping" >&2
    return
  fi
  wait_chip
  echo "[r5q3] === $name: $* (started $(date -u +%H:%M:%S))" >&2
  if timeout "$tmo" "$@" > "/tmp/r5c_${name}.log" 2>&1; then
    touch "/tmp/r5c_${name}.done"
    echo "[r5q3] $name OK ($(date -u +%H:%M:%S))" >&2
  else
    echo "[r5q3] $name FAILED rc=$? (see /tmp/r5c_${name}.log)" >&2
  fi
}

run_job 2400 rescore_exact python examples/r5_rescore_probe.py \
                             --scan-impl exact --probes 1 2 4
run_job 2400 prefix_exact    python examples/prefix_probe.py \
                             --scan-impl exact --probes 1
run_job 2400 prefix_exact_rr python examples/prefix_probe.py \
                             --scan-impl exact --probes 1 --rescore-rows
echo "[r5q3] all jobs processed" >&2
