#!/usr/bin/env python3
"""rescore_rows (deferred-id decode) A/B at GloVe scale.

The round-3 gather analysis (docs/PERFORMANCE.md "Where the time
goes") says the PQ-path query at P>=4 is dominated by two
multi-million-element gathers: the (Q, p1) csr_ids decode and the
(Q, p1) raw-row rescore gather. ``rescore_rows`` stores a CSR-ordered
raw copy so the rescore gathers by flat row directly and ids decode
only for the k winners — removing the first gather at the price of
one extra HBM copy of the corpus. It is implemented and CPU-tested
but was never measured on hardware (VERDICT r4 weak #5); this probe
decides its default.

Measures sustained QPS (query_stream, best-of-3 MARGINAL between two
rep counts — the ~28.5 ms relay constant rides both dispatches and
cancels) and recall at P in {1, 4, 10} with the sweep harness's
default pool (pass_1 = 4*((P+1)k+1)), rescore_rows off vs on, on the
cached bp=1 GloVe-scale archive. ``--scan-impl exact`` runs the same
A/B on the exact engine (engine-default sliver pass_1 = 4kP) — its
select+decode stage is decode-GATHER-bound (examples/r5_select_probe:
approx_max_k at (10k, 2304, p1=40) is ~free; the 7.5 ms stage cost is
the (Q, p1) csr_ids survivor gather), exactly what rescore_rows
removes.

``--device-out`` times the pipelined form instead
(query_stream(device_out=True) + scalar checksum readback): no
(R, Q, k) id download through the ~35 MB/s tunnel, so the gather
deltas aren't drowned by transfer noise — this is the measurement
that decided the exact-engine verdict (parsed6: 518k -> 601k).
``--table-dtype bf16 --pass1 17`` probes the north-star operating
point.

Usage: python examples/r5_rescore_probe.py [--reps 2 7]
       [--probes 1 4 10] [--scan-impl exact] [--device-out]
       [--table-dtype bf16] [--pass1 17]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tinyknn_tpu import utils                      # noqa: E402
from tinyknn_tpu.io import load_ivf                # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, nargs="+", default=[1, 4, 10])
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--reps", type=int, nargs=2, default=[2, 7])
parser.add_argument("--mult", type=float, default=4.0)
parser.add_argument("--scan-impl", default=None,
                    choices=["auto", "fused", "xla", "exact"])
parser.add_argument("--device-out", action="store_true",
                    help="time device-consumed (no id download)")
parser.add_argument("--table-dtype", default=None,
                    choices=["int8", "bf16", "f32"])
parser.add_argument("--pass1", type=int, default=None,
                    help="fixed pass_1 overriding the mult formula")
parser.add_argument("--ab-cycles", type=int, default=1,
                    help="repeat the off/on cycle N times: relay-"
                    "weather drift shows up as disagreement between "
                    "the repeated off (or on) rows")
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
parser.add_argument("--trus", default="trus_clustered-1183514-100_"
                    "k_neighbours=10_num_queries=10000_metric="
                    "'angular'.npy")
args = parser.parse_args()

utils.enable_compilation_cache()
print("loading index...", flush=True)
ivf = load_ivf(args.index)

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

true_sets = None
if os.path.isfile(args.trus):
    trus = np.load(args.trus)
    true_sets = [set(t.tolist()) for t in trus]

if args.scan_impl:
    ivf.set_scan_impl(args.scan_impl)
if args.table_dtype:
    ivf.pq.table_dtype = args.table_dtype

k = args.k
R1, R2 = args.reps
# pre-place on device: a numpy batch would re-upload (R, 10k, 100) f32
# through the ~620 MB/s tunnel on every timed call, and the R2-R1
# upload DELTA (~6 ms/rep at R=7) rides the marginal
import jax.numpy as jnp                            # noqa: E402
qbs = {r: jnp.asarray(queries[None] + np.arange(r, dtype=np.float32)[
    :, None, None] * 1e-6) for r in (R1, R2)}

for enabled in (False, True) * args.ab_cycles:
    ivf.set_rescore_rows(enabled)
    tag = "rescore_rows=on " if enabled else "rescore_rows=off"
    for P in args.probes:
        if args.pass1 is not None:
            p1 = args.pass1
        elif args.scan_impl == "exact":
            p1 = None          # engine default sliver (4kP)
        else:
            p1 = int(args.mult * ((P + 1) * k + 1))

        def tick(r):
            if args.device_out:
                import jax.numpy as jnp
                o, _ = ivf.query_stream(qbs[r], k=k, n_probes=P,
                                        pass_1=p1, device_out=True)
                int(jnp.sum(o))   # scalar readback forces completion
                return None
            return np.asarray(ivf.query_stream(
                qbs[r], k=k, n_probes=P, pass_1=p1))

        el, out = {}, None
        for r in (R1, R2):
            out = np.asarray(ivf.query_stream(
                qbs[r], k=k, n_probes=P, pass_1=p1))  # warm/compile+recall
            tick(r)               # warm the device_out variant too
            el[r] = float("inf")
            for _ in range(3):
                t0 = time.time()
                tick(r)
                el[r] = min(el[r], time.time() - t0)
        # marginal rate, with bench.py's fallback: relay jitter can
        # make el[R2] <= el[R1], and a near-zero positive margin would
        # print an absurd QPS — fall back to the (constant-bearing,
        # conservative) whole-call rate and say so
        fell_back = el[R2] <= el[R1]
        if fell_back:
            qps = R2 * nq / el[R2]
        else:
            qps = (R2 - R1) * nq / (el[R2] - el[R1])
        note = (" (whole-call fallback: margin lost to jitter)"
                if fell_back else "")
        rec = ""
        if true_sets is not None:
            g = out[0]
            found = sum(len(true_sets[i] & set(row.tolist()))
                        for i, row in enumerate(g))
            rec = f"  recall{k}@{k}={found / k / nq:.4f}"
        print(f"{tag} P={P:>2} pass_1={p1 or 4 * k * P:>4}: "
              f"marginal QPS={qps:,.0f}{rec}{note}", flush=True)
