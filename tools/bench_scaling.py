#!/usr/bin/env python3
"""Generate BENCH_SCALING.md from two bench artifacts.

Usage: python3 tools/bench_scaling.py [bench_results/bench_sf0.1.json] \
           [bench_results/bench_sf1.json] [data_factor=10]

Reads the per-query JSON the graft.Bench main persists, computes the
per-query wall ratio between the two scale factors, and writes a
markdown report flagging anything super-linear (ratio > data factor).
Driver-side tooling (like compare_oracle.py) — not part of the Scala
library.
"""
import json
import statistics
import sys

lo_path = sys.argv[1] if len(sys.argv) > 1 else "bench_results/bench_sf0.1.json"
hi_path = sys.argv[2] if len(sys.argv) > 2 else "bench_results/bench_sf1.json"
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

lo = json.load(open(lo_path))
hi = json.load(open(hi_path))
ql, qh = lo["queries"], hi["queries"]

rows = []
dropped = []  # no-silent-caps: every non-compared query is reported
for k in sorted(set(ql) | set(qh)):
    a, b = ql.get(k), qh.get(k)
    if a is None or b is None:
        dropped.append((k, "only in one artifact"))
    elif a <= 0:
        dropped.append((k, "lo sample %.3f (failed or rounds to 0 — judge the hi absolute: %.3fs)"
                        % (a, b if b is not None else float("nan"))))
    elif b < 0:
        continue  # counted under failed below
    else:
        rows.append((b / a, a, b, k))
rows.sort(reverse=True)

failed = {k: v for k, v in qh.items() if v < 0}
if not rows:
    sys.exit("no comparable queries between %s and %s" % (lo_path, hi_path))
ratios = [r[0] for r in rows]
med = statistics.median(ratios)
super_linear = [r for r in rows if r[0] > factor]

out = []
out.append("# BENCH_SCALING — sf0.1 vs sf1 (data ×%g)\n" % factor)
out.append("Artifacts: `%s` (total %.1f s) vs `%s` (total %.1f s).\n"
           % (lo_path, lo["value"], hi_path, hi["value"]))
out.append("Protocol: lo %s · hi %s\n" % (lo["protocol"], hi["protocol"]))
out.append("")
out.append("- queries compared: **%d**; failed/timeout at sf1: **%d** %s"
           % (len(rows), len(failed), sorted(failed) if failed else ""))
out.append("- median wall ratio: **%.2f×** at %g× data "
           "(sub-linear: local[32] parallel headroom absorbs the growth)" % (med, factor))
out.append("- super-linear (> %g×): **%d**" % (factor, len(super_linear)))
if dropped:
    out.append("- not compared (%d): %s" % (len(dropped),
               "; ".join("`%s` — %s" % d for d in dropped)))
out.append("")
out.append("## Super-linear queries (the worklist)\n")
out.append("| query | sf0.1 s | sf1 s | ratio |")
out.append("|---|---|---|---|")
for r, a, b, k in super_linear:
    out.append("| %s | %.2f | %.2f | %.1f× |" % (k, a, b, r))
out.append("")
out.append("### Reading the super-linear list\n")
out.append("""\
- **By-design quadratic oracle twins.** `knn_label_accuracy` (exact
  N-squared leave-one-out) and `dedup_embedding` (all-pairs) exist as the
  naive references their scale paths are verified against —
  `knn_label_accuracy_sampled` (bounded anchor panel) and
  `dedup_embedding_bucketed` (corpus-scaled LSH bands) are the documented
  at-scale defaults and must stay ~linear here.
- **Output-driven growth.** The sf1 corpus replicates documents and
  embeddings VERBATIM (ScaleData, deliberately the dedup worst case):
  every row gains 9 exact duplicates, so pair-listing outputs grow
  ~C(10,2) = 45-fold by construction. A pair query's cost follows its
  output, not its input.
- **Amdahl floor.** Queries under ~0.5 s at sf0.1 are dominated by fixed
  plan/setup cost, so their ratio overstates the data term; judge the
  absolute sf1 seconds for those.
- **One-time index builds** (`bm25_indexed`, `dedup_incremental`) pay
  their build inside the timing; amortized cost per query is the read
  path, which is bounded. Shared per-JVM caches land in their first
  alphabetical consumer: `contrastive_pairs` fronts the near-dup pair
  graph for the whole dedup family, `decontaminate_spans` the
  positional 5-gram table for the span family.
""")
out.append("## Full per-query table (ratio desc)\n")
out.append("| query | sf0.1 s | sf1 s | ratio |")
out.append("|---|---|---|---|")
for r, a, b, k in rows:
    out.append("| %s | %.3f | %.3f | %.1f× |" % (k, a, b, r))
out.append("")

open("BENCH_SCALING.md", "w").write("\n".join(out) + "\n")
print("wrote BENCH_SCALING.md: %d queries, median %.2fx, %d super-linear"
      % (len(rows), med, len(super_linear)))
