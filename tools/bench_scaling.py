#!/usr/bin/env python3
"""Generate a scaling report from two bench artifacts.

Usage: python3 tools/bench_scaling.py [lo.json] [hi.json] [data_factor=10] [out.md]

Reads the per-query JSON the graft.Bench main persists, computes the
per-query wall ratio between the two scale factors, and writes a
markdown report flagging anything super-linear (ratio > data factor).
Driver-side tooling (like compare_oracle.py) — not part of the Scala
library.
"""
import json
import os
import re
import statistics
import sys

lo_path = sys.argv[1] if len(sys.argv) > 1 else "bench_results/bench_sf0.1.json"
hi_path = sys.argv[2] if len(sys.argv) > 2 else "bench_results/bench_sf1.json"
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH_SCALING.md"


def label(p):
    m = re.search(r"bench_(sf[0-9.]+)\.json$", os.path.basename(p))
    return m.group(1) if m else os.path.basename(p)


lo_lab, hi_lab = label(lo_path), label(hi_path)
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
out.append("# BENCH_SCALING — %s vs %s (data ×%g)\n" % (lo_lab, hi_lab, factor))
out.append("Artifacts: `%s` (total %.1f s) vs `%s` (total %.1f s).\n"
           % (lo_path, lo["value"], hi_path, hi["value"]))
out.append("Protocol: lo %s · hi %s\n" % (lo["protocol"], hi["protocol"]))
out.append("")
out.append("- queries compared: **%d**; failed/timeout at %s: **%d** %s"
           % (len(rows), hi_lab, len(failed), sorted(failed) if failed else ""))
out.append("- median wall ratio: **%.2f×** at %g× data "
           "(sub-linear: local[32] parallel headroom absorbs the growth)" % (med, factor))
out.append("- super-linear (> %g×): **%d**" % (factor, len(super_linear)))
zl = lo.get("protocol", {}).get("zombies", [])
zh = hi.get("protocol", {}).get("zombies", [])
if zl or zh:
    out.append("- ZOMBIE-polluted tails (timed-out task still running; discount "
               "the queries after it): lo %s · hi %s" % (zl, zh))
if dropped:
    out.append("- not compared (%d): %s" % (len(dropped),
               "; ".join("`%s` — %s" % d for d in dropped)))
out.append("")
pb_lo = lo.get("protocol", {}).get("prebuild_sec", {})
pb_hi = hi.get("protocol", {}).get("prebuild_sec", {})
if pb_lo or pb_hi:
    out.append("## Shared-artifact prebuild (explicitly timed, outside per-query walls)\n")
    out.append("| artifact | %s s | %s s | ratio |" % (lo_lab, hi_lab))
    out.append("|---|---|---|---|")
    for k in sorted(set(pb_lo) | set(pb_hi)):
        a, b = pb_lo.get(k), pb_hi.get(k)
        r = ("%.1f×" % (b / a)) if a and b and a > 0 else "—"
        out.append("| %s | %s | %s | %s |"
                   % (k,
                      ("%.2f" % a) if a is not None else "—",
                      ("%.2f" % b) if b is not None else "—", r))
    out.append("")
out.append("## Super-linear queries (the worklist)\n")
out.append("| query | %s s | %s s | ratio |" % (lo_lab, hi_lab))
out.append("|---|---|---|---|")
for r, a, b, k in super_linear:
    out.append("| %s | %.2f | %.2f | %.1f× |" % (k, a, b, r))
out.append("")
out.append("### Reading the super-linear list\n")
out.append("""\
- **Output-driven growth.** The scaled corpus replicates documents and
  embeddings VERBATIM (ScaleData, deliberately the dedup worst case):
  at ×F every row gains F−1 exact duplicates, so pair-listing outputs
  grow ~C(F,2)-fold by construction. A pair query's cost follows its
  output, not its input.
- **Amdahl floor.** Queries under ~0.5 s at the low SF are dominated by
  fixed plan/setup cost, so their ratio overstates the data term; judge
  the absolute hi-SF seconds for those.
- **Bounded twins.** The former quadratic oracle twins
  (`knn_label_accuracy` exact LOO, `dedup_embedding` all-pairs) run
  over fixed vec_id < 2048 panels since round 10 — vacuous at sf ≤ 0.1
  — so they must now scale ~linearly; a high ratio there is a
  regression, not a design note.
- **Prebuilt shared artifacts.** One-time builds (near-dup pair graph,
  positional grams, BPE table, BM25/shingle/IVF/z-order stores) are
  timed in the prebuild table above, NOT inside any query's wall —
  per-query ratios are steady-state.
""")
out.append("## Full per-query table (ratio desc)\n")
out.append("| query | %s s | %s s | ratio |" % (lo_lab, hi_lab))
out.append("|---|---|---|---|")
for r, a, b, k in rows:
    out.append("| %s | %.3f | %.3f | %.1f× |" % (k, a, b, r))
out.append("")

open(out_path, "w").write("\n".join(out) + "\n")
print("wrote %s: %d queries, median %.2fx, %d super-linear"
      % (out_path, len(rows), med, len(super_linear)))
