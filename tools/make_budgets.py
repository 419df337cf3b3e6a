#!/usr/bin/env python3
"""Regenerate tools/bench_budgets.json from a graft.Bench stdout capture.

Usage: python3 tools/make_budgets.py BENCH_LOG [BENCH_LOG...]

Reads every line that parses as the Bench full-result JSON (has a
"queries" map), takes the per-query MEDIAN across the given logs, and
writes budget = max(3 x median, 1.0) seconds — 3x covers this VM's
documented run-to-run noise (~2x) with headroom; the 1 s floor keeps
sub-100 ms queries from flapping on scheduler jitter.

Caveats for re-baselining (see ADVICE round 6):
- The queries listed in the bench JSON's "memo_hits" array replayed the
  shared dup-components frame built by an EARLIER query in the same run
  (alphabetical order: q_dedup_keeplist pays, q_dup_clusters and
  q_leakage_safe_split replay). Their numbers are only meaningful under
  the same run order — never budget them from a partial-run log where a
  different query paid the build.
- Keep budget re-baselines in their own commit with the measurement
  context (machine, warmth, what else ran) in the message, and do NOT
  loosen the budget of a query the same change set claims to speed up.
"""
import json
import statistics
import sys

def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    samples: dict[str, list[float]] = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                line = line.strip()
                # sbt prefixes runMain stdout with "[info] " — accept
                # raw captures without a separate sed pass.
                if line.startswith("[info] "):
                    line = line[len("[info] "):]
                if not (line.startswith("{") and '"queries"' in line):
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                for q, sec in rec.get("queries", {}).items():
                    samples.setdefault(q, []).append(float(sec))
    if not samples:
        sys.exit("no parseable bench lines with a queries map found")
    budgets = {
        q: round(max(3.0 * statistics.median(v), 1.0), 2)
        for q, v in sorted(samples.items())
    }
    out = "tools/bench_budgets.json"
    with open(out, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(budgets)} budgets "
          f"from {sum(len(v) for v in samples.values())} samples")

if __name__ == "__main__":
    main()
