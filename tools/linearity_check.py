"""Empirical linearity check between two bench JSONs at different SFs.

Every "linear, never pairwise" docstring claim in the engine gets its
empirical test here: run ``bench.py`` at two scale factors (e.g. the
committed sf0.1 round bench and an sf1 run over tools/gen_sf1.py
output), then compare per-query growth against the data-size ratio.

A query is flagged SUPERLINEAR when its time grows by more than
``ratio * tolerance`` (default tolerance 1.3 — generous headroom for
the log-linear factor in sorts and the fixed-overhead distortion of
sub-second queries, which makes most queries look SUBlinear). Flags
mean "go read the plan", not "guilty": the round-7 sf1 smoke caught
exactly such a flag on dedup_ngram_jaccard that turned out to be a
testdata-generator tokenization bug (shingle df exploding 150x for
data reasons), not an engine plan problem.

Usage: python tools/linearity_check.py BENCH_A.json BENCH_B.json
       (A = smaller SF, B = larger; both bench.py output lines, or the
       driver's wrapped {"tail": ...} form)
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    d = json.load(open(path))
    if "queries" not in d and "tail" in d:  # driver-wrapped form
        m = re.search(r'\{"metric".*', d["tail"])
        d = json.loads(m.group(0).split("\r")[-1])
    return d


def main() -> None:
    a, b = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    ratio = b["sf"] / a["sf"]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    rows = sorted(
        (
            (b["queries"][q] / t, t, b["queries"][q], q)
            for q, t in a["queries"].items()
            if q in b["queries"]
        ),
        reverse=True,
    )
    print(
        f"sf {a['sf']} -> {b['sf']} (data x{ratio:g}); "
        f"flag threshold x{ratio * tol:g}"
    )
    print(f"{'growth':>7} {'t_a':>7} {'t_b':>8}  query")
    n_flag = 0
    for g, ta, tb, q in rows:
        flag = ""
        if g > ratio * tol:
            flag = "  <== SUPERLINEAR"
            n_flag += 1
        print(f"{g:7.1f} {ta:7.2f} {tb:8.2f}  {q}{flag}")
    only_b = [q for q in b["queries"] if q not in a["queries"]]
    if only_b:
        print(f"only in B (no comparison): {only_b}")
    print(
        f"totals: {a['value']:.1f}s -> {b['value']:.1f}s "
        f"(x{b['value'] / a['value']:.1f}); {n_flag} flagged"
    )
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
