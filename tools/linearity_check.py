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

Accepted input shapes (per file):
- bench.py's full JSON line (has "queries") — per-query comparison;
- bench.py's compact summary line (no "queries", has "full" naming
  the persisted per-query file) — the full file is resolved relative
  to the input path and, if present, used for per-query comparison;
  otherwise the check degrades to a totals-only comparison;
- the driver's wrapped form ({"tail": "..."}) — the LAST parseable
  JSON object in the tail is used (bench prints the compact summary
  last precisely so a truncated tail still parses).

Truncated/unparseable input exits 2 with a one-line message, never a
traceback.

Usage: python tools/linearity_check.py BENCH_A.json BENCH_B.json [tol]
       (A = smaller SF, B = larger)
"""

from __future__ import annotations

import json
import os
import re
import sys


def _die(msg: str) -> None:
    print(f"linearity_check: {msg}", file=sys.stderr)
    sys.exit(2)


def _last_json_object(text: str) -> dict | None:
    """The last parseable {...} JSON object in a possibly-truncated
    text blob — candidates are tried back to front."""
    candidates = re.findall(r"\{[^{}]*(?:\{[^{}]*\}[^{}]*)*\}", text)
    for cand in reversed(candidates):
        try:
            d = json.loads(cand)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "value" in d:
            return d
    return None


def load_bench(path: str) -> dict:
    try:
        with open(path) as f:
            text = f.read()
    except OSError as e:
        _die(f"cannot read {path!r}: {e}")
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = _last_json_object(text)
        if d is None:
            _die(
                f"{path!r} is not parseable bench output (truncated "
                "capture with no complete JSON object in it)"
            )
    if isinstance(d, dict) and "queries" not in d and "tail" in d:
        d = _last_json_object(str(d["tail"]))
        if d is None:
            _die(
                f"{path!r}: driver tail contains no complete JSON "
                "object — capture truncated before the summary line"
            )
    if "queries" not in d and d.get("full"):
        # compact summary: pull the per-query map from the persisted
        # full file when it's still around (same dir as the input)
        for base in (os.path.dirname(os.path.abspath(path)), os.getcwd()):
            fp = os.path.join(base, d["full"])
            if os.path.exists(fp):
                try:
                    with open(fp) as f:
                        full = json.load(f)
                    if full.get("sf") == d.get("sf"):
                        return full
                except (json.JSONDecodeError, OSError):
                    pass
    if "value" not in d or "sf" not in d:
        _die(f"{path!r} parsed but lacks value/sf — not bench output")
    return d


def main() -> None:
    if len(sys.argv) < 3:
        _die("usage: linearity_check.py BENCH_A.json BENCH_B.json [tol]")
    a, b = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    ratio = b["sf"] / a["sf"]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    print(
        f"sf {a['sf']} -> {b['sf']} (data x{ratio:g}); "
        f"flag threshold x{ratio * tol:g}"
    )
    n_flag = 0
    if "queries" in a and "queries" in b:
        rows = sorted(
            (
                (b["queries"][q] / t, t, b["queries"][q], q)
                for q, t in a["queries"].items()
                if q in b["queries"]
            ),
            reverse=True,
        )
        print(f"{'growth':>7} {'t_a':>7} {'t_b':>8}  query")
        for g, ta, tb, q in rows:
            flag = ""
            if g > ratio * tol:
                flag = "  <== SUPERLINEAR"
                n_flag += 1
            print(f"{g:7.1f} {ta:7.2f} {tb:8.2f}  {q}{flag}")
        only_b = [q for q in b["queries"] if q not in a["queries"]]
        if only_b:
            print(f"only in B (no comparison): {only_b}")
    else:
        print(
            "per-query map unavailable on at least one side (compact "
            "summary without its full file) — totals-only comparison"
        )
        if b["value"] / a["value"] > ratio * tol:
            n_flag += 1
            print("total growth exceeds threshold  <== SUPERLINEAR")
    print(
        f"totals: {a['value']:.1f}s -> {b['value']:.1f}s "
        f"(x{b['value'] / a['value']:.1f}); {n_flag} flagged"
    )
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
