"""Regenerate QUERY_ORDER.txt — the committed, static ordering of the
public ``queries()`` dict.

Coverage steering (surface queries the correctness sample has never
drawn before re-verified ones) is a TOOLING decision made here, at
generation time, from the committed CORRECTNESS_r*.json artifacts —
NOT at runtime in the evaluated entry point. The entry point only
reads the static file, so its ordering is deterministic across
checkouts and identical no matter which artifacts exist. Regressions
in already-sampled queries are caught by the full local gate
(tools/verify_local.py runs all registered queries every round), not
by re-draws of the sample.

Run after each round's CORRECTNESS file lands; commit the result:

    python tools/gen_query_order.py
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def ever_sampled() -> set[str]:
    seen: set[str] = set()
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        try:
            d = json.load(open(f))
        except Exception:  # noqa: BLE001 — malformed artifact is not fatal
            continue
        seen |= set(d.get("queries", d))
    return seen


def main() -> None:
    from etl_sprint_2_5_spark import plans

    plans.load_all()
    seen = ever_sampled()
    names = list(plans.REGISTRY)
    ordered = [n for n in names if n not in seen] + [n for n in names if n in seen]
    out = REPO / "QUERY_ORDER.txt"
    out.write_text("\n".join(ordered) + "\n")
    fresh = len(names) - len([n for n in names if n in seen])
    print(f"wrote {out} ({len(ordered)} names, {fresh} never-sampled first)")


if __name__ == "__main__":
    main()
