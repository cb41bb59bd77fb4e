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


def _is_pass(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match", True)
        and row.get("hash_match", True)
        and not row.get("err")
    )


def sample_history() -> tuple[set[str], set[str], dict[str, int]]:
    """(ever_sampled, last_row_failed, last_green_round).

    Queries whose most RECENT driver row (highest round number) was a
    FAIL go right after the never-sampled block so the public record
    gets corrected — an old FAIL predating a fix stays on the books
    forever if re-draws never reach it. ``last_green_round`` drives
    STALENESS ROTATION of the green block: the driver samples only the
    head of the file each round, so without rotation a query last
    proven in r02 can go unrefreshed indefinitely; ordering greens by
    ascending last-green round re-proves the stalest rows first."""
    seen: set[str] = set()
    last: dict[str, tuple[int, bool]] = {}
    last_green: dict[str, int] = {}
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        try:
            rnd = int(Path(f).stem.rsplit("_r", 1)[-1])
            d = json.load(open(f))
        except Exception:  # noqa: BLE001 — malformed artifact is not fatal
            continue
        for name, row in d.get("queries", d).items():
            seen.add(name)
            ok = _is_pass(row) if isinstance(row, dict) else bool(row)
            if name not in last or rnd > last[name][0]:
                last[name] = (rnd, ok)
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    failed = {n for n, (_, ok) in last.items() if not ok}
    return seen, failed, last_green


def main() -> None:
    from etl_sprint_2_5_spark import plans

    plans.load_all()
    seen, failed, last_green = sample_history()
    names = list(plans.REGISTRY)
    never = [n for n in names if n not in seen]
    refail = [n for n in names if n in failed]
    rest = [n for n in names if n in seen and n not in failed]
    # staleness rotation: stalest-proven greens first (registry order
    # breaks ties deterministically via the stable sort)
    rest.sort(key=lambda n: last_green.get(n, 0))
    ordered = never + refail + rest
    out = REPO / "QUERY_ORDER.txt"
    out.write_text("\n".join(ordered) + "\n")
    stale = last_green.get(rest[0], 0) if rest else 0
    print(
        f"wrote {out} ({len(ordered)} names: {len(never)} never-sampled, "
        f"{len(refail)} last-sample-failed, {len(rest)} green "
        f"rotated stalest-first, head last proven r{stale:02d})"
    )


if __name__ == "__main__":
    main()
