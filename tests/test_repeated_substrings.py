"""dedup_repeated_substrings (plans/dedup_queries.py): the Lee-et-al
repeated-span operator must match a brute-force Python witness on an
ADVERSARIAL fixture — a hot boilerplate paragraph shared by many
documents (the df-skew case), overlapping spans that must merge in
the coverage union, a within-document-only repeat that must NOT
count (cross-document df >= 2), and sub-K documents with zero spans.
"""

from __future__ import annotations

import re

import pytest

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY

K = 15


def _toks(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if w]


def _brute(docs: dict[int, str]) -> dict[int, tuple]:
    toks = {i: _toks(t) for i, t in docs.items()}
    span_docs: dict[tuple, set] = {}
    for i, tk in toks.items():
        for p in range(max(len(tk) - K + 1, 0)):
            span_docs.setdefault(tuple(tk[p : p + K]), set()).add(i)
    out = {}
    for i, tk in toks.items():
        n = len(tk)
        pos = [
            p
            for p in range(max(n - K + 1, 0))
            if len(span_docs[tuple(tk[p : p + K])]) >= 2
        ]
        covered_set: set[int] = set()
        for p in pos:
            covered_set.update(range(p, p + K))
        covered = len(covered_set)
        ppm = 0 if n == 0 else (covered * 1_000_000) // n
        out[i] = (n, max(n - K + 1, 0), len(pos), covered, ppm)
    return out


@pytest.fixture(scope="module")
def fixture_docs() -> dict[int, str]:
    boiler = " ".join(f"b{j}" for j in range(20))  # 20-token boilerplate
    docs = {}
    # hot key: the same boilerplate inside 30 otherwise-unique docs
    for i in range(30):
        unique = " ".join(f"u{i}x{j}" for j in range(10))
        docs[i] = f"{unique} {boiler} tail{i}"
    # doc that is ONLY boilerplate (coverage == n_tokens)
    docs[100] = boiler
    # two docs sharing TWO disjoint spans -> coverage adds up
    sa = " ".join(f"s{j}" for j in range(K))
    sb = " ".join(f"t{j}" for j in range(K))
    docs[101] = f"{sa} mid101a mid101b {sb}"
    docs[102] = f"{sb} mid102a mid102b {sa}"
    # within-doc-only repeat: K-token run twice in ONE doc, nowhere else
    rep = " ".join(f"r{j}" for j in range(K))
    docs[103] = f"{rep} gap103a gap103b {rep}"
    # shorter than K tokens: zero spans
    docs[104] = "tiny doc with nine tokens only here now end"
    return docs


def test_matches_bruteforce_on_adversarial_fixture(
    spark, tmp_path_factory, fixture_docs
):
    load_all()
    sf_dir = tmp_path_factory.mktemp("subdup")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in sorted(fixture_docs.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(sf_dir / "documents.parquet"))

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans"],
            r["dup_spans"],
            r["covered_tokens"],
            r["dup_ppm"],
        )
        for r in REGISTRY["dedup_repeated_substrings"]
        .fn(spark, str(sf_dir))
        .collect()
    }
    assert got == _brute(fixture_docs)


def test_semantics_spot_checks(spark, tmp_path_factory, fixture_docs):
    want = _brute(fixture_docs)
    # the all-boilerplate doc is fully covered
    n100 = want[100][0]
    assert want[100][3] == n100 and want[100][4] == 1_000_000
    # hot boilerplate: every one of the 30 docs has dup coverage >= 20
    for i in range(30):
        assert want[i][3] >= 20
    # within-doc-only repeats do not count as duplication
    assert want[103] == (2 * K + 2, K + 3, 0, 0, 0)
    # sub-K docs produce no spans
    assert want[104][1] == 0 and want[104][2] == 0
