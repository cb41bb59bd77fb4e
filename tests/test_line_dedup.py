"""line_dedup_clean (plans/dedup_queries.py): the C4-style rewriting
dedup must implement the keep-global-first-occurrence policy exactly
on a crafted corpus — cross-document duplicates dropped everywhere
but their first (doc_id, seg_no) slot, WITHIN-document repeats also
collapsed to the first slot, unique segments untouched, and the
rebuilt text (md5-verified by the oracle at sf0.01) reconstructable
by an independent Python witness."""

from __future__ import annotations

import hashlib
import re

import pytest

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY

SEG = 10


def _toks(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if w]


def _witness(docs: dict[int, str]) -> dict[int, tuple]:
    """Independent reimplementation of the keep-first policy."""
    segs: dict[int, list[list[str]]] = {
        i: [
            _toks(t)[p : p + SEG]
            for p in range(0, len(_toks(t)), SEG)
        ]
        for i, t in docs.items()
    }
    first: dict[tuple, tuple] = {}
    for i in sorted(segs):
        for no, s in enumerate(segs[i]):
            first.setdefault(tuple(s), (i, no))
    out = {}
    for i in sorted(segs):
        kept = [
            s
            for no, s in enumerate(segs[i])
            if first[tuple(s)] == (i, no)
        ]
        n_tokens = sum(len(s) for s in segs[i])
        kept_tokens = sum(len(s) for s in kept)
        clean = " ".join(" ".join(s) for s in kept)
        out[i] = (
            n_tokens,
            len(segs[i]),
            len(segs[i]) - len(kept),
            1_000_000 if n_tokens == 0 else kept_tokens * 1_000_000 // n_tokens,
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


def _seg_text(prefix: str) -> str:
    return " ".join(f"{prefix}{j}" for j in range(SEG))


@pytest.fixture(scope="module")
def fixture_docs() -> dict[int, str]:
    a, b, c, d = (_seg_text(p) for p in "abcd")
    docs = {
        0: f"{a} {b}",        # both first occurrences -> kept whole
        1: f"{a} {c}",        # a dropped (doc 0 owns it), c kept
        2: f"{b} {c}",        # both dropped -> empty rewrite
        3: f"{d} {d}",        # within-doc repeat -> second dropped
        4: "lonely short tail",  # sub-SEG unique segment, kept
    }
    # hot segment: shared by 20 more docs, each with a unique tail seg
    for i in range(10, 30):
        docs[i] = f"{a} {_seg_text(f'u{i}x')}"
    return docs


def test_matches_witness_on_adversarial_fixture(
    spark, tmp_path_factory, fixture_docs
):
    load_all()
    sf_dir = tmp_path_factory.mktemp("linededup")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in sorted(fixture_docs.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(sf_dir / "documents.parquet"))

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_segs"],
            r["dropped_segs"],
            r["kept_ppm"],
            r["clean_md5"],
        )
        for r in REGISTRY["line_dedup_clean"].fn(spark, str(sf_dir)).collect()
    }
    assert got == _witness(fixture_docs)


def test_policy_spot_checks(fixture_docs):
    want = _witness(fixture_docs)
    empty_md5 = hashlib.md5(b"").hexdigest()
    # doc 0 keeps everything; doc 2 is rewritten to the empty string
    assert want[0][2] == 0 and want[0][3] == 1_000_000
    assert want[2][2] == 2 and want[2][3] == 0 and want[2][4] == empty_md5
    # within-doc repeat: exactly one copy survives
    assert want[3][2] == 1 and want[3][3] == 500_000
    # hot segment: every one of the 20 sharers loses exactly it
    for i in range(10, 30):
        assert want[i][2] == 1
    # the unique short doc is untouched
    assert want[4][2] == 0 and want[4][3] == 1_000_000
