"""Training-pipeline hygiene operators: repetition stats (Gopher),
benchmark decontamination (n-gram overlap), PII scrub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.decontam import (
    contamination,
    decontaminate,
    ngram_set,
)
from ckanext_extractor_spark.functions.pii import (
    PII_PATTERNS,
    pii_scrub,
    pii_stats,
)
from ckanext_extractor_spark.functions.textstats import repetition_stats


# ---------------------------------------------------------------- repetition


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_uniform_doc(spark):
    out = repetition_stats(
        _docs(spark, [(1, "a a a a")])
    ).collect()[0]
    assert out["n_tokens"] == 4
    assert out["n_distinct_tokens"] == 1
    assert out["top_token_frac"] == 1.0
    assert out["top_bigram_frac"] == 1.0  # "a a" x3 / 3
    assert out["dup_token_frac"] == 0.75


def test_repetition_all_distinct(spark):
    out = repetition_stats(
        _docs(spark, [(1, "w x y z")])
    ).collect()[0]
    assert out["top_token_frac"] == 0.25
    assert out["dup_token_frac"] == 0.0
    # every bigram unique: 1/3
    assert out["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_repetition_empty_and_single(spark):
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(spark, [(1, ""), (2, "only"), (3, "...")])
        ).collect()
    }
    assert len(rows) == 3
    for did in (1, 3):
        assert rows[did]["n_tokens"] == 0
        assert rows[did]["top_token_frac"] == 0.0
        assert rows[did]["top_bigram_frac"] == 0.0
    assert rows[2]["n_tokens"] == 1
    assert rows[2]["top_token_frac"] == 1.0
    assert rows[2]["top_bigram_frac"] == 0.0  # no bigrams in 1 token


def test_repetition_gopher_boilerplate_ranks_worst(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(
                spark,
                [
                    (1, "click here click here click here click here"),
                    (2, "the quick brown fox jumps over a lazy dog"),
                ],
            )
        ).collect()
    }
    assert out[1]["top_bigram_frac"] > out[2]["top_bigram_frac"]
    assert out[1]["dup_token_frac"] > out[2]["dup_token_frac"]


# ------------------------------------------------------------- decontaminate


def test_ngram_set_counts_and_short_docs(spark):
    g = ngram_set(_docs(spark, [(1, "a b c d"), (2, "a b")]), n=3)
    rows = g.collect()
    # doc 1: "a b c", "b c d"; doc 2 too short
    assert sorted(r["doc_id"] for r in rows) == [1, 1]
    assert len({r["gram_hash"] for r in rows}) == 2


def test_contamination_flags_exact_overlap(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "completely different words here"),
            (3, "beta gamma delta epsilon"),
        ],
    )
    bench = _docs(spark, [(99, "x alpha beta gamma y")])
    rep = {r["doc_id"]: r["n_shared_grams"]
           for r in contamination(docs, bench, n=3).collect()}
    # doc 1 shares "alpha beta gamma"; docs 2, 3 share nothing (3-grams)
    assert rep == {1: 1}
    clean = decontaminate(docs, bench, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_contamination_repeated_gram_counts_once_per_doc(spark):
    docs = _docs(spark, [(1, "p q r s p q r")])  # "p q r" occurs twice
    bench = _docs(spark, [(9, "p q r")])
    rep = contamination(docs, bench, n=3).collect()
    assert [(r["doc_id"], r["n_shared_grams"]) for r in rep] == [(1, 1)]


def test_contamination_shuffle_join_parity(spark):
    docs = _docs(
        spark,
        [(i, f"tok{i} shared middle part tok{i + 1}") for i in range(20)],
    )
    bench = _docs(spark, [(99, "shared middle part")])
    a = sorted(
        (r["doc_id"], r["n_shared_grams"])
        for r in contamination(docs, bench, n=3).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_shared_grams"])
        for r in contamination(
            docs, bench, n=3, broadcast_bench=False
        ).collect()
    )
    assert a == b and len(a) == 20


def test_ngram_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        ngram_set(_docs(spark, [(1, "a b")]), n=0)


# ---------------------------------------------------------------------- pii


def test_pii_stats_counts(spark):
    df = _docs(
        spark,
        [
            (1, "reach me at a.user@corp.example.com or 10.1.2.3 ref 123456789"),
            (2, "no pii here"),
        ],
    )
    rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert rows[1]["n_email"] == 1
    assert rows[1]["n_ipv4"] == 1
    assert rows[1]["n_digit_run"] == 1
    assert rows[1]["n_pii"] == 3
    assert rows[2]["n_pii"] == 0


def test_pii_scrub_replaces_all_classes(spark):
    df = _docs(
        spark,
        [(1, "a@b.io and c@d.org via 192.168.0.1 acct 9999999999")],
    )
    out = pii_scrub(df).collect()[0]["text"]
    assert out == "<EMAIL> and <EMAIL> via <IP> acct <NUM>"


def test_pii_scrub_preserves_clean_text_and_out_col(spark):
    df = _docs(spark, [(1, "port 8080 at 1.2 level v1.2.3.4x")])
    row = pii_scrub(df, out_col="clean").collect()[0]
    # short digit runs, 2-part dotted, non-boundary dotted quad: untouched
    assert row["clean"] == row["text"]


def test_pii_email_not_rematched_as_digit_run(spark):
    # host digits inside an email must be consumed by the email pass
    df = _docs(spark, [(1, "x 123456789@example.com y")])
    row = pii_scrub(df).collect()[0]
    assert row["text"] == "x <EMAIL> y"
    stats = pii_stats(df).collect()[0]
    assert stats["n_email"] == 1


def test_pii_patterns_are_re2_safe():
    # oracle portability: no backreferences / lookaround in any pattern
    for _name, pat, _tag in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat


# ---------------------------------------------------- boilerplate removal


def test_boilerplate_drops_cross_doc_segments(spark):
    from ckanext_extractor_spark.functions.chunking import (
        remove_repeated_segments,
    )

    # 4-token segments; "COPYRIGHT footer legal text" appears in docs
    # 0 and 1 at a segment boundary -> dropped from both. Doc 2 has a
    # unique body only; doc 3 is empty.
    rows = [
        (0, "alpha beta gamma delta COPYRIGHT footer legal text"),
        (1, "one two three four COPYRIGHT footer legal text"),
        (2, "unique body here now"),
        (3, "   "),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_repeated_segments(
            _docs(spark, rows), size=4, min_docs=2
        ).collect()
    }
    assert out[0]["clean_text"] == "alpha beta gamma delta"
    assert out[0]["n_segments"] == 2
    assert out[0]["n_dropped_segments"] == 1
    assert out[1]["clean_text"] == "one two three four"
    assert out[1]["n_dropped_segments"] == 1
    # unique content untouched
    assert out[2]["clean_text"] == "unique body here now"
    assert out[2]["n_dropped_segments"] == 0
    # zero-token doc passes through with empty text and zero counts
    assert out[3]["clean_text"] == ""
    assert out[3]["n_segments"] == 0


def test_boilerplate_min_docs_threshold(spark):
    from ckanext_extractor_spark.functions.chunking import (
        remove_repeated_segments,
    )

    rows = [
        (0, "shared block text"),
        (1, "shared block text"),
        (2, "shared block text"),
    ]
    # min_docs=4 -> nothing hot enough, everything kept
    kept = remove_repeated_segments(
        _docs(spark, rows), size=3, min_docs=4
    ).collect()
    assert all(r["n_dropped_segments"] == 0 for r in kept)
    # min_docs=2 -> all three drop the shared segment
    dropped = remove_repeated_segments(
        _docs(spark, rows), size=3, min_docs=2
    ).collect()
    assert all(r["clean_text"] == "" for r in dropped)
    assert all(r["n_dropped_segments"] == 1 for r in dropped)


def test_boilerplate_all_docs_present_and_validation(spark):
    from ckanext_extractor_spark.functions.chunking import (
        remove_repeated_segments,
    )

    rows = [(0, "a b"), (1, "")]
    df = _docs(spark, rows)
    out = remove_repeated_segments(df, size=8, min_docs=2)
    assert out.count() == 2  # left join keeps chunkless docs
    for bad in (1, 0, -3, True, "2"):
        with pytest.raises(ValueError):
            remove_repeated_segments(df, min_docs=bad)


# ---------------------------------------------------- token estimates


def test_token_count_estimates(spark):
    from ckanext_extractor_spark.functions.textstats import (
        token_count_estimates,
    )

    rows = [
        (0, "Hello, world! x2"),
        (1, "   "),
        (2, "abc123def"),
    ]
    out = {
        r["doc_id"]: r
        for r in token_count_estimates(_docs(spark, rows)).collect()
    }
    # "Hello, world! x2" -> ws tokens: Hello, world! x2 = 3
    # pieces: hello / , / world / ! / x / 2 = 6
    assert out[0]["n_ws_tokens"] == 3
    assert out[0]["n_bpe_pieces"] == 6
    assert out[0]["chars_per_piece"] == round(16 / 6, 6)
    # whitespace-only doc: 0 tokens, 0 pieces, ratio pinned to 0
    assert out[1]["n_ws_tokens"] == 0
    assert out[1]["n_bpe_pieces"] == 0
    assert out[1]["chars_per_piece"] == 0.0
    # letter/digit runs split: abc / 123 / def
    assert out[2]["n_bpe_pieces"] == 3
