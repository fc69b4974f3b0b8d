"""Round-6 optimization: scale-adaptive tokenize-input spread.

The rule (api.ExtractorEngine._tokenize_spread_target) must
  * fire only when the input has fewer partitions than the cluster's
    parallelism (at scale the scan partition count already exceeds
    cores -> no added exchange),
  * size tasks by measured changed-bytes, capped at one even wave,
  * never reduce partitioning,
and a build over a deliberately under-partitioned corpus must produce
byte-identical index tables to the same corpus well-partitioned.
"""

from __future__ import annotations





from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.corpus import corpus_df


class _Probe(ExtractorEngine):
    pass


def _target(changed_bytes, cur, par, task_bytes=256 << 10):
    eng = object.__new__(_Probe)  # no spark needed for the pure rule
    eng.TOKENIZE_TASK_BYTES = task_bytes
    return ExtractorEngine._tokenize_spread_target(
        eng, changed_bytes, cur, par
    )


def test_spread_noop_when_partitions_cover_cores():
    # at-scale shape: scan partitions >= parallelism -> never repartition
    assert _target(100 << 30, 800, 32) is None
    assert _target(1 << 20, 32, 32) is None


def test_spread_scales_with_bytes_and_caps_at_one_wave():
    # 15 MB / 256 KB = 60 tasks, capped at parallelism (one even wave)
    assert _target(15 << 20, 2, 32) == 32
    # small corpus: bytes only justify a few tasks
    assert _target(1 << 20, 1, 32) == 4
    # tiny corpus: target 1 == current -> no-op
    assert _target(10 << 10, 1, 32) is None
    # never shrink: target below current partitioning -> no-op
    assert _target(512 << 10, 8, 32) is None


def test_underpartitioned_build_matches_wellpartitioned(spark, tmp_path):
    corpus = corpus_df(spark, 120).cache()
    corpus.count()
    one_part = corpus.coalesce(1)

    def build(src, root):
        eng = ExtractorEngine(
            spark, str(root), n_buckets=4, salt_threshold=1000
        )
        eng.extract(src, build_id="b1")
        return eng

    # force the spread rule to fire on the tiny fixture
    orig = ExtractorEngine.TOKENIZE_TASK_BYTES
    ExtractorEngine.TOKENIZE_TASK_BYTES = 1 << 10
    try:
        eng_a = build(one_part, tmp_path / "a")
    finally:
        ExtractorEngine.TOKENIZE_TASK_BYTES = orig
    eng_b = build(corpus, tmp_path / "b")

    rows_a = sorted(
        (r["term"], r["n_postings"])
        for r in eng_a._local_segment_rows(None)
    )
    rows_b = sorted(
        (r["term"], r["n_postings"])
        for r in eng_b._local_segment_rows(None)
    )
    assert rows_a == rows_b and rows_a
    assert eng_a.corpus_stats() == eng_b.corpus_stats()
    assert (
        eng_a.search("data value", k=10)
        == eng_b.search("data value", k=10)
    )
