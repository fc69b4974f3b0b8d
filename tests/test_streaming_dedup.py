"""Streaming ingest dedup (streaming/dedup.py).

Pins: (1) single-batch result equals the batch GROUP BY md5(text) ->
min(doc_id) (the q137 oracle contract); (2) across micro-batches the
EARLIEST batch containing a key supplies the representative and
re-arrivals are dropped (each key emitted exactly once); (3) a key new
in a later batch is still emitted.
"""

from __future__ import annotations

import os

from ckanext_extractor_spark.streaming.dedup import stream_dedup_documents


def _write_docs(path: str, rows: list[tuple], mtime: float) -> None:
    """rows: (doc_id, text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_single_batch_equals_group_by(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_docs(
        str(src / "a.parquet"),
        [(3, "dup text"), (1, "dup text"), (2, "unique text")],
        mtime=1_000_000,
    )
    out = stream_dedup_documents(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
    )
    got = {r["content_md5"]: r["doc_id"] for r in out.collect()}
    import hashlib

    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got == {h("dup text"): 1, h("unique text"): 2}


def test_earliest_batch_wins_and_no_reemission(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 0 holds doc 5; batch 1 re-delivers the same text as doc 1
    # (smaller id, LATER batch -> must NOT replace) plus a new key
    _write_docs(str(src / "a.parquet"), [(5, "seen early")], 1_000_000)
    _write_docs(
        str(src / "b.parquet"),
        [(1, "seen early"), (7, "new in batch two")],
        1_000_100,
    )
    out = stream_dedup_documents(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    rows = out.collect()
    got = {r["content_md5"]: r["doc_id"] for r in rows}
    import hashlib

    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got == {h("seen early"): 5, h("new in batch two"): 7}
    # exactly one emission per key (the sink keeps every emission)
    assert len(rows) == 2
