"""Round-5 second self-review pass (code-review findings, each fixed):

1. curate_corpus: group_quota and hash_split drew on the SAME
   md5(id||salt), so quota survivors were exactly the 'test'-labeled
   rows (decorrelation covered in tests/test_curate.py).
2. nb_train keyed per-label totals off the token stream, so a label
   whose docs all tokenize to zero tokens lost its default/dims rows
   and nb_classify's prior-join silently dropped it.
3. streaming sinks appended per epoch (duplicate rows under
   foreachBatch at-least-once replays) — now per-epoch overwrite
   paths (idempotent); replay itself is not reproducible in-process,
   so the pinned contract here is the partitioned layout + read-back.
4. stream_dedup_documents / stateful_user_totals_stream /
   stream_windowed_event_stats raised PATH_NOT_FOUND when the source
   was empty (zero batches -> sink dir never created).
5. nb_train's id_col parameter was dead API surface (removed).
"""

from __future__ import annotations

import inspect
import os
import tempfile

from ckanext_extractor_spark.functions.classify import nb_classify, nb_train


def test_nb_zero_token_label_survives(spark):
    # 'zz' docs tokenize to nothing: it must still train a prior and
    # be predictable for zero-token inputs (prior-only argmax; 'zz'
    # has the majority prior here so it must WIN on empty text).
    df = spark.createDataFrame(
        [(0, "en", "the cat sat"), (1, "zz", "!!! ..."),
         (2, "zz", "???")],
        "doc_id long, lang string, text string",
    )
    model = nb_train(df, dim=64)
    labels = {r["label"] for r in model.where("bucket = -2").collect()}
    assert labels == {"en", "zz"}
    pred = nb_classify(
        spark.createDataFrame([(9, "...")], "doc_id long, text string"),
        model, dim=64,
    ).collect()
    assert pred[0]["pred_label"] == "zz"


def test_nb_train_has_no_id_col_param():
    assert "id_col" not in inspect.signature(nb_train).parameters


def test_stream_dedup_empty_source_returns_empty(spark):
    from ckanext_extractor_spark.streaming.dedup import (
        stream_dedup_documents,
    )

    root = tempfile.mkdtemp(prefix="sdedup_empty_")
    os.mkdir(f"{root}/in")
    out = stream_dedup_documents(
        spark, f"{root}/in", checkpoint_dir=f"{root}/ckpt",
        out_dir=f"{root}/out",
    )
    assert out.count() == 0
    assert out.columns == ["content_md5", "doc_id"]


def test_stateful_totals_empty_source_returns_empty(spark):
    from ckanext_extractor_spark.streaming.windows import (
        stateful_user_totals_stream,
    )

    root = tempfile.mkdtemp(prefix="stotals_empty_")
    os.mkdir(f"{root}/in")
    out = stateful_user_totals_stream(
        spark, f"{root}/in", checkpoint_dir=f"{root}/ckpt",
        out_dir=f"{root}/out",
    )
    assert out.count() == 0
    assert out.columns == ["user_id", "n_events", "sum_value"]


def test_stream_dedup_sink_is_epoch_partitioned(spark):
    # the idempotence fix writes each epoch to its own overwritable
    # directory; pin the layout so a refactor back to append fails
    from ckanext_extractor_spark.streaming.dedup import (
        stream_dedup_documents,
    )

    root = tempfile.mkdtemp(prefix="sdedup_epoch_")
    os.mkdir(f"{root}/in")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha beta"] * 2, pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
            "source": pa.array(["s"] * 2, pa.string()),
            "n_chars": pa.array([10, 10], pa.int64()),
        }),
        f"{root}/in/batch0.parquet",
    )
    out = stream_dedup_documents(
        spark, f"{root}/in", checkpoint_dir=f"{root}/ckpt",
        out_dir=f"{root}/out",
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 0
    assert any(d.startswith("epoch=") for d in os.listdir(f"{root}/out"))
