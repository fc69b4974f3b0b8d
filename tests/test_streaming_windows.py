"""Structured-Streaming windows + stateful operator (streaming/windows.py).

Pins: (1) the streaming complete-mode tumbling aggregate equals the batch
plan (same Catalyst expression both ways); (2) append mode drops
late-beyond-watermark rows and never emits still-open windows; (3)
session_window gap-merge semantics coalesce touching sessions and break
only at ts - prev > gap (matching the q133 lag/cumsum oracle); (4) applyInPandasWithState carries
state across micro-batches and its latest emission per key equals the
batch GROUP BY.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ckanext_extractor_spark.streaming.windows import (
    EVENTS_SCHEMA,
    session_event_stats,
    stateful_user_totals_stream,
    stream_windowed_event_stats,
    windowed_event_stats,
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m, 0)


def _write_events(path: str, rows: list[tuple], mtime: float) -> None:
    """rows: (event_id, ts, user_id, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    pq.write_table(table, path)
    # file-source batch order follows modification time: pin it
    os.utime(path, (mtime, mtime))


def test_stream_complete_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        str(src / "a.parquet"),
        [
            (0, _ts(0, 10), 1, "view", 1.5),
            (1, _ts(0, 40), 1, "view", 2.5),
            (2, _ts(1, 5), 2, "buy", 10.0),
        ],
        mtime=1_000_000,
    )
    _write_events(
        str(src / "b.parquet"),
        [
            (3, _ts(1, 30), 1, "buy", 4.0),
            (4, _ts(3, 0), 2, "view", 0.5),
        ],
        mtime=1_000_100,
    )
    streamed = stream_windowed_event_stats(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
        window="1 hour",
        watermark="1 hour",
        mode="complete",
        max_files_per_trigger=1,
    )
    batch = windowed_event_stats(
        spark.read.schema(EVENTS_SCHEMA).parquet(str(src)), window="1 hour"
    )
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    # (h0, view) x2 events, (h1, buy) x2 events, (h3, view)
    assert len(got) == 3


def test_append_mode_watermark_semantics(spark, tmp_path):
    # Spark commits the watermark at END of batch N and applies it to
    # late-data filtering from batch N+1 on — so the late row arrives
    # two batches after the data that advanced the watermark past it.
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: hours 0,1,2 -> watermark committed after batch = 01:10
    _write_events(
        str(src / "a.parquet"),
        [
            (0, _ts(0, 10), 1, "view", 1.0),
            (1, _ts(1, 10), 1, "view", 1.0),
            (2, _ts(2, 10), 1, "view", 1.0),
        ],
        mtime=1_000_000,
    )
    # batch 1: advances the committed watermark to 03:00
    _write_events(
        str(src / "b.parquet"),
        [(3, _ts(4, 0), 1, "view", 1.0)],
        mtime=1_000_100,
    )
    # batch 2: one LATE row in hour 0 (00:05 < watermark 03:00: dropped)
    # and one row at 06:00 whose window stays open at drain time
    _write_events(
        str(src / "c.parquet"),
        [
            (4, _ts(0, 5), 1, "view", 100.0),
            (5, _ts(6, 0), 1, "view", 1.0),
        ],
        mtime=1_000_200,
    )
    out = stream_windowed_event_stats(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
        window="1 hour",
        watermark="1 hour",
        mode="append",
        max_files_per_trigger=1,
    )
    rows = {r["win_start_us"]: r for r in out.collect()}

    def us(hh: int) -> int:
        return int(_ts(hh).timestamp()) * 1_000_000

    # finalized windows (end <= final watermark 05:00): hours 0,1,2,4
    assert set(rows) == {us(0), us(1), us(2), us(4)}
    # the late 100.0 row was dropped: hour 0 kept exactly one event
    assert rows[us(0)]["n_events"] == 1
    assert rows[us(0)]["sum_value"] == 1.0
    # the 06:00 window is still open when the bounded input drains
    assert us(6) not in rows


def test_session_window_gap_semantics(spark):
    # user 1: 00:00, 00:10 merge; 00:40 is EXACTLY prev(00:10)+30min
    # -> touching sessions COALESCE (Spark merges while ts <= prev+gap;
    # empirically pinned — the q133 oracle breaks on ts - prev > gap);
    # 01:10:01 is one second PAST 00:40+30min -> new session.
    rows = [
        (0, _ts(0, 0), 1, "view", 1.0),
        (1, _ts(0, 10), 1, "view", 2.0),
        (2, _ts(0, 40), 1, "view", 4.0),
        (3, dt.datetime(2024, 3, 1, 1, 10, 1), 1, "view", 16.0),
        (4, _ts(0, 0), 2, "buy", 8.0),
    ]
    import pandas as pd

    events = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).assign(props="{}"),
        schema=EVENTS_SCHEMA,
    )
    got = {
        (r["user_id"], r["session_start_us"]): r
        for r in session_event_stats(events, gap="30 minutes").collect()
    }

    def us(h: int, m: int = 0, s: int = 0) -> int:
        return int(dt.datetime(2024, 3, 1, h, m, s).timestamp()) * 1_000_000

    gap = 30 * 60 * 1_000_000
    assert set(got) == {(1, us(0, 0)), (1, us(1, 10, 1)), (2, us(0, 0))}
    s1 = got[(1, us(0, 0))]
    assert s1["n_events"] == 3 and s1["sum_value"] == 7.0
    assert s1["session_end_us"] == us(0, 40) + gap
    s2 = got[(1, us(1, 10, 1))]
    assert s2["n_events"] == 1 and s2["sum_value"] == 16.0
    assert s2["session_end_us"] == us(1, 10, 1) + gap


def test_stateful_totals_carry_state_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        str(src / "a.parquet"),
        [
            (0, _ts(0), 1, "view", 1.0),
            (1, _ts(0, 5), 1, "view", 2.0),
            (2, _ts(0, 6), 2, "buy", 10.0),
        ],
        mtime=1_000_000,
    )
    _write_events(
        str(src / "b.parquet"),
        [(3, _ts(1), 1, "buy", 4.0)],
        mtime=1_000_100,
    )
    final = stateful_user_totals_stream(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in final.collect()}
    # user 1 spans both micro-batches: state carried (1+2)+4
    assert got == {1: (3, 7.0), 2: (1, 10.0)}
    # the raw sink proves TWO micro-batches ran and user 1 was
    # re-emitted with refreshed state in the second
    raw = spark.read.parquet(str(tmp_path / "out"))
    epochs = {r["epoch"] for r in raw.select("epoch").distinct().collect()}
    assert len(epochs) == 2
    u1 = sorted(
        (r["epoch"], r["n_events"], r["sum_value"])
        for r in raw.where("user_id = 1").collect()
    )
    assert [x[1:] for x in u1] == [(2, 3.0), (3, 7.0)]


@pytest.mark.parametrize("bad", ["upsert", "update"])
def test_stream_windowed_rejects_bad_mode(spark, tmp_path, bad):
    with pytest.raises(ValueError, match="mode"):
        stream_windowed_event_stats(
            spark, str(tmp_path), str(tmp_path / "c"), str(tmp_path / "o"),
            mode=bad,
        )
