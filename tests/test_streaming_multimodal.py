"""Structured Streaming == batch equivalence (trigger=availableNow) and
the multimodal mapInPandas plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.operators.multimodal import binary_metadata, extract_features
from bigsdb_spark.streaming.events import (
    read_event_stream,
    run_available_now,
    streaming_tumbling_counts,
)


def test_streaming_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (i, f"2024-01-01 0{i % 10}:00:0{i % 6}", "click" if i % 2 else "view", float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    df.repartition(4).write.parquet(src)

    # one trigger for all files: with per-file triggers the watermark can
    # advance past windows whose rows sit in a later (unordered) file —
    # correct streaming semantics, but not batch-equivalent
    stream = read_event_stream(spark, src, max_files=16)
    agg = streaming_tumbling_counts(stream, "ts", "event_type", "1 hour", "1 hour")
    out = str(tmp_path / "out")
    run_available_now(agg, str(tmp_path / "ckpt"), out)
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(out).collect()
    }

    batch = (
        df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .select(
            F.unix_timestamp("w.start").cast("long").alias("ws"), "event_type", "n", "tv"
        )
    )
    want = {(r.ws, r.event_type): (r.n, r.tv) for r in batch.collect()}
    # append mode only emits FINALIZED windows: window_end <= watermark
    # (= max event time - 1h); the trailing windows stay in state.
    max_ts = df.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    finalized = {k: v for k, v in want.items() if k[0] + 3600 <= max_ts - 3600}
    assert got == finalized and len(got) > 0


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer")], "doc_id long, payload binary"
    )
    meta = {r.doc_id: r.n_bytes for r in binary_metadata(df, "doc_id", "payload").collect()}
    assert meta == {1: 11, 2: 18}

    feats = {r.doc_id: r for r in extract_features(df, "doc_id", "payload").collect()}
    assert feats[1].n_bytes == 11
    assert len(feats[1].features) == 8
    assert all(0 <= v <= 1 for v in feats[1].features)
    # deterministic stub: same payload -> same features
    again = {r.doc_id: r for r in extract_features(df, "doc_id", "payload").collect()}
    assert feats[1].features == again[1].features


def test_multimodal_decoder_dispatch(monkeypatch):
    """codec='stub' always returns the deterministic stub; 'pil'
    requires the real codec; 'auto' falls back to the stub when PIL is
    missing and picks the real decoder when importable."""
    import sys
    import types

    import pytest

    from bigsdb_spark.operators import multimodal as mm

    assert mm.pick_decoder("stub") is mm._decode_stub
    with pytest.raises(ValueError):
        mm.pick_decoder("webp")

    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        # no PIL installed: auto -> stub, pil -> ImportError
        assert mm.pick_decoder("auto") is mm._decode_stub
        with pytest.raises(ImportError):
            mm.pick_decoder("pil")
    # fake PIL module -> auto and pil pick the real decoder
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.ModuleType("PIL.Image")
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)
    assert mm.pick_decoder("auto") is mm._decode_pil
    assert mm.pick_decoder("pil") is mm._decode_pil
    assert mm.pick_decoder("stub") is mm._decode_stub


def test_sample_frames_shape_and_determinism(spark):
    from bigsdb_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"0123456789abcdef")), (2, bytearray(b"xy"))],
        "doc_id long, payload binary",
    )
    a = sample_frames(df, "doc_id", "payload", n_frames=4).collect()
    b = sample_frames(df, "doc_id", "payload", n_frames=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    assert len(a) == 8  # 4 frames per doc, short payloads included
    by_doc = {}
    for r in a:
        by_doc.setdefault(r["doc_id"], []).append(r)
    fr = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in fr] == [0, 1, 2, 3]
    assert [round(r["t_frac"], 2) for r in fr] == [0.0, 0.25, 0.5, 0.75]
    assert all(len(r["features"]) == 8 for r in fr)
    # distinct slices -> distinct features (stub decodes the slice)
    assert fr[0]["features"] != fr[1]["features"]


def test_resize_images_plumbing(spark):
    from bigsdb_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"imagebytes"))], "doc_id long, payload binary"
    )
    r224 = resize_images(df, "doc_id", "payload", 224, 224).collect()[0]
    r64 = resize_images(df, "doc_id", "payload", 64, 64).collect()[0]
    assert (r224["width"], r224["height"]) == (224, 224)
    # target size participates in the deterministic stub features
    assert r224["features"] != r64["features"]
