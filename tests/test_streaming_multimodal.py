"""Structured Streaming ingest + multimodal plumbing tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CFG
from libchunk_spark.fixtures import corpus_to_spark, generate_corpus
from libchunk_spark.operators.multimodal import (
    encode_fake_media,
    extract_features,
    media_keys,
    resize_images,
    sample_frames,
)
from libchunk_spark.streaming.ingest import start_ingest


def test_streaming_ingest_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "chunk_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = generate_corpus(n_files=40, seed=9)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    # batch 1: first half; batch 2: second half + exact re-sends of first
    df.where("file_id < 20").coalesce(1).write.mode("overwrite").parquet(
        f"{src}/b1"
    )
    q = start_ingest(spark, f"{src}/*", idx, ckpt, CFG.chunk)
    q.awaitTermination(120)
    n1 = spark.read.parquet(idx).count()
    assert n1 > 0

    df.withColumn("file_id", F.col("file_id") + 1000).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b2")
    q = start_ingest(spark, f"{src}/*", idx, ckpt, CFG.chunk)
    q.awaitTermination(120)
    idx_df = spark.read.parquet(idx)
    n2 = idx_df.count()
    # second batch includes all first-batch contents again (re-sent under new
    # file_ids) -> those chunk keys must NOT be re-appended
    assert n2 > n1
    assert idx_df.count() == idx_df.select("k").distinct().count()


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a chronologically split
    replay must equal the batch lag+running-sum answer (q_event_sessions)."""
    from libchunk_spark.queries import q_event_sessions
    from libchunk_spark.streaming.sessionize import (
        latest_sessions,
        sessionize_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "replay")
    os.makedirs(src)
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .orderBy("ts")
        .toPandas()
    )
    n = len(events)
    assert n > 100
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        events.iloc[cuts[i] : cuts[i + 1]].to_parquet(
            f"{src}/{i:03d}.parquet",
            index=False,
            coerce_timestamps="us",  # Spark reads TIMESTAMP(MICROS), not raw ns INT64
            allow_truncated_timestamps=True,
        )

    out = str(tmp_path / "sessions")
    q = sessionize_stream(spark, src, str(tmp_path / "ckpt"), out)
    q.awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in latest_sessions(spark, out)
        .select("user_id", "session_idx", "n_events", "first_event")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in q_event_sessions(spark, sf_dir)
        .select(
            "user_id",
            F.col("session_idx").cast("long"),
            "n_events",
            "first_event",
        )
        .collect()
    )
    assert got == want


def test_streaming_incremental_clustering_matches_batch(spark, tmp_path):
    """Streaming cluster maintenance: replaying the corpus in three
    micro-batches and folding each batch's delta edges into the persistent
    assignment must end at exactly the batch connected-components answer
    over the full corpus's band-sharing pairs."""
    from libchunk_spark.operators.components import connected_components
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.streaming.ingest import start_incremental_clustering

    src = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    os.makedirs(src)
    rows = generate_corpus(n_files=60, seed=21)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    # NON-contiguous thirds so near-dup families straddle batches
    for i in range(3):
        df.where(f"file_id % 3 = {i}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{i:03d}.batch")
    q = start_incremental_clustering(
        spark, f"{src}/*", str(tmp_path / "ckpt"), state, CFG
    )
    assert q.awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{state}/components").collect()
    )
    bands = sign(df, CFG).select(
        "file_id", F.posexplode("bands").alias("band", "band_hash")
    )
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(r, ["band", "band_hash"])
        .where(F.col("l.file_id") < F.col("r.file_id"))
        .select(F.col("l.file_id").alias("a"), F.col("r.file_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    want = sorted(
        tuple(r)
        for r in connected_components(
            pairs, all_nodes=df.select("file_id")
        ).collect()
    )
    assert got == want
    # the signature index accumulated every file exactly once
    assert spark.read.parquet(f"{state}/signatures").count() == 60


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, mod, encode_fake_media(mod, 32, 16, seed=i % 7, n_frames=4 if mod == "vid" else 1),
         ("fake", 32, 16, 1000))
        for i, mod in enumerate(["img", "img", "vid", "aud", "img", "vid"])
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, modality string, media binary, "
        "meta struct<format:string, width:int, height:int, duration_ms:int>",
    ).cache()


def test_media_exact_dedup_keys(media):
    keys = media_keys(media)
    assert keys.count() == 6
    # seeds repeat (i % 7 over 6 rows -> all distinct seeds) but two img rows
    # with same seed+dims would collide; verify key determinism instead
    k0 = keys.where("media_id = 0").first()["k"]
    assert len(k0) == 64


def test_extract_features_shapes(media):
    feats = extract_features(media).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["width"] == 32 and r["height"] == 16
        assert len(r["intensity_hist"]) == 8
        assert 0 <= r["mean_intensity"] <= 255
        assert r["n_frames"] == (4 if r["modality"] == "vid" else 1)


def test_resize_and_frame_sample(media):
    resized = resize_images(media, 8, 4).collect()
    assert all(len(r["resized"]) == 32 for r in resized)
    frames = sample_frames(media.where("modality = 'vid'"), every_n=2)
    got = frames.collect()
    # 2 videos x frames {0, 2}
    assert sorted((r["media_id"], r["frame_no"]) for r in got) == [
        (2, 0), (2, 2), (5, 0), (5, 2),
    ]


def test_real_codec_raises_not_implemented(spark):
    df = spark.createDataFrame(
        [(1, "img", b"\x89PNG\r\n...", None)],
        "media_id long, modality string, media binary, "
        "meta struct<format:string, width:int, height:int, duration_ms:int>",
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKE|stub"):
        extract_features(df).collect()


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """Structured Streaming tumbling-window agg (watermark + availableNow)
    must equal the batch q_event_window_stats on the same data."""
    import shutil

    from libchunk_spark.queries import q_event_window_stats
    from libchunk_spark.streaming.ingest import windowed_event_stats_stream

    sf = "/root/testdata/sf0.01"
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy(f"{sf}/events.parquet", f"{src}/events.parquet")
    out = str(tmp_path / "out")
    q = windowed_event_stats_stream(spark, src, str(tmp_path / "ck"), out)
    q.awaitTermination(180)
    got = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_event_window_stats(spark, sf).collect()
    }
    # append mode only emits windows the watermark has closed: the final
    # windows (within watermark horizon of max event time) are withheld
    max_bucket = max(b for b, _ in want)
    for k, v in got.items():
        assert want[k] == v  # every emitted window matches the batch truth
    missing = set(want) - set(got)
    assert all(b >= max_bucket - 3 for b, _ in missing), missing
    closed = {k: v for k, v in want.items() if k[0] < max_bucket - 3}
    assert set(closed) <= set(got)


def test_stateful_sessionization_out_of_order_within_lateness(spark, tmp_path):
    """VERDICT r02 item 6: a replay shuffled arbitrarily within the lateness
    window (events displaced up to 300 s across micro-batch boundaries,
    arbitrary order inside each batch) must still equal the batch answer —
    the reorder buffer holds events until the watermark passes them."""
    import numpy as np

    from libchunk_spark.queries import q_event_sessions
    from libchunk_spark.streaming.sessionize import (
        latest_sessions,
        sessionize_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "replay")
    os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    rng = np.random.default_rng(17)
    epochs = events["ts"].astype("int64") // 10**9
    # ~8 micro-batches (state-store batches cost seconds each); safety needs
    # jitter < slice_sec and lateness >= 2*slice_sec
    slice_sec = max(int((epochs.max() - epochs.min()) // 8), 60)
    lateness = 2 * slice_sec
    perturbed = epochs + rng.integers(0, slice_sec, len(events))
    events = events.assign(_slice=(perturbed // slice_sec))
    n_files = 0
    for i, (_, grp) in enumerate(sorted(events.groupby("_slice"))):
        grp = grp.sample(frac=1, random_state=i)  # shuffle inside the batch
        grp.drop(columns="_slice").to_parquet(
            f"{src}/{i:05d}.parquet", index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        n_files += 1
    assert n_files > 3, "replay must span several micro-batches"
    # final watermark heartbeats (event_id < 0): drain every user's buffer
    import pandas as pd

    hb_ts = events["ts"].max() + pd.Timedelta(seconds=lateness + 1)
    hb = pd.DataFrame(
        {
            "event_id": -1 - np.arange(events["user_id"].nunique()),
            "ts": hb_ts,
            "user_id": sorted(events["user_id"].unique()),
            "event_type": "hb",
            "value": 0.0,
            "props": "",
        }
    )
    hb.to_parquet(
        f"{src}/{n_files:05d}_hb.parquet", index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )

    out = str(tmp_path / "sessions")
    q = sessionize_stream(
        spark, src, str(tmp_path / "ckpt"), out, lateness_sec=lateness
    )
    assert q.awaitTermination(420), "stream did not drain in time"

    got = sorted(
        tuple(r)
        for r in latest_sessions(spark, out)
        .select("user_id", "session_idx", "n_events", "first_event")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in q_event_sessions(spark, sf_dir)
        .select(
            "user_id",
            F.col("session_idx").cast("long"),
            "n_events",
            "first_event",
        )
        .collect()
    )
    assert got == want


def test_sessionization_idle_timeout_evicts_and_finalizes(spark, tmp_path):
    """VERDICT r03 missing #4: with idle_timeout_sec set, a user idle past
    the timeout has their buffered events finalized + emitted (no per-user
    heartbeat needed) and their state evicted, driven by other users'
    watermark progress."""
    import pandas as pd

    from libchunk_spark.streaming.sessionize import (
        latest_sessions,
        sessionize_stream,
    )

    e0 = 1_700_000_000
    src = str(tmp_path / "replay")
    os.makedirs(src)

    def write(fname, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).assign(ts=lambda d: pd.to_datetime(d["ts"], unit="s")).to_parquet(
            f"{src}/{fname}", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    # user 1: two sessions — [e0, e0+100] and [e0+2500]; the last event sits
    # inside the lateness window of user 1's own high-water mark, so without
    # a heartbeat it would stay buffered forever under NoTimeout
    write("000.parquet", [
        (10, e0, 1, "a", 0.0, ""),
        (11, e0 + 100, 1, "a", 0.0, ""),
        (12, e0 + 2500, 1, "a", 0.0, ""),
        (20, e0 + 2500, 2, "a", 0.0, ""),
    ])
    # user 2 keeps going — their progress advances the GLOBAL watermark
    write("001.parquet", [(21, e0 + 3 * 3600, 2, "a", 0.0, "")])
    # one more batch so the advanced watermark fires user 1's timeout
    write("002.parquet", [(22, e0 + 4 * 3600, 2, "a", 0.0, "")])

    out = str(tmp_path / "sessions")
    q = sessionize_stream(
        spark, src, str(tmp_path / "ckpt"), out,
        lateness_sec=600, idle_timeout_sec=3600,
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["first_event"])
        for r in latest_sessions(spark, out).collect()
    }
    # user 1 fully finalized via eviction: session 0 = 2 events, session 1 = 1
    assert got[(1, 0)] == (2, 10)
    assert got[(1, 1)] == (1, 12)
    # user 2 is still ACTIVE at stream end: finalized sessions present, the
    # last event still buffered (their own idle timeout never fired)
    assert got[(2, 0)] == (1, 20)
    assert got[(2, 1)] == (1, 21)
    assert (2, 2) not in got


def test_sessionization_beyond_lateness_fails_loudly(spark, tmp_path):
    """An event older than an already-finalized epoch must raise (naming the
    lateness contract) instead of silently corrupting emitted sessions."""
    import pandas as pd

    from libchunk_spark.streaming.sessionize import sessionize_stream

    src = str(tmp_path / "replay")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")

    def mk(path, rows):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [base + pd.Timedelta(seconds=r[1]) for r in rows],
                "user_id": [1] * len(rows),
                "event_type": "e",
                "value": 0.0,
                "props": "",
            }
        ).to_parquet(path, index=False, coerce_timestamps="us",
                     allow_truncated_timestamps=True)

    mk(f"{src}/000.parquet", [(1, 0), (2, 100)])
    mk(f"{src}/001.parquet", [(3, 50)])  # regresses behind finalized epoch 100
    with pytest.raises(Exception, match="late beyond|lateness contract"):
        q = sessionize_stream(
            spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"),
            lateness_sec=0,
        )
        q.awaitTermination(120)
        raise AssertionError("stream finished without the loud failure")


def test_streaming_neardup_flags(spark, tmp_path):
    """Stream-static LSH matching: new files streamed against a signed index
    must flag exactly the pairs the batch band-join finds (same cap)."""
    from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CFG
    from libchunk_spark.fixtures import corpus_to_spark, generate_corpus
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.streaming.ingest import start_neardup_flagging

    rows = generate_corpus(n_files=80, seed=21)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    ).cache()
    indexed = df.where("file_id < 40")
    incoming = df.where("file_id >= 40")

    sig_path = str(tmp_path / "sigs")
    sign(indexed, CFG).write.parquet(sig_path)
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    incoming.where("file_id < 60").coalesce(1).write.parquet(f"{src}/b1")
    incoming.where("file_id >= 60").coalesce(1).write.parquet(f"{src}/b2")

    out = str(tmp_path / "flags")
    q = start_neardup_flagging(
        spark, f"{src}/*", sig_path, str(tmp_path / "ckpt"), out, CFG
    )
    assert q.awaitTermination(180)
    got = {
        (r["file_id"], r["matched_file_id"])
        for r in spark.read.parquet(out).collect()
    }

    # batch twin: distinct band collisions between incoming and indexed
    nb = sign(incoming, CFG).select(
        "file_id", F.posexplode("bands").alias("band", "band_hash")
    )
    ib = spark.read.parquet(sig_path).select(
        F.col("file_id").alias("matched_file_id"),
        F.posexplode("bands").alias("band", "band_hash"),
    )
    want = {
        (r["file_id"], r["matched_file_id"])
        for r in nb.join(ib, ["band", "band_hash"])
        .select("file_id", "matched_file_id")
        .distinct()
        .collect()
    }
    assert got == want
    assert want, "fixture must produce cross-partition near-dups"


def test_ingest_anti_join_not_forced_broadcast(spark):
    """VERDICT r04 wrong #1: the streaming index probe must not FORCE a
    broadcast of the chunk-index side. With the broadcast threshold
    disabled (what 'index too big to broadcast' looks like to the planner),
    the anti-join plan must contain no broadcast at all — the old
    F.broadcast(existing) hint produced one regardless of size."""
    import hashlib

    from libchunk_spark.streaming.ingest import _index_anti_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        keys = [hashlib.sha256(f"c{i}".encode()).hexdigest() for i in range(50)]
        new_rows = spark.createDataFrame(
            [(k, i) for i, k in enumerate(keys)], "k string, payload long"
        )
        existing = spark.createDataFrame([(k,) for k in keys[::2]], "k string")
        df = _index_anti_join(new_rows, existing)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        assert "LeftAnti" in plan
        assert df.count() == 25  # and it still anti-joins correctly
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_ingest_bloom_equals_exact(spark, tmp_path):
    """VERDICT r04 next #1: the maintained-Bloom ingest path must produce a
    byte-identical chunk index to the exact anti-join path across multiple
    micro-batches (no false negatives; maybe-set resolved exactly), with
    cross-batch dedup intact."""
    src_a = str(tmp_path / "in_exact")
    src_b = str(tmp_path / "in_bloom")
    os.makedirs(src_a)
    os.makedirs(src_b)
    rows = generate_corpus(n_files=40, seed=9)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    first = df.where("file_id < 20")
    # second wave re-sends the first wave's contents under new file_ids
    second = df.withColumn("file_id", F.col("file_id") + 1000)
    for src in (src_a, src_b):
        first.coalesce(1).write.parquet(f"{src}/b1")

    idx_a = str(tmp_path / "idx_exact")
    idx_b = str(tmp_path / "idx_bloom")
    q = start_ingest(spark, f"{src_a}/*", idx_a, str(tmp_path / "ck_a1"), CFG.chunk)
    assert q.awaitTermination(120)
    # tiny expected_keys at high fpp: the maybe-branch fires constantly
    q = start_ingest(
        spark, f"{src_b}/*", idx_b, str(tmp_path / "ck_b1"), CFG.chunk,
        use_bloom=True, expected_keys=8, bloom_fpp=0.4,
    )
    assert q.awaitTermination(120)

    for src in (src_a, src_b):
        second.coalesce(1).write.parquet(f"{src}/b2")
    q = start_ingest(spark, f"{src_a}/*", idx_a, str(tmp_path / "ck_a1"), CFG.chunk)
    assert q.awaitTermination(120)
    q = start_ingest(
        spark, f"{src_b}/*", idx_b, str(tmp_path / "ck_b1"), CFG.chunk,
        use_bloom=True, expected_keys=8, bloom_fpp=0.4,
    )
    assert q.awaitTermination(120)

    a = spark.read.parquet(idx_a)
    b = spark.read.parquet(idx_b)
    assert sorted(r["k"] for r in a.select("k").collect()) == sorted(
        r["k"] for r in b.select("k").collect()
    )
    assert b.count() == b.select("k").distinct().count()  # no re-appends


def test_bloom_ingest_restart_loads_persisted_filter(spark, tmp_path, monkeypatch):
    """VERDICT r05 next #6: start_ingest(use_bloom=True) on an EXISTING
    checkpoint must load the persisted bitmap instead of rescanning the full
    index; the full rebuild is only the fallback for a missing/mismatched
    state file. Counted via the build_bloom_bitmap seam (bound at call
    time from operators.move)."""
    import libchunk_spark.operators.move as move_mod
    from libchunk_spark.streaming.ingest import _bloom_state_paths

    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "chunk_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = generate_corpus(n_files=20, seed=9)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    df.where("file_id < 10").coalesce(1).write.parquet(f"{src}/b1")
    q = start_ingest(
        spark, f"{src}/*", idx, ckpt, CFG.chunk,
        use_bloom=True, expected_keys=64, bloom_fpp=0.3,
    )
    assert q.awaitTermination(120)
    bin_p, meta_p = _bloom_state_paths(ckpt)
    assert os.path.exists(bin_p) and os.path.exists(meta_p)

    calls = {"n": 0}
    real_build = move_mod.build_bloom_bitmap

    def counting_build(keys_df, m, h):
        calls["n"] += 1
        return real_build(keys_df, m, h)

    monkeypatch.setattr(move_mod, "build_bloom_bitmap", counting_build)
    # restart, no new files: persisted filter loads, NO index scan, no batch
    q = start_ingest(
        spark, f"{src}/*", idx, ckpt, CFG.chunk,
        use_bloom=True, expected_keys=64, bloom_fpp=0.3,
    )
    assert q.awaitTermination(120)
    assert calls["n"] == 0

    # restart WITH new content (re-sends of b1 under new ids + fresh files):
    # only the per-batch delta builds run, never the full-index rebuild,
    # and cross-restart dedup still holds through the loaded filter
    n1 = spark.read.parquet(idx).count()
    df.withColumn("file_id", F.col("file_id") + 1000).coalesce(1).write.parquet(
        f"{src}/b2"
    )
    calls["n"] = 0
    q = start_ingest(
        spark, f"{src}/*", idx, ckpt, CFG.chunk,
        use_bloom=True, expected_keys=64, bloom_fpp=0.3,
    )
    assert q.awaitTermination(120)
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() > n1  # fresh files (10..19) did append
    assert idx_df.count() == idx_df.select("k").distinct().count()
    batches = calls["n"]
    assert batches >= 1  # delta builds only
    # geometry change (different expected_keys) must force a clean rebuild:
    # one extra full-index build on top of any per-batch delta builds
    calls["n"] = 0
    q = start_ingest(
        spark, f"{src}/*", idx, ckpt, CFG.chunk,
        use_bloom=True, expected_keys=1024, bloom_fpp=0.3,
    )
    assert q.awaitTermination(120)
    assert calls["n"] == 1  # the rebuild; no new files -> no delta builds


def test_bloom_ingest_replay_safe_after_partial_commit(spark, tmp_path, caplog):
    """ADVICE r05 medium: the filter ORs BEFORE the index append. Both crash
    points of that order are replay-safe: (a) crash after full commit ->
    replaying the batch appends nothing; (b) crash after the OR but before
    the append -> the replayed keys probe maybe-present, anti-join the index
    that lacks them, and append exactly once (no loss). Also exercises the
    saturation warning (ADVICE r05 low)."""
    import hashlib
    import logging as _logging

    import numpy as np

    from libchunk_spark.operators.move import _bloom_params, build_bloom_bitmap
    from libchunk_spark.streaming.ingest import _bloom_ingest_batch

    idx = str(tmp_path / "chunk_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    keys = [hashlib.sha256(f"chunk{i}".encode()).hexdigest() for i in range(40)]
    batch = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k string, payload long"
    )
    m, h = _bloom_params(64, 0.3)
    state = {"bm": np.zeros((m + 7) // 8, dtype=np.uint8).tobytes(), "n": 0}

    # scenario (b): the OR happened, the append did not (simulated crash)
    delta = build_bloom_bitmap(batch.select("k"), m, h)
    state["bm"] = np.bitwise_or(
        np.frombuffer(state["bm"], dtype=np.uint8),
        np.frombuffer(delta, dtype=np.uint8),
    ).tobytes()
    _bloom_ingest_batch(batch, state, idx, ckpt, m, h, expected_keys=64)
    got = spark.read.parquet(idx)
    assert sorted(r["k"] for r in got.collect()) == sorted(keys)  # nothing lost

    # scenario (a): full commit, then an at-least-once replay of the batch
    _bloom_ingest_batch(batch, state, idx, ckpt, m, h, expected_keys=64)
    got = spark.read.parquet(idx)
    assert got.count() == len(keys)  # no duplicates

    # saturation: inserting past expected_keys warns loudly (correctness
    # is unaffected; the warning is the operator's re-size signal)
    more = spark.createDataFrame(
        [(hashlib.sha256(f"x{i}".encode()).hexdigest(), i) for i in range(50)],
        "k string, payload long",
    )
    with caplog.at_level(
        _logging.WARNING, logger="libchunk_spark.streaming.ingest"
    ):
        _bloom_ingest_batch(more, state, idx, ckpt, m, h, expected_keys=64)
    assert any("expected_keys" in r.message for r in caplog.records)
    got = spark.read.parquet(idx)
    assert got.count() == got.select("k").distinct().count() == 90


def test_incremental_clustering_batch_replay_is_idempotent(spark, tmp_path):
    """ADVICE r04 medium: foreachBatch is at-least-once — replaying a batch
    after a (partial) commit must not append duplicate signature/band rows
    (which would double band frequencies past the cap and drop edges) and
    must leave the component assignment exactly as a single run would."""
    from libchunk_spark.streaming.ingest import _incremental_cluster_batch

    rows = generate_corpus(n_files=40, seed=21)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    ).cache()
    state = str(tmp_path / "state")
    b0 = df.where("file_id % 2 = 0")
    b1 = df.where("file_id % 2 = 1")
    _incremental_cluster_batch(b0, 0, state, CFG, band_freq_cap=4096)
    _incremental_cluster_batch(b1, 1, state, CFG, band_freq_cap=4096)
    want = sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/components").collect()
    )
    n_sigs = spark.read.parquet(f"{state}/signatures").count()
    n_bands = spark.read.parquet(f"{state}/bands").count()

    # crash-recovery replay of the already-committed batch 1
    _incremental_cluster_batch(b1, 1, state, CFG, band_freq_cap=4096)
    got = sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/components").collect()
    )
    assert got == want
    assert spark.read.parquet(f"{state}/signatures").count() == n_sigs
    assert spark.read.parquet(f"{state}/bands").count() == n_bands


def test_incremental_clustering_cross_edges_plan(spark, tmp_path):
    """VERDICT r04 next #2 'Done' criteria: per-batch new↔old edge work
    must be independent of history size — the maintained band index is
    scanned (never shuffled: the batch's band keys broadcast into it), the
    signature history is never read at all, and the current batch's own
    partition is pruned out (replay idempotence)."""
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.streaming.ingest import _cross_edges, _write_band_partition

    rows = generate_corpus(n_files=30, seed=7)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    state = str(tmp_path / "state")
    bands_root = f"{state}/bands"
    old = sign(df.where("file_id < 20"), CFG).select(
        "file_id", F.posexplode("bands").alias("band", "band_hash")
    )
    _write_band_partition(old, bands_root, 0, band_buckets=64)
    new_bands = sign(df.where("file_id >= 20"), CFG).select(
        "file_id", F.posexplode("bands").alias("band", "band_hash")
    ).localCheckpoint()

    edges = _cross_edges(new_bands, bands_root, 1, band_freq_cap=4096)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    # batch band keys broadcast INTO the index scan — history never shuffles
    assert "BroadcastExchange" in plan and "BroadcastHashJoin" in plan, plan
    # the signature history (minhash/band arrays) is not read per trigger
    assert "signatures" not in plan, plan
    # the current batch's own partition is pruned at the scan, and the
    # probe's bh_bucket values prune FILES within surviving batch dirs
    # (VERDICT r05 next #4)
    assert "PartitionFilters" in plan and "batch" in plan, plan
    assert "bh_bucket" in plan, plan
    # and the edges are real: planted near-dup families straddle the split
    assert edges.count() > 0


def test_cross_edges_bucket_pruning_preserves_edges(spark, tmp_path):
    """The bh_bucket file pruning must be invisible to results: edges with
    a coarse bucket count (heavy pruning) equal edges with band_buckets=1
    (no pruning possible — every row in one bucket)."""
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.streaming.ingest import _cross_edges, _write_band_partition

    rows = generate_corpus(n_files=30, seed=7)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    old = sign(df.where("file_id < 20"), CFG).select(
        "file_id", F.posexplode("bands").alias("band", "band_hash")
    )
    new_bands = sign(df.where("file_id >= 20"), CFG).select(
        "file_id", F.posexplode("bands").alias("band", "band_hash")
    ).localCheckpoint()
    got = {}
    for k in (1, 64):
        root = str(tmp_path / f"bands_k{k}")
        _write_band_partition(old, root, 0, band_buckets=k)
        edges = _cross_edges(new_bands, root, 1, band_freq_cap=4096, band_buckets=k)
        got[k] = sorted(tuple(r) for r in edges.collect())
    assert got[1] == got[64] and len(got[1]) > 0


def test_returning_user_after_eviction_does_not_overwrite(spark, tmp_path):
    """ADVICE r04: a user who returns AFTER idle-state eviction restarts
    session_idx at 0 — the session_start-keyed sink must keep BOTH the
    finalized pre-eviction sessions and the new post-eviction ones instead
    of silently overwriting rows that share (user_id, session_idx)."""
    import pandas as pd

    from libchunk_spark.streaming.sessionize import (
        latest_sessions,
        sessionize_stream,
    )

    e0 = 1_700_000_000
    src = str(tmp_path / "replay")
    os.makedirs(src)

    def write(fname, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).assign(ts=lambda d: pd.to_datetime(d["ts"], unit="s")).to_parquet(
            f"{src}/{fname}", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    # user 1 session 0, then goes idle; user 2 advances the global watermark
    write("000.parquet", [
        (10, e0, 1, "a", 0.0, ""),
        (20, e0, 2, "a", 0.0, ""),
    ])
    write("001.parquet", [(21, e0 + 3 * 3600, 2, "a", 0.0, "")])
    write("002.parquet", [(22, e0 + 6 * 3600, 2, "a", 0.0, "")])
    # user 1 RETURNS long after eviction: fresh state, session_idx restarts 0
    write("003.parquet", [(13, e0 + 9 * 3600, 1, "a", 0.0, "")])
    write("004.parquet", [(23, e0 + 12 * 3600, 2, "a", 0.0, "")])
    write("005.parquet", [(24, e0 + 15 * 3600, 2, "a", 0.0, "")])

    out = str(tmp_path / "sessions")
    q = sessionize_stream(
        spark, src, str(tmp_path / "ckpt"), out,
        lateness_sec=600, idle_timeout_sec=3600,
    )
    assert q.awaitTermination(180)

    user1 = sorted(
        (r["session_start"], r["session_idx"], r["n_events"], r["first_event"])
        for r in latest_sessions(spark, out).where("user_id = 1").collect()
    )
    # BOTH user-1 sessions survive; each restarted numbering at 0
    assert user1 == [(e0, 0, 1, 10), (e0 + 9 * 3600, 0, 1, 13)]


def test_streaming_asof_enrichment(spark, tmp_path):
    """Stream-static as-of enrichment must equal the batch asof_join
    over the same rows, across multiple micro-batches, with the quote
    side pruned per trigger (bucket partition + key semi-join)."""
    from libchunk_spark.operators.asof import asof_join
    from libchunk_spark.streaming.ingest import start_asof_enrichment

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probes = ev.where("event_type = 'purchase'").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    quotes = (
        ev.where("event_type in ('click','view')")
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("src_event"),
            F.col("event_type").alias("src_type"),
        )
    )
    qpath = str(tmp_path / "quotes")
    quotes.write.parquet(qpath)

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    probes.where("event_id % 3 = 0").coalesce(1).write.parquet(f"{src}/b1")
    probes.where("event_id % 3 = 1").coalesce(1).write.parquet(f"{src}/b2")
    probes.where("event_id % 3 = 2").coalesce(1).write.parquet(f"{src}/b3")

    out = str(tmp_path / "enriched")
    q = start_asof_enrichment(
        spark,
        f"{src}/*",
        qpath,
        str(tmp_path / "ckpt"),
        out,
        on=["user_id"],
        tiebreak="src_event",
        quote_buckets=4,
    )
    assert q.awaitTermination(180)

    got = {
        (r["event_id"], r["src_event"], r["src_type"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["event_id"], r["src_event"], r["src_type"])
        for r in asof_join(
            probes,
            quotes,
            on=["user_id"],
            left_time="ts",
            right_time="ts",
            tiebreak="src_event",
        ).collect()
    }
    assert got == want
    assert len(got) == probes.count()
    assert any(s is not None for (_, s, _) in got)
    # three files → three batch_ids (per-trigger pruning exercised 3x)
    n_batches = (
        spark.read.parquet(out).select("batch_id").distinct().count()
    )
    assert n_batches == 3
