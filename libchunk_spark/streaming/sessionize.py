"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is queries.q_event_sessions (lag + running-sum windows); this
operator carries the per-user session state ACROSS micro-batches instead:
state = (last event epoch, current session index, events-in-session,
first event id). Each batch emits the cumulative row for every session it
touched, so the sink (append parquet via foreachBatch) holds a history of
updates and the latest row per (user_id, session_idx) equals the batch
answer — verified in tests against q_event_sessions on a chronologically
split replay.

Reference tie-in: this is the streaming generalization of the reference's
incremental chunker state machine (vendor/.../chunker.go:202-327 — bounded
state carried across reads); here the bounded state is per-user session
progress carried across micro-batches.

Scale notes: state is keyed by user_id → hash-shuffled, skew-free for
bounded per-user event rates; the per-key state is O(1) (four scalars), so
10^9 users is ~tens of GB of state across a cluster, well inside the HDFS-
backed state store's envelope. The pandas body is vectorized (one
np.cumsum per user-batch, no per-row Python).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)

_OUT_SCHEMA = "user_id long, session_idx long, n_events long, first_event long"
_STATE_SCHEMA = "last_epoch long, session_idx long, n_events long, first_event long"

SESSION_GAP_SEC = 1800


def _sessionize_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch into the session state, vectorized."""
    (user_id,) = key
    batch = pd.concat(list(pdfs))
    if not len(batch):
        return
    epochs = (batch["ts"].astype("int64") // 10**9).to_numpy()
    order = np.argsort(epochs, kind="stable")
    epochs = epochs[order]
    event_ids = batch["event_id"].to_numpy()[order]

    if state.exists:
        last_epoch, session_idx, n_events, first_event = state.get
    else:
        last_epoch, session_idx, n_events, first_event = None, 0, 0, 0

    # gap > SESSION_GAP_SEC starts a new session; the first gap compares
    # against the cross-batch state rather than a same-batch neighbour
    prev = np.empty_like(epochs)
    prev[1:] = epochs[:-1]
    prev[0] = last_epoch if last_epoch is not None else epochs[0]
    new_session = (epochs - prev) > SESSION_GAP_SEC
    sess_of_row = session_idx + np.cumsum(new_session)

    rows = []
    for s in np.unique(sess_of_row):
        mask = sess_of_row == s
        if s == session_idx and n_events > 0:
            cnt = n_events + int(mask.sum())
            first = min(first_event, int(event_ids[mask].min()))
        else:
            cnt = int(mask.sum())
            first = int(event_ids[mask].min())
        rows.append((user_id, int(s), cnt, first))

    last_s = int(sess_of_row[-1])
    last_row = rows[-1]
    state.update((int(epochs[-1]), last_s, int(last_row[2]), int(last_row[3])))
    yield pd.DataFrame(rows, columns=["user_id", "session_idx", "n_events", "first_event"])


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_path: str,
):
    """Stream event files → per-user stateful sessionization → parquet of
    cumulative session updates (latest per (user_id, session_idx) = final).

    Requires event-time-ordered arrival per user (e.g. chronologically
    split replay files with maxFilesPerTrigger=1) — the same contract a
    production deployment satisfies with watermark-ordered upstream topics.
    """
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    updates = (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_path)

    return (
        updates.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_sessions(spark: SparkSession, out_path: str) -> DataFrame:
    """Collapse the update history to the final row per (user, session)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id", "session_idx")
        .orderBy(F.desc("batch_id"), F.desc("n_events"))
    )
    return (
        spark.read.parquet(out_path)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "session_idx", "n_events", "first_event")
    )
