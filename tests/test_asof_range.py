"""as-of join, bucketized range join, and salted aggregation:
equivalence vs naive formulations + physical-plan shape.

The naive oracles here are deliberately the formulations the operators
exist to AVOID (non-equi joins, one-phase skewed groupBy) — equality
proves semantics, the plan assertions prove the scale shape.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from libchunk_spark.operators.asof import asof_join
from libchunk_spark.operators.rangejoin import bucketed_range_join
from libchunk_spark.operators.skew import salted_agg


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _probe_quote(spark):
    """Hand-built fixture with every edge the operators must handle:
    exact-time tie, same-(key,time) quote tie, no-match key, numeric
    payload NULL inside an otherwise-valid quote row."""
    probes = spark.createDataFrame(
        [
            (1, _ts(100.0), 10),
            (1, _ts(200.5), 11),
            (2, _ts(50.0), 12),   # before every quote for key 2
            (3, _ts(10.0), 13),   # key with no quotes at all
            (1, _ts(300.0), 14),  # exact tie with quote at 300.0
        ],
        "key long, t timestamp, probe_id long",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts(90.0), 100, 7.0),
            (1, _ts(100.0), 101, None),  # exact-time quote, NULL payload
            (1, _ts(250.0), 102, 9.0),
            (1, _ts(250.0), 103, 2.0),   # same (key, time): tiebreak wins
            (1, _ts(300.0), 104, 1.0),
            (2, _ts(60.0), 105, 4.0),
            (2, _ts(75.0), 106, 5.0),
        ],
        "key long, t timestamp, quote_id long, val double",
    )
    return probes, quotes


def _naive_asof(probes, quotes, direction="backward"):
    """Reference semantics via the non-equi join + row_number the
    operator avoids."""
    if direction == "backward":
        cond = quotes["t"] <= probes["t"]
        order = [F.col("qt").desc(), F.col("quote_id").desc()]
    else:
        cond = quotes["t"] >= probes["t"]
        order = [F.col("qt").asc(), F.col("quote_id").asc()]
    j = probes.join(
        quotes, (probes["key"] == quotes["key"]) & cond, "left"
    ).select(
        probes["key"],
        "probe_id",
        "quote_id",
        "val",
        quotes["t"].alias("qt"),
    )
    w = Window.partitionBy("probe_id").orderBy(*order)
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("probe_id", "quote_id", "val")
    )


def test_asof_backward_matches_naive(spark):
    probes, quotes = _probe_quote(spark)
    got = asof_join(
        probes,
        quotes,
        on=["key"],
        left_time="t",
        right_time="t",
        tiebreak="quote_id",
    )
    got_rows = {
        r["probe_id"]: (r["quote_id"], r["val"])
        for r in got.collect()
    }
    exp_rows = {
        r["probe_id"]: (r["quote_id"], r["val"])
        for r in _naive_asof(probes, quotes).collect()
    }
    assert got_rows == exp_rows
    # load-bearing edges, pinned explicitly:
    assert got_rows[10] == (101, None)  # exact tie eligible, NULL payload
    #   ^ the struct carry must NOT skip back to quote 100 on the NULL
    assert got_rows[11] == (101, None)
    assert got_rows[13] == (None, None)  # key with no quotes
    assert got_rows[14] == (104, 1.0)


def test_asof_forward_matches_naive(spark):
    probes, quotes = _probe_quote(spark)
    got = asof_join(
        probes,
        quotes,
        on=["key"],
        left_time="t",
        right_time="t",
        direction="forward",
        tiebreak="quote_id",
    )
    got_rows = {
        r["probe_id"]: (r["quote_id"], r["val"]) for r in got.collect()
    }
    exp = {
        r["probe_id"]: (r["quote_id"], r["val"])
        for r in _naive_asof(probes, quotes, "forward").collect()
    }
    assert got_rows == exp
    assert got_rows[12] == (105, 4.0)  # first quote at/after t=50


def test_asof_tolerance_nulls_far_matches(spark):
    probes, quotes = _probe_quote(spark)
    got = asof_join(
        probes,
        quotes,
        on=["key"],
        left_time="t",
        right_time="t",
        tolerance_sec=10.0,
        tiebreak="quote_id",
    )
    rows = {r["probe_id"]: r["quote_id"] for r in got.collect()}
    assert rows[10] == 101  # gap 0 <= 10
    assert rows[11] is None  # nearest quote is 200.5-100=100.5s away
    assert rows[14] == 104
    assert got.count() == probes.count()  # left rows always kept


def test_asof_plan_single_exchange_no_bnlj(spark):
    probes, quotes = _probe_quote(spark)
    plan = _plan(
        asof_join(
            probes, quotes, on=["key"], left_time="t", right_time="t",
            tiebreak="quote_id",
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # merge shape: ONE shuffle (both sides union before the exchange)
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_matches_naive_non_equi(spark):
    probes, quotes = _probe_quote(spark)
    got = bucketed_range_join(
        probes,
        quotes,
        on=["key"],
        probe_time="t",
        quote_time="t",
        lo_sec=-150.0,
        hi_sec=0.0,
        bucket_sec=60,  # window spans multiple buckets
    )
    naive = probes.alias("p").join(
        quotes.alias("q"),
        (F.col("p.key") == F.col("q.key"))
        & (F.col("q.t") > F.col("p.t") - F.expr("INTERVAL '150' SECOND"))
        & (F.col("q.t") <= F.col("p.t")),
        "inner",
    )
    got_pairs = sorted(
        (r["probe_id"], r["quote_id"]) for r in got.collect()
    )
    exp_pairs = sorted(
        (r["probe_id"], r["quote_id"]) for r in naive.collect()
    )
    assert got_pairs == exp_pairs
    # boundary semantics: exact-time quote included (<= hi); a quote
    # several buckets back still found (window spans 3 buckets of 60s)
    assert (14, 104) in got_pairs
    assert (11, 100) in got_pairs  # t=90 inside (50.5, 200.5]


def test_range_join_closed_lower_bound(spark):
    probes, quotes = _probe_quote(spark)
    # probe 11 at 200.5; quote 102/103 at 250.0 = exactly t+49.5
    got_open = bucketed_range_join(
        probes, quotes, on=["key"], probe_time="t", quote_time="t",
        lo_sec=49.5, hi_sec=60.0, bucket_sec=60, lo_open=True,
    )
    got_closed = bucketed_range_join(
        probes, quotes, on=["key"], probe_time="t", quote_time="t",
        lo_sec=49.5, hi_sec=60.0, bucket_sec=60, lo_open=False,
    )
    open_pairs = {(r["probe_id"], r["quote_id"]) for r in got_open.collect()}
    closed_pairs = {
        (r["probe_id"], r["quote_id"]) for r in got_closed.collect()
    }
    assert (11, 102) not in open_pairs
    assert (11, 102) in closed_pairs and (11, 103) in closed_pairs


def test_range_join_plan_equi_not_bnlj(spark):
    probes, quotes = _probe_quote(spark)
    plan = _plan(
        bucketed_range_join(
            probes, quotes, on=["key"], probe_time="t", quote_time="t",
            lo_sec=-3600.0, hi_sec=0.0,
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_agg_equals_plain_groupby(spark):
    # skewed: 2 hot keys over 5000 rows, 97 distinct users
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("k"),
        (F.col("id") % 97).alias("user_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    got = salted_agg(
        df,
        keys=["k"],
        salt_from="user_id",
        n_salts=8,
        count_alias="n",
        sum_col="value",
        sum_alias="sv",
        distinct_alias="nd",
    )
    exp = df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sv"),
        F.countDistinct("user_id").alias("nd"),
    )
    g = {r["k"]: (r["n"], round(r["sv"], 6), r["nd"]) for r in got.collect()}
    e = {r["k"]: (r["n"], round(r["sv"], 6), r["nd"]) for r in exp.collect()}
    assert g == e
    assert g["hot"][2] == 97  # distinct stays EXACT across salt buckets


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Semantic contract: asof_join == pandas.merge_asof (by=key,
    backward, allow_exact_matches) on seeded random instances, with and
    without tolerance. Right-side ties at equal (key, time) align
    because merge_asof takes the positionally-last row of the sorted
    right frame and our tiebreak takes the max quote_id."""
    import numpy as np
    import pandas as pd

    for seed in range(5):
        rng = np.random.default_rng(seed)
        nl, nr = 120, 200
        lp = pd.DataFrame(
            {
                "key": rng.integers(0, 6, nl),
                "t": np.round(rng.uniform(0, 100, nl), 1),
                "probe_id": np.arange(nl),
            }
        )
        rp = pd.DataFrame(
            {
                "key": rng.integers(0, 6, nr),
                "t": np.round(rng.uniform(0, 100, nr), 1),
                "quote_id": np.arange(nr),
                "val": np.round(rng.uniform(0, 10, nr), 3),
            }
        )
        tol = None if seed % 2 == 0 else 7.5
        exp = pd.merge_asof(
            lp.sort_values(["t", "probe_id"], kind="mergesort"),
            rp.sort_values(["t", "quote_id"], kind="mergesort"),
            on="t",
            by="key",
            suffixes=("", "_r"),
            tolerance=tol,
        )
        got = asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on=["key"],
            left_time="t",
            right_time="t",
            tolerance_sec=tol,
            tiebreak="quote_id",
        ).toPandas()
        g = {
            int(r.probe_id): (
                None if pd.isna(r.quote_id) else int(r.quote_id)
            )
            for r in got.itertuples()
        }
        e = {
            int(r.probe_id): (
                None if pd.isna(r.quote_id) else int(r.quote_id)
            )
            for r in exp.itertuples()
        }
        assert g == e, f"seed {seed} tol {tol}"


def test_range_join_randomized_vs_naive(spark):
    """Seeded random windows/bucket widths (incl. bucket >> window and
    bucket << window, negative-only and straddling-zero windows,
    open and closed lower bounds) against the naive non-equi join."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 150
    base = pd.Timestamp("2024-01-01")
    mk = lambda arr: [base + pd.Timedelta(seconds=float(s)) for s in arr]
    probes_p = pd.DataFrame(
        {
            "key": rng.integers(0, 4, n),
            "t": mk(np.round(rng.uniform(0, 5000, n), 2)),
            "probe_id": np.arange(n),
        }
    )
    quotes_p = pd.DataFrame(
        {
            "key": rng.integers(0, 4, n),
            "t": mk(np.round(rng.uniform(0, 5000, n), 2)),
            "quote_id": np.arange(n),
        }
    )
    probes = spark.createDataFrame(probes_p)
    quotes = spark.createDataFrame(quotes_p)

    cases = [
        (-600.0, 0.0, 600, True),
        (-600.0, 0.0, 30, True),      # bucket << window
        (-50.0, 50.0, 7200, False),   # bucket >> window, closed
        (-1000.0, -200.0, 250, True), # strictly-past window
        (100.0, 400.0, 128, False),   # strictly-future window
        (0.0, 0.0, 60, False),        # degenerate: exact-time matches
    ]
    for lo, hi, bucket, lo_open in cases:
        got = bucketed_range_join(
            probes, quotes, on=["key"], probe_time="t", quote_time="t",
            lo_sec=lo, hi_sec=hi, bucket_sec=bucket, lo_open=lo_open,
        )
        lo_cmp = (
            F.col("q.t") > F.col("p.t") + F.expr(f"INTERVAL '{lo}' SECOND")
            if lo_open
            else F.col("q.t")
            >= F.col("p.t") + F.expr(f"INTERVAL '{lo}' SECOND")
        )
        naive = probes.alias("p").join(
            quotes.alias("q"),
            (F.col("p.key") == F.col("q.key"))
            & lo_cmp
            & (
                F.col("q.t")
                <= F.col("p.t") + F.expr(f"INTERVAL '{hi}' SECOND")
            ),
            "inner",
        )
        got_pairs = sorted(
            (r["probe_id"], r["quote_id"]) for r in got.collect()
        )
        exp_pairs = sorted(
            (r["probe_id"], r["quote_id"]) for r in naive.collect()
        )
        assert got_pairs == exp_pairs, (lo, hi, bucket, lo_open)
        if (lo, hi) == (0.0, 0.0):
            continue
        assert len(got_pairs) > 0, f"vacuous case {(lo, hi, bucket)}"
