"""Recrawl scheduling (sources/cdx.py::cdx_change_rate/recrawl_topk):
Cho & Garcia-Molina change-frequency estimation over a capture index
and the integer priority protocol, pinned against a plain-Python
oracle plus plan-shape properties (one surt-keyed exchange, window
and aggregate sharing it; top-k via TakeOrderedAndProject)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from website_indexer_spark.sources.cdx import (
    cdx_change_rate,
    recrawl_topk,
)

NOW = 2_000_000_000


def _index_df(spark, rows):
    """rows: (surt, ts14, url, digest)."""
    return spark.createDataFrame(
        [(s, t, u, "text/html", 200, d, 10) for (s, t, u, d) in rows],
        "surt string, ts14 string, url string, mime string, "
        "status_code int, digest string, length long",
    )


def _py_oracle(rows, now):
    """Per-surt (n, X, first, last, lambda_milli, priority)."""
    import time
    from collections import defaultdict

    def ep(ts14):
        import calendar

        return calendar.timegm(time.strptime(ts14, "%Y%m%d%H%M%S"))

    by = defaultdict(list)
    for s, t, u, d in rows:
        by[s].append((t, u, d))
    out = {}
    for s, caps in by.items():
        caps.sort()
        n = len(caps)
        x = sum(
            1 for i in range(1, n) if caps[i][2] != caps[i - 1][2]
        )
        first, last = ep(caps[0][0]), ep(caps[-1][0])
        m = n - 1
        lam = math.floor(-1000.0 * math.log((m - x + 0.5) / (m + 0.5)))
        span = last - first
        pri = lam * (now - last) * m // span if span > 0 else 0
        out[s] = (n, x, first, last, lam, pri, caps[-1][1])
    return out


ROWS = [
    # stable page: 3 captures, never changes -> lambda 0, priority 0
    ("com,stable)/", "20240101000000", "https://stable.com/a", "h1"),
    ("com,stable)/", "20240201000000", "https://stable.com/b", "h1"),
    ("com,stable)/", "20240301000000", "https://stable.com/c", "h1"),
    # churny page: changes every interval
    ("com,churn)/", "20240101000000", "https://churn.com/", "a"),
    ("com,churn)/", "20240102000000", "https://churn.com/", "b"),
    ("com,churn)/", "20240103000000", "https://churn.com/", "c"),
    ("com,churn)/", "20240104000000", "https://churn.com/", "d"),
    # changed once, flip-back counts as a second change
    ("com,flip)/", "20240101000000", "https://flip.com/", "x"),
    ("com,flip)/", "20240108000000", "https://flip.com/", "y"),
    ("com,flip)/", "20240115000000", "https://flip.com/", "x"),
    # single capture: m=0 -> lambda 0, priority 0
    ("com,once)/", "20240601000000", "https://once.com/", "z"),
]


def test_change_rate_matches_python_oracle(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = {
        r["surt"]: r
        for r in cdx_change_rate(_index_df(spark, ROWS), NOW).collect()
    }
    want = _py_oracle(ROWS, NOW)
    assert set(got) == set(want)
    for s, (n, x, first, last, lam, pri, url) in want.items():
        r = got[s]
        assert (
            r["n_captures"],
            r["n_changes"],
            r["first_epoch"],
            r["last_epoch"],
            r["lambda_milli"],
            r["priority"],
            r["url"],
        ) == (n, x, first, last, lam, pri, url), s


def test_known_lambda_values(spark):
    """m=3 intervals: X=1 -> 336 milli-nats, X=3 -> 1945 (the gate's
    even/odd split); X=0 -> 0; flip-back X=2 -> 1252."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = {
        r["surt"]: r["lambda_milli"]
        for r in cdx_change_rate(_index_df(spark, ROWS), NOW).collect()
    }
    assert got["com,stable)/"] == 0
    assert got["com,once)/"] == 0
    assert got["com,churn)/"] == math.floor(-1000 * math.log(0.5 / 3.5))
    assert got["com,flip)/"] == math.floor(-1000 * math.log(0.5 / 2.5))


def test_never_changed_never_scheduled(spark):
    """lambda=0 pages rank priority 0 no matter how stale."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        ("com,old)/", "20000101000000", "https://old.com/", "h"),
        ("com,old)/", "20000601000000", "https://old.com/", "h"),
    ]
    r = cdx_change_rate(_index_df(spark, rows), NOW).collect()[0]
    assert r["lambda_milli"] == 0 and r["priority"] == 0


def test_topk_order_and_cut(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rates = cdx_change_rate(_index_df(spark, ROWS), NOW)
    top = recrawl_topk(rates, 2).collect()
    allr = sorted(
        rates.collect(), key=lambda r: (-r["priority"], r["surt"])
    )
    assert [(r["surt"], r["priority"]) for r in top] == [
        (r["surt"], r["priority"]) for r in allr[:2]
    ]


def test_plan_one_exchange_and_takeordered(spark):
    """The lag window and the per-surt aggregate share ONE surt-keyed
    exchange; top-k compiles to TakeOrderedAndProject (no global
    sort)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _index_df(spark, ROWS).localCheckpoint()
    rates = cdx_change_rate(src, NOW)
    plan = rates._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan
    top_plan = (
        recrawl_topk(rates, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in top_plan
    assert "Sort " not in top_plan or "SortAggregate" in top_plan


def test_recrawl_priorities_drive_frontier_topk(spark):
    """Composition: cdx_change_rate priorities as frontier_prioritize
    scores — churny URLs outrank stable ones; never-changed URLs ride
    default_score and fall back to BFS order."""
    from website_indexer_spark.operators.frontier import (
        frontier_prioritize,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rates = cdx_change_rate(_index_df(spark, ROWS), NOW)
    urls = [r["url"] for r in rates.collect()]
    frontier = spark.createDataFrame(
        [(u, 0, i) for i, u in enumerate(sorted(urls))],
        "url string, depth int, discovery_seq long",
    )
    top = frontier_prioritize(
        frontier,
        rates.select("url", F.col("priority").alias("score")),
        k=2,
    ).collect()
    want = sorted(
        (-r["priority"], r["url"]) for r in rates.collect()
    )[:2]
    assert [r["url"] for r in top] == [u for _, u in want]
    # the two churny URLs must be exactly the winners
    assert {r["url"] for r in top} == {
        "https://churn.com/",
        "https://flip.com/",
    }


def test_seeded_random_histories_match_oracle(spark):
    """200 seeded random capture histories (1-8 captures, random
    digest churn, irregular gaps) in ONE batch vs the Python oracle —
    the fuzz coverage a hand-picked table can't give."""
    import random
    import time

    rng = random.Random(0xC0FFEE)
    rows = []
    for s in range(200):
        surt = f"com,fuzz{s})/"
        n = rng.randint(1, 8)
        epoch = rng.randint(1_500_000_000, 1_600_000_000)
        digest = f"d{rng.randint(0, 3)}"
        for c in range(n):
            ts14 = time.strftime(
                "%Y%m%d%H%M%S", time.gmtime(epoch)
            )
            rows.append(
                (surt, ts14, f"https://fuzz{s}.com/p{c}", digest)
            )
            epoch += rng.randint(60, 10_000_000)
            if rng.random() < 0.5:
                digest = f"d{rng.randint(0, 3)}"
    got = {
        r["surt"]: (
            r["n_captures"],
            r["n_changes"],
            r["first_epoch"],
            r["last_epoch"],
            r["lambda_milli"],
            r["priority"],
            r["url"],
        )
        for r in cdx_change_rate(_index_df(spark, rows), NOW).collect()
    }
    assert got == _py_oracle(rows, NOW)
