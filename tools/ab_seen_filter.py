"""Bloom-vs-cuckoo seen-prefilter A/B at fat-superstep scale (r4
verdict item 5): the two filter kinds run the IDENTICAL crawl on the
identical cached corpus, interleaved in one window (the ab_bench
noisy-neighbor discipline), with busy-worker probes bracketing the
window so the reader can see how much hardware it actually delivered.

Per round each kind crawls once; per kind the best (minimum) crawl
time across rounds is the machine-capability number. The filter is
forced on from the first superstep (use_bloom=True) so every wave
pays the filter's update+probe cost — the thing being compared.

Usage:
    [CPUS=16] [PAGES=600000] [BRANCHING=32] [ROUNDS=2]
    python tools/ab_seen_filter.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from website_indexer_spark.plans.crawl import run_crawl  # noqa: E402
from website_indexer_spark.sources.synth import generate_web_pages  # noqa: E402
from website_indexer_spark.sources.tables import (  # noqa: E402
    build_spark,
    load_web_pages,
)


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def probe(k: int, n: int = 3_000_000) -> float:
    with mp.Pool(k) as p:
        t0 = time.time()
        p.map(_burn, [n] * k * 2)
        return round((k * 2 * n) / (time.time() - t0) / 1e6, 1)


def main() -> None:
    cpus = int(os.environ.get("CPUS", "16"))
    n_pages = int(os.environ.get("PAGES", "600000"))
    branching = int(os.environ.get("BRANCHING", "32"))
    rounds = int(os.environ.get("ROUNDS", "2"))
    cache_root = os.environ.get("BENCH_CORPUS_DIR", "/tmp/wi_scale_corpus")
    corpus_path = os.path.join(cache_root, f"web_pages_n{n_pages}_b{branching}")

    spark = build_spark(
        f"ab-seen-filter-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "24g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_web_pages(
            spark,
            n_pages=n_pages,
            n_hosts=20,
            seed=42,
            partitions=max(cpus, 16),
            branching=branching,
        ).write.mode("overwrite").parquet(corpus_path)
    web = load_web_pages(spark, corpus_path)

    work = tempfile.mkdtemp(prefix="wi_ab_filter_")
    # shared warmup (codegen, python pool) charged to neither side
    run_crawl(
        spark, web, "https://host0.test/p0/",
        os.path.join(work, "warmup"), max_supersteps=2,
    )

    kinds = ["bloom", "cuckoo"]
    times: dict = {k: [] for k in kinds}
    requested = {}
    probes = [probe(cpus)]
    for r in range(rounds):
        for kind in kinds:
            out = os.path.join(work, f"{kind}{r}")
            t0 = time.time()
            res = run_crawl(
                spark, web, "https://host0.test/p0/", out,
                use_bloom=True, seen_filter=kind,
            )
            dt = round(time.time() - t0, 2)
            times[kind].append(dt)
            requested[kind] = res.requested
            print(f"round {r} {kind}: {dt}s "
                  f"({res.requested / dt:.0f} urls/s)", flush=True)
            shutil.rmtree(out, ignore_errors=True)
        probes.append(probe(cpus))

    assert len(set(requested.values())) == 1, requested  # identical crawls
    summary = {
        "metric": "seen-prefilter A/B crawl sec (best of rounds)",
        "cpus": cpus,
        "corpus_pages": n_pages,
        "requested": next(iter(requested.values())),
        "rounds": rounds,
        "times": times,
        "best": {k: min(v) for k, v in times.items()},
        "urls_per_sec": {
            k: round(next(iter(requested.values())) / min(v), 1)
            for k, v in times.items()
        },
        "window_probes_mops": probes,
    }
    print(json.dumps(summary))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
