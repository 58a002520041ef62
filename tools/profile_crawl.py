"""Per-step superstep profile of the end-to-end crawl — where does
the non-parallelizing time go? Runs the bench corpus crawl once with
verbose step marks after a warmup, printing the per-superstep
breakdown (select / fetch-join-build / route-extract-build /
policy-build / seen-antijoin-build / plan-build / write-deltas /
count-footers / count-frontier / commit) that `run_crawl(verbose=)`
already emits.

Usage: [CPUS=4] [PAGES=600000] [BRANCHING=32] python tools/profile_crawl.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from website_indexer_spark.plans.crawl import run_crawl  # noqa: E402
from website_indexer_spark.sources.synth import generate_web_pages  # noqa: E402
from website_indexer_spark.sources.tables import build_spark, load_web_pages  # noqa: E402


def main() -> None:
    # MATERIALIZE=0 disables the eager pre-write cache warm (A/B knob
    # for tools only — the product switch is the wave-size threshold)
    if os.environ.get("MATERIALIZE") == "0":
        import website_indexer_spark.plans.crawl as C

        C.EAGER_EXTRACT_MATERIALIZE_MIN = 1 << 62

    cpus = int(os.environ.get("CPUS", "4"))
    n_pages = int(os.environ.get("PAGES", "600000"))
    branching = int(os.environ.get("BRANCHING", "32"))
    cache_root = os.environ.get("BENCH_CORPUS_DIR", "/tmp/wi_scale_corpus")
    corpus_path = os.path.join(cache_root, f"web_pages_n{n_pages}_b{branching}")

    spark = build_spark(
        f"profile-crawl-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "16g")},
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

    work = tempfile.mkdtemp(prefix="wi_profile_")
    t0 = time.time()
    run_crawl(
        spark,
        web,
        "https://host0.test/p0/",
        os.path.join(work, "warmup"),
        max_supersteps=2,
    )
    print(f"warmup: {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    result = run_crawl(
        spark,
        web,
        "https://host0.test/p0/",
        os.path.join(work, "crawl"),
        verbose=True,
    )
    total = time.time() - t0
    print(
        f"crawl: {total:.2f}s  requested={result.requested} "
        f"({result.requested / total:.1f} urls/s)  supersteps={result.supersteps}",
        flush=True,
    )


if __name__ == "__main__":
    main()
