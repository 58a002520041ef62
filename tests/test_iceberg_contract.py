"""Iceberg deployment contract (VERDICT r3 #9): the sandbox has no
Iceberg jars, so IcebergBackend cannot execute — but the exact
statements a deployment would run are pure string emissions, golden-
tested here so the wiring is pinned rather than trusted. No Spark
session needed."""

from website_indexer_spark.sources.tables import (
    DIMS_SCHEMA,
    FRONTIER_SCHEMA,
    ROUTED_SCHEMA,
    SEEN_SCHEMA,
    IcebergBackend,
)

IB = IcebergBackend


def test_session_conf_golden():
    assert IB.session_conf("s3://bucket/wh") == {
        "spark.jars.packages": (
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"
        ),
        "spark.sql.catalog.crawl": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.crawl.type": "hadoop",
        "spark.sql.catalog.crawl.warehouse": "s3://bucket/wh",
    }


def test_seen_ddl_golden():
    assert IB.create_table_ddl("seen", SEEN_SCHEMA, seen_buckets=4096) == (
        "CREATE TABLE IF NOT EXISTS crawl.seen (\n"
        "  url_hash BIGINT NOT NULL,\n"
        "  url STRING NOT NULL,\n"
        "  superstep INT NOT NULL\n"
        ") USING iceberg\n"
        "PARTITIONED BY (superstep, bucket(4096, url_hash))"
    )


def test_dims_ddl_golden():
    assert IB.create_table_ddl("dims", DIMS_SCHEMA, dims_buckets=512) == (
        "CREATE TABLE IF NOT EXISTS crawl.dims (\n"
        "  kind STRING NOT NULL,\n"
        "  key STRING NOT NULL,\n"
        "  superstep INT NOT NULL\n"
        ") USING iceberg\n"
        "PARTITIONED BY (superstep, kind, bucket(512, key))"
    )


def test_routed_and_frontier_ddl_shape():
    routed = IB.create_table_ddl("routed", ROUTED_SCHEMA)
    assert "record_type STRING NOT NULL" in routed
    assert "links ARRAY<STRING>" in routed
    assert "status_code INT" in routed
    assert "timestamp TIMESTAMP" in routed
    assert routed.endswith("PARTITIONED BY (superstep, record_type)")
    frontier = IB.create_table_ddl("frontier", FRONTIER_SCHEMA)
    assert "depth INT NOT NULL" in frontier
    assert "discovery_seq BIGINT NOT NULL" in frontier
    assert frontier.endswith("PARTITIONED BY (superstep)")


def test_merge_golden():
    assert IB.dims_merge_sql() == (
        "MERGE INTO crawl.dims t\n"
        "USING dims_delta s\n"
        "ON t.kind = s.kind AND t.key = s.key\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_maintenance_golden():
    assert IB.compact_sql("seen") == (
        "CALL crawl.system.rewrite_data_files(\n"
        "  table => 'crawl.seen',\n"
        "  options => map('target-file-size-bytes', '536870912'))"
    )
    assert IB.expire_snapshots_sql("routed", retain_last=3) == (
        "CALL crawl.system.expire_snapshots(\n"
        "  table => 'crawl.routed', retain_last => 3)"
    )
    assert IB.rollback_sql("seen", 123456789) == (
        "CALL crawl.system.rollback_to_snapshot('crawl.seen', 123456789)"
    )


def test_every_engine_table_has_a_spec():
    from website_indexer_spark.sources.tables import (
        DELTA_TABLES,
        SNAPSHOT_TABLES,
    )

    for name in DELTA_TABLES + SNAPSHOT_TABLES:
        assert name in IB._PARTITION_SPECS, name
