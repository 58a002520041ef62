import pytest

from website_indexer_spark.sources.tables import build_spark


@pytest.fixture(scope="session")
def spark():
    spark = build_spark(
        app_name="wi-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


def web_dict_to_df(spark, web: dict):
    """Materialize an oracle web dict (url -> WebResponse) as a
    web_pages DataFrame in the input_hint shape + response metadata."""
    from website_indexer_spark.sources.tables import WEB_PAGES_SCHEMA

    rows = []
    for url, r in web.items():
        rows.append(
            (
                url,
                None,
                bytes(r.html) if r.html is not None else None,
                None,
                None,
                r.status_code,
                r.location,
                r.content_type,
            )
        )
    return spark.createDataFrame(rows, WEB_PAGES_SCHEMA)
