"""Sources: synthetic-web fixtures → Spark DataFrames / parquet.

The "network" in the sandbox is the ``crawl_pages`` table; a fetch is a
column-pruned join against it (SURVEY.md §2 O22). ``pages_meta`` is the
fetch-path projection — it must never include the payload columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from infinitycrawler_spark import schemas
from infinitycrawler_spark.functions.robots import parse_robots_txt
from infinitycrawler_spark.synth.fixtures import WebFixture


def pages_df(spark: SparkSession, fixture: WebFixture) -> DataFrame:
    """Fixture pages → DataFrame. If any page dict carries a ``body``
    key (raw response bytes — HTML, robots.txt, sitemap XML), a nullable
    ``body:binary`` column is appended and the engine parses content
    from it (DefaultContentProcessor.cs:24-25 raw-stream mode)."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = schemas.CRAWL_PAGES
    has_body = any("body" in p for p in fixture.pages)
    if has_body:
        schema = StructType(
            [*schemas.CRAWL_PAGES.fields, StructField("body", BinaryType(), True)])
    rows = [
        tuple(p.get(f.name) if f.name != "links"
              else [(l["href"], l["text"], l["title"], l["rel"])
                    for l in (p.get("links") or [])]
              for f in schema.fields)
        for p in fixture.pages
    ]
    return spark.createDataFrame(rows, schema=schema)


def robots_rules_df(spark: SparkSession, fixture: WebFixture) -> DataFrame:
    rows = []
    for host, text in fixture.robots_txt.items():
        robots = parse_robots_txt(text)
        for ua, group in robots.groups.items():
            rows.append((host, ua, group.allow, group.disallow, group.crawl_delay_s))
    return spark.createDataFrame(rows or [], schema=schemas.ROBOTS_RULES)


def sitemap_seeds_df(spark: SparkSession, fixture: WebFixture) -> DataFrame:
    from infinitycrawler_spark.functions.urls import host_of

    rows = [(host_of(u) or "", u) for u in fixture.sitemap_urls]
    return spark.createDataFrame(rows or [], schema=schemas.SITEMAP_SEEDS)


def write_fixture_parquet(spark: SparkSession, fixture: WebFixture,
                          out_dir: str, partitions: int | None = None) -> dict[str, str]:
    """Materialize a fixture as parquet (bench path: read like any other
    table, with real scan pruning + pushdown)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    df = pages_df(spark, fixture)
    if partitions:
        df = df.repartition(partitions, "host")
    paths["crawl_pages"] = os.path.join(out_dir, "crawl_pages.parquet")
    df.write.mode("overwrite").parquet(paths["crawl_pages"])
    paths["robots_rules"] = os.path.join(out_dir, "robots_rules.parquet")
    robots_rules_df(spark, fixture).write.mode("overwrite").parquet(paths["robots_rules"])
    paths["sitemap_seeds"] = os.path.join(out_dir, "sitemap_seeds.parquet")
    sitemap_seeds_df(spark, fixture).write.mode("overwrite").parquet(paths["sitemap_seeds"])
    return paths
