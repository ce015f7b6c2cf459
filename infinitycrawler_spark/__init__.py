"""infinitycrawler_spark — a PySpark-native web-crawl analytics engine.

A from-scratch re-creation of the capabilities of
TurnerSoftware/InfinityCrawler (reference at /root/reference, C#/.NET)
as a distributed Spark engine: URL frontier + fetch scheduler with
politeness/AIMD throttling, robots.txt + page-robots gating, redirect
and retry routing, an exact URL-seen set (Bloom-prefiltered anti-join),
snapshot/checkpoint state tables, and vectorized (Arrow) parsing and
image-payload validation — plus the training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis).

Design: DataFrame-first BSP round loop (Nutch-style
generate → fetch → parse → expand → update), never per-row Python.
"""

__version__ = "0.1.0"

from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions

__all__ = ["CrawlSettings", "RequestProcessorOptions", "__version__"]
