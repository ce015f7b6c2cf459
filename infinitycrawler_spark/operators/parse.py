"""Parse operator — Arrow-vectorized content processing.

Spark-first shape of DefaultContentProcessor.Parse
(/root/reference/src/InfinityCrawler/Processing/Content/DefaultContentProcessor.cs:15-52)
plus the image-payload invariant of BASELINE.json input_hint, fused in
one ``mapInPandas`` pass (narrow — no shuffle): per batch it

- collects page robots rules (X-Robots-Tag header values + meta robots,
  :27-45) and evaluates can_index/can_follow for the job user agent
  (CrawlRunner.cs:96-127);
- resolves the canonical link and every anchor against the page URL and
  optional <base href> (:54-116), dropping missing/malformed/non-http
  anchors;
- decodes the image payload, checks PSNR ≥ 40 dB / exact pixels,
  recomputes the phash, and compares the caption.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from infinitycrawler_spark import schemas
from infinitycrawler_spark.functions.images import validate_payload
from infinitycrawler_spark.functions.robots import evaluate_page_robots
from infinitycrawler_spark.functions.urls import resolve_href, scheme_of
from infinitycrawler_spark.settings import CrawlSettings

PAYLOAD_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
CONTENT_COLS = [
    "url", "x_robots_tag", "robots_meta", "base_href", "canonical_href",
    "links", "content_type", "charset",
    *PAYLOAD_COLS,
]


def content_cols(validate_payload: bool, has_body: bool = False) -> list[str]:
    """Columns the parse pass needs. With payload validation off, the
    image payload (≈95% of the table bytes) must never be read, cached,
    or Arrow-serialized — mapInPandas sends every joined column to
    Python, so pruning has to happen here, not in Catalyst. ``has_body``
    adds the raw-HTML ``body`` column (pages in bytes mode)."""
    cols = (CONTENT_COLS if validate_payload
            else [c for c in CONTENT_COLS if c not in PAYLOAD_COLS])
    return [*cols, "body"] if has_body else cols


def parse_round(
    success_attempts: DataFrame,
    pages_content: DataFrame,
    settings: CrawlSettings,
) -> DataFrame:
    """success_attempts: ATTEMPT rows with 2xx status. Returns PARSED."""
    has_body = "body" in pages_content.columns
    joined = success_attempts.select(
        "url", "host", "enqueue_seq", "depth",
        success_attempts["status_code"].alias("last_status_code"),
    ).join(pages_content.select(
        *content_cols(settings.validate_payload, has_body=has_body)),
           "url", "left")

    user_agent = settings.user_agent
    validate = settings.validate_payload

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from infinitycrawler_spark.functions.html import extract_html

        for pdf in batches:
            out_rows = []
            for row in pdf.itertuples():
                url = row.url
                # raw-HTML-bytes mode (DefaultContentProcessor.cs:24-25):
                # a non-null body overrides the structured fixture columns
                body = getattr(row, "body", None)
                row_base_href = row.base_href
                row_canonical_href = row.canonical_href
                row_robots_meta = row.robots_meta
                row_links = row.links
                if body is not None and isinstance(
                        row.content_type, str) and "html" in row.content_type:
                    html = extract_html(bytes(body), row.charset or "utf-8")
                    row_base_href = html.base_href
                    row_canonical_href = html.canonical_href
                    row_robots_meta = html.robots_meta
                    row_links = html.links
                rules = list(row.x_robots_tag) if row.x_robots_tag is not None else []
                if isinstance(row_robots_meta, str) and row_robots_meta:
                    rules.append(row_robots_meta)
                can_index, can_follow = evaluate_page_robots(rules, user_agent)
                base_href = row_base_href if isinstance(row_base_href, str) else None
                canonical = None
                if isinstance(row_canonical_href, str) and row_canonical_href:
                    canonical = resolve_href(url, row_canonical_href, base_href)
                links = []
                for link in (row_links if row_links is not None else []):
                    href = link["href"] if isinstance(link, dict) else link.href
                    text = link["text"] if isinstance(link, dict) else link.text
                    title = link["title"] if isinstance(link, dict) else link.title
                    rel = link["rel"] if isinstance(link, dict) else link.rel
                    if href is None:
                        continue  # DefaultContentProcessor.cs:89-92
                    loc = resolve_href(url, href, base_href)
                    if loc is None:
                        continue  # :94-99 invalid links ignored
                    if scheme_of(loc) not in ("http", "https"):
                        continue  # :101-105 non-HTTP schemes skipped
                    links.append({"location": loc, "text": text,
                                  "title": title, "rel": rel})
                image_ok = psnr = phash_match = caption_ok = None
                if validate and getattr(row, "image_id", None) is not None:
                    path = url.split(row.host, 1)[1] if row.host in url else url
                    image_ok, psnr, phash_match, caption_ok = validate_payload(
                        row.image_id, row.bytes, int(row.w), int(row.h),
                        row.fmt, row.caption, int(row.phash), row.host, path)
                out_rows.append({
                    "url": url, "host": row.host,
                    "enqueue_seq": int(row.enqueue_seq), "depth": int(row.depth),
                    "last_status_code": int(row.last_status_code),
                    "can_index": can_index, "can_follow": can_follow,
                    "canonical": canonical,
                    "content_type": row.content_type, "charset": row.charset,
                    "links": links,
                    "image_ok": image_ok, "psnr_db": psnr,
                    "phash_match": phash_match, "caption_ok": caption_ok,
                })
            if out_rows:
                out = pd.DataFrame(out_rows)
                out["depth"] = out["depth"].astype("int32")
                out["last_status_code"] = out["last_status_code"].astype("Int32")
                yield out

    return joined.mapInPandas(parse_batches, schema=schemas.PARSED)
