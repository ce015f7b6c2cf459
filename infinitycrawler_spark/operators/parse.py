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
            # columnar accumulators: one list per output column beats a
            # list of per-row dicts (no per-row dict alloc; DataFrame
            # construction from columns is a straight copy per column)
            n = len(pdf)
            c_url, c_host, c_seq, c_depth, c_status = [], [], [], [], []
            c_can_index, c_can_follow, c_canonical = [], [], []
            c_ctype, c_charset, c_links = [], [], []
            c_image_ok, c_psnr, c_phash, c_caption = [], [], [], []
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
                c_url.append(url); c_host.append(row.host)
                c_seq.append(int(row.enqueue_seq)); c_depth.append(int(row.depth))
                c_status.append(int(row.last_status_code))
                c_can_index.append(can_index); c_can_follow.append(can_follow)
                c_canonical.append(canonical)
                c_ctype.append(row.content_type); c_charset.append(row.charset)
                c_links.append(links)
                c_image_ok.append(image_ok); c_psnr.append(psnr)
                c_phash.append(phash_match); c_caption.append(caption_ok)
            if n:
                yield pd.DataFrame({
                    "url": c_url, "host": c_host,
                    "enqueue_seq": pd.array(c_seq, dtype="int64"),
                    "depth": pd.array(c_depth, dtype="int32"),
                    "last_status_code": pd.array(c_status, dtype="Int32"),
                    "can_index": c_can_index, "can_follow": c_can_follow,
                    "canonical": c_canonical,
                    "content_type": c_ctype, "charset": c_charset,
                    "links": c_links,
                    "image_ok": c_image_ok, "psnr_db": c_psnr,
                    "phash_match": c_phash, "caption_ok": c_caption,
                })

    return joined.mapInPandas(parse_batches, schema=schemas.PARSED)
