"""Parse operator — Arrow-vectorized content processing.

Spark-first shape of DefaultContentProcessor.Parse
(/root/reference/src/InfinityCrawler/Processing/Content/DefaultContentProcessor.cs:15-52)
plus the image-payload invariant of BASELINE.json input_hint, fused in
one narrow map pass (no shuffle): per batch it

- collects page robots rules (X-Robots-Tag header values + meta robots,
  :27-45) and evaluates can_index/can_follow for the job user agent
  (CrawlRunner.cs:96-127);
- resolves the canonical link and every anchor against the page URL and
  optional <base href> (:54-116), dropping missing/malformed/non-http
  anchors;
- decodes the image payload, checks PSNR ≥ 40 dB / exact pixels,
  recomputes the phash, and compares the caption.

Two engines behind one row kernel, selectable with
``SPARK_GRAFT_PARSE=pandas|arrow``:

- ``pandas`` (default): ``mapInPandas``. Chosen BY MEASUREMENT, not
  theory: at the benchmark payload size (2.3 KB rows) interleaved A/B
  at local[8] put it 15-30% ahead of the arrow engine (38.5-50.6k vs
  32.4-36.3k pages/s) — Spark's C-level Arrow↔pandas conversion beats
  Python-level RecordBatch assembly, and the per-row ``bytes`` objects
  it materializes are cheap at this size (BENCH/BASELINE.md §3).
- ``arrow``: ``mapInArrow`` — the payload ``bytes`` column stays in
  the record batch's contiguous Arrow buffer and rows reach the
  validator as ZERO-COPY memoryview slices; pass-through columns are
  reused as unconverted Arrow arrays. The expected regime for this
  engine is LARGE payloads (hundreds of KB per row), where per-row
  bytes-object allocation and copy traffic dominate; at small payloads
  its per-batch Python-side assembly overhead wins out, so it is not
  the default. Equivalence is pinned row-for-row by
  tests/test_parse_arrow.py.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
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


def content_cols(validate_payload: bool, has_body: bool = False,
                 has_encoding: bool = False) -> list[str]:
    """Columns the parse pass needs. With payload validation off, the
    image payload (≈95% of the table bytes) must never be read, cached,
    or Arrow-serialized — the map pass receives every joined column, so
    pruning has to happen here, not in Catalyst. ``has_body`` adds the
    raw-HTML ``body`` column (pages in bytes mode); ``has_encoding``
    the Content-Encoding header column (older page tables predate it)."""
    cols = (CONTENT_COLS if validate_payload
            else [c for c in CONTENT_COLS if c not in PAYLOAD_COLS])
    if has_encoding:
        cols = [*cols, "content_encoding"]
    return [*cols, "body"] if has_body else cols


def _link_fields(link):
    if isinstance(link, dict):
        return link["href"], link["text"], link["title"], link["rel"]
    return link.href, link.text, link.title, link.rel


def _parse_kernel(cols: dict, n: int, user_agent: str, validate: bool) -> dict:
    """Shared per-row logic over plain Python column sequences.
    ``cols['bytes']``/``cols['body']`` rows may be any buffer (bytes or
    zero-copy memoryview). Returns output columns for PARSED order."""
    from infinitycrawler_spark.functions.html import extract_html

    none = [None] * n
    urls = cols["url"]; hosts = cols.get("host") or none
    xrts = cols.get("x_robots_tag") or none
    metas = cols.get("robots_meta") or none
    base_hrefs = cols.get("base_href") or none
    canon_hrefs = cols.get("canonical_href") or none
    links_col = cols.get("links") or none
    ctypes = cols.get("content_type") or none
    charsets = cols.get("charset") or none
    bodies = cols.get("body") or none
    image_ids = cols.get("image_id") or none
    payloads = cols.get("bytes") or none
    ws = cols.get("w") or none; hs = cols.get("h") or none
    fmts = cols.get("fmt") or none
    captions = cols.get("caption") or none
    phashes = cols.get("phash") or none

    c_can_index, c_can_follow, c_canonical = [], [], []
    c_rules, c_raw, c_links = [], [], []
    c_image_ok, c_psnr, c_phash, c_caption = [], [], [], []
    for i in range(n):
        url = urls[i]
        # raw-HTML-bytes mode (DefaultContentProcessor.cs:24-25): a
        # non-null body overrides the structured fixture columns
        body = bodies[i]
        row_base_href = base_hrefs[i]
        row_canonical_href = canon_hrefs[i]
        row_robots_meta = metas[i]
        row_links = links_col[i]
        ctype, charset = ctypes[i], charsets[i]
        raw_content = None
        if body is not None:
            # CrawledContent.RawContent (Crawler.cs:70-71): the
            # response body re-read as text. errors='replace' handles
            # bad bytes; an unknown/garbled charset TOKEN (real servers
            # send those) would raise LookupError at codec lookup, so
            # fall back to utf-8 rather than failing the task
            try:
                raw_content = bytes(body).decode(
                    charset or "utf-8", errors="replace")
            except LookupError:
                charset = "utf-8"
                raw_content = bytes(body).decode("utf-8", errors="replace")
            if isinstance(ctype, str) and "html" in ctype:
                try:
                    html = extract_html(bytes(body), charset or "utf-8")
                except LookupError:
                    html = extract_html(bytes(body), "utf-8")
                row_base_href = html.base_href
                row_canonical_href = html.canonical_href
                row_robots_meta = html.robots_meta
                row_links = html.links
        rules = list(xrts[i]) if xrts[i] is not None else []
        if isinstance(row_robots_meta, str) and row_robots_meta:
            rules.append(row_robots_meta)
        can_index, can_follow = evaluate_page_robots(rules, user_agent)
        base_href = row_base_href if isinstance(row_base_href, str) else None
        canonical = None
        if isinstance(row_canonical_href, str) and row_canonical_href:
            canonical = resolve_href(url, row_canonical_href, base_href)
        links = []
        for link in (row_links if row_links is not None else []):
            href, text, title, rel = _link_fields(link)
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
        if validate and image_ids[i] is not None:
            host = hosts[i]
            path = url.split(host, 1)[1] if host in url else url
            image_ok, psnr, phash_match, caption_ok = validate_payload(
                image_ids[i], payloads[i], int(ws[i]), int(hs[i]),
                fmts[i], captions[i], int(phashes[i]), host, path)
        c_can_index.append(can_index); c_can_follow.append(can_follow)
        c_canonical.append(canonical)
        c_rules.append(rules); c_raw.append(raw_content)
        c_links.append(links)
        c_image_ok.append(image_ok); c_psnr.append(psnr)
        c_phash.append(phash_match); c_caption.append(caption_ok)
    # computed columns only — pass-through columns (url/host/seq/depth/
    # status/content meta) are reused by the engines without conversion
    return {
        "can_index": c_can_index, "can_follow": c_can_follow,
        "canonical": c_canonical,
        "robots_rules": c_rules, "raw_content": c_raw,
        "links": c_links,
        "image_ok": c_image_ok, "psnr_db": c_psnr,
        "phash_match": c_phash, "caption_ok": c_caption,
    }


def _binary_views(arr) -> list:
    """Zero-copy per-row memoryview slices over a pyarrow Binary /
    LargeBinary array's contiguous data buffer — no per-row Python
    bytes objects, no copies."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        out = []
        for chunk in arr.chunks:
            out.extend(_binary_views(chunk))
        return out
    n = len(arr)
    bufs = arr.buffers()
    validity, offsets, data = bufs[0], bufs[1], bufs[2]
    if offsets is None:
        # an all-null column can materialize with null buffers —
        # np.frombuffer(None) would raise and fail the task
        return [None] * n
    dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(offsets, dtype=dt, count=n + 1,
                        offset=arr.offset * np.dtype(dt).itemsize)
    mv = memoryview(data) if data is not None else memoryview(b"")
    if arr.null_count == 0 or validity is None:
        return [mv[off[i]:off[i + 1]] for i in range(n)]
    bits = np.unpackbits(np.frombuffer(validity, dtype=np.uint8),
                         bitorder="little")
    base = arr.offset
    return [mv[off[i]:off[i + 1]] if bits[base + i] else None
            for i in range(n)]


def _arrow_out_schema():
    import pyarrow as pa

    link = pa.struct([("location", pa.string()), ("text", pa.string()),
                      ("title", pa.string()), ("rel", pa.string())])
    return pa.schema([
        ("url", pa.string()), ("host", pa.string()),
        ("enqueue_seq", pa.int64()), ("depth", pa.int32()),
        ("last_status_code", pa.int32()),
        ("can_index", pa.bool_()), ("can_follow", pa.bool_()),
        ("canonical", pa.string()),
        ("content_type", pa.string()), ("charset", pa.string()),
        ("content_encoding", pa.string()),
        ("robots_rules", pa.list_(pa.string())),
        ("raw_content", pa.string()),
        ("links", pa.list_(link)),
        ("image_ok", pa.bool_()), ("psnr_db", pa.float64()),
        ("phash_match", pa.bool_()), ("caption_ok", pa.bool_()),
    ])


def parse_round(
    success_attempts: DataFrame,
    pages_content: DataFrame,
    settings: CrawlSettings,
) -> DataFrame:
    """success_attempts: ATTEMPT rows with 2xx status. Returns PARSED."""
    has_body = "body" in pages_content.columns
    has_encoding = "content_encoding" in pages_content.columns
    joined = success_attempts.select(
        "url", "host", "enqueue_seq", "depth",
        success_attempts["status_code"].alias("last_status_code"),
    ).join(pages_content.select(
        *content_cols(settings.validate_payload, has_body=has_body,
                      has_encoding=has_encoding)),
           "url", "left")

    user_agent = settings.user_agent
    validate = settings.validate_payload
    engine = os.environ.get("SPARK_GRAFT_PARSE", "pandas")

    if engine == "arrow":
        # columns the row kernel must see as Python values; everything
        # else passes through as UNTOUCHED arrow arrays (url/host/seq/
        # depth/status/content meta — zero conversion either direction),
        # and the binary columns arrive as zero-copy memoryview slices
        # over the batch buffer (no per-row bytes objects — the
        # allocator churn this engine exists to kill)
        KERNEL_COLS = ("url", "host", "x_robots_tag", "robots_meta",
                       "base_href", "canonical_href", "links",
                       "content_type", "charset", "image_id", "w", "h",
                       "fmt", "caption", "phash")

        def parse_batches_arrow(batches) -> Iterator:
            import pyarrow as pa

            out_schema = _arrow_out_schema()

            def _ensure(arr, typ):
                return arr if arr.type.equals(typ) else arr.cast(typ)

            for batch in batches:
                n = batch.num_rows
                if not n:
                    continue
                names = batch.schema.names

                def col(name):
                    return batch.column(names.index(name))

                cols = {name: col(name).to_pylist()
                        for name in KERNEL_COLS if name in names}
                for name in ("bytes", "body"):
                    if name in names:
                        cols[name] = _binary_views(col(name))
                out = _parse_kernel(cols, n, user_agent, validate)
                null_str = pa.nulls(n, pa.string())
                passthrough = {
                    "url": _ensure(col("url"), pa.string()),
                    "host": _ensure(col("host"), pa.string()),
                    "enqueue_seq": _ensure(col("enqueue_seq"), pa.int64()),
                    "depth": _ensure(col("depth"), pa.int32()),
                    "last_status_code": _ensure(col("last_status_code"),
                                                pa.int32()),
                    "content_type": (_ensure(col("content_type"), pa.string())
                                     if "content_type" in names else null_str),
                    "charset": (_ensure(col("charset"), pa.string())
                                if "charset" in names else null_str),
                    "content_encoding": (
                        _ensure(col("content_encoding"), pa.string())
                        if "content_encoding" in names else null_str),
                }
                arrays = [passthrough[f.name] if f.name in passthrough
                          else pa.array(out[f.name], type=f.type)
                          for f in out_schema]
                yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

        return joined.mapInArrow(parse_batches_arrow, schema=schemas.PARSED)

    def parse_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            n = len(pdf)
            if not n:
                continue
            cols = {name: pdf[name].tolist() for name in pdf.columns}
            out = _parse_kernel(cols, n, user_agent, validate)
            none = [None] * n
            yield pd.DataFrame({
                "url": pdf["url"].values, "host": pdf["host"].values,
                "enqueue_seq": pdf["enqueue_seq"].values,
                "depth": pd.array(
                    [int(d) for d in cols["depth"]], dtype="int32"),
                "last_status_code": pd.array(
                    [None if s is None or s != s else int(s)
                     for s in cols["last_status_code"]], dtype="Int32"),
                "can_index": out["can_index"],
                "can_follow": out["can_follow"],
                "canonical": out["canonical"],
                "content_type": cols.get("content_type", none),
                "charset": cols.get("charset", none),
                "content_encoding": cols.get("content_encoding", none),
                "robots_rules": out["robots_rules"],
                "raw_content": out["raw_content"],
                "links": out["links"],
                "image_ok": out["image_ok"], "psnr_db": out["psnr_db"],
                "phash_match": out["phash_match"],
                "caption_ok": out["caption_ok"],
            })

    return joined.mapInPandas(parse_batches, schema=schemas.PARSED)
