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

Two engines behind one row kernel:

- ``arrow`` (default): ``mapInArrow`` — the payload ``bytes`` column
  stays in the record batch's single contiguous Arrow buffer and rows
  are handed to the validator as ZERO-COPY memoryview slices. The
  pandas engine materializes one Python ``bytes`` object per row
  (~2 GB of allocator churn per million 2 KB payloads), which is the
  byte-stream/allocator pressure that binds this stage at high
  parallelism (BENCH/BASELINE.md §0 membw collapse; §6 roadmap 3).
- ``pandas``: the original ``mapInPandas`` path, kept as a fallback
  (SPARK_GRAFT_PARSE=pandas) and as the A/B twin for the equivalence
  test.
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
    urls = cols["url"]; hosts = cols["host"]
    seqs = cols["enqueue_seq"]; depths = cols["depth"]
    statuses = cols["last_status_code"]
    xrts = cols.get("x_robots_tag") or none
    metas = cols.get("robots_meta") or none
    base_hrefs = cols.get("base_href") or none
    canon_hrefs = cols.get("canonical_href") or none
    links_col = cols.get("links") or none
    ctypes = cols.get("content_type") or none
    charsets = cols.get("charset") or none
    cencs = cols.get("content_encoding") or none
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
            # response body re-read as text
            raw_content = bytes(body).decode(
                charset or "utf-8", errors="replace")
            if isinstance(ctype, str) and "html" in ctype:
                html = extract_html(bytes(body), charset or "utf-8")
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
    return {
        "url": urls, "host": hosts, "enqueue_seq": seqs, "depth": depths,
        "last_status_code": statuses,
        "can_index": c_can_index, "can_follow": c_can_follow,
        "canonical": c_canonical,
        "content_type": ctypes, "charset": charsets,
        "content_encoding": cencs if cols.get("content_encoding") else none,
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
    engine = os.environ.get("SPARK_GRAFT_PARSE", "arrow")

    if engine == "arrow":
        def parse_batches_arrow(batches) -> Iterator:
            import pyarrow as pa

            out_schema = _arrow_out_schema()
            for batch in batches:
                n = batch.num_rows
                if not n:
                    continue
                names = batch.schema.names
                cols = {}
                for name in names:
                    arr = batch.column(names.index(name))
                    if name in ("bytes", "body"):
                        cols[name] = _binary_views(arr)
                    else:
                        cols[name] = arr.to_pylist()
                out = _parse_kernel(cols, n, user_agent, validate)
                arrays = [pa.array(out[f.name], type=f.type)
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
            yield pd.DataFrame({
                "url": out["url"], "host": out["host"],
                "enqueue_seq": pd.array(
                    [int(s) for s in out["enqueue_seq"]], dtype="int64"),
                "depth": pd.array(
                    [int(d) for d in out["depth"]], dtype="int32"),
                "last_status_code": pd.array(
                    [None if s is None or s != s else int(s)
                     for s in out["last_status_code"]], dtype="Int32"),
                "can_index": out["can_index"],
                "can_follow": out["can_follow"],
                "canonical": out["canonical"],
                "content_type": out["content_type"],
                "charset": out["charset"],
                "content_encoding": out["content_encoding"],
                "robots_rules": out["robots_rules"],
                "raw_content": out["raw_content"],
                "links": out["links"],
                "image_ok": out["image_ok"], "psnr_db": out["psnr_db"],
                "phash_match": out["phash_match"],
                "caption_ok": out["caption_ok"],
            })

    return joined.mapInPandas(parse_batches, schema=schemas.PARSED)
