"""Real-HTTP fetch operator — the socket-backed variant of
``fetch_round`` behind the same interface (ATTEMPT schema out,
host-grouped ``applyInPandas``).

Re-expresses DefaultRequestProcessor's request loop
(/root/reference/src/InfinityCrawler/Processing/Requests/DefaultRequestProcessor.cs:137-198):
``requests`` session with ``allow_redirects=False`` (the engine's
redirect operator handles 3xx routing, like the reference's
``AllowAutoRedirect = false``, Crawler.cs:26-29), per-request timeout
(:166, RequestTimeout), politeness delay between request STARTS within
a host (:84-90, DelayBetweenRequestStart + jitter handled by the
synthetic scheduler; here real wall-clock sleep), and transport errors
surfaced as retryable attempts (:176-183).

Concurrency model at scale: one Spark task per (host, salt) group —
requests within a host are sequential (politeness), hosts fetch in
parallel across executor slots, exactly the per-host-queue model of the
synthetic scheduler. The payload body is returned as a ``body`` binary
column so the raw-HTML parse path consumes it directly; header-borne
page-robots rules ride along as ``x_robots_tag``.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    StringType,
    StructField,
    StructType,
)

from infinitycrawler_spark import schemas
from infinitycrawler_spark.settings import RequestProcessorOptions

#: ATTEMPT plus the real response payload columns.
HTTP_ATTEMPT = StructType([
    *schemas.ATTEMPT.fields,
    StructField("body", BinaryType(), True),
    StructField("content_type", StringType(), True),
    StructField("charset", StringType(), True),
    StructField("content_encoding", StringType(), True),
    StructField("x_robots_tag", ArrayType(StringType()), True),
])


def _fetch_one(session, url: str, timeout_s: float, user_agent: str):
    """One real request. → (status, redirect_to, body, content_type,
    charset, content_encoding, x_robots_tag, error)."""
    try:
        resp = session.get(
            url, timeout=timeout_s, allow_redirects=False,
            headers={"User-Agent": user_agent})
    except Exception as exc:  # transport error / timeout → retryable
        return None, None, None, None, None, None, None, type(exc).__name__
    ctype = resp.headers.get("Content-Type", "")
    charset = None
    main_type = ctype
    if ";" in ctype:
        main_type, _, rest = ctype.partition(";")
        if "charset=" in rest:
            # the charset token ends at the next parameter separator
            # ('...; charset=utf-8; boundary=x' must yield 'utf-8')
            charset = (rest.split("charset=", 1)[1]
                       .split(";", 1)[0].strip().strip('"') or None)
    xrt = resp.headers.get("X-Robots-Tag")
    # ContentEncoding joined like DefaultContentProcessor.cs:21
    cenc = resp.headers.get("Content-Encoding")
    return (resp.status_code, resp.headers.get("Location"),
            resp.content, main_type.strip() or None, charset, cenc,
            [xrt] if xrt else [], None)


def http_fetch_round(
    due: DataFrame,
    host_state: DataFrame,
    options: RequestProcessorOptions,
    user_agent: str = "InfinityCrawler-Spark",
) -> DataFrame:
    """due: frontier rows (url, host, enqueue_seq, depth). Returns
    HTTP_ATTEMPT: one row per real request plus the per-host ``is_state``
    trailer, exactly like the synthetic ``fetch_round`` — ``CrawlJob``'s
    split/route/parse stages run unchanged on the output."""
    from pyspark.sql import functions as F

    has_priority = "priority" in due.columns
    due_sel = due.select("url", "host", "enqueue_seq", "depth",
                         *(["priority"] if has_priority else []))
    if not has_priority:
        due_sel = due_sel.withColumn("priority", F.lit(0))
    joined = due_sel.join(host_state, "host", "left")

    delay_ms = options.delay_between_request_start_ms
    timeout_s = options.request_timeout_ms / 1000.0

    throttle_at = options.timeout_before_throttle_ms
    step = options.throttling_request_backoff_ms
    min_successes = options.min_sequential_successes_to_minimise_throttling

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import requests

        # same per-host priority-queue order as the synthetic fetcher
        pdf = pdf.sort_values(["priority", "enqueue_seq"],
                              ascending=[False, True]).reset_index(drop=True)
        host = pdf["host"].iloc[0]
        # carry the host's AIMD scheduler state across rounds, exactly
        # like the synthetic scheduler (politeness.py; the reference's
        # throttle state lives for the processor's lifetime,
        # DefaultRequestProcessor.cs:44-45) — so mixing the HTTP and
        # synthetic processors across rounds keeps one coherent state
        backoff_ms = (int(pdf["backoff_ms"].iloc[0])
                      if pd.notna(pdf["backoff_ms"].iloc[0]) else 0)
        streak = (int(pdf["successes"].iloc[0])
                  if pd.notna(pdf["successes"].iloc[0]) else 0)
        session = requests.Session()
        rows = []
        t0 = time.monotonic()
        last_start = None
        n = 0
        for row in pdf.itertuples():
            # politeness: space request STARTS by the merged delay plus
            # the current AIMD backoff (DefaultRequestProcessor.cs:58-66)
            now = time.monotonic()
            wait_s = 0.0
            if last_start is not None:
                wait_s = max(
                    0.0, last_start + (delay_ms + backoff_ms) / 1000.0 - now)
                if wait_s > 0:
                    time.sleep(wait_s)
            start = time.monotonic()
            last_start = start
            (status, redir, body, ctype, charset, cenc, xrt,
             error) = _fetch_one(session, row.url, timeout_s, user_agent)
            elapsed_ms = (time.monotonic() - start) * 1000.0
            n += 1
            # AIMD throttle — the reference's rule is elapsed-time-based
            # (DefaultRequestProcessor.cs:112-130), identical to
            # politeness.py: slow response (incl. timeouts/transport
            # errors, which burn the full wait) → backoff += step, streak
            # reset; fast response while throttled → streak++, at
            # min_successes → backoff -= step (floor 0), streak reset
            if throttle_at > 0 and elapsed_ms > throttle_at:
                streak = 0
                backoff_ms += step
            elif backoff_ms > 0:
                streak += 1
                if streak >= min_successes:
                    backoff_ms = max(0, backoff_ms - step)
                    streak = 0
            rows.append({
                "url": row.url, "host": host,
                "enqueue_seq": int(row.enqueue_seq), "depth": int(row.depth),
                "status_code": status, "redirect_to": redir, "error": error,
                "start_delay_ms": wait_s * 1000.0,
                "request_start_ms": (start - t0) * 1000.0,
                "elapsed_ms": elapsed_ms, "is_state": False,
                "backoff_ms": None, "successes": None,
                "request_count": None, "clock_ms": None,
                "body": body, "content_type": ctype, "charset": charset,
                "content_encoding": cenc, "x_robots_tag": xrt,
            })
        session.close()
        rows.append({
            "url": "", "host": host, "enqueue_seq": -1, "depth": 0,
            "status_code": None, "redirect_to": None, "error": None,
            "start_delay_ms": None, "request_start_ms": None,
            "elapsed_ms": None, "is_state": True,
            "backoff_ms": backoff_ms, "successes": streak,
            "request_count": n,  # delta; split_attempts re-adds the base
            "clock_ms": (time.monotonic() - t0) * 1000.0,
            "body": None, "content_type": None, "charset": None,
            "content_encoding": None, "x_robots_tag": None,
        })
        out = pd.DataFrame(rows)
        out["status_code"] = out["status_code"].astype("Int32")
        out["depth"] = out["depth"].astype("int32")
        out["backoff_ms"] = out["backoff_ms"].astype("Int64")
        out["successes"] = out["successes"].astype("Int64")
        out["request_count"] = out["request_count"].astype("Int64")
        return out

    return joined.groupBy("host").applyInPandas(fetch_group, schema=HTTP_ATTEMPT)


# ------------------------------------------------- CrawlJob seam adapters

def http_request_processor(due, pages_meta, host_state, options,
                           user_agent: str = "InfinityCrawler-Spark", **_kw):
    """``CrawlJob(request_processor=...)`` adapter: real sockets instead
    of the synthetic pages-table join. ``pages_meta`` and the skew-salt
    kwargs are ignored — real requests already serialize per host."""
    return http_fetch_round(due, host_state, options, user_agent=user_agent)


def http_content_processor(success_attempts, pages_content, settings):
    """``CrawlJob(content_processor=...)`` adapter: parse the response
    bodies the HTTP fetch carried back on the attempt rows themselves
    (the reference's Parse consumes the request's content stream,
    Crawler.cs:66-74) instead of joining the synthetic pages table."""
    from dataclasses import replace as _dc_replace

    from pyspark.sql import functions as F

    from infinitycrawler_spark.operators.parse import parse_round

    derived_pages = success_attempts.select(
        "url", "x_robots_tag",
        F.lit(None).cast("string").alias("robots_meta"),
        F.lit(None).cast("string").alias("base_href"),
        F.lit(None).cast("string").alias("canonical_href"),
        F.lit(None).cast(
            "array<struct<href:string,text:string,title:string,rel:string>>"
        ).alias("links"),
        "content_type", "charset", "content_encoding", "body")
    if settings.validate_payload:
        # no synthetic image payload on real responses
        settings = _dc_replace(settings, validate_payload=False)
    return parse_round(
        success_attempts.drop("x_robots_tag", "content_type", "charset",
                              "content_encoding"),
        derived_pages, settings)
