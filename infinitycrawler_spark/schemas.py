"""Explicit StructTypes for every state table — never inferred
(SURVEY.md §1.3; the reference's schema is compiled C# classes,
CrawledUri.cs:10-56)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LINK = StructType([
    StructField("href", StringType()),
    StructField("text", StringType()),
    StructField("title", StringType()),
    StructField("rel", StringType()),
])

#: The synthetic web (FIXTURES.md §1) + input_hint payload columns.
CRAWL_PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("status_code", IntegerType(), False),
    StructField("redirect_to", StringType(), True),
    StructField("delay_ms", IntegerType(), False),
    StructField("content_type", StringType(), True),
    StructField("charset", StringType(), True),
    StructField("content_encoding", StringType(), True),
    StructField("x_robots_tag", ArrayType(StringType()), True),
    StructField("robots_meta", StringType(), True),
    StructField("base_href", StringType(), True),
    StructField("canonical_href", StringType(), True),
    StructField("links", ArrayType(LINK), True),
    StructField("image_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("fmt", StringType(), False),
    StructField("caption", StringType(), False),
    StructField("phash", LongType(), False),
])

#: Columns the fetch path reads — NEVER the payload (column pruning is
#: the load-bearing optimization: frontier ops must not touch `bytes`).
PAGES_META_COLS = ["url", "status_code", "redirect_to", "delay_ms"]

FRONTIER = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("url_key", LongType(), False),
    StructField("enqueue_seq", LongType(), False),
    StructField("depth", IntegerType(), False),
    StructField("round_enqueued", IntegerType(), False),
    #: north-rule addition (absent from the reference, whose queue is
    #: FIFO only — DefaultRequestProcessor.cs:19): higher fetches
    #: earlier within a host's politeness round; ties keep FIFO order
    StructField("priority", IntegerType(), False),
])

SEEN = StructType([
    StructField("url", StringType(), False),
    StructField("url_key", LongType(), False),
    StructField("host", StringType(), False),
])

#: One request attempt — CrawlRequest parity (CrawledUri.cs:36-42:
#: RequestStart/ElapsedTime/StatusCode/IsSuccessfulStatus). start_ms is
#: the per-host scheduler clock (virtual ms for the synthetic fetch,
#: wall ms since round start for the HTTP fetch); a transport-error
#: attempt has a null status_code (CrawlRunner.cs:238-243).
ATTEMPT_REC = StructType([
    StructField("start_ms", DoubleType(), True),
    StructField("elapsed_ms", DoubleType(), True),
    StructField("status_code", IntegerType(), True),
    StructField("is_success", BooleanType(), False),
])

#: DDL strings for selectExpr casts/constructors of the nested logs.
ATT_REC_DDL = ("struct<start_ms:double,elapsed_ms:double,"
               "status_code:int,is_success:boolean>")
ATT_LOG_DDL = f"array<{ATT_REC_DDL}>"
#: One redirect hop — CrawledUriRedirect parity (CrawledUri.cs:30-34:
#: the pre-redirect location plus the requests made against it).
HOP_LOG_DDL = f"array<struct<location:string,attempts:{ATT_LOG_DDL}>>"

STATES = StructType([
    StructField("url", StringType(), False),
    StructField("n_attempts", IntegerType(), False),
    StructField("redirect_chain", ArrayType(StringType()), False),
    StructField("last_success", BooleanType(), False),
    #: UriCrawlState.Requests (UriCrawlState.cs:10) — this URI's attempts
    StructField("att_log", ArrayType(ATTEMPT_REC), True),
    #: CrawledUri.RedirectChain with per-hop request lists
    StructField("hop_logs", ArrayType(StructType([
        StructField("location", StringType(), True),
        StructField("attempts", ArrayType(ATTEMPT_REC), True),
    ])), True),
])

#: The upsert-path state row (VERDICT r4 next #1): the per-attempt and
#: per-hop logs are SPLIT OUT of the table that re-materializes every
#: round into append-only delta tables (ATT_ROWS / HOP_ROWS below), so
#: the per-round localCheckpoint carries only small fixed-width rows —
#: the measured O(|state|·payload) round residual becomes O(|state|)
#: with a small constant, and the history is written once, never
#: rewritten (BENCH/BASELINE.md §8).
STATES_LIVE = StructType([
    StructField("url", StringType(), False),
    StructField("n_attempts", IntegerType(), False),
    StructField("redirect_chain", ArrayType(StringType()), False),
    StructField("last_success", BooleanType(), False),
])

#: Append-only attempt history — one flat row per fetch attempt, keyed
#: (url, attempt_no); UriCrawlState.Requests (UriCrawlState.cs:10)
#: re-expressed as a delta table.
ATT_ROWS = StructType([
    StructField("url", StringType(), False),
    StructField("attempt_no", IntegerType(), False),
    StructField("start_ms", DoubleType(), True),
    StructField("elapsed_ms", DoubleType(), True),
    StructField("status_code", IntegerType(), True),
    StructField("is_success", BooleanType(), False),
])

#: Append-only redirect-hop history — one row per (target url, hop),
#: the hop source's attempts nested at move time so emission needs no
#: transitive lookup; CrawledUriRedirect parity (CrawledUri.cs:30-34).
HOP_ROWS = StructType([
    StructField("url", StringType(), False),
    StructField("hop_seq", IntegerType(), False),
    StructField("location", StringType(), True),
    StructField("attempts", ArrayType(ATTEMPT_REC), True),
])

HOST_STATE = StructType([
    StructField("host", StringType(), False),
    StructField("backoff_ms", LongType(), False),
    StructField("successes", LongType(), False),
    StructField("request_count", LongType(), False),
    StructField("clock_ms", DoubleType(), False),
])

ATTEMPT = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("enqueue_seq", LongType(), False),
    StructField("depth", IntegerType(), False),
    StructField("status_code", IntegerType(), True),
    StructField("redirect_to", StringType(), True),
    StructField("error", StringType(), True),
    StructField("start_delay_ms", DoubleType(), True),
    StructField("request_start_ms", DoubleType(), True),
    StructField("elapsed_ms", DoubleType(), True),
    StructField("is_state", BooleanType(), False),
    StructField("backoff_ms", LongType(), True),
    StructField("successes", LongType(), True),
    StructField("request_count", LongType(), True),
    StructField("clock_ms", DoubleType(), True),
])

RESOLVED_LINK = StructType([
    StructField("location", StringType()),
    StructField("text", StringType()),
    StructField("title", StringType()),
    StructField("rel", StringType()),
])

PARSED = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("enqueue_seq", LongType(), False),
    StructField("depth", IntegerType(), False),
    StructField("last_status_code", IntegerType(), True),
    StructField("can_index", BooleanType(), False),
    StructField("can_follow", BooleanType(), False),
    StructField("canonical", StringType(), True),
    StructField("content_type", StringType(), True),
    StructField("charset", StringType(), True),
    StructField("content_encoding", StringType(), True),
    #: CrawledContent.PageRobotRules (X-Robots-Tag values + meta robots)
    StructField("robots_rules", ArrayType(StringType()), True),
    #: CrawledContent.RawContent — body text (null when the page row has
    #: no raw body, i.e. pre-extracted structured fixtures)
    StructField("raw_content", StringType(), True),
    StructField("links", ArrayType(RESOLVED_LINK), False),
    StructField("image_ok", BooleanType(), True),
    StructField("psnr_db", DoubleType(), True),
    StructField("phash_match", BooleanType(), True),
    StructField("caption_ok", BooleanType(), True),
])

RESULTS = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("status", StringType(), False),
    StructField("n_attempts", IntegerType(), False),
    StructField("redirect_chain", ArrayType(StringType()), False),
    StructField("last_status_code", IntegerType(), True),
    StructField("links", ArrayType(StringType()), False),
    StructField("canonical", StringType(), True),
    StructField("round", IntegerType(), False),
    StructField("image_ok", BooleanType(), True),
    StructField("psnr_db", DoubleType(), True),
    StructField("phash_match", BooleanType(), True),
    StructField("caption_ok", BooleanType(), True),
    # -- CrawledContent parity (CrawledUri.cs:44-56): null on results
    # that the reference emits without Content (admission results,
    # "crawled without content" terminals, noindex RobotsBlocked)
    StructField("content_type", StringType(), True),
    StructField("charset", StringType(), True),
    StructField("content_encoding", StringType(), True),
    StructField("page_robot_rules", ArrayType(StringType()), True),
    StructField("raw_content", StringType(), True),
    #: CrawledContent.Links with title/text/rel (CrawlLink.cs:7-13);
    #: the bare-string ``links`` column above stays for the oracles
    StructField("links_detail", ArrayType(RESOLVED_LINK), True),
    # -- per-request detail (CrawledUri.cs:16-17): Requests of the final
    # location, and the redirect chain with per-hop request lists
    StructField("attempts", ArrayType(ATTEMPT_REC), True),
    StructField("redirect_hops", ArrayType(StructType([
        StructField("location", StringType(), True),
        StructField("attempts", ArrayType(ATTEMPT_REC), True),
    ])), True),
])

CANDIDATES = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("kind", StringType(), False),  # seed | link | retry | redirect
    StructField("parent_seq", LongType(), False),
    StructField("child_pos", IntegerType(), False),
    StructField("depth", IntegerType(), False),
    StructField("skip_budget", BooleanType(), False),
    StructField("moved_chain", ArrayType(StringType()), True),
])

ROBOTS_RULES = StructType([
    StructField("host", StringType(), False),
    StructField("user_agent", StringType(), False),
    StructField("allow", ArrayType(StringType()), False),
    StructField("disallow", ArrayType(StringType()), False),
    StructField("crawl_delay_s", IntegerType(), True),
])

SITEMAP_SEEDS = StructType([
    StructField("host", StringType(), False),
    StructField("url", StringType(), False),
])

#: per-partition lineage (north rule): host shard → fetched → emitted
LINEAGE = StructType([
    StructField("round", IntegerType(), False),
    StructField("host", StringType(), False),
    StructField("fetched", LongType(), False),
    StructField("links_emitted", LongType(), False),
    StructField("enqueued", LongType(), False),
])

METRICS = StructType([
    StructField("round", IntegerType(), False),
    StructField("frontier_size", LongType(), False),
    StructField("fetched", LongType(), False),
    StructField("errors", LongType(), False),
    StructField("results_emitted", LongType(), False),
    StructField("new_urls", LongType(), False),
    StructField("politeness_wait_ms", DoubleType(), False),
    StructField("retries", LongType(), False),
    StructField("wall_s", DoubleType(), False),
    StructField("pages_per_s", DoubleType(), False),
])
