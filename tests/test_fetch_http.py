"""Real-HTTP fetch smoke test: ``http_fetch_round`` against a live
localhost ``http.server`` — real sockets, no-redirect-follow, timeout,
politeness spacing (DefaultRequestProcessor.cs:137-198 semantics)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.operators.fetch_http import http_fetch_round
from infinitycrawler_spark.settings import RequestProcessorOptions

PAGES = {
    "/": (200, b"<html><body><a href='/a.html'>A</a>"
               b"<a href='/missing'>M</a>"
               b"<a href='/redirect'>R</a></body></html>"),
    "/a.html": (200, b"<html><body>leaf</body></html>"),
    "/missing": (404, b"nope"),
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/a.html")
            self.end_headers()
            return
        if self.path == "/gz.html":
            # Content-Encoding gzip body — the client must surface the
            # DECODED bytes (HttpClient AutomaticDecompression parity)
            # while still reporting the encoding header
            import gzip as _gz
            body = _gz.compress(b"<html><body>zipped leaf</body></html>")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        status, body = PAGES.get(self.path, (404, b""))
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("X-Robots-Tag", "all")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_fetch_round_real_sockets(spark, http_base):
    host = http_base.split("://", 1)[1]
    urls = [f"{http_base}/", f"{http_base}/a.html", f"{http_base}/missing",
            f"{http_base}/redirect"]
    due = spark.createDataFrame(
        [(u, host, i, 0) for i, u in enumerate(urls)],
        schema="url string, host string, enqueue_seq long, depth int")
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    opts = RequestProcessorOptions().no_delay()
    out = http_fetch_round(due, host_state, opts).collect()
    rows = {r.url: r for r in out if not r.is_state}
    trailer = [r for r in out if r.is_state]

    assert rows[f"{http_base}/"].status_code == 200
    assert b"a.html" in bytes(rows[f"{http_base}/"].body)
    assert rows[f"{http_base}/"].content_type == "text/html"
    assert rows[f"{http_base}/"].charset == "utf-8"
    assert rows[f"{http_base}/"].x_robots_tag == ["all"]
    assert rows[f"{http_base}/missing"].status_code == 404
    # redirects NOT followed (allow_redirects=False) — 3xx surfaces raw
    red = rows[f"{http_base}/redirect"]
    assert red.status_code == 302 and red.redirect_to == "/a.html"
    # state trailer: one per host, request_count delta = 4
    assert len(trailer) == 1 and trailer[0].request_count == 4


def test_http_fetch_transport_error_is_retryable(spark):
    # nothing listens on this port → ConnectionError attempt row
    due = spark.createDataFrame(
        [("http://127.0.0.1:1/x", "127.0.0.1:1", 0, 0)],
        schema="url string, host string, enqueue_seq long, depth int")
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    out = http_fetch_round(due, host_state,
                           RequestProcessorOptions().no_delay()).collect()
    row = [r for r in out if not r.is_state][0]
    assert row.status_code is None and row.error is not None


def test_crawljob_over_real_http(spark, http_base, tmp_path):
    """Full CrawlJob against live sockets via the pluggable processor
    seam (CrawlSettings.cs:18-19): real fetch, bodies parsed from the
    response stream, redirects/404s routed by the unchanged engine."""
    from infinitycrawler_spark import schemas
    from infinitycrawler_spark.operators.fetch_http import (
        http_content_processor,
        http_request_processor,
    )
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import CrawlSettings

    host = http_base.split("://", 1)[1]
    settings = CrawlSettings(
        validate_payload=False,
        request_processor_options=RequestProcessorOptions().no_delay())
    job = CrawlJob(
        spark=spark,
        pages=spark.createDataFrame([], schema=schemas.CRAWL_PAGES),
        robots_map={}, sitemap_urls=[], seed_uri=f"{http_base}/",
        settings=settings, copartition_pages=False,
        request_processor=http_request_processor,
        content_processor=http_content_processor,
        store_root=str(tmp_path / "state"))
    out = job.run()
    by = {r.url: r for r in out.results.collect()}
    assert by[f"{http_base}/"].status == "Crawled"
    assert by[f"{http_base}/a.html"].status == "Crawled"
    assert by[f"{http_base}/missing"].status == "Crawled"  # 4xx terminal
    assert by[f"{http_base}/missing"].last_status_code == 404
    # /redirect 302→/a.html: target already seen → chain recorded, no dup
    red = by.get(f"{http_base}/redirect")
    assert red is None or red.status in ("Crawled", "MaxRedirects")
    # links on the index page were parsed from the real response body
    assert sorted(by[f"{http_base}/"].links) == [
        f"{http_base}/a.html", f"{http_base}/missing", f"{http_base}/redirect"]


def test_http_fetch_politeness_spacing(spark, http_base):
    """Request starts within a host are spaced by the merged delay."""
    host = http_base.split("://", 1)[1]
    due = spark.createDataFrame(
        [(f"{http_base}/a.html", host, i, 0) for i in range(3)],
        schema="url string, host string, enqueue_seq long, depth int")
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    opts = RequestProcessorOptions(delay_between_request_start_ms=150,
                                   delay_jitter_ms=0)
    out = http_fetch_round(due.coalesce(1), host_state, opts).collect()
    starts = sorted(r.request_start_ms for r in out if not r.is_state)
    assert starts[1] - starts[0] >= 140  # tolerance for sleep granularity
    assert starts[2] - starts[1] >= 140


def test_gzip_content_encoding_transparently_decoded(spark, http_base):
    """Crawler.cs relies on HttpClient's AutomaticDecompression; our
    requests-backed fetcher must likewise hand the parse pass DECODED
    bytes and carry the Content-Encoding header as metadata
    (DefaultContentProcessor.cs:21)."""
    host = http_base.split("://", 1)[1]
    due = spark.createDataFrame(
        [(f"{http_base}/gz.html", host, 0, 0)],
        schema="url string, host string, enqueue_seq long, depth int")
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    out = http_fetch_round(
        due, host_state, RequestProcessorOptions().no_delay()).collect()
    row = [r for r in out if not r.is_state][0]
    assert row.status_code == 200
    assert bytes(row.body) == b"<html><body>zipped leaf</body></html>"
    assert row.content_encoding == "gzip"
