"""Golden oracle — a single-threaded interpreter of the reference's
crawl semantics, used ONLY as a test oracle (never on the Spark path).

It re-states the observable behavior of
/root/reference/src/InfinityCrawler/Internal/CrawlRunner.cs (admission
pipeline, seen set, retry/redirect/budget limits, status routing) and
Crawler.cs:39-79 (seed → robots → sitemap → fixpoint) over a
WebFixture, with the serialized FIFO processing order the reference's
own deterministic tests use (MaxNumberOfSimultaneousRequests = 1,
DefaultRequestProcessorTests.cs:52). The Spark engine's output is
asserted equal to this interpreter's results/seen-set/enqueue-order.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from infinitycrawler_spark.functions.robots import (
    evaluate_page_robots,
    parse_robots_txt,
    RobotsFile,
)
from infinitycrawler_spark.functions.urls import (
    authority_of,
    canonicalize,
    host_of,
    path_and_query,
    resolve_href,
    scheme_of,
    strip_fragment,
)
from infinitycrawler_spark.settings import CrawlSettings
from infinitycrawler_spark.synth.fixtures import WebFixture

REDIRECT_CODES = {301, 302, 307}  # CrawlRunner.cs:257-262 — not 303/308


@dataclass
class GoldenResult:
    url: str
    status: str  # Crawled | RobotsBlocked | MaxRetries | MaxRedirects
    n_attempts: int
    redirect_chain: list[str]
    last_status_code: int | None = None
    links: list[str] = field(default_factory=list)


@dataclass
class GoldenCrawl:
    results: list[GoldenResult]
    seen: set[str]
    enqueue_order: list[str]

    def by_url(self) -> dict[str, GoldenResult]:
        return {r.url: r for r in self.results}

    def result_set(self) -> set[tuple[str, str, int, int]]:
        return {(r.url, r.status, r.n_attempts, len(r.redirect_chain))
                for r in self.results}


class _State:
    __slots__ = ("location", "requests", "redirects")

    def __init__(self, location: str):
        self.location = location
        self.requests: list[dict] = []
        self.redirects: list[str] = []


def crawl(fixture: WebFixture, settings: CrawlSettings | None = None,
          extra_queue_urls: list[str] | None = None) -> GoldenCrawl:
    settings = settings or CrawlSettings()
    pages = fixture.page_map()
    base_host = host_of(fixture.seed_uri)
    robots: RobotsFile = parse_robots_txt(fixture.robots_txt.get(base_host, ""))
    timeout_ms = settings.request_processor_options.request_timeout_ms

    queue: deque[str] = deque()
    seen: set[str] = set()
    states: dict[str, _State] = {}
    results: list[GoldenResult] = []
    enqueue_order: list[str] = []

    def add_result(url: str, status: str, state: _State | None,
                   last_code: int | None = None, links: list[str] | None = None):
        results.append(GoldenResult(
            url=url, status=status,
            n_attempts=len(state.requests) if state else 0,
            redirect_chain=list(state.redirects) if state else [],
            last_status_code=last_code, links=links or []))

    def add_request(url: str, skip_max_page_check: bool = False):
        # CrawlRunner.cs:138-214 admission pipeline, in order
        h = host_of(url)
        if settings.host_aliases is not None:
            if not (h == base_host or h in settings.host_aliases):
                return
        elif h != base_host:
            return
        if not skip_max_page_check and settings.max_number_of_pages_to_crawl > 0:
            expected = len(results) + len(queue)
            if expected == settings.max_number_of_pages_to_crawl:  # == quirk
                return
        seen.add(url)
        state = states.get(url)
        if state is not None:
            if state.requests and state.requests[-1].get("success"):
                return
            if len(state.requests) == settings.number_of_retries:
                add_result(url, "MaxRetries", state)
                return
            # Redirects non-null check (CrawlRunner.cs:187) ⟺ chain non-empty
            if state.redirects and len(state.redirects) == settings.max_number_of_redirects:
                add_result(url, "MaxRedirects", state)
                return
        if robots.is_allowed(path_and_query(url), settings.user_agent):
            queue.append(url)
            enqueue_order.append(url)
        else:
            add_result(url, "RobotsBlocked", None)

    def add_link(url: str, rel: str | None):
        if rel is not None and rel.lower() == "nofollow":
            return
        u = strip_fragment(url)
        if u in seen:
            return
        add_request(u, False)

    def add_redirect(request_url: str, redirect_to: str):
        # CrawlRunner.cs:69-90: move crawl state to the resolved target,
        # append to the redirect chain; TryAdd keeps an existing state.
        state = states.pop(request_url, None)
        if state is None:
            return
        target = strip_fragment(canonicalize(resolve_href(request_url, redirect_to)) or "")
        if target not in states:
            new_state = _State(target)
            new_state.redirects = state.redirects + [state.location]
            states[target] = new_state
        add_request(target, True)

    # --- Crawler.Crawl setup (Crawler.cs:48-62) ---
    base_uri = canonicalize(fixture.seed_uri)
    # authority keeps a non-default port (Uri.GetLeftPart, Crawler.cs:48)
    authority_root = f"{scheme_of(base_uri)}://{authority_of(base_uri)}/"
    add_request(strip_fragment(authority_root), False)
    for sitemap_url in fixture.sitemap_urls:
        add_request(strip_fragment(canonicalize(sitemap_url) or ""), False)
    for url in extra_queue_urls or []:
        # processor.Add bypasses admission entirely (BasicSiteTests.cs:185-188)
        queue.append(canonicalize(url) or url)
        enqueue_order.append(canonicalize(url) or url)

    # --- serialized FIFO fixpoint (DefaultRequestProcessor.cs:48-132) ---
    while queue:
        url = queue.popleft()
        state = states.setdefault(url, _State(url))
        page = pages.get(url)
        if page is None or page["delay_ms"] >= timeout_ms:
            # transport error / timeout → retry (CrawlRunner.cs:235-245)
            state.requests.append({"success": False, "error": True})
            add_request(url)
            continue
        code = page["status_code"]
        success = 200 <= code <= 299
        state.requests.append({"success": success, "code": code})
        if code in REDIRECT_CODES:
            add_redirect(url, page["redirect_to"])
        elif success:
            rules = list(page["x_robots_tag"] or [])
            if page["robots_meta"]:
                rules.append(page["robots_meta"])
            can_index, can_follow = evaluate_page_robots(rules, settings.user_agent)
            resolved_links = []
            for link in page["links"]:
                loc = resolve_href(url, link["href"], page["base_href"])
                if loc is None or scheme_of(loc) not in ("http", "https"):
                    continue
                resolved_links.append((canonicalize(loc) or loc, link["rel"]))
            if not can_index:
                add_result(url, "RobotsBlocked", state, code)
            else:
                add_result(url, "Crawled", state, code,
                           [l for l, _ in resolved_links])
                if can_follow:
                    for loc, rel in resolved_links:
                        add_link(loc, rel)
        elif 500 <= code <= 599:
            add_request(url)  # retry (CrawlRunner.cs:272-277)
        else:
            add_result(url, "Crawled", state, code)  # terminal, content ignored

    return GoldenCrawl(results=results, seen=seen, enqueue_order=enqueue_order)
