"""Crawl configuration — the normative knobs shared by the Spark engine and
the pure-Python oracle simulator (SURVEY §3.4). Defaults mirror Scrapy's
``default_settings.py`` (tier [S]) where a counterpart exists.
"""

from __future__ import annotations

from dataclasses import dataclass

# Scrapy RETRY_HTTP_CODES default [S:scrapy/downloadermiddlewares/retry.py]
RETRY_CODES = frozenset({500, 502, 503, 504, 522, 524, 408, 429})

# X16 download limits (r4b): synthetic statuses for failures that happen
# at the TRANSPORT level, below HTTP. A timed-out download retries —
# Scrapy's TimeoutError is in RetryMiddleware's EXCEPTIONS_TO_RETRY
# [S:scrapy/downloadermiddlewares/retry.py] — so 598 (the conventional
# network-read-timeout code) joins the retryable set; a response whose
# body exceeds DOWNLOAD_MAXSIZE is CANCELLED, not retried (deterministic
# re-failure) [S:scrapy/core/downloader/handlers/http11.py maxsize], so
# 413 is terminal. Neither is ever written to the HTTP cache: no
# complete response was received.
TIMEOUT_STATUS = 598
MAXSIZE_STATUS = 413
RETRYABLE_CODES = RETRY_CODES | {TIMEOUT_STATUS}
# X17 (r5): synthesized robots.txt requests outrank every regular request
# in the global round order (Scrapy's robots request carries top priority —
# nothing from the host can download before it). Regular priorities are
# small ints (depth shaping / retry adjust), so 2^30 can never collide.
ROBOTS_PRIORITY = 1 << 30

# LinkExtractor IGNORED_EXTENSIONS (subset relevant to the fixture graph)
# [S:scrapy/linkextractors/__init__.py::IGNORED_EXTENSIONS]
IGNORED_EXT_RE = (
    r"(?i)\.(?:jpg|jpeg|png|gif|webp|svg|ico|css|js|pdf|zip|gz|tar|mp3|mp4"
    r"|avi|mov|doc|docx|xls|xlsx|ppt|exe|bin|dmg)$"
)


@dataclass(frozen=True)
class CrawlConfig:
    """All semantics-bearing knobs. Frozen so a run's config is immutable
    and serializable into the snapshot manifest (C1 resume uses it)."""

    allowed_domains: tuple[str, ...] = ()   # P1 offsite suffix match; () = off
    depth_limit: int = 6                    # P2; 0 = unlimited (Scrapy
                                            # DEPTH_LIMIT=0 semantics;
                                            # we pin a finite default for tests)
    allow_re: str = ""                      # P4 LinkExtractor allow= ("" = all)
    deny_re: str = ""                       # P4 deny= ("" = none)
    max_url_len: int = 2083                 # P3
    retry_times: int = 2                    # X10 RETRY_TIMES [S]
    retry_priority_adjust: int = -1         # X10 RETRY_PRIORITY_ADJUST [S]
    redirect_max_times: int = 20            # X11 REDIRECT_MAX_TIMES
                                            # [S:scrapy/downloadermiddlewares/
                                            # redirect.py]: a request whose
                                            # redirect chain would exceed this
                                            # is discarded (counted filtered)
    lifo: bool = True                       # F3: True = DFO (Scrapy default
                                            # memory queue is LIFO [S:squeues])
    depth_priority: int = 0                 # DEPTH_PRIORITY
                                            # [S:scrapy/spidermiddlewares/
                                            # depth.py]: discovered links get
                                            # priority -= depth*this (positive
                                            # => shallower-first/BFO shaping,
                                            # negative => deeper-first; 0 =
                                            # Scrapy default, no shaping)
    round_cap: int = 64                     # F5 global per-round fetch cap
                                            # (CONCURRENT_REQUESTS analogue)
    round_wall_s: float = 8.0               # F4 nominal wall-seconds per round
    default_crawl_delay_s: float = 0.5      # F4 when host_policy/robots silent
    default_max_concurrency: int = 8        # CONCURRENT_REQUESTS_PER_DOMAIN [S]
    max_rounds: int = 1000                  # F6 safety stop
    page_budget: int = 0                    # F6 CLOSESPIDER_PAGECOUNT (0 = off)
    item_budget: int = 0                    # F6 CLOSESPIDER_ITEMCOUNT (r3,
                                            # 0 = off) [S:scrapy/extensions/
                                            # closespider.py]: stop after the
                                            # first round whose cumulative
                                            # EMITTED document count reaches
                                            # the budget (graceful close —
                                            # the crossing round completes)
    bloom_shards: int = 16                  # D3 seen-filter shard count
    bloom_bits_per_shard: int = 1 << 17     # D3 shard bitset size (bits)
    bloom_hashes: int = 4                   # D3 k hash functions
    use_bloom: bool = True                  # D3 prefilter on/off (exactness is
                                            # guaranteed by J3 either way)
    seen_filter: str = "bloom"              # D3 prefilter kind when use_bloom:
                                            # "bloom" (insert-only bitsets) or
                                            # "cuckoo" (deletable tag table —
                                            # north_star's "bloom/cuckoo";
                                            # required to keep occupancy
                                            # bounded under seen_ttl_rounds)
    cuckoo_buckets_per_shard: int = 4096    # cuckoo buckets/shard (power of
                                            # 2; 4 slots each, 16-bit tags ->
                                            # 32 KiB + 1 flag byte per shard)
    cuckoo_max_kicks: int = 256             # eviction budget before a shard
                                            # degrades to sticky all-maybe-
                                            # seen (never wrong, only less
                                            # selective)
    seen_ttl_rounds: int = 0                # D3/R3 re-crawl TTL (0 = off =
                                            # Scrapy RFPDupeFilter forever-
                                            # seen). N>0: a fingerprint's
                                            # seen entry is LIVE for N rounds
                                            # after its last enqueue or fetch
                                            # (fetch refreshes it); an expired
                                            # fingerprint rediscovered later
                                            # re-enqueues — the periodic
                                            # re-crawl schedule a production
                                            # listing crawl needs. Dedup rule
                                            # at round r: drop iff live
                                            # (r - seen_round < N) OR still
                                            # pending in the frontier.
    autothrottle: bool = False              # A5 AutoThrottle analogue, opt-in
                                            # (Scrapy default: disabled [S])
    at_start_delay_s: float = 5.0           # AUTOTHROTTLE_START_DELAY [S]
    at_max_delay_s: float = 60.0            # AUTOTHROTTLE_MAX_DELAY [S]
    at_target_concurrency: float = 1.0      # AUTOTHROTTLE_TARGET_CONCURRENCY
    cookies_enabled: bool = True            # X13 cookies/session state
                                            # [S:scrapy/downloadermiddlewares/
                                            # cookies.py]: a 200 response
                                            # whose page sets a cookie grants
                                            # it host-wide at END of round; a
                                            # requires_cookie page serves 403
                                            # unless the cookie is held at
                                            # round START (next-round effect —
                                            # batch fetches are concurrent, so
                                            # within-round propagation is
                                            # deliberately excluded; pinned
                                            # deviation, see COVERAGE.md)
    http_cache: bool = False                # X12 HTTP-cache analogue
                                            # [S:scrapy/downloadermiddlewares/
                                            # httpcache.py DummyPolicy]:
                                            # non-retryable responses are
                                            # cached by fingerprint; a later
                                            # run fetches them WITHOUT hitting
                                            # the network — cache hits bypass
                                            # the per-host politeness budget,
                                            # consume no carry, and do not
                                            # feed AutoThrottle (they skip the
                                            # download slot). Requires a
                                            # cache_dir on the engine.
    frontier_deltas: bool | str = "auto"    # C1 frontier storage mode:
                                            # False = full rewrite per round
                                            # (simple; write cost O(frontier)
                                            # per round). True = merge-on-read
                                            # deltas (Iceberg-MOR shape): each
                                            # round appends O(round) add/
                                            # remove events; reads resolve
                                            # latest-event-wins per
                                            # fingerprint; a full base is
                                            # compacted every
                                            # frontier_compact_every rounds.
                                            # "auto" (default, r5 — VERDICT
                                            # r04 #6): per round, delta mode
                                            # iff the round-START pending
                                            # count exceeds the auto
                                            # threshold below — small crawls
                                            # keep the simple full-rewrite
                                            # plan, big ones get the
                                            # O(round) write path without
                                            # opting in; a shrinking tail
                                            # downshifts back (the full
                                            # write doubles as compaction).
                                            # At the 10^10 design point the
                                            # delta mode is mandatory —
                                            # rewriting a 10-TB frontier per
                                            # round is not.
    frontier_deltas_auto_rows: int | None = None  # absolute upshift
                                            # threshold override (pending
                                            # rows); None (default) uses the
                                            # dimensionless ratio rule below
    frontier_deltas_auto_ratio: float = 4.0  # default auto rule: delta mode
                                            # iff round-start pending >
                                            # ratio * round_cap. The units
                                            # are the COSTS being traded: a
                                            # full rewrite writes O(pending)
                                            # rows; MOR appends O(round_cap)
                                            # events + pending/compact_every
                                            # amortized compaction, and pays
                                            # read-resolve on every scan. At
                                            # pending = 4x round_cap (with
                                            # compact_every=8) MOR writes
                                            # ~2.7x fewer bytes — enough to
                                            # beat its read amplification;
                                            # below that the rewrite is
                                            # comparable-or-cheaper AND
                                            # read-amp-free. Measured
                                            # (BENCH/BASELINE.md): at the
                                            # 300k tier, pending/round_cap
                                            # ~= 1.1, interleaved quiet-
                                            # window pairs put full-rewrite
                                            # 13-24% AHEAD (2,430-2,617 vs
                                            # 2,115-2,145 URLs/s) while the
                                            # r4 contended window showed
                                            # MOR 1.68-1.78x ahead — at
                                            # ratio ~1 the mode choice is
                                            # I/O-regime noise, so the rule
                                            # reserves MOR for the regime
                                            # where its win is structural
                                            # (a 10^10-row frontier at
                                            # round_cap 10^5-10^6 has ratio
                                            # 10^4+ and CANNOT be rewritten
                                            # per round)
    frontier_compact_every: int = 8         # delta-mode compaction cadence
    httpcache_expiration_rounds: int = 0    # X12 TTL (r3)
                                            # [S:scrapy/extensions/httpcache
                                            # .py HTTPCACHE_EXPIRATION_SECS
                                            # analogue, in cache EPOCHS]:
                                            # 0 = DummyPolicy (cache forever).
                                            # N>0: every caching round
                                            # publishes one cache dir = one
                                            # epoch; an entry written at
                                            # epoch e is fresh while
                                            # cur_epoch - e <= N, after which
                                            # it is a MISS — the re-fetch
                                            # re-caches at the new epoch
                                            # (reads resolve latest-epoch-
                                            # wins per fingerprint)
    httpcache_revalidate: bool = False      # X12 conditional revalidation
                                            # (r4) [S:scrapy/extensions/
                                            # httpcache.py::RFC2616Policy
                                            # ETag/If-None-Match validators]:
                                            # a 200 response stores the
                                            # page's ``validator`` (ETag
                                            # analogue) with its cache
                                            # entry. When an entry is TTL-
                                            # EXPIRED, the request goes to
                                            # the network (budget-gated like
                                            # any fetch — a conditional GET
                                            # still occupies a download
                                            # slot); if the live response
                                            # would be 200 and its validator
                                            # matches the stored one, the
                                            # server "304"s: the CACHED
                                            # body/redirect are served and
                                            # the entry's epoch refreshes.
                                            # A changed validator (or any
                                            # non-200) is a full re-fetch +
                                            # re-cache. Fresh entries never
                                            # revalidate; entries without a
                                            # validator (non-200s) never
                                            # revalidate.
    httpcache_compact_every: int = 0        # X12 cache compaction cadence
                                            # (r4, VERDICT r03 #2): 0 = off.
                                            # N>0: every N cache epochs the
                                            # engine materializes the
                                            # latest-epoch-wins projection
                                            # (TTL-pruned where entries are
                                            # provably dead) into ONE dir
                                            # and drops the superseded dirs,
                                            # so _read_cache lists O(N) dirs
                                            # instead of one per round.
                                            # Purely physical — entries keep
                                            # their original epoch, so
                                            # TTL/revalidation semantics are
                                            # byte-identical; crash-safe
                                            # because duplicate entries are
                                            # idempotent under latest-wins.
    error_budget: int = 0                   # F6 CLOSESPIDER_ERRORCOUNT
                                            # analogue (r4, 0 = off)
                                            # [S:scrapy/extensions/
                                            # closespider.py]: stop after
                                            # the first round whose
                                            # cumulative error-response
                                            # count (the per-round metrics
                                            # "errors" column: non-ok,
                                            # non-redirect responses,
                                            # retryables included) reaches
                                            # the budget — graceful close,
                                            # the crossing round completes,
                                            # same discipline as page/item
                                            # budgets.
    honor_retry_after: bool = True          # X10->F4 coupling (r3)
                                            # [S:scrapy 2.x RetryMiddleware
                                            # reads Retry-After]: a 429/503
                                            # response carrying retry_after_s
                                            # makes the host's NEXT round use
                                            # delay = max(delay_eff,
                                            # retry_after_s) for budget AND
                                            # carry — one-shot: cleared at
                                            # that round's end unless the
                                            # host re-signals
    sitemaps_enabled: bool = True           # F1 extension (r3)
                                            # [S:scrapy/spiders/sitemap.py::
                                            # SitemapSpider]: a fetched body
                                            # that IS a sitemap (urlset /
                                            # sitemapindex root tag) expands
                                            # to its <loc> entries in document
                                            # order instead of HTML parsing;
                                            # sitemap fetches emit NO document
                                            # row. Index recursion falls out:
                                            # sub-sitemaps enqueue like links
                                            # and expand when fetched.
    download_timeout_ms: float | None = None  # X16 (r4b) DOWNLOAD_TIMEOUT
                                            # analogue [S:scrapy default_
                                            # settings DOWNLOAD_TIMEOUT]:
                                            # a network fetch whose fixture
                                            # latency_ms exceeds this fails
                                            # with TIMEOUT_STATUS (598,
                                            # retryable) and observes
                                            # latency == the timeout (what
                                            # the client actually waited —
                                            # feeds AutoThrottle/carry).
                                            # Cache hits and revalidations
                                            # are served locally and bypass
                                            # it. None = off.
    download_maxsize_bytes: int = 0         # X16 (r4b) DOWNLOAD_MAXSIZE
                                            # analogue: a 200 network
                                            # response whose body exceeds
                                            # this many bytes is cancelled
                                            # as MAXSIZE_STATUS (413,
                                            # terminal — deterministic
                                            # re-failure, never retried,
                                            # never cached). 0 = off.
    robots_fetch: bool = False              # X17 (r5) live robots.txt
                                            # acquisition [S:scrapy/
                                            # downloadermiddlewares/
                                            # robotstxt.py]: robots.txt is
                                            # itself downloaded through the
                                            # scheduler — lazily per host, on
                                            # first contact, consuming one
                                            # politeness slot and a crawl_
                                            # order rank. Until a host's
                                            # robots has been fetched its
                                            # regular requests stay pending;
                                            # a non-200 (or synthetic 598/
                                            # 413) robots response records
                                            # allow-all (Scrapy's no-robots
                                            # default) and is NOT retried.
                                            # Sitemap: lines enqueue as
                                            # discoveries (depth 1) when
                                            # sitemaps_enabled; bootstrap
                                            # skips robots-table sitemap
                                            # seeding in this mode. Robots
                                            # fetches bypass the HTTP cache
                                            # (their freshness is governed
                                            # by robots_ttl_rounds below).
    robots_ttl_rounds: int = 0              # X17: re-fetch schedule — a
                                            # robots entry fetched at round
                                            # f is live while rnd - f < N;
                                            # an expired host reverts to
                                            # unknown (its requests wait one
                                            # round while robots re-fetches).
                                            # 0 = fetch once, never expires.
    concurrent_requests_per_ip: int = 0     # X18 (r5) CONCURRENT_REQUESTS_
                                            # PER_IP analogue [S:scrapy/core/
                                            # downloader/__init__.py::
                                            # Downloader._get_slot_key]:
                                            # 0 = off (politeness slots key
                                            # per host, the PER_DOMAIN
                                            # default). N>0: the slot keys on
                                            # the host's IP — host_policy.ip
                                            # is the sandbox "resolver" (no
                                            # DNS here); hosts with no ip
                                            # fall back to their own name —
                                            # so co-hosted sites share ONE
                                            # budget/carry/AutoThrottle/
                                            # Retry-After slot. The slot's
                                            # concurrency cap is N (per-host
                                            # max_concurrency is ignored,
                                            # exactly as Scrapy's PER_IP
                                            # overrides PER_DOMAIN) and its
                                            # crawl delay each round is the
                                            # max of the member hosts'
                                            # base delays present in that
                                            # round. Run-start config: slot
                                            # keys persist in host_state, so
                                            # flipping it mid-resume is
                                            # undefined (like seen_filter).
    broadcast_host_max_bytes: int = 32 * 1024 * 1024
                                            # J1/J2/F4 join strategy (r5,
                                            # VERDICT r04 #1): hint
                                            # F.broadcast on the per-host
                                            # tables (policy/robots/
                                            # host_state/host_round) only
                                            # while their measured parquet
                                            # bytes stay under this; above
                                            # it (broad-crawl 10^7-10^8
                                            # hosts) every such join is
                                            # left to Catalyst/AQE as a
                                            # plain shuffled equi-join —
                                            # a forced hint would override
                                            # Spark's size check and OOM.
                                            # 0 = never hint (the test
                                            # lever for the unhinted path).
    driver_shard_cache: bool = True         # keep shard bytes in driver RAM
                                            # between rounds (saves 1 collect
                                            # + 1 shuffle per round; turn OFF
                                            # at the 10^10 design point where
                                            # shards exceed driver RAM — the
                                            # distributed cogroup path is the
                                            # scale path)

    def budget_for(self, crawl_delay_s: float | None,
                   max_concurrency: int | None, carry_s: float) -> tuple[int, float]:
        """F4 per-host politeness budget for one round.

        Returns (budget, avail_s). Deterministic arithmetic shared verbatim
        with the oracle: a host may fetch at most
        ``min(max_concurrency, max(1, floor((carry + round_wall)/delay)))``
        pages this round; the caller computes the new carry as
        ``min(avail - fetched*delay, round_wall)`` clamped at >= 0.
        """
        delay = crawl_delay_s if crawl_delay_s and crawl_delay_s > 0 \
            else self.default_crawl_delay_s
        conc = max_concurrency if max_concurrency and max_concurrency > 0 \
            else self.default_max_concurrency
        avail = carry_s + self.round_wall_s
        budget = min(int(conc), max(1, int(avail / delay)))
        return budget, avail

    def at_fold(self, d: float, responses: list[tuple[float, int]],
                min_delay: float) -> float:
        """A5 AutoThrottle analogue, serialized: Scrapy's _adjust_delay
        [S:scrapy/extensions/throttle.py] folded over one round's responses
        in global fetch order. Per response: target = latency/target_conc;
        candidate = max(target, (delay+target)/2) clamped to
        [min_delay, at_max]; non-200 responses never DECREASE the delay.
        The engine evaluates the identical fold as a native `aggregate`
        higher-order expression — same IEEE double ops, same order, so
        engine/oracle parity is exact."""
        for lat_s, status in responses:
            td = lat_s / self.at_target_concurrency
            nd = max(td, (d + td) / 2.0)
            nd = min(max(min_delay, nd), self.at_max_delay_s)
            if status != 200 and nd <= d:
                continue
            d = nd
        return d

    def carry_after(self, avail_s: float, fetched: int,
                    crawl_delay_s: float | None) -> float:
        delay = crawl_delay_s if crawl_delay_s and crawl_delay_s > 0 \
            else self.default_crawl_delay_s
        return max(0.0, min(avail_s - fetched * delay, self.round_wall_s))

    def to_dict(self) -> dict:
        from dataclasses import asdict
        d = asdict(self)
        d["allowed_domains"] = list(self.allowed_domains)
        return d

    @staticmethod
    def from_dict(d: dict) -> "CrawlConfig":
        d = dict(d)
        d["allowed_domains"] = tuple(d.get("allowed_domains", ()))
        return CrawlConfig(**d)
