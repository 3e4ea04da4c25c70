"""Deterministic pure-Python crawl oracle (SURVEY.md §3.4 R1–R6, §5.2 item 2).

This is the executable spec of the reference's crawl semantics, serialized:
Scrapy's scheduler/dupefilter/politeness behavior (tier [S]) made
deterministic per SURVEY §3.4. The Spark engine must reproduce its outputs
EXACTLY: crawl order (list), seen set (set), per-document span sequences,
and per-(round,host) metrics. Engine and oracle import the same kernels
(canonicalize / fingerprint / parse / robots), so kernel parity is by
construction; what this module independently specifies is ORDERING and
STATE EVOLUTION.

Normative rules implemented here (R-numbers from SURVEY §3.4):
  R1  seeds get enqueue_seq 0..n-1 in seed-list order; deduped; no P-filters.
  R2  every raw discovered candidate (outlink, redirect target, or retry
      pseudo-link) consumes one enqueue_seq, in (fetch order × within-page
      discovery order); filters decide enqueue but never seq assignment.
  R3  dedup-at-enqueue: candidate dropped iff fingerprint already seen;
      seen grows immediately (intra-round dedup falls out sequentially).
  R4  per-host dequeue order: priority DESC, then enqueue_seq DESC (LIFO)
      or ASC (FIFO); global order: priority DESC, host_rank ASC, seq ASC.
  R5  crawl order = concatenation over rounds of fetch lists in global rank.
  R6  fingerprint = sha1('GET' || canonical_url) hex.

Additional pinned semantics (shared with the engine, see config.py):
  * robots gating at DEQUEUE time (Scrapy RobotsTxtMiddleware runs in the
    downloader [S]); blocked requests leave the frontier permanently and ARE
    in the seen set (they were enqueued).
  * effective crawl delay = max(host_policy.crawl_delay_s,
    robots.crawl_delay_s) with config default when both null.
  * politeness budget + fractional carry per CrawlConfig.budget_for /
    carry_after; carry updates for every host that had >=1 eligible
    candidate this round.
  * retries: status in RETRY_CODES and retry_count < retry_times re-enqueues
    the same fingerprint (dont_filter) with priority += retry_priority_adjust
    and a fresh seq; flaky pages (succeeds_after) serve 200 once
    retry_count >= succeeds_after.
  * redirects (3xx): target treated as the page's single discovered link,
    but keeps the parent's depth and priority.
  * documents: doc_id = fingerprint of the fetched canonical URL; spans from
    parse_html; only status-200 fetches produce documents.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from types import SimpleNamespace

import pandas as pd

from ..config import (
    IGNORED_EXT_RE, MAXSIZE_STATUS, RETRY_CODES, RETRYABLE_CODES,
    ROBOTS_PRIORITY, TIMEOUT_STATUS, CrawlConfig,
)
from ..kernels.canon import absolutize, canonicalize_url, fingerprint_hex
from ..kernels.parse import Form, is_sitemap, parse_page, parse_sitemap
from ..kernels.robots import parse_robots_txt, robots_allowed
from urllib.parse import urlsplit

_RETRY = object()  # pseudo-link sentinel


@dataclass
class _Req:
    fingerprint: str
    url_canon: str
    host: str
    priority: int
    depth: int
    seq: int
    retry_count: int = 0
    method: str = "GET"
    body: str = ""
    chain: tuple[str, ...] = ()   # X11 redirect provenance, oldest first


@dataclass
class OracleResult:
    crawl_order: list[dict] = field(default_factory=list)  # rank,fp,url,round,host,status
    seen: set[str] = field(default_factory=set)
    documents: dict[str, list[dict]] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)      # per (round, host)
    canonical: dict[str, str] = field(default_factory=dict)  # fp -> canon
    rounds: int = 0
    # fp -> round of last enqueue or fetch-refresh (drives seen_ttl_rounds;
    # res.seen stays the all-time set)
    seen_rounds: dict[str, int] = field(default_factory=dict)


def _suffix_match(host: str, domains: tuple[str, ...]) -> bool:
    if not domains:
        return True
    return any(host == d or host.endswith("." + d) for d in domains)


def simulate(fixture: dict[str, pd.DataFrame], cfg: CrawlConfig,
             max_rounds: int | None = None,
             cache: dict[str, tuple] | None = None,
             reseed: tuple[int, list[tuple[str, bool]]] | None = None
             ) -> OracleResult:
    """``cache`` is the X12 HTTP-cache: {fingerprint: (status,
    redirect_to, body_html, epoch, validator, last_modified)} plus the
    bookkeeping key
    ``"__epoch__"`` (the current cache epoch — one per caching round,
    mirroring the engine's one-published-dir-per-round). When
    cfg.http_cache is on, non-retryable responses are appended IN PLACE
    (so a caller can chain runs) and FRESH hits are served without
    consuming the per-host politeness budget, carry, or AutoThrottle
    state — they bypass the download slot
    [S:scrapy/downloadermiddlewares/httpcache.py]. With
    cfg.httpcache_expiration_rounds = N > 0 an entry is fresh while
    cur_epoch - entry_epoch <= N; an expired entry is a MISS and the
    re-fetch re-caches it at the current epoch (r3 TTL —
    HTTPCACHE_EXPIRATION_SECS analogue in epochs). With
    cfg.httpcache_revalidate (r4, RFC2616Policy ETag analogue) an EXPIRED
    entry carrying a validator goes to the network budget-gated like any
    fetch, but if the live response would be 200 with an UNCHANGED
    ``validator`` the server "304"s: the cached body/redirect are served
    and the entry's epoch refreshes; a changed validator (or non-200) is
    a full re-fetch + re-cache. r5 (RFC2616Policy both-validators):
    ``last_modified`` is the If-Modified-Since analogue — consulted ONLY
    when the cached entry carries no ETag (the strong validator wins,
    like a real server preferring If-None-Match), matching if the live
    page's last_modified is unchanged. Download limits (X16) adjust the
    live status BEFORE any validator check — a timed-out/oversized
    conditional GET is a 598/413, never a cache serve."""
    pages = {
        r.url_canon: r for r in fixture["pages"].itertuples(index=False)
    }
    robots = {
        r.host: r for r in fixture["robots"].itertuples(index=False)
    }
    policy = {
        r.host: r for r in fixture["host_policy"].itertuples(index=False)
    }
    # X18 (r5) CONCURRENT_REQUESTS_PER_IP [S:scrapy/core/downloader/
    # __init__.py::Downloader._get_slot_key]: the politeness slot key.
    # Off (0, default): slot == host (PER_DOMAIN). On: slot == the host's
    # fixture IP (host_policy.ip is the sandbox resolver; hosts with no ip
    # keep their own name), so co-hosted sites share one budget/carry/
    # AutoThrottle/Retry-After slot whose concurrency cap is the setting
    # itself and whose delay is the max of member hosts' base delays.
    per_ip = int(getattr(cfg, "concurrent_requests_per_ip", 0) or 0)
    if per_ip:
        hp = fixture["host_policy"]
        if "ip" not in hp.columns:
            raise ValueError(
                "concurrent_requests_per_ip requires an 'ip' column on "
                "host_policy (the fixture is the resolver)")
        ip_map = {r.host: r.ip for r in hp.itertuples(index=False)
                  if isinstance(r.ip, str) and r.ip}
        slot_of = ip_map.get
    else:
        ip_map = {}
        slot_of = dict().get  # identity via the default below

    def _slot(h: str) -> str:
        return slot_of(h, h)
    # X17 (r5) live robots.txt acquisition: the fixture robots TABLE is
    # ignored for gating/delays — rules come from fetching each host's
    # /robots.txt page on first contact (one budget slot, a crawl_order
    # rank) and PARSING the body. robots_view is the round-START snapshot
    # of live entries (entries fetched this round apply from the next
    # round — budgets/carry/AT are computed before the fetches, exactly
    # like the engine's host_round join against the committed state).
    robots_state: dict[str, SimpleNamespace] = {}
    rb_ttl = cfg.robots_ttl_rounds
    robots_view: dict = robots if not cfg.robots_fetch else {}
    ignored_ext = re.compile(IGNORED_EXT_RE)
    allow_re = re.compile(cfg.allow_re) if cfg.allow_re else None
    deny_re = re.compile(cfg.deny_re) if cfg.deny_re else None

    res = OracleResult()
    pending: dict[str, _Req] = {}
    # D3/R3 seen-TTL (r3): a fingerprint is LIVE-seen at round r while
    # r - seen_rounds[fp] < ttl; fetches refresh the entry. ttl=0 = the
    # Scrapy RFPDupeFilter forever-seen default. Dedup rule under TTL:
    # drop iff live OR still pending (an expired-but-pending fingerprint
    # is never duplicated).
    seen_ttl = cfg.seen_ttl_rounds
    sr = res.seen_rounds

    def live(fp: str, at_round: int) -> bool:
        if seen_ttl <= 0:
            return fp in res.seen
        return fp in sr and at_round - sr[fp] < seen_ttl
    items_emitted = 0   # F6 CLOSESPIDER_ITEMCOUNT analogue (r3)
    errors_total = 0    # F6 CLOSESPIDER_ERRORCOUNT analogue (r4)
    carry: dict[str, float] = {}
    at_state: dict[str, float] = {}   # A5 AutoThrottle adaptive delay
    ra_state: dict[str, float] = {}   # X10->F4 pending Retry-After (r3)
    cookies: set[tuple[str, str]] = set()   # X13 (host, cookie) session state
    next_seq = 0
    rank = 0

    def eff_delay(host: str) -> float:
        p = policy.get(host)
        r = robots_view.get(host)
        d1 = float(p.crawl_delay_s) if p is not None and p.crawl_delay_s else 0.0
        d2 = float(r.crawl_delay_s) if r is not None and r.crawl_delay_s \
            and not pd.isna(r.crawl_delay_s) else 0.0
        return max(d1, d2) or cfg.default_crawl_delay_s

    def delay_for(slot: str, base: float) -> float:
        """Effective delay for a politeness slot given its round base
        delay (off mode: slot == host, base == eff_delay(host))."""
        d = base if not cfg.autothrottle else \
            min(max(at_state.get(slot, cfg.at_start_delay_s), base),
                cfg.at_max_delay_s)
        if cfg.honor_retry_after:
            # one-shot Retry-After clamp (max with the normal delay)
            d = max(d, ra_state.get(slot, 0.0))
        return d

    def max_conc(host: str) -> int:
        if per_ip:
            # X18: the per-IP cap replaces per-host concurrency, exactly
            # as Scrapy's PER_IP setting overrides PER_DOMAIN
            return per_ip
        p = policy.get(host)
        return int(p.max_concurrency) if p is not None else cfg.default_max_concurrency

    # ---- R1: seeds --------------------------------------------------------
    for _, row in fixture["seeds"].sort_values("seed_id").iterrows():
        canon = canonicalize_url(row["url"])
        fp = fingerprint_hex(canon)
        seq = next_seq
        next_seq += 1
        if fp in res.seen:
            continue
        res.seen.add(fp)
        sr[fp] = 0
        pending[fp] = _Req(fp, canon, urlsplit(canon).hostname or "", 0, 0, seq)
    # F7 r3: robots.txt `Sitemap:` declarations seed after the explicit
    # seed list, (host asc, position) order [S:scrapy/spiders/sitemap.py]
    rdf = fixture["robots"]
    # X17: in live-acquisition mode robots-declared sitemaps arrive with
    # each host's robots.txt FETCH, not at bootstrap
    if cfg.sitemaps_enabled and not cfg.robots_fetch \
            and "sitemap_urls" in rdf.columns:
        for _, rrow in rdf.sort_values("host").iterrows():
            for u in (rrow["sitemap_urls"]
                      if rrow["sitemap_urls"] is not None else []):
                canon = canonicalize_url(u)
                fp = fingerprint_hex(canon)
                seq = next_seq
                next_seq += 1
                if fp in res.seen:
                    continue
                res.seen.add(fp)
                sr[fp] = 0
                pending[fp] = _Req(fp, canon,
                                   urlsplit(canon).hostname or "", 0, 0, seq)

    total_fetched = 0
    max_r = max_rounds if max_rounds is not None else cfg.max_rounds

    for rnd in range(max_r):
        if reseed is not None and rnd == reseed[0]:
            # r3 dont_filter re-seeding [S:scrapy Request.dont_filter]:
            # each re-seed consumes a seq in list order; dont_filter=True
            # enqueues even when seen (unless already pending);
            # dont_filter=False dedups normally; seen grows either way
            for url, dflt in reseed[1]:
                canon = canonicalize_url(url)
                fp = fingerprint_hex(canon)
                seq = next_seq
                next_seq += 1
                known = live(fp, rnd)
                res.seen.add(fp)
                if (dflt or not known) and fp not in pending:
                    if not known:
                        sr[fp] = rnd
                    pending[fp] = _Req(
                        fp, canon, urlsplit(canon).hostname or "", 0, 0, seq)
        if not pending:
            break
        res.rounds = rnd + 1
        m: dict[str, dict] = {}

        def mc(host: str, key: str, n: int = 1):
            d = m.setdefault(host, {
                "fetched": 0, "ok": 0, "errors": 0, "redirects": 0,
                "retried": 0, "discovered": 0, "enqueued": 0, "deduped": 0,
                "filtered": 0, "robots_blocked": 0, "cached": 0})
            d[key] += n

        # ---- robots gating at dequeue (P5 / X17) ---------------------------
        if cfg.robots_fetch:
            # round-START snapshot of live robots entries (TTL-pruned)
            robots_view = {
                h: e for h, e in robots_state.items()
                if rb_ttl <= 0 or rnd - e.fetched_round < rb_ttl}
        eligible: list[_Req] = []
        need_robots: dict[str, int] = {}   # X17: host -> min pending seq
        for req in list(pending.values()):
            if cfg.robots_fetch and req.host not in robots_view:
                # first contact (or TTL-expired): the host fetches ONLY
                # robots.txt this round; its requests wait in the frontier
                prev = need_robots.get(req.host)
                need_robots[req.host] = req.seq if prev is None \
                    else min(prev, req.seq)
                continue
            rb = robots_view.get(req.host)
            path = urlsplit(req.url_canon).path or "/"
            if rb is not None and not robots_allowed(
                    path,
                    list(rb.allow_prefixes) if rb.allow_prefixes is not None else [],
                    list(rb.disallow_prefixes) if rb.disallow_prefixes is not None else []):
                del pending[req.fingerprint]
                mc(req.host, "robots_blocked")
                continue
            eligible.append(req)
        # X17: synthesize one robots.txt request per unknown host —
        # top priority (nothing from the host may download before it),
        # seq = the host's min pending seq (deterministic, unique across
        # hosts since seqs are globally unique)
        robots_fps: set[str] = set()
        for rb_host, rb_seq in need_robots.items():
            ru = f"https://{rb_host}/robots.txt"
            rfp = fingerprint_hex(ru)
            robots_fps.add(rfp)
            eligible.append(_Req(rfp, ru, rb_host, ROBOTS_PRIORITY, 0,
                                 rb_seq))

        # ---- F3/F4: per-slot budget + ordering (slot == host unless X18
        # per-IP keying is on, in which case co-hosted hosts pool here) ----
        by_slot: dict[str, list[_Req]] = {}
        slot_hosts: dict[str, set[str]] = {}
        for req in eligible:
            s = _slot(req.host)
            by_slot.setdefault(s, []).append(req)
            slot_hosts.setdefault(s, set()).add(req.host)
        # slot base delay = max over member hosts PRESENT this round (off
        # mode: the single host's eff_delay — identical to the per-host
        # formulation)
        base_by_slot = {s: max(eff_delay(h) for h in hs)
                        for s, hs in slot_hosts.items()}

        selected: list[tuple[_Req, int]] = []  # (req, slot_rank)
        avail_by_slot: dict[str, float] = {}
        use_cache = cfg.http_cache and cache is not None
        cur_epoch = cache.get("__epoch__", 0) if use_cache else 0
        ttl = cfg.httpcache_expiration_rounds

        def cache_fresh(fp: str) -> bool:
            if not use_cache or fp not in cache or fp == "__epoch__":
                return False
            return ttl <= 0 or cur_epoch - cache[fp][3] <= ttl

        for slot, reqs in by_slot.items():
            budget, avail = cfg.budget_for(
                delay_for(slot, base_by_slot[slot]), max_conc(slot),
                carry.get(slot, 0.0))
            avail_by_slot[slot] = avail
            reqs.sort(key=lambda q: (-q.priority,
                                     -q.seq if cfg.lifo else q.seq))
            if use_cache:
                # X12: the budget gates only requests that will hit the
                # network; FRESH cache hits all ship this round, re-ranked
                # into the host's R4 order
                uncached = [q for q in reqs
                            if not cache_fresh(q.fingerprint)]
                kept = [q for q in reqs if cache_fresh(q.fingerprint)] \
                    + uncached[:budget]
                kept.sort(key=lambda q: (-q.priority,
                                         -q.seq if cfg.lifo else q.seq))
            else:
                kept = reqs[:budget]
            for i, q in enumerate(kept):
                selected.append((q, i + 1))

        # ---- F5: global cap + total order (R4) ----------------------------
        selected.sort(key=lambda t: (-t[0].priority, t[1], t[0].seq))
        fetch_list = [q for q, _ in selected[:cfg.round_cap]]

        fetched_per_slot: dict[str, int] = {}
        responses_per_slot: dict[str, list[tuple[float, int]]] = {}
        new_grants: set[tuple[str, str]] = set()
        round_ra: dict[str, float] = {}   # max Retry-After per slot
        round_base = next_seq

        # ---- fetch in rank order (R5) + discover (R2) ----------------------
        for req in fetch_list:
            is_rb = req.fingerprint in robots_fps   # X17 synthesized req
            if not is_rb:
                del pending[req.fingerprint]
            if seen_ttl > 0:
                sr[req.fingerprint] = rnd   # fetch refreshes the seen entry
            # X17: robots fetches bypass the HTTP cache both directions
            # (their freshness is governed by robots_ttl_rounds)
            hit = (not is_rb) and cache_fresh(req.fingerprint)
            page = pages.get(req.url_canon)
            reval = False
            if hit:
                # X12 cache hit: served locally — no budget/carry/AT cost
                status, cached_redirect, cached_body = \
                    cache[req.fingerprint][:3]
                mc(req.host, "cached")
            else:
                fetched_per_slot[_slot(req.host)] = \
                    fetched_per_slot.get(_slot(req.host), 0) + 1
                req_ck = getattr(page, "requires_cookie", None) \
                    if page is not None else None
                if page is None:
                    status = 404
                elif cfg.cookies_enabled and isinstance(req_ck, str) \
                        and req_ck and (req.host, req_ck) not in cookies:
                    # X13: gated page, cookie not held at round start
                    status = 403
                elif page.succeeds_after is not None \
                        and not pd.isna(page.succeeds_after) \
                        and req.retry_count >= int(page.succeeds_after):
                    status = 200
                else:
                    status = int(page.status)
                lat_s = (float(page.latency_ms) / 1000.0) \
                    if page is not None else 0.0
                # X16 (r4b) download limits — network fetches only (cache
                # hits above bypass): timeout first (the transport gives
                # up before the body arrives; the OBSERVED latency is the
                # timeout itself — that is what feeds AT/carry), then the
                # maxsize cancel on what would have been a 200
                if cfg.download_timeout_ms is not None \
                        and page is not None \
                        and float(page.latency_ms) > cfg.download_timeout_ms:
                    status = TIMEOUT_STATUS
                    lat_s = cfg.download_timeout_ms / 1000.0
                elif cfg.download_maxsize_bytes and status == 200 \
                        and page is not None \
                        and isinstance(page.body_html, str) \
                        and len(page.body_html) > cfg.download_maxsize_bytes:
                    status = MAXSIZE_STATUS
                responses_per_slot.setdefault(_slot(req.host), []) \
                    .append((lat_s, status))
                # X12 r4 conditional revalidation: an expired entry with a
                # validator sent a conditional GET (it consumed the budget
                # + fed AT above, like any network fetch); a 200 whose
                # validator is unchanged is the server's "304" — serve the
                # cached triple and refresh the entry's epoch below
                if cfg.httpcache_revalidate and use_cache and not is_rb \
                        and req.fingerprint in cache and status == 200:
                    entry = cache[req.fingerprint]
                    pv = getattr(page, "validator", None) \
                        if page is not None else None
                    pv = pv if isinstance(pv, str) and pv else None
                    if entry[4] is not None:
                        # strong validator (ETag) present: it decides
                        reval = pv == entry[4]
                    else:
                        # r5: If-Modified-Since fallback — weak validator
                        # consulted only when the entry has no ETag
                        plm = getattr(page, "last_modified", None) \
                            if page is not None else None
                        plm = plm if isinstance(plm, str) and plm else None
                        c_lm = entry[5] if len(entry) > 5 else None
                        reval = c_lm is not None and plm == c_lm
                if status in (429, 503) and page is not None:
                    ra = getattr(page, "retry_after_s", None)
                    if ra is not None and not pd.isna(ra):
                        round_ra[_slot(req.host)] = max(
                            round_ra.get(_slot(req.host), 0.0), float(ra))
            rank += 1
            res.crawl_order.append({
                "rank": rank, "fingerprint": req.fingerprint,
                "url_canon": req.url_canon, "round": rnd, "host": req.host,
                "status": status, "depth": req.depth,
                "method": req.method, "redirect_chain": list(req.chain),
            })
            total_fetched += 1
            mc(req.host, "fetched")

            if reval:
                # served from cache on the validator match ("304 body")
                redirect_tgt, body = cache[req.fingerprint][1:3]
            else:
                redirect_tgt = cached_redirect if hit else (
                    page.redirect_to if page is not None else None)
                body = cached_body if hit else (
                    page.body_html if page is not None else None)
            stream: list = []
            if is_rb:
                # X17: parse + record the host's rules (allow-all on ANY
                # non-200, incl. synthetic 598/413 — the Scrapy no-robots
                # default); never retried, never redirect-followed, no
                # document. Sitemap: lines enqueue as plain discoveries
                # (depth parent+1) when sitemaps are on. Metrics classify
                # by the engine's batch indicators (ok / redirects /
                # errors) even though nothing is followed.
                if status == 200 and isinstance(body, str) and body:
                    r_alw, r_dis, r_dly, r_smaps = parse_robots_txt(body)
                else:
                    r_alw, r_dis, r_dly, r_smaps = [], [], None, []
                robots_state[req.host] = SimpleNamespace(
                    allow_prefixes=r_alw, disallow_prefixes=r_dis,
                    crawl_delay_s=r_dly, fetched_round=rnd)
                stream = list(r_smaps) if cfg.sitemaps_enabled else []
                retryable_resp = status in RETRYABLE_CODES
                redirect_resp = 300 <= status < 400 \
                    and isinstance(redirect_tgt, str) and redirect_tgt
                if status == 200:
                    mc(req.host, "ok")
                elif redirect_resp and not retryable_resp:
                    mc(req.host, "redirects")
                else:
                    mc(req.host, "errors")
            elif status in RETRYABLE_CODES:
                mc(req.host, "errors")
                if req.retry_count < cfg.retry_times:
                    stream = [_RETRY]
            elif 300 <= status < 400 and isinstance(redirect_tgt, str) \
                    and redirect_tgt:
                mc(req.host, "redirects")
                stream = [redirect_tgt]
            elif status == 200 and body is not None:
                mc(req.host, "ok")
                # X14 r4: X-Robots-Tag response-header nofollow — read
                # from the live fixture at processing time (headers are
                # not modeled in the cache; pinned deviation, COVERAGE.md)
                # — suppresses ALL discovery from this response, composing
                # with the meta tag (either suppresses). Spans/documents
                # are unaffected: nofollow stops following, not indexing.
                xr = getattr(page, "x_robots", None) \
                    if page is not None else None
                hdr_nf = isinstance(xr, str) and "nofollow" in xr.lower()
                hdr_ni = isinstance(xr, str) and "noindex" in xr.lower()
                if cfg.sitemaps_enabled and is_sitemap(body):
                    # F1 sitemap extension (r3): locs in document order,
                    # NO document row [S:scrapy/spiders/sitemap.py]
                    stream = [] if hdr_nf else parse_sitemap(body)
                else:
                    # X9 r3: parse_page applies page-level robots-meta
                    # nofollow (hrefs/forms empty) + rel=canonical.
                    # X14 r4b: noindex (meta or X-Robots-Tag header) —
                    # page crawled, links followed, but NO document row
                    # (no item count, no canonical registration: the
                    # canonical rides on the document)
                    spans, hrefs, forms, meta = \
                        parse_page(req.url_canon, body)
                    if not (meta.noindex or hdr_ni):
                        res.documents[req.fingerprint] = \
                            [s._asdict() for s in spans]
                        items_emitted += 1
                        if meta.canonical_raw:
                            res.canonical[req.fingerprint] = \
                                canonicalize_url(absolutize(
                                    req.url_canon, meta.canonical_raw))
                    # R2: links first, then forms
                    stream = [] if hdr_nf else hrefs + forms
            else:
                mc(req.host, "errors")
            # X16: synthetic transport failures (timeout/maxsize cancel)
            # received no complete response — never cached
            if use_cache and not hit and not is_rb \
                    and status not in RETRYABLE_CODES \
                    and status != MAXSIZE_STATUS:
                # DummyPolicy: store every non-retryable response at the
                # current epoch (re-caching an expired — or revalidated —
                # entry refreshes it). Validators ride only on 200s
                # (a real server sends ETag with the entity, not with
                # errors/redirects), so only 200 entries can revalidate.
                pv = getattr(page, "validator", None) \
                    if page is not None else None
                pv = pv if isinstance(pv, str) and pv else None
                plm = getattr(page, "last_modified", None) \
                    if page is not None else None
                plm = plm if isinstance(plm, str) and plm else None
                cache[req.fingerprint] = \
                    (status, redirect_tgt, body, cur_epoch,
                     pv if status == 200 else None,
                     plm if status == 200 else None)
            if cfg.cookies_enabled and status == 200 and page is not None:
                set_ck = getattr(page, "set_cookie", None)
                if isinstance(set_ck, str) and set_ck:
                    new_grants.add((req.host, set_ck))

            is_redirect = 300 <= status < 400
            for item in stream:
                seq = next_seq
                next_seq += 1
                mc(req.host, "discovered")
                if item is _RETRY:
                    pending[req.fingerprint] = _Req(
                        req.fingerprint, req.url_canon, req.host,
                        req.priority + cfg.retry_priority_adjust, req.depth,
                        seq, req.retry_count + 1,
                        req.method, req.body, req.chain)
                    mc(req.host, "retried")
                    continue
                if isinstance(item, Form):
                    method, body, raw = "POST", item.body, item.action
                else:
                    method, body, raw = "GET", "", item
                canon = canonicalize_url(absolutize(req.url_canon, raw))
                sp = urlsplit(canon)
                host = (sp.hostname or "").lower()
                path = sp.path or "/"
                depth = req.depth if is_redirect else req.depth + 1
                # X11: redirect targets extend the chain; links/forms reset
                chain = req.chain + (req.url_canon,) if is_redirect else ()
                # P3 scheme/len/ext, P4 allow/deny, P1 offsite, P2 depth,
                # X11 REDIRECT_MAX_TIMES chain cap
                if (sp.scheme not in ("http", "https")
                        or len(canon) > cfg.max_url_len
                        or ignored_ext.search(path)
                        or (allow_re and not allow_re.search(canon))
                        or (deny_re and deny_re.search(canon))
                        or not _suffix_match(host, cfg.allowed_domains)
                        or len(chain) > cfg.redirect_max_times
                        or (cfg.depth_limit > 0
                            and depth > cfg.depth_limit)):
                    mc(req.host, "filtered")
                    continue
                fp = fingerprint_hex(canon, method, body)
                if live(fp, rnd) or fp in pending:      # R3 (+ TTL rule)
                    mc(req.host, "deduped")
                    continue
                res.seen.add(fp)
                sr[fp] = rnd
                prio = req.priority if is_redirect \
                    else -depth * cfg.depth_priority
                pending[fp] = _Req(fp, canon, host, prio, depth, seq,
                                   0, method, body, chain)
                mc(req.host, "enqueued")

        # ---- carry + AutoThrottle update for slots with eligible candidates
        for slot in by_slot:
            carry[slot] = cfg.carry_after(
                avail_by_slot[slot], fetched_per_slot.get(slot, 0),
                delay_for(slot, base_by_slot[slot]))
            if cfg.autothrottle and responses_per_slot.get(slot):
                at_state[slot] = cfg.at_fold(
                    at_state.get(slot, cfg.at_start_delay_s),
                    responses_per_slot[slot], base_by_slot[slot])
        for slot in by_slot:
            # X10->F4 (r3): record this round's signal / clear the
            # one-shot — AFTER the carry update consumed the old value
            if slot in round_ra:
                ra_state[slot] = round_ra[slot]
            else:
                ra_state.pop(slot, None)

        cookies |= new_grants   # X13: grants take effect NEXT round
        if use_cache:
            # one epoch per caching round (engine: one published dir)
            cache["__epoch__"] = cur_epoch + 1

        for host, d in sorted(m.items()):
            res.metrics.append({"round": rnd, "host": host, **d})

        errors_total += sum(d["errors"] for d in m.values())
        if cfg.page_budget and total_fetched >= cfg.page_budget:
            break
        if cfg.item_budget and items_emitted >= cfg.item_budget:
            break
        # F6 r4 CLOSESPIDER_ERRORCOUNT analogue: graceful close after the
        # first round whose cumulative error-response count hits the budget
        if cfg.error_budget and errors_total >= cfg.error_budget:
            break
        _ = round_base  # documented anchor for engine parity (R2)

    return res
