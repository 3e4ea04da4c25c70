"""Deterministic synthetic web graph (FIXTURES.md §§1-4). seed=42.

The ``pages`` table IS the network: the engine's fetch operator (X7) is a
join against it, never real HTTP. The generator embeds every golden fact the
tests need:

  * ``body_html``      — what the fetch "returns"; the engine's extractor
                         (X8/X9 applyInPandas) parses THIS.
  * ``body_spans``     — golden interleaved spans (kind,text,media_ref,offset)
                         that parse_html must reproduce exactly.
  * ``outlinks_raw``   — golden raw hrefs in discovery order (canonicalizer
                         fodder: fragments, unsorted query params, stray %xx,
                         default ports, relative paths, uppercase hosts).
  * skew: two mega-hosts (booking.test / tripadvisor.test) own ~40% of pages
    (BASELINE.json:"north_star" skew requirement, exercises J6 salting).
  * failure modes: 404 / 301 redirect chains / retryable 5xx & 429, some
    flaky (succeed after N retries) / robots-disallowed /private paths with
    an /private/open allow carve-out (longest-prefix test).
"""

from __future__ import annotations

import json
import os
import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..kernels.canon import canonicalize_url, fingerprint_hex
from ..kernels.robots import render_robots_txt
from ..kernels.parse import (
    Form, Span, media_ref_for, render_html, render_sitemap,
)

MEGA_HOSTS = ["booking.test", "tripadvisor.test"]
OFFSITE_HOSTS = ["facebook.test", "ads.tracker.test"]

SPAN_T = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

PAGES_SCHEMA = pa.schema([
    ("url_canon", pa.string()),
    ("host", pa.string()),
    ("path", pa.string()),
    ("status", pa.int32()),
    ("redirect_to", pa.string()),
    ("succeeds_after", pa.int32()),   # flaky pages: 200 once retry_count >= this
    ("latency_ms", pa.float64()),
    ("title", pa.string()),
    ("body_html", pa.string()),
    ("body_spans", pa.list_(SPAN_T)),
    ("outlinks_raw", pa.list_(pa.string())),
    ("outform_actions", pa.list_(pa.string())),   # golden raw form actions
    ("outform_bodies", pa.list_(pa.string())),    # golden urlencoded bodies
    ("nofollow_raw", pa.list_(pa.string())),      # golden rel=nofollow hrefs
    ("set_cookie", pa.string()),       # 200 response grants this host cookie
    ("requires_cookie", pa.string()),  # 403 unless the cookie is held
    ("meta_nofollow", pa.bool_()),     # page-level robots meta nofollow (r3)
    ("canonical_raw", pa.string()),    # golden raw rel=canonical href (r3)
    ("retry_after_s", pa.float64()),   # Retry-After on 429/503 pages (r3)
    ("validator", pa.string()),        # ETag analogue (r4): stored with a
                                       # 200's cache entry; an expired entry
                                       # whose validator still matches the
                                       # page revalidates ("304") instead of
                                       # a full re-fetch
    ("x_robots", pa.string()),         # X-Robots-Tag response header (r4):
                                       # "nofollow" suppresses link/form
                                       # discovery, composing with the
                                       # meta-robots page tag (either wins);
                                       # "noindex" suppresses the document
                                       # row (page still crawled+followed)
    ("meta_noindex", pa.bool_()),      # page-level robots meta noindex
                                       # (r4b): golden for the no-document
                                       # rule; renders into the same meta
                                       # tag as meta_nofollow
    ("last_modified", pa.string()),    # If-Modified-Since analogue (r5):
                                       # weak validator, consulted on
                                       # revalidation only when the cached
                                       # entry has no ETag (default graphs
                                       # carry BOTH, so the ETag decides)
])


def _hosts(n_small: int) -> list[str]:
    hs = list(MEGA_HOSTS)
    for i in range(n_small):
        fam = "example-hotels.test" if i % 2 == 0 else "example-restaurants.test"
        hs.append(f"h{i}.{fam}")
    return hs


def _mess_up(rng: random.Random, url_canon: str, same_host: bool) -> str:
    """Produce a raw href that canonicalizes back to ``url_canon``."""
    from urllib.parse import urlsplit
    p = urlsplit(url_canon)
    url = url_canon
    roll = rng.random()
    if roll < 0.15 and same_host:
        url = p.path + (f"?{p.query}" if p.query else "")       # relative
    elif roll < 0.30:
        url = url_canon.replace(p.hostname, p.hostname.upper(), 1)
    elif roll < 0.45 and p.query:
        ks = p.query.split("&")
        rng.shuffle(ks)
        url = f"{p.scheme}://{p.netloc}{p.path}?{'&'.join(ks)}"
    elif roll < 0.55:
        url = f"{p.scheme}://{p.netloc}:443{p.path}" + (f"?{p.query}" if p.query else "")
    elif roll < 0.70 and "/page/" in p.path:
        url = url_canon.replace("/page/", "/%70age/", 1)        # %70 == 'p'
    if rng.random() < 0.35:
        url += "#frag" + str(rng.randrange(10))
    return url


def generate(n_pages: int = 300, seed: int = 42,
             chain_len: int = 25, with_cookies: bool = True,
             with_nofollow: bool = True,
             with_sitemaps: bool = True,
             with_meta: bool = True,
             with_x_robots: bool = False) -> dict[str, pd.DataFrame]:
    rng = random.Random(seed)
    n_small = max(4, n_pages // 40)
    hosts = _hosts(n_small)

    # --- allocate pages to hosts: ~20% to each mega host (skew), rest spread
    page_host: list[str] = []
    for j in range(n_pages):
        r = rng.random()
        if r < 0.20:
            page_host.append(MEGA_HOSTS[0])
        elif r < 0.40:
            page_host.append(MEGA_HOSTS[1])
        else:
            page_host.append(hosts[2 + rng.randrange(n_small)])

    # --- canonical URLs (roots first so every host has an index page)
    urls: list[str] = [f"https://{h}/" for h in hosts]
    url_host_l: list[str] = list(hosts)
    for j, h in enumerate(page_host):
        kind = rng.choice(["hotel", "restaurant", "page", "review"])
        if rng.random() < 0.35:
            q = f"?a={rng.randrange(5)}&b={rng.randrange(5)}"
        else:
            q = ""
        path = f"/{kind}/{j}" if rng.random() > 0.08 else (
            f"/private/open/{j}" if rng.random() < 0.4 else f"/private/{j}")
        urls.append(canonicalize_url(f"https://{h}{path}{q}"))
        url_host_l.append(h)
    # dedupe (query collisions are possible) keeping first occurrence
    seen_u: dict[str, str] = {}
    for u, h in zip(urls, url_host_l):
        seen_u.setdefault(u, h)
    urls = list(seen_u)
    url_host_l = [seen_u[u] for u in urls]
    by_host: dict[str, list[str]] = {}
    for u, h in zip(urls, url_host_l):
        by_host.setdefault(h, []).append(u)

    # --- cookie sessions (X13): on ~1/3 of hosts a non-root "login" page
    # sets a session cookie and ~20% of that host's other pages are gated
    # on it. The setter is NOT the (seeded) root, so crawl order decides
    # whether a gated page 403s (fetched before the login) or serves —
    # both outcomes occur on the default graph and both are oracle-pinned.
    # independent stream: cookie layout must not perturb the page/status/
    # link draws (the failure-mode coverage of the rest of the graph)
    crng = random.Random(seed ^ 0xC00C1E)
    cookie_hosts = {h for h in hosts
                    if crng.random() < 0.5} if with_cookies else set()
    cookie_set_done: set[str] = set()
    # page-level head metadata (r3): independent stream — ~6% of non-root
    # 200 pages are meta-nofollow (ALL their links/forms suppressed), ~8%
    # declare rel=canonical to another same-host page via a messy href
    # (canonicalizer fodder, like outlinks)
    mrng = random.Random(seed ^ 0xCA7014)
    # meta noindex (r4b): its own stream — drawn from mrng it would shift
    # every later page's nofollow/canonical draw and reshape the graph
    nrng = random.Random(seed ^ 0x401DE)
    # Retry-After signals (r3): independent stream; ~60% of 429/503 pages
    # ask for a backoff that exceeds the politeness delay
    rrng = random.Random(seed ^ 0x7E7A)
    # X-Robots-Tag headers (r4): independent stream, drawn ONLY when the
    # knob is on so default graphs are bit-identical to r3
    xrng = random.Random(seed ^ 0x0B07)
    # --- per-page rows
    rows = []
    for u, h in zip(urls, url_host_l):
        from urllib.parse import urlsplit
        path = urlsplit(u).path
        is_root = path == "/"
        r = rng.random()
        status, redirect_to, succ = 200, None, None
        if not is_root:
            if r < 0.04:
                status = 404
            elif r < 0.08:
                status = 301
                redirect_to = rng.choice(by_host[h])
                if redirect_to == u:
                    redirect_to = f"https://{h}/"
            elif r < 0.11:
                status = rng.choice([500, 503, 429])
                if rng.random() < 0.5:
                    succ = rng.randrange(1, 3)   # flaky: ok after 1-2 retries
            elif r < 0.12:
                status = 403                      # non-retryable error
        latency = 20.0 + (int(fingerprint_hex(u)[:6], 16) % 2000) / 10.0

        # spans: 1-6 interleaved text/media pieces
        spans: list[Span] = []
        media_srcs: list[str] = []
        for t in range(rng.randrange(1, 7)):
            if rng.random() < 0.3:
                src = f"/img/{int(fingerprint_hex(u)[:8], 16) % 10_000}_{t}.jpg" \
                    if rng.random() < 0.7 else f"https://cdn.{h}/m/{t}.png"
                spans.append(Span("media", None, media_ref_for(u, src), t))
                media_srcs.append(src)
            else:
                spans.append(Span(
                    "text",
                    f"{h} {path} para {t}: "
                    + " ".join(rng.choice(["stay", "eat", "view", "price",
                                           "rooms", "menu", "clean", "<b>",
                                           "café", "5★"]) for _ in range(8)),
                    None, t))

        # outlinks: roots fan out wide; leaf pages link a few
        n_links = rng.randrange(8, 16) if is_root else rng.randrange(0, 6)
        hrefs: list[str] = []
        for _ in range(n_links):
            lr = rng.random()
            if lr < 0.70:                                  # same-host
                tgt = rng.choice(by_host[h])
                hrefs.append(_mess_up(rng, tgt, same_host=True))
            elif lr < 0.82:                                # cross-host in-scope
                oh = rng.choice(hosts)
                hrefs.append(_mess_up(rng, rng.choice(by_host[oh]), False))
            elif lr < 0.88:                                # offsite (P1 fodder)
                hrefs.append(f"https://{rng.choice(OFFSITE_HOSTS)}/x/{rng.randrange(99)}")
            elif lr < 0.93:                                # bad scheme (P3)
                hrefs.append(rng.choice(["mailto:a@b.test",
                                         "javascript:void(0)",
                                         "ftp://files.test/f"]))
            elif lr < 0.97:                                # ignored ext (P3)
                hrefs.append(f"https://{h}/brochure/{rng.randrange(99)}.pdf")
            else:                                          # over-long (P3)
                hrefs.append(f"https://{h}/l/" + "x" * 2200)
        # ~12% of links demote to rel=nofollow (otherwise-valid targets
        # the extractor must skip [S:scrapy/linkextractors/lxmlhtml.py])
        nofollow: list[str] = []
        if with_nofollow and len(hrefs) >= 3 and rng.random() < 0.5:
            nofollow.append(hrefs.pop(rng.randrange(len(hrefs))))
        # the first mega-root links into the 301 chain (X11 cap fodder).
        # NOTE: the chain advances ONE hop per round (each redirect target
        # is re-enqueued), so it adds ~chain_len rounds to a crawl — tests
        # not exercising the cap pass chain_len=0
        if is_root and h == MEGA_HOSTS[0] and chain_len:
            hrefs.append("/chain/0x")
        # ~12% of non-root pages carry a POST search form (D2 method+body
        # fingerprints; FormRequest analogue) whose action page is appended
        # below — distinct fingerprint even when a GET to the same URL exists
        forms: list[Form] = []
        if not is_root and rng.random() < 0.12:
            forms = [Form(f"/form/submit{path}",
                          f"src={path}&lang={rng.choice(['en', 'fr'])}")]
        set_ck, req_ck = None, None
        if not is_root and h in cookie_hosts and status == 200:
            if h not in cookie_set_done:
                set_ck = f"sess-{h}"
                cookie_set_done.add(h)
            elif crng.random() < 0.45:
                req_ck = f"sess-{h}"
        retry_after = None
        if status in (429, 503) and rrng.random() < 0.6:
            retry_after = float(rrng.choice([4.0, 10.0, 16.0]))
        meta_nf, canon_raw = False, None
        if with_meta and not is_root and status == 200:
            mr = mrng.random()
            if mr < 0.06:
                meta_nf = True
            elif mr < 0.14:
                canon_raw = _mess_up(mrng, mrng.choice(by_host[h]),
                                     same_host=True)
        # noindex (r4b): independent stream so adding it leaves every
        # pre-existing draw (and thus graph shape) untouched; ~5% of
        # non-root 200 pages; composes freely with meta_nf/canonical
        meta_ni = bool(with_meta and not is_root and status == 200
                       and nrng.random() < 0.05)
        # X-Robots-Tag (r4): ~8% of non-root 200 pages carry a header-level
        # directive; overlaps with meta_nf naturally (independent streams),
        # exercising the either-suppresses composition. Pure "noindex"
        # (r4b) exercises followed-but-not-indexed via the header alone
        x_robots = None
        if with_x_robots and not is_root and status == 200 \
                and xrng.random() < 0.08:
            x_robots = xrng.choice(["nofollow", "noindex",
                                    "noindex, nofollow"])
        hdr_nf = x_robots is not None and "nofollow" in x_robots
        title = f"{h}{path}"
        body = render_html(title, spans, hrefs, media_srcs, forms, nofollow,
                           meta_nofollow=meta_nf, canonical=canon_raw,
                           meta_noindex=meta_ni)
        # goldens are DISCOVERY goldens: a meta-nofollow (or header-
        # nofollow) page still renders its anchors/forms, but the
        # extractor must discover nothing
        no_follow_all = meta_nf or hdr_nf
        rows.append((u, h, path, status, redirect_to, succ, latency, title,
                     body, [s._asdict() for s in spans],
                     [] if no_follow_all else hrefs,
                     [] if no_follow_all else [f.action for f in forms],
                     [] if no_follow_all else [f.body for f in forms],
                     nofollow, set_ck, req_ck, meta_nf, canon_raw,
                     retry_after, "W/" + fingerprint_hex(u)[:16], x_robots,
                     meta_ni, "LM/" + fingerprint_hex(u)[16:28]))

    # --- form-action result pages (fetched via POST; simple, no outlinks);
    # keyed dedupe: pages differing only in query share an action URL
    extra: dict[str, tuple] = {}
    for row in rows:
        for action in row[11]:
            au = canonicalize_url(f"https://{row[1]}{action}")
            if au in extra:
                continue
            sp = [Span("text", f"form result for {action}", None, 0)]
            extra[au] = (au, row[1], action, 200, None, None,
                         20.0 + (int(fingerprint_hex(au)[:6], 16) % 2000) / 10.0,
                         f"{row[1]}{action}",
                         render_html(f"{row[1]}{action}", sp, [], []),
                         [s._asdict() for s in sp], [], [], [], [],
                         None, None, False, None, None,
                         "W/" + fingerprint_hex(au)[:16], None, False,
                         "LM/" + fingerprint_hex(au)[16:28])
    rows.extend(extra.values())

    # --- 301 chain of 25 DISTINCT hops on the first mega host: exercises
    # REDIRECT_MAX_TIMES=20 (the seen-set alone would never cut it)
    ch = MEGA_HOSTS[0]
    # paths end in 'x' so a host's random REP wildcard rules (/*7$) can
    # never robots-block a hop and mask the cap behavior
    chain_urls = [canonicalize_url(f"https://{ch}/chain/{i}x")
                  for i in range(25)]
    for i, cu in enumerate(chain_urls):
        last = i == len(chain_urls) - 1
        sp = [Span("text", f"chain end {i}", None, 0)] if last else []
        rows.append((cu, ch, f"/chain/{i}x",
                     200 if last else 301,
                     None if last else chain_urls[i + 1], None,
                     20.0 + (int(fingerprint_hex(cu)[:6], 16) % 2000) / 10.0,
                     f"{ch}/chain/{i}x",
                     render_html(f"{ch}/chain/{i}x", sp, [], []),
                     [s._asdict() for s in sp], [], [], [], [],
                     None, None, False, None, None,
                     "W/" + fingerprint_hex(cu)[:16], None, False,
                     "LM/" + fingerprint_hex(cu)[16:28]))

    # --- sitemaps (F1 extension, r3): ~1/4 of hosts publish /sitemap.xml
    # listing a sample of the host's pages PLUS 1-3 ORPHAN pages reachable
    # only through the sitemap (proving expansion adds coverage). The
    # first sitemap host publishes a sitemapindex -> two sub-sitemaps
    # (recursion via content sniffing). Independent rng stream so sitemap
    # layout never perturbs the page/status/link draws.
    srng = random.Random(seed ^ 0x5173AB)
    sitemap_seed_urls: list[str] = []
    # F7 r3: sitemaps are discovered two ways, alternating by host —
    # even-indexed sitemap hosts are SEEDED directly, odd-indexed ones
    # are declared ONLY via a robots.txt `Sitemap:` line
    # [S:scrapy/spiders/sitemap.py — sitemap_urls may point at
    # robots.txt]; deterministic split, no extra rng draws
    robots_sitemaps: dict[str, list[str]] = {}
    if with_sitemaps:
        def _page_row(u, h, path, status, body, spans, outlinks):
            lat = 20.0 + (int(fingerprint_hex(u)[:6], 16) % 2000) / 10.0
            return (u, h, path, status, None, None, lat, f"{h}{path}",
                    body, [s._asdict() for s in spans], outlinks,
                    [], [], [], None, None, False, None, None,
                    "W/" + fingerprint_hex(u)[:16], None, False,
                    "LM/" + fingerprint_hex(u)[16:28])

        sm_hosts = [h for h in hosts if srng.random() < 0.25]
        for idx, h in enumerate(sm_hosts):
            orphans = []
            for j in range(srng.randrange(1, 4)):
                ou = canonicalize_url(f"https://{h}/orphan/{j}")
                sp = [Span("text", f"orphan page {h} {j}", None, 0)]
                rows.append(_page_row(
                    ou, h, f"/orphan/{j}", 200,
                    render_html(f"{h}/orphan/{j}", sp, [], []), sp, []))
                orphans.append(ou)
            locs = [u for u in by_host.get(h, [])
                    if srng.random() < 0.5] + orphans
            sm_url = canonicalize_url(f"https://{h}/sitemap.xml")
            if idx == 0 and len(locs) >= 2:
                # sitemapindex: locs split across two sub-sitemaps
                subs = []
                half = len(locs) // 2
                for i, chunk in enumerate((locs[:half], locs[half:])):
                    su = canonicalize_url(f"https://{h}/sitemap-{i}.xml")
                    rows.append(_page_row(su, h, f"/sitemap-{i}.xml", 200,
                                          render_sitemap(chunk), [], chunk))
                    subs.append(su)
                body = render_sitemap(subs, index=True)
                outl = subs
            else:
                body = render_sitemap(locs)
                outl = locs
            rows.append(_page_row(sm_url, h, "/sitemap.xml", 200,
                                  body, [], outl))
            if idx % 2 == 0:
                sitemap_seed_urls.append(sm_url)
            else:
                robots_sitemaps[h] = [sm_url]

    # --- robots (Protego subset): disallow /private, allow /private/open
    rrows = []
    for h in hosts:
        dis = ["/private"] if rng.random() < 0.8 else []
        alw = ["/private/open"] if dis and rng.random() < 0.7 else []
        if rng.random() < 0.2:
            dis.append("/review")
        # REP wildcard rules (*, $): disallow any path ending in 7, but a
        # longer Allow carves /hotel/...7 back out (longest-pattern-wins)
        if rng.random() < 0.25:
            dis.append("/*7$")
            if rng.random() < 0.5:
                alw.append("/hotel/*7$")
        delay = round(rng.choice([0.0, 0.25, 0.5, 1.0]), 2) or None
        rrows.append((h, alw, dis, delay, robots_sitemaps.get(h, [])))
    robots = pd.DataFrame(
        rrows, columns=["host", "allow_prefixes", "disallow_prefixes",
                        "crawl_delay_s", "sitemap_urls"])

    # --- X17 (r5): every host with rules also serves /robots.txt as a
    # PAGE whose body renders those same rules (live-acquisition mode
    # fetches + parses it; the parsed result round-trips bit-identically
    # to the table above). Inert outside robots_fetch mode: never seeded,
    # never linked. NO rng draws here — fixture determinism is unchanged.
    for h, alw, dis, delay, smaps in rrows:
        ru = canonicalize_url(f"https://{h}/robots.txt")
        rows.append((ru, h, "/robots.txt", 200, None, None,
                     20.0 + (int(fingerprint_hex(ru)[:6], 16) % 2000) / 10.0,
                     f"{h}/robots.txt",
                     render_robots_txt(alw, dis, delay, smaps),
                     [], [], [], [], [],
                     None, None, False, None, None,
                     "W/" + fingerprint_hex(ru)[:16], None, False,
                     "LM/" + fingerprint_hex(ru)[16:28]))

    pages = pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA])

    # --- host_policy: mega hosts get salt_n>1 (explicit skew handling J6).
    # X18 (r5): the ip column is the sandbox "resolver" for
    # CONCURRENT_REQUESTS_PER_IP — megas get dedicated IPs; small hosts
    # co-host 3-per-IP (a shared-CDN shape), deterministic from host index
    # so engine and oracle resolve identically.
    prows = []
    for i, h in enumerate(hosts):
        mega = h in MEGA_HOSTS
        ip = f"203.0.113.{i + 1}" if mega \
            else f"198.51.100.{(i - len(MEGA_HOSTS)) // 3 + 1}"
        prows.append((h,
                      round(rng.choice([0.25, 0.5, 0.75, 1.0]), 2),
                      8 if mega else rng.choice([2, 4, 8]),
                      8 if mega else 1,
                      ip))
    host_policy = pd.DataFrame(
        prows, columns=["host", "crawl_delay_s", "max_concurrency", "salt_n",
                        "ip"])

    # --- seeds: both megas + a sample of small hosts, roots first (R1
    # order); sitemap seeds append AFTER the page seeds (kind column is
    # informational — expansion is content-sniffed, as SitemapSpider
    # sniffs the response body)
    seed_hosts = MEGA_HOSTS + [h for h in hosts[2:] if rng.random() < 0.6]
    seed_urls = [f"https://{h}/" for h in seed_hosts] + sitemap_seed_urls
    seeds = pd.DataFrame({
        "seed_id": range(len(seed_urls)),
        "url": seed_urls,
        "kind": (["page"] * len(seed_hosts)
                 + ["sitemap"] * len(sitemap_seed_urls)),
    })

    return {"seeds": seeds, "pages": pages, "robots": robots,
            "host_policy": host_policy}


def default_config() -> CrawlConfig:
    return CrawlConfig(
        allowed_domains=("example-hotels.test", "example-restaurants.test",
                         *MEGA_HOSTS),
    )


def write_fixture(out_dir: str, n_pages: int = 300, seed: int = 42,
                  config: CrawlConfig | None = None,
                  chain_len: int = 25, with_cookies: bool = True,
                  with_nofollow: bool = True,
                  with_sitemaps: bool = True,
                  with_meta: bool = True,
                  with_x_robots: bool = False) -> CrawlConfig:
    os.makedirs(out_dir, exist_ok=True)
    dfs = generate(n_pages=n_pages, seed=seed, chain_len=chain_len,
                   with_cookies=with_cookies, with_nofollow=with_nofollow,
                   with_sitemaps=with_sitemaps, with_meta=with_meta,
                   with_x_robots=with_x_robots)
    pq.write_table(pa.Table.from_pandas(dfs["pages"], schema=PAGES_SCHEMA,
                                        preserve_index=False),
                   os.path.join(out_dir, "pages.parquet"))
    for name in ("seeds", "robots", "host_policy"):
        pq.write_table(pa.Table.from_pandas(dfs[name], preserve_index=False),
                       os.path.join(out_dir, f"{name}.parquet"))
    cfg = config or default_config()
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=1)
    return cfg
