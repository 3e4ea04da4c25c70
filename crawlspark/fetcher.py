"""X7 fetch source — batched fetchers behind one interface (SURVEY §2.1).

The engine's fetch operator is a function ``(dequeued batch) -> fetch
results``; in this sandbox it is a join against the fixture ``pages`` table
("the network", no real HTTP — engine.py does that join inline because it
also feeds golden columns). This module provides the REAL-crawl form: an
Arrow-batched ``mapInPandas`` HTTP fetcher a cluster deployment would swap
in — each executor task fetches its partition's URLs with a bounded
thread pool (politeness is already enforced upstream by F4: a partition
never carries more than one round's budget for a host).

No network exists in this sandbox, so ``http_fetch_batch`` is exercised
through dependency injection of the opener (tests inject a deterministic
fake; the default is urllib). The mapInPandas plumbing — schema, batch
shape, latency measurement, error mapping — is real and tested.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

FETCH_SCHEMA = StructType([
    StructField("url_canon", StringType()),
    StructField("status", IntegerType()),
    StructField("latency_ms", DoubleType()),
    StructField("body_html", StringType()),
    StructField("redirect_to", StringType()),
    # X15 r3: parsed Retry-After header seconds (null when absent) — the
    # engine's politeness coupling consumes this column on 429/503
    StructField("retry_after_s", DoubleType()),
])


def parse_retry_after(value: str | None) -> float | None:
    """Retry-After header -> seconds. Handles the delta-seconds form
    (RFC 9110 §10.2.3); the HTTP-date form needs a reference clock the
    deterministic engine deliberately excludes, so it maps to None."""
    if not value:
        return None
    try:
        s = float(value.strip())
        return s if s >= 0 else None
    except ValueError:
        return None


def default_opener(url: str, timeout_s: float, method: str = "GET",
                   body: str = "") \
        -> tuple[int, str, str | None, float | None]:
    """(status, body, redirect_location, retry_after_s) via urllib; POST
    bodies are sent urlencoded (FormRequest analogue). Real-cluster path;
    unreachable in this sandbox (no network)."""
    import urllib.error
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):   # surface 3xx to the engine
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(
        url, data=body.encode("utf-8") if body else None, method=method)
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            return int(resp.status), resp.read().decode(
                "utf-8", errors="replace"), None, None
    except urllib.error.HTTPError as e:
        loc = e.headers.get("Location") if e.headers else None
        ra = parse_retry_after(
            e.headers.get("Retry-After") if e.headers else None)
        return int(e.code), "", loc, ra
    except Exception:
        return 599, "", None, None  # connection-level failure (retryable)


def http_fetch_batch(
    batch: DataFrame,
    opener: Callable[[str, float], tuple[int, str, str | None]] | None = None,
    timeout_s: float = 30.0,
    max_threads: int = 8,
) -> DataFrame:
    """Dequeued batch (needs ``url_canon``) -> FETCH_SCHEMA via mapInPandas.

    One bounded thread pool per Arrow batch (I/O-bound; threads, not
    processes). Results keep the batch's row order so downstream
    deterministic sequencing (R2) is preserved.
    """
    op = opener or default_opener
    has_mb = {"method", "body"} <= set(batch.columns)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor
        for pdf in batches:
            urls = list(pdf["url_canon"])
            methods = list(pdf["method"]) if has_mb else ["GET"] * len(urls)
            bodies = list(pdf["body"]) if has_mb else [""] * len(urls)

            def one(args):
                url, method, body = args
                t0 = time.time()
                out = op(url, timeout_s, method, body)
                # injected test openers may return the legacy 3-tuple
                # (status, body, redirect); retry_after defaults to None
                status, rbody, loc = out[:3]
                ra = out[3] if len(out) > 3 else None
                return status, (time.time() - t0) * 1000.0, rbody, loc, ra

            with ThreadPoolExecutor(max_workers=max_threads) as pool:
                rows = list(pool.map(one, zip(urls, methods, bodies)))
            yield pd.DataFrame({
                "url_canon": urls,
                "status": pd.array([r[0] for r in rows], dtype="int32"),
                "latency_ms": [r[1] for r in rows],
                "body_html": [r[2] for r in rows],
                "redirect_to": [r[3] for r in rows],
                "retry_after_s": pd.array([r[4] for r in rows],
                                          dtype="float64"),
            })

    cols = ["url_canon", "method", "body"] if has_mb else ["url_canon"]
    return batch.select(*cols).mapInPandas(gen, FETCH_SCHEMA)
