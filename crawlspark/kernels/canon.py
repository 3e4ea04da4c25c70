"""URL canonicalization + request fingerprinting (SURVEY.md §2.3 D1/D2).

Semantics: w3lib-compatible subset of ``w3lib.url.canonicalize_url``
(reference tier [S]; w3lib is not installed in-sandbox, so this module IS
the normative spec — the Spark engine and the pure-Python oracle simulator
both import these exact functions, and golden-vector tests in
``tests/test_canon.py`` pin the behavior):

  1. scheme lowercased
  2. host lowercased, IDNA-encoded when non-ASCII
  3. default port stripped (http:80, https:443)
  4. path: percent-decoded then re-quoted with a fixed safe set (uppercases
     stray %xx escapes, encodes illegal chars); empty path -> "/"
  5. query: parsed with blank values kept, parameters sorted by (key, value),
     re-encoded with quote_plus
  6. fragment dropped
  7. surrounding whitespace stripped

Fingerprint (Scrapy >=2.7 ``RequestFingerprinter`` default for GET + empty
body, tier [S:scrapy/utils/request.py::fingerprint]): here pinned as
``sha1(b"GET" + canonical_url.utf8)`` hex — a pure function of the canonical
URL, computable natively in Spark as ``sha1(concat(lit('GET'), url_canon))``
so the hot path never leaves the JVM.

The pandas UDF wrappers at the bottom are the only place Python-level string
work happens in the engine, and they run over Arrow batches
(no per-row Python at the Spark row level — BASELINE.json:"input_hint").
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from urllib.parse import (
    parse_qsl,
    quote,
    quote_plus,
    urljoin,
    urlsplit,
    urlunsplit,
    unquote,
)

# Safe characters for path re-quoting — mirrors w3lib's RFC-3986 path set.
_PATH_SAFE = "/;:@&=+$,!*'()~-._"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _canon_host(host: str, scheme: str, port: str | None) -> str:
    host = host.lower()
    if not host.isascii():
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass
    if port and _DEFAULT_PORTS.get(scheme) != port:
        return f"{host}:{port}"
    return host


@lru_cache(maxsize=65536)
def canonicalize_url(url: str) -> str:
    """Canonical form of ``url`` per the module-level spec. Deterministic,
    total (never raises on str input — unparseable URLs canonicalize to a
    best-effort normalization)."""
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    try:
        host = parts.hostname or ""
        port = parts.port
    except ValueError:
        host, port = parts.netloc.lower(), None
    netloc = _canon_host(host, scheme, str(port) if port else None)
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = quote(unquote(parts.path), safe=_PATH_SAFE)
    if netloc and not path:
        path = "/"
    pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
    query = "&".join(
        f"{quote_plus(k)}={quote_plus(v)}" if v else f"{quote_plus(k)}="
        for k, v in pairs
    )
    return urlunsplit((scheme, netloc, path, query, ""))


def absolutize(base_url: str, href: str) -> str:
    """Resolve ``href`` (possibly relative) against ``base_url``
    (stdlib RFC-3986 join — what LxmlLinkExtractor does via
    ``response.urljoin``, tier [S])."""
    return urljoin(base_url, href.strip())


def fingerprint_hex(url_canon: str, method: str = "GET",
                    body: str = "") -> str:
    """sha1(method || canonical_url || body) lowercase hex (SURVEY §3.4 R6,
    extended r2 to non-GET per
    [S:scrapy/utils/request.py::fingerprint] which hashes method+URL+body).
    GET with empty body degenerates to the r1 sha1('GET' || url) goldens.
    Engine-native twin: ``sha1(concat(method, url_canon, body))``."""
    return hashlib.sha1(
        method.encode("ascii") + url_canon.encode("utf-8")
        + body.encode("utf-8")).hexdigest()


def url_host(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


# --------------------------------------------------------------------------
# Spark-side vectorized wrappers (imported lazily so the oracle/pytest can use
# the pure functions above without a JVM).
# --------------------------------------------------------------------------

def make_udfs():
    """Build the Arrow-vectorized pandas UDFs used by the engine.

    Returns (canonicalize_udf, absolutize_udf, host_udf). Fingerprinting is
    deliberately NOT a UDF — the engine computes it natively as
    ``F.sha1(F.concat(F.lit("GET"), col))`` (JVM-side, codegen'd).
    """
    import pandas as pd  # noqa: F401 (resolves UDF type hints)
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def canonicalize_udf(urls: pd.Series) -> pd.Series:
        return urls.map(canonicalize_url, na_action="ignore")

    @pandas_udf("string")
    def absolutize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
        return pd.Series(
            [urljoin(b, h.strip()) if isinstance(h, str) else None
             for b, h in zip(base, href)],
            index=base.index,
            dtype="object",
        )

    @pandas_udf("string")
    def host_udf(urls: pd.Series) -> pd.Series:
        return urls.map(url_host, na_action="ignore")

    return canonicalize_udf, absolutize_udf, host_udf
