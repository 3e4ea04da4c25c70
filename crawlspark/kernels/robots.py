"""robots.txt gating — Protego-subset longest-prefix matcher (SURVEY §2.2 P5).

Reference behavior (tier [S:scrapy/downloadermiddlewares/robotstxt.py] +
protego): for User-agent:*, the most specific (longest) matching Allow or
Disallow path prefix wins; on equal length Allow wins; no matching rule =>
allowed. Crawl-delay feeds the politeness budget (F4).

protego is not installed in-sandbox; the fixture generator only emits this
subset (documented limitation, SURVEY §7.3 hard-part 3). The pure function
below is shared by engine (inside an Arrow-vectorized pandas UDF) and oracle.
"""

from __future__ import annotations


def robots_allowed(path: str, allow_prefixes: list[str] | None,
                   disallow_prefixes: list[str] | None) -> bool:
    """Longest-prefix Allow/Disallow decision for one URL path."""
    best_allow = -1
    best_dis = -1
    for p in allow_prefixes or ():
        if p and path.startswith(p) and len(p) > best_allow:
            best_allow = len(p)
    for p in disallow_prefixes or ():
        if p and path.startswith(p) and len(p) > best_dis:
            best_dis = len(p)
    return best_allow >= best_dis  # ties -> Allow wins; no rules -> allowed


def make_robots_udf():
    """Arrow-vectorized matcher: (path, allow_prefixes, disallow_prefixes)
    -> bool. Rule arrays ride the broadcast-joined robots table (J2), so the
    UDF is a pure columnar function — no driver-side state."""
    import pandas as pd  # noqa: F401 (resolves UDF type hints)
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def robots_allowed_udf(path: pd.Series, allow: pd.Series,
                           disallow: pd.Series) -> pd.Series:
        return pd.Series(
            [robots_allowed(p if isinstance(p, str) else "/",
                            None if a is None else list(a),
                            None if d is None else list(d))
             for p, a, d in zip(path, allow, disallow)],
            index=path.index,
            dtype="boolean",
        )

    return robots_allowed_udf
