"""Driver-contract query surface (SURVEY §2 Q1-Q5 + training-pipeline ops).

Each entry re-expresses one operator family from the crawl engine (window
dequeue, anti-join dedup, politeness aggregates, ...) or a large-scale
training-data-pipeline operation (exact/near dedup, similarity search,
text analysis) over the driver's TPC-H-ish testdata, so the DuckDB oracle
can verify it at sf0.01 (CORRECTNESS_r{N}.json).

Conventions (driver compare is column-name-sorted value hashing):
  * every computed column is aliased IDENTICALLY in Spark and SQL;
  * counts cast to BIGINT on both sides; doubles rounded to 6 decimals;
  * every ORDER-dependent query carries a total order via unique keys.

Scale notes: joins to small dims are broadcast; aggregations are partial+
final hash aggs; window queries partition by their natural key (user_id /
doc bucket) — no global single-partition windows except bounded top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import similarity as sim


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# crawl-operator analogues over `events` (FIXTURES.md §7: host≈user_id)
# =====================================================================

def q_frontier_topk(spark, sf):
    """F3 per-host priority dequeue: top-3 per user by (value desc, id)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(),
                                              F.col("event_id").asc())
    return (e.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= 3)
            .select("user_id", "event_id",
                    F.round("value", 6).alias("value"), "rn"))


SQL_FRONTIER_TOPK = """
SELECT user_id, event_id, ROUND(value, 6) AS value, rn
FROM (SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events)
WHERE rn <= 3
"""


def q_frontier_dequeue(spark, sf):
    """F3+F4+F5 flagship: per-host budget (2) then global round cap (50)
    with the engine's exact ordering contract (R4)."""
    e = _t(spark, sf, "events")
    w_host = Window.partitionBy("user_id").orderBy(F.col("value").desc(),
                                                   F.col("event_id").desc())
    ranked = (e.withColumn("host_rank", F.row_number().over(w_host).cast("long"))
              .filter(F.col("host_rank") <= 2))
    w_glob = Window.orderBy(F.col("value").desc(), F.col("host_rank").asc(),
                            F.col("event_id").asc())
    return (ranked.withColumn("fetch_rank", F.row_number().over(w_glob).cast("long"))
            .filter(F.col("fetch_rank") <= 50)
            .select("fetch_rank", "user_id", "event_id",
                    F.round("value", 6).alias("value"), "host_rank"))


SQL_FRONTIER_DEQUEUE = """
SELECT fetch_rank, user_id, event_id, ROUND(value, 6) AS value, host_rank
FROM (SELECT user_id, event_id, value, host_rank,
             ROW_NUMBER() OVER (ORDER BY value DESC, host_rank ASC,
                                event_id ASC) AS fetch_rank
      FROM (SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id DESC)
                       AS host_rank
            FROM events)
      WHERE host_rank <= 2)
WHERE fetch_rank <= 50
"""


def q_seen_anti_join(spark, sf):
    """J3/S2 dedup kernel: customers never seen in orders (left anti)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


SQL_SEEN_ANTI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_semi_join(spark, sf):
    """J5 left-semi: customers with at least one order."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_intra_batch_dedup(spark, sf):
    """D4: first event per (user_id, event_type) by (ts, event_id)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type") \
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id", "ts"))


SQL_INTRA_BATCH_DEDUP = """
SELECT user_id, event_type, event_id, ts
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
WHERE rn = 1
"""


def q_set_ops(spark, sf):
    """S3: (clickers ∩ viewers) \\ error-users."""
    e = _t(spark, sf, "events")
    def users(t):
        return e.filter(F.col("event_type") == t).select("user_id").distinct()
    return users("click").intersect(users("view")) \
        .subtract(users("error")).select("user_id")


SQL_SET_OPS = """
SELECT user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
"""


# =====================================================================
# aggregates / windows / sorts (A*, Q3-Q5)
# =====================================================================

def q_pricing_summary(spark, sf):
    """A1/Q3 (TPC-H Q1 shape): grouped agg with partial+final hash agg."""
    l = _t(spark, sf, "lineitem")
    return (l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark, sf):
    """J1-style broadcast dim joins: orders⋈customer⋈nation⋈region."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


SQL_REVENUE_BY_NATION = """
SELECT r_name, n_name, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_rollup_customers(spark, sf):
    """Q3 rollup: customer counts per region→nation with subtotals."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .rollup("r_name", "n_name")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal")))


SQL_ROLLUP_CUSTOMERS = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_event_histogram(spark, sf):
    """A2/A4: global per-type stats."""
    e = _t(spark, sf, "events")
    return (e.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


SQL_EVENT_HISTOGRAM = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


def q_value_percentiles(spark, sf):
    """A5 latency-percentile analogue: exact p50/p95 per event_type."""
    e = _t(spark, sf, "events")
    return (e.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95")))


SQL_VALUE_PERCENTILES = """
SELECT event_type,
       ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
       ROUND(CAST(quantile_cont(value, 0.95) AS DOUBLE), 6) AS p95
FROM events GROUP BY event_type
"""


def q_event_sessions(spark, sf):
    """Sessionization: a new session starts after a >30-min gap per user
    (lag + conditional cumulative sum) — the batch form of session
    windows; returns per-session bounds and event counts."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts")
           - F.unix_timestamp(F.lag("ts").over(w))) > 1800
    sess = (e.withColumn("new_s", F.when(F.coalesce(gap, F.lit(True)), 1)
                         .otherwise(0))
            .withColumn("session_no",
                        F.sum("new_s").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                        .cast("long")))
    return (sess.groupBy("user_id", "session_no")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("session_value")))


SQL_EVENT_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_no
  FROM g)
SELECT user_id, session_no, MIN(ts) AS session_start,
       MAX(ts) AS session_end, COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS session_value
FROM s GROUP BY user_id, session_no
"""


def q_window_lag(spark, sf):
    """Q4 lag/lead: per-user value delta over time."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    return (e.withColumn("prev_value", F.lag("value").over(w))
            .withColumn("delta", F.round(F.col("value")
                                         - F.coalesce(F.col("prev_value"),
                                                      F.lit(0.0)), 6))
            .select("user_id", "event_id",
                    F.round("value", 6).alias("value"), "delta"))


SQL_WINDOW_LAG = """
SELECT user_id, event_id, ROUND(value, 6) AS value,
       ROUND(value - COALESCE(LAG(value) OVER
             (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 0.0), 6)
           AS delta
FROM events
"""


def q_tumbling_hourly(spark, sf):
    """Q5 event-time tumbling window (batch mode, SURVEY §2.9)."""
    e = _t(spark, sf, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n", "sum_value"))


SQL_TUMBLING_HOURLY = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_json_props(spark, sf):
    """SF5 JSON ops: extract props.k, aggregate per event_type."""
    e = _t(spark, sf, "events")
    return (e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))


SQL_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events GROUP BY event_type
"""


def q_top_orders(spark, sf):
    """Q4 orderBy().limit() top-k (TakeOrdered — no global sort)."""
    o = _t(spark, sf, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(10)
            .select("o_orderkey", "o_custkey",
                    F.round("o_totalprice", 2).alias("o_totalprice")))


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_string_funcs(spark, sf):
    """SF3 string kernel: normalize p_type, extract brand number."""
    p = _t(spark, sf, "part")
    return (p.withColumn("type_head", F.lower(F.split("p_type", " ")[0]))
            .withColumn("brand_num",
                        F.regexp_extract("p_brand", "(\\d+)", 1).cast("long"))
            .groupBy("type_head")
            .agg(F.count("*").alias("n"),
                 F.sum("brand_num").alias("sum_brand"),
                 F.round(F.avg("p_retailprice"), 4).alias("avg_price")))


SQL_STRING_FUNCS = """
SELECT lower(split_part(p_type, ' ', 1)) AS type_head, COUNT(*) AS n,
       CAST(SUM(CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT))
            AS BIGINT) AS sum_brand,
       ROUND(AVG(p_retailprice), 4) AS avg_price
FROM part GROUP BY 1
"""


# =====================================================================
# training-pipeline ops: dedup / fingerprint / text / similarity
# =====================================================================

def q_docs_fingerprint(spark, sf):
    """Document fingerprinting: md5 of whitespace-normalized text (exact-
    dedup key; D2 analogue over documents)."""
    d = _t(spark, sf, "documents")
    return (d.withColumn(
                "fp", F.md5(F.lower(F.regexp_replace(F.trim("text"),
                                                     "\\s+", " "))))
            .select("doc_id", "fp"))


SQL_DOCS_FINGERPRINT = """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


def q_docs_exact_dedup(spark, sf):
    """Exact dedup via hash-groupBy: one keeper per distinct text."""
    d = _t(spark, sf, "documents")
    return (d.groupBy(F.md5(F.col("text")).alias("text_hash"))
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies")))


SQL_DOCS_EXACT_DEDUP = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_docs_canonical_dedup(spark, sf):
    """Canonical-URL dedup (X9 rel=canonical extension, r3): the cheapest
    near-dup signal a crawler gets is pages sharing a canonical target.
    The driver tables carry no URLs, so each document derives a
    deterministic MESSY url (uppercase scheme/host, default :443 port,
    utm_ tracking params, unsorted query, fragment) from its own columns;
    the query then applies the D1 canonicalization pipeline — lowercase
    scheme+host, strip default port, strip fragment, drop utm_* params,
    sort the survivors — entirely in native string/array functions, and
    dedups on the canonical target (keeper = min doc_id). The identical
    normalization runs in DuckDB, so the canonicalization semantics are
    cross-engine verified end-to-end."""
    d = _t(spark, sf, "documents")
    raw = F.concat(
        F.lit("HTTPS://Site-"), F.upper("source"),
        F.lit(".Example.COM:443/"), F.col("lang"), F.lit("/doc/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&b="), (F.col("doc_id") % 2).cast("string"),
        F.lit("&a=1#sec"), (F.col("doc_id") % 7).cast("string"))
    nofrag = F.regexp_replace(raw, "#.*$", "")
    prefix = F.regexp_replace(
        F.lower(F.regexp_extract(nofrag, "^([^?]*)", 1)), ":443/", "/")
    qstr = F.regexp_extract(nofrag, "\\?(.*)$", 1)
    params = F.array_join(
        F.array_sort(F.filter(F.split(qstr, "&"),
                              lambda x: ~x.startswith("utm_"))), "&")
    canon = F.concat(prefix,
                     F.when(params != "", F.concat(F.lit("?"), params))
                     .otherwise(F.lit("")))
    return (d.select("doc_id", canon.alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies")))


SQL_DOCS_CANONICAL_DEDUP = """
WITH u AS (
  SELECT doc_id,
         'HTTPS://Site-' || UPPER(source) || '.Example.COM:443/' || lang ||
         '/doc/' || CAST(doc_id % 50 AS VARCHAR) ||
         '?utm_source=feed&b=' || CAST(doc_id % 2 AS VARCHAR) ||
         '&a=1#sec' || CAST(doc_id % 7 AS VARCHAR) AS raw
  FROM documents),
c AS (
  SELECT doc_id,
         regexp_replace(lower(regexp_extract(
             regexp_replace(raw, '#.*$', ''), '^([^?]*)', 1)),
             ':443/', '/') AS prefix,
         regexp_extract(regexp_replace(raw, '#.*$', ''), '\\?(.*)$', 1) AS q
  FROM u),
p AS (
  SELECT doc_id,
         prefix || CASE WHEN params <> '' THEN '?' || params ELSE '' END
           AS canonical_url
  FROM (SELECT doc_id, prefix,
               array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   x -> NOT starts_with(x, 'utm_'))), '&') AS params
        FROM c))
SELECT canonical_url, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM p GROUP BY 1
"""


def q_docs_boilerplate_chunks(spark, sf):
    """Chunk-level exact dedup / boilerplate detection (r3): tumbling
    8-word chunks per document; a chunk appearing in >= 3 distinct
    documents is boilerplate (the repeated-navigation/footer pass a
    training-data pipeline runs before near-dup). Pure native split/
    slice/explode + hash agg — the same inverted-index shape as the
    shingle family, at stride 8 instead of 1."""
    d = _t(spark, sf, "documents")
    chunks = (d.withColumn("w", F.split(F.trim("text"), "\\s+"))
              .filter(F.size("w") >= 8)
              .select("doc_id", F.explode(F.expr(
                  "transform(sequence(0, size(w) div 8 - 1),"
                  " i -> concat_ws(' ', slice(w, i*8+1, 8)))")).alias("chunk"))
              .distinct())
    return (chunks.groupBy("chunk")
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= 3)
            .select("chunk", "n_docs"))


SQL_DOCS_BOILERPLATE_CHUNKS = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 8),
ch AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i*8+1, i*8+8), ' ') AS chunk
  FROM w, unnest(generate_series(0, len(w)//8 - 1)) g(i))
SELECT chunk, COUNT(*) AS n_docs FROM ch GROUP BY 1 HAVING COUNT(*) >= 3
"""


_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
              "it", "for", "on", "with", "as", "at", "by", "this")


def q_docs_top_terms(spark, sf):
    """Vocabulary / document-frequency stats (r3): lowercase alphabetic
    tokens, stopword-excluded, ranked by the number of distinct documents
    containing the term (the df statistic TF-IDF-style quality filters
    and vocab builders need); top 20, ties broken by term. Native
    split/filter/explode + hash aggs."""
    d = _t(spark, sf, "documents")
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    terms = (d.withColumn("w", F.split(F.lower(F.trim("text")), "\\s+"))
             .select("doc_id", F.explode(F.expr(
                 f"filter(w, x -> x rlike '^[a-z]+$'"
                 f" AND NOT x IN ({sw}))")).alias("term"))
             .distinct())
    return (terms.groupBy("term")
            .agg(F.count("*").alias("df"))
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(20))


SQL_DOCS_TOP_TERMS = f"""
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                 AS term
        FROM documents)
  WHERE regexp_matches(term, '^[a-z]+$')
    AND term NOT IN ({", ".join(f"'{w}'" for w in _STOPWORDS)}))
SELECT term, COUNT(*) AS df FROM t GROUP BY 1
ORDER BY df DESC, term ASC LIMIT 20
"""


def q_docs_token_stats(spark, sf):
    """Token counting (whitespace tokenizer) + per-lang stats."""
    d = _t(spark, sf, "documents")
    toks = d.withColumn("n_tokens",
                        F.size(F.split(F.trim("text"), "\\s+")).cast("long"))
    return (toks.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
                 F.max("n_tokens").alias("max_tokens")))


SQL_DOCS_TOKEN_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS total_tokens,
       ROUND(AVG(len(regexp_split_to_array(trim(text), '\\s+'))), 6)
           AS avg_tokens,
       CAST(MAX(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS max_tokens
FROM documents GROUP BY lang
"""


# BPE-ish pre-tokenizer (GPT-2-style contractions + space-prefixed
# letter/digit/punct runs, lookahead-free so Java regex and RE2 agree —
# parity verified at sf0.001/sf0.01)
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def q_docs_token_bpe(spark, sf):
    """Token counting, BPE-ish path: a GPT-2-style pre-tokenizer regex
    (contractions, space-prefixed letter/digit/punctuation runs) next to
    the whitespace count — the token-budget accounting a training-data
    pipeline actually runs (subword counts ~= BPE pre-tokens)."""
    d = _t(spark, sf, "documents")
    toks = (d.withColumn(
                "n_bpe",
                F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT),
                                            F.lit(0))).cast("long"))
            .withColumn("n_ws",
                        F.size(F.split(F.trim("text"), "\\s+")).cast("long")))
    return (toks.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_bpe").alias("total_bpe_tokens"),
                 F.sum("n_ws").alias("total_ws_tokens"),
                 F.round(F.avg(F.col("n_bpe") / F.col("n_ws")), 6)
                 .alias("avg_bpe_per_word")))


SQL_DOCS_TOKEN_BPE = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}',
                                       0))) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS total_ws_tokens,
       ROUND(AVG(CAST(len(regexp_extract_all(text,
                 '{_BPE_PAT.replace("'", "''")}', 0)) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\\s+'))), 6)
           AS avg_bpe_per_word
FROM documents GROUP BY lang
"""


def q_docs_quality(spark, sf):
    """Quality scoring: length/alpha-ratio/mean-word-length heuristics."""
    d = _t(spark, sf, "documents")
    return (d.withColumn("n_tokens",
                         F.size(F.split(F.trim("text"), "\\s+")).cast("long"))
            .withColumn("n_alpha",
                        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
                        .cast("long"))
            .withColumn("alpha_ratio",
                        F.round(F.col("n_alpha")
                                / F.greatest(F.length("text"), F.lit(1)), 6))
            .withColumn("mean_word_len",
                        F.round(F.col("n_alpha")
                                / F.greatest(F.col("n_tokens"), F.lit(1)), 6))
            .select("doc_id", "n_tokens", "alpha_ratio", "mean_word_len"))


SQL_DOCS_QUALITY = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
       ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1), 6) AS alpha_ratio,
       ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6)
           AS mean_word_len
FROM documents
"""


def q_docs_langid(spark, sf):
    """Language-ID heuristic: stopword-hit scoring, confusion counts vs the
    labeled lang column. Deterministic formula mirrored in the oracle."""
    d = _t(spark, sf, "documents")
    def hits(word):
        padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
        return ((F.length(padded)
                 - F.length(F.regexp_replace(padded, f" {word} ", " ")))
                / (len(word) + 1)).cast("long")
    scored = (d.withColumn("hits_en", hits("the") + hits("and"))
              .withColumn("hits_q", hits("query") + hits("data"))
              .withColumn("lang_guess",
                          F.when(F.col("hits_en") >= F.col("hits_q"), "en")
                          .otherwise("q")))
    return (scored.groupBy("lang", "lang_guess")
            .agg(F.count("*").alias("n")))


SQL_DOCS_LANGID = """
WITH scored AS (
  SELECT lang,
    CAST((length(' '||text||' ')
          - length(regexp_replace(' '||text||' ', ' the ', ' ', 'g'))) / 4
       + (length(' '||text||' ')
          - length(regexp_replace(' '||text||' ', ' and ', ' ', 'g'))) / 4
      AS BIGINT) AS hits_en,
    CAST((length(' '||text||' ')
          - length(regexp_replace(' '||text||' ', ' query ', ' ', 'g'))) / 6
       + (length(' '||text||' ')
          - length(regexp_replace(' '||text||' ', ' data ', ' ', 'g'))) / 5
      AS BIGINT) AS hits_q
  FROM documents)
SELECT lang, CASE WHEN hits_en >= hits_q THEN 'en' ELSE 'q' END AS lang_guess,
       COUNT(*) AS n
FROM scored GROUP BY 1, 2
"""


def q_docs_ngram_pairs(spark, sf):
    """Near-dup candidates by word-3-gram Jaccard: shingle → inverted-index
    self-join → per-pair intersection counts (the scalable shuffle-join
    shape of MinHash candidate generation, but exact)."""
    d = _t(spark, sf, "documents")
    sh = (d.withColumn("w", F.split(F.trim("text"), "\\s+"))
          .filter(F.size("w") >= 3)
          .select("doc_id",
                  F.explode(F.expr(
                      "transform(sequence(0, size(w)-3),"
                      " i -> concat_ws(' ', slice(w, i+1, 3)))"))
                  .alias("shingle"))
          .distinct())
    n_sh = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # scale guard: drop shingles shared by >64 docs before the self-join —
    # ultra-frequent shingles blow the join output up quadratically while
    # contributing nothing to NEAR-dup detection; the DuckDB oracle applies
    # the identical cap, and |union| still uses the UNCAPPED counts
    rare = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= 64).select("shingle"))
    sh_r = sh.join(rare, "shingle")
    pairs = (sh_r.alias("a").join(sh_r.alias("b"), "shingle")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    return (pairs
            .join(n_sh.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "n_a"), "doc_a")
            .join(n_sh.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "n_b"), "doc_b")
            # filter on the RAW ratio, round only in the projection — the
            # DuckDB oracle's HAVING also tests raw, so a pair with raw
            # jaccard in [0.049..95, 0.05) is excluded by BOTH engines
            .withColumn("j_raw",
                        F.col("inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .filter(F.col("j_raw") >= 0.05)
            .select("doc_a", "doc_b", "inter",
                    F.round("j_raw", 6).alias("jaccard")))


SQL_DOCS_NGRAM_PAIRS = """
WITH sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, i+2), ' ') AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w
        FROM documents WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3),
       unnest(generate_series(1, len(w)-2)) AS g(i)),
ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 64),
shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, inter,
       ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 6) AS jaccard
FROM pairs JOIN ns na ON na.doc_id = doc_a JOIN ns nb ON nb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.05
"""


def _shingles(d):
    """Distinct word-3-gram shingles per doc (shared by the Jaccard and
    MinHash families)."""
    return (d.withColumn("w", F.split(F.trim("text"), "\\s+"))
            .filter(F.size("w") >= 3)
            .select("doc_id",
                    F.explode(F.expr(
                        "transform(sequence(0, size(w)-3),"
                        " i -> concat_ws(' ', slice(w, i+1, 3)))"))
                    .alias("shingle"))
            .distinct())


_MH_SIGS = 16   # minhash permutations
_MH_BANDS = 4   # bands of _MH_SIGS/_MH_BANDS rows each


def q_docs_minhash_verified(spark, sf):
    """MinHash+LSH near-dup with a FULL cross-engine oracle: signatures are
    min(md5(i || ':' || shingle)) (hex-string min — computable identically
    in DuckDB, unlike the xxhash64 variant docs_minhash_lsh which stays as
    the faster rows-only native path), banded 4x4; pairs sharing a band
    bucket are verified by exact shingle-set Jaccard >= 0.5. Scale shape:
    band-bucket equi-join for candidates, shingle inverted-index join
    restricted to candidate pairs for verification — never all-pairs."""
    d = _t(spark, sf, "documents")
    sh = _shingles(d)
    sig = sh.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
          .alias(f"s{i}") for i in range(_MH_SIGS)])
    r = _MH_SIGS // _MH_BANDS
    bands = sig.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat(*[F.col(f"s{b * r + j}") for j in range(r)]))
                 .alias("bucket"))
        for b in range(_MH_BANDS)])).alias("bb")) \
        .select("doc_id", "bb.band", "bb.bucket")
    cand = (bands.alias("a").join(bands.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    n_sh = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_b = sh.select(F.col("doc_id").alias("_db"),
                     F.col("shingle").alias("_shb"))
    inter = (cand
             .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
             .join(sh_b, (F.col("doc_b") == F.col("_db"))
                   & (F.col("shingle") == F.col("_shb")))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    return (inter
            .join(n_sh.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "n_a"), "doc_a")
            .join(n_sh.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "n_b"), "doc_b")
            # raw-ratio filter + round-in-projection, mirroring the SQL
            # oracle's HAVING on j_raw (boundary-exact parity: ADVICE r02)
            .withColumn("j_raw",
                        F.col("inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .filter(F.col("j_raw") >= 0.5)
            .select("doc_a", "doc_b",
                    F.round("j_raw", 6).alias("jaccard")))


def _mh_sql_core() -> str:
    sigs = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS s{i}" for i in range(_MH_SIGS))
    r = _MH_SIGS // _MH_BANDS
    band_sel = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, "
        f"md5({' || '.join(f's{b * r + j}' for j in range(r))}) AS bucket "
        f"FROM sig"
        for b in range(_MH_BANDS))
    return f"""
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, i+2), ' ') AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w
        FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3),
       unnest(generate_series(1, len(w)-2)) AS g(i)),
sig AS (
  SELECT doc_id, {sigs}
  FROM sh GROUP BY doc_id),
bands AS (
{band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(COUNT(*) AS DOUBLE) / (na.n + nb.n - COUNT(*)) AS j_raw
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  JOIN ns na ON na.doc_id = c.doc_a
  JOIN ns nb ON nb.doc_id = c.doc_b
  GROUP BY c.doc_a, c.doc_b, na.n, nb.n
  HAVING CAST(COUNT(*) AS DOUBLE) / (na.n + nb.n - COUNT(*)) >= 0.5)
""".strip()


SQL_DOCS_MINHASH_VERIFIED = f"""
WITH {_mh_sql_core()}
SELECT doc_a, doc_b, ROUND(j_raw, 6) AS jaccard FROM verified
"""


def q_docs_dedup_clusters(spark, sf):
    """Text-side cluster resolution: connected components over the
    verified MinHash near-dup pairs (same min-label-propagation kernel as
    the embedding family), emitting (doc_id, cluster_keeper)."""
    pairs = q_docs_minhash_verified(spark, sf).select("doc_a", "doc_b")
    return sim.label_propagation(pairs, "doc_a", "doc_b",
                                 "doc_id", "cluster_keeper")


SQL_DOCS_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_mh_sql_core()},
und AS (SELECT doc_a AS s, doc_b AS d FROM verified
        UNION ALL SELECT doc_b, doc_a FROM verified),
verts AS (SELECT DISTINCT s AS v FROM und),
reach(v, rt) AS (
  SELECT v, v FROM verts
  UNION
  SELECT und.d, reach.rt FROM reach JOIN und ON und.s = reach.v)
SELECT v AS doc_id, MIN(rt) AS cluster_keeper FROM reach GROUP BY v
"""


def q_emb_cosine_topk(spark, sf):
    """Similarity search baseline: brute-force cosine top-10 vs the vec_id=0
    query vector — dot product via zip_with/aggregate (native, JVM-side)."""
    e = _t(spark, sf, "embeddings") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"))
    dot = F.expr("aggregate(zip_with(embedding, q_emb, (x, y) -> x * y),"
                 " 0D, (acc, v) -> acc + v)")
    norm = ("sqrt(aggregate(transform({c}, x -> x * x), 0D,"
            " (acc, v) -> acc + v))")
    return (e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
            .withColumn("cosine",
                        F.round(dot / (F.expr(norm.format(c="embedding"))
                                       * F.expr(norm.format(c="q_emb"))), 6))
            .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            .limit(10)
            .select("vec_id", "label", "cosine"))


SQL_EMB_COSINE_TOPK = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
           FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q_emb)
                  AS DOUBLE), 6) AS cosine
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def q_emb_near_dup(spark, sf):
    """Embedding-cosine near-duplicate pairs (exact baseline): all pairs
    with cosine >= 0.45, dot/norms via native zip_with/aggregate. The LSH
    scale path (emb_ann_lsh) prunes candidates at 100 TB; this exact
    variant is the correctness oracle for it."""
    e = _t(spark, sf, "embeddings") \
        .withColumn("emb", F.col("embedding").cast("array<double>")) \
        .withColumn("norm", F.expr(
            "sqrt(aggregate(transform(emb, x -> x * x), 0D,"
            " (acc, v) -> acc + v))")) \
        .select("vec_id", "emb", "norm")
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr("aggregate(zip_with(a.emb, b.emb, (x, y) -> x * y), 0D,"
                 " (acc, v) -> acc + v)")
    return (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .withColumn("cosine", dot / (F.col("a.norm") * F.col("b.norm")))
            .filter(F.col("cosine") >= 0.45)
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round("cosine", 6).alias("cosine")))


SQL_EMB_NEAR_DUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                  AS DOUBLE), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
           AS DOUBLE) >= 0.45
"""


def q_docs_rolling_hash(spark, sf):
    """Rolling (polynomial) document fingerprint, fully JVM-side: fold
    h = (h*31 + charcode) mod 1e9+7 over the whitespace-normalized text via
    the `aggregate` higher-order function — no UDF. DuckDB mirrors it with
    list_reduce (which seeds from the first element, hence the slice)."""
    d = _t(spark, sf, "documents")
    norm = F.lower(F.regexp_replace(F.trim("text"), "\\s+", " "))
    return (d.withColumn("_n", norm)
            .filter(F.length("_n") > 0)
            .withColumn("codes", F.expr(
                "transform(filter(split(_n, ''), c -> c <> ''),"
                " c -> CAST(ascii(c) AS BIGINT))"))
            .withColumn("rhash", F.expr(
                "aggregate(slice(codes, 2, size(codes) - 1), codes[0],"
                " (a, b) -> (a * 31 + b) % 1000000007)"))
            .select("doc_id", "rhash"))


SQL_DOCS_ROLLING_HASH = """
SELECT doc_id,
       list_reduce(
         list_transform(string_split(
             lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ''),
           c -> CAST(ascii(c) AS BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007) AS rhash
FROM documents
WHERE length(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) > 0
"""


def q_media_manifest(spark, sf):
    """O2 media sink analogue [S:scrapy/pipelines/files.py::FilesPipeline.
    file_path]: deterministic media_ref = full/<sha256(media_url)> computed
    column per document — no blobs, pure JVM-side hashing."""
    d = _t(spark, sf, "documents")
    url = F.concat(F.lit("https://cdn.test/"), F.col("source"), F.lit("/"),
                   F.col("doc_id").cast("string"), F.lit(".jpg"))
    return (d.withColumn("media_url", url)
            .withColumn("media_ref",
                        F.concat(F.lit("full/"), F.sha2(F.col("media_url"), 256)))
            .select("doc_id", "media_url", "media_ref"))


SQL_MEDIA_MANIFEST = """
SELECT doc_id,
       'https://cdn.test/' || source || '/' || doc_id || '.jpg' AS media_url,
       'full/' || sha256('https://cdn.test/' || source || '/' || doc_id
                         || '.jpg') AS media_ref
FROM documents
"""


# ---------------------------------------------------------------------
# non-SQL-expressible ops (rows-only driver check; own pytest oracles)
# ---------------------------------------------------------------------

def q_events_hll(spark, sf):
    """A3 HLL monitoring surface: approx_count_distinct (HyperLogLog++,
    rsd=2%) next to the exact distinct count per event_type — the
    cardinality probe a 10^10-row seen table is monitored with (the exact
    count is a full shuffle; the HLL sketch is a constant-size partial
    aggregate). Rows-only driver check (sketch estimates are
    engine-specific); tests/test_queries_duckdb.py pins the relative
    error <= 5% against the exact count."""
    e = _t(spark, sf, "events")
    return (e.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.02)
                 .alias("approx_users"),
                 F.countDistinct("user_id").alias("exact_users")))

def q_media_meta(spark, sf):
    """Multimodal plumbing end-to-end: media_ref -> opaque binary payload ->
    Arrow-batched fake decode (crawlspark.multimodal) -> typed metadata agg.
    Rows-only check (binary payloads are not DuckDB-expressible); pytest
    verifies decode determinism and schema (tests/test_multimodal.py)."""
    from . import multimodal as mm
    d = _t(spark, sf, "documents")
    refs = d.select(F.concat(
        F.lit("full/"),
        F.sha2(F.concat(F.col("source"), F.lit("/"),
                        F.col("doc_id").cast("string")), 256)).alias("media_ref"))
    meta = mm.decode_media(mm.attach_payloads(refs), codec="fake")
    return (meta.groupBy("media_kind", "format")
            .agg(F.count("*").alias("n_media"),
                 F.sum("byte_len").alias("total_bytes"),
                 F.round(F.avg("width"), 2).alias("avg_width"),
                 F.round(F.avg("height"), 2).alias("avg_height"),
                 F.sum("duration_ms").alias("total_duration_ms")))


def q_media_frames(spark, sf):
    """Video frame-sampling plumbing: sampled-frame histogram per video.
    Rows-only check; determinism pytest-verified."""
    from . import multimodal as mm
    d = _t(spark, sf, "documents")
    refs = d.select(F.concat(
        F.lit("full/"),
        F.sha2(F.concat(F.col("source"), F.lit("/"),
                        F.col("doc_id").cast("string")), 256)).alias("media_ref"))
    frames = mm.sample_frames(mm.attach_payloads(refs))
    return (frames.groupBy("media_ref")
            .agg(F.count("*").alias("n_frames"),
                 F.max("frame_ms").alias("last_frame_ms")))


def q_docs_minhash_lsh(spark, sf):
    """MinHash-LSH near-dup candidates: 16 permutations via seeded xxhash64,
    4 bands × 4 rows; pairs sharing a band bucket. Rows-only check (DuckDB
    has no xxhash64); self-consistency is pytest-verified: candidates ⊇
    exact duplicates (tests/test_queries_duckdb.py)."""
    d = _t(spark, sf, "documents")
    sh = (d.withColumn("w", F.split(F.trim("text"), "\\s+"))
          .filter(F.size("w") >= 3)
          .select("doc_id",
                  F.explode(F.expr(
                      "transform(sequence(0, size(w)-3),"
                      " i -> concat_ws(' ', slice(w, i+1, 3)))"))
                  .alias("shingle"))
          .distinct())
    sig = sh.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
          for i in range(16)])
    bands = [F.xxhash64(F.lit(100 + b),
                        *[F.col(f"h{b * 4 + j}") for j in range(4)])
             .alias(f"band{b}") for b in range(4)]
    bd = sig.select("doc_id", *bands)
    stacked = bd.select(
        "doc_id",
        F.explode(F.array(*[F.struct(F.lit(b).alias("band"),
                                     F.col(f"band{b}").alias("bucket"))
                            for b in range(4)])).alias("bb")) \
        .select("doc_id", "bb.band", "bb.bucket")
    return (stacked.alias("a").join(stacked.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def q_docs_simhash(spark, sf):
    """SimHash document fingerprints: per-token xxhash64, sign-sum over 64
    bit positions, assembled to one BIGINT per doc. Rows-only check.

    Scale shape: ONE shuffle whose row count equals the token count — the
    64 per-bit sign-sums are 64 conditional-sum aggregates over the token
    rows (partial map-side combine collapses them per doc before the
    shuffle), NOT a per-bit explode (which would shuffle 64x the rows)."""
    d = _t(spark, sf, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.trim("text"), "\\s+")).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    sums = toks.groupBy("doc_id").agg(
        *[F.sum(F.when(F.expr(f"(h >> {b}) & 1") == 1, 1).otherwise(-1))
          .alias(f"s{b}") for b in range(64)])
    bit_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST(1 AS BIGINT) << {b}"
        f" ELSE CAST(0 AS BIGINT) END)" for b in range(64))
    return sums.select("doc_id", F.expr(bit_terms).alias("simhash"))


QUERIES = {
    "frontier_topk": (q_frontier_topk, SQL_FRONTIER_TOPK),
    "frontier_dequeue": (q_frontier_dequeue, SQL_FRONTIER_DEQUEUE),
    "seen_anti_join": (q_seen_anti_join, SQL_SEEN_ANTI_JOIN),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "intra_batch_dedup": (q_intra_batch_dedup, SQL_INTRA_BATCH_DEDUP),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION),
    "rollup_customers": (q_rollup_customers, SQL_ROLLUP_CUSTOMERS),
    "event_histogram": (q_event_histogram, SQL_EVENT_HISTOGRAM),
    "value_percentiles": (q_value_percentiles, SQL_VALUE_PERCENTILES),
    "window_lag": (q_window_lag, SQL_WINDOW_LAG),
    "event_sessions": (q_event_sessions, SQL_EVENT_SESSIONS),
    "tumbling_hourly": (q_tumbling_hourly, SQL_TUMBLING_HOURLY),
    "json_props": (q_json_props, SQL_JSON_PROPS),
    "top_orders": (q_top_orders, SQL_TOP_ORDERS),
    "string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "docs_fingerprint": (q_docs_fingerprint, SQL_DOCS_FINGERPRINT),
    "docs_exact_dedup": (q_docs_exact_dedup, SQL_DOCS_EXACT_DEDUP),
    "docs_canonical_dedup": (q_docs_canonical_dedup,
                             SQL_DOCS_CANONICAL_DEDUP),
    "docs_boilerplate_chunks": (q_docs_boilerplate_chunks,
                                SQL_DOCS_BOILERPLATE_CHUNKS),
    "docs_top_terms": (q_docs_top_terms, SQL_DOCS_TOP_TERMS),
    "docs_token_stats": (q_docs_token_stats, SQL_DOCS_TOKEN_STATS),
    "docs_token_bpe": (q_docs_token_bpe, SQL_DOCS_TOKEN_BPE),
    "docs_quality": (q_docs_quality, SQL_DOCS_QUALITY),
    "docs_langid": (q_docs_langid, SQL_DOCS_LANGID),
    "docs_ngram_pairs": (q_docs_ngram_pairs, SQL_DOCS_NGRAM_PAIRS),
    "docs_minhash_verified": (q_docs_minhash_verified,
                              SQL_DOCS_MINHASH_VERIFIED),
    "docs_dedup_clusters": (q_docs_dedup_clusters, SQL_DOCS_DEDUP_CLUSTERS),
    "emb_cosine_topk": (q_emb_cosine_topk, SQL_EMB_COSINE_TOPK),
    "emb_near_dup": (q_emb_near_dup, SQL_EMB_NEAR_DUP),
    "emb_ann_ivf": (sim.q_emb_ann_ivf, sim.SQL_EMB_ANN_IVF),
    "emb_ann_lsh": (sim.q_emb_ann_lsh, sim.SQL_EMB_ANN_LSH),
    "emb_near_dup_bucketed": (sim.q_emb_near_dup_bucketed,
                              sim.SQL_EMB_NEAR_DUP_BUCKETED),
    "dedup_clusters": (sim.q_dedup_clusters, sim.SQL_DEDUP_CLUSTERS),
    "docs_rolling_hash": (q_docs_rolling_hash, SQL_DOCS_ROLLING_HASH),
    "media_manifest": (q_media_manifest, SQL_MEDIA_MANIFEST),
    # rows-only (non-SQL-expressible: xxhash64-based sketches, binary media,
    # engine-specific HLL estimates)
    "events_hll": (q_events_hll, None),
    "docs_minhash_lsh": (q_docs_minhash_lsh, None),
    "docs_simhash": (q_docs_simhash, None),
    "media_meta": (q_media_meta, None),
    "media_frames": (q_media_frames, None),
}
