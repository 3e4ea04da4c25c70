"""DuckDB-oracle parity for the driver-contract query surface (SURVEY
§5.2.4): row-count + column names + order-insensitive value equality per
query, emulating the driver's CORRECTNESS check at sf0.001 (the driver
itself re-runs these at sf0.01)."""

import os

import duckdb
import pandas as pd
import pytest

from crawlspark.queries import QUERIES

SF_DIR = os.environ.get("CRAWLSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = [n for n, (_, sql) in QUERIES.items() if sql]
ROWS_ONLY = [n for n, (_, sql) in QUERIES.items() if not sql]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_duckdb(spark, duck, name):
    fn, sql = QUERIES[name]
    got = _norm(fn(spark, SF_DIR).toPandas())
    want = _norm(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = QUERIES[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema) > 0


def test_minhash_candidates_superset_of_exact_dups(spark):
    """Self-consistency oracle for the rows-only MinHash-LSH op: every pair
    of EXACTLY identical texts must land in the candidate set (identical
    shingle sets → identical signatures → same band buckets)."""
    from pyspark.sql import functions as F
    fn, _ = QUERIES["docs_minhash_lsh"]
    cand = {(r.doc_a, r.doc_b) for r in fn(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dups = (docs.alias("a").join(docs.alias("b"),
                                 F.col("a.text") == F.col("b.text"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
            .collect())
    for r in dups:
        assert (r.x, r.y) in cand


def test_simhash_identical_texts_equal_fingerprints(spark):
    fn, _ = QUERIES["docs_simhash"]
    sh = fn(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").toPandas()
    m = sh.merge(docs, on="doc_id")
    by_text = m.groupby("text").simhash.nunique()
    assert (by_text == 1).all()


def test_entry_smoke(spark):
    import __spark_entry__ as ent
    df = ent.entry(spark)
    assert df.count() > 0
    assert set(ent.oracle_sql()) <= set(ent.queries())


def test_events_hll_error_bound(spark):
    """A3 HLL contract: the HyperLogLog++ estimate is within 5% of the
    exact distinct count for every group (rsd=2% sketch)."""
    fn, _ = QUERIES["events_hll"]
    for r in fn(spark, SF_DIR).collect():
        assert abs(r.approx_users - r.exact_users) <= \
            max(1, 0.05 * r.exact_users), (r.event_type, r.approx_users,
                                           r.exact_users)


def test_minhash_verified_recall_vs_exact(spark, duck):
    """Banded-MinHash candidates must catch every exact pair at the
    verify threshold (fixture pairs sit at j>=0.89, where 4x4 banding is
    near-certain: P(miss) = (1-j^4)^4 <= 3e-3). Precision is absolute
    (candidates are exact-Jaccard verified)."""
    exact = duck.execute("""
    WITH sh AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i+2), ' ')
             AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w
            FROM documents
            WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3),
           unnest(generate_series(1, len(w)-2)) AS g(i)),
    ns AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
    p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle
                             AND a.doc_id < b.doc_id GROUP BY 1,2)
    SELECT da, db FROM p JOIN ns na ON na.doc_id=da
                         JOIN ns nb ON nb.doc_id=db
    WHERE CAST(inter AS DOUBLE)/(na.n+nb.n-inter) >= 0.5""").fetchall()
    exact_set = set(map(tuple, exact))
    got = {(r.doc_a, r.doc_b) for r in
           QUERIES["docs_minhash_verified"][0](spark, SF_DIR).collect()}
    assert len(exact_set) > 0
    assert got <= exact_set                      # precision = 1
    assert len(got & exact_set) / len(exact_set) >= 0.95   # measured 1.0
