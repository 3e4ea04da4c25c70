"""THE correctness gate (SURVEY §5.2.2): the Spark engine's crawl order,
seen set, documents, and metrics must EXACTLY equal the deterministic
pure-Python oracle on the same fixture graph and config
(BASELINE.json:"metric" — exact crawl-order + seen-set match)."""

import pandas as pd

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host",
              "status", "depth", "method", "redirect_chain"]


def test_crawl_order_exact(engine_run, oracle_result):
    eng, manifest = engine_run
    got = (eng.crawl_order_df(manifest).orderBy("rank").toPandas()[ORDER_COLS]
           .reset_index(drop=True))
    want = pd.DataFrame(oracle_result.crawl_order)[ORDER_COLS] \
        .reset_index(drop=True)
    # array column -> hashable/comparable form on both sides
    got["redirect_chain"] = got["redirect_chain"].map(tuple)
    want["redirect_chain"] = want["redirect_chain"].map(tuple)
    want = want.astype(got.dtypes.to_dict())
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)


def test_crawl_covers_failure_modes(oracle_result):
    """The fixture graph must actually exercise retries/redirects/errors —
    guards against a fixture regression silently weakening the gate."""
    st = {r["status"] for r in oracle_result.crawl_order}
    assert 200 in st and 301 in st and 404 in st
    assert st & {429, 500, 503}, st
    m = pd.DataFrame(oracle_result.metrics)
    for k in ("retried", "deduped", "filtered", "robots_blocked", "redirects"):
        assert m[k].sum() > 0, k
    # D2 extension: POST form submissions are fetched with distinct
    # fingerprints; X11: the 25-hop 301 chain is cut at exactly
    # REDIRECT_MAX_TIMES=20 redirects
    methods = {r["method"] for r in oracle_result.crawl_order}
    assert methods == {"GET", "POST"}
    chain_lens = [len(r["redirect_chain"]) for r in oracle_result.crawl_order]
    assert max(chain_lens) == 20
    fetched_urls = {r["url_canon"] for r in oracle_result.crawl_order}
    assert "https://booking.test/chain/20x" in fetched_urls
    assert "https://booking.test/chain/21x" not in fetched_urls


def test_seen_set_exact(engine_run, oracle_result):
    eng, manifest = engine_run
    got = set(eng.seen_df(manifest).toPandas().fingerprint)
    assert got == oracle_result.seen


def test_documents_span_sequences_exact(engine_run, oracle_result):
    """Per-row invariant (input_hint): span-sequence equality on
    (kind, text, media_ref, order) per doc_id."""
    eng, manifest = engine_run
    pdf = eng.documents_df(manifest).toPandas()
    got = {r.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r.spans]
           for r in pdf.itertuples()}
    want = {k: [(d["kind"], d["text"], d["media_ref"], d["offset"])
                for d in v]
            for k, v in oracle_result.documents.items()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_documents_schema(engine_run):
    eng, manifest = engine_run
    df = eng.documents_df(manifest)
    # input_hint contract (doc_id, spans) + the additive r3
    # canonical_url column (X9 rel=canonical) + the additive r4 round
    # column ((doc_id, round) names one successful fetch — O1 export)
    assert df.schema.simpleString() == (
        "struct<doc_id:string,spans:array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>,"
        "canonical_url:string,round:int>")


def test_metrics_exact(engine_run, oracle_result):
    eng, manifest = engine_run
    got = eng.metrics_df(manifest).toPandas() \
        .sort_values(["round", "host"]).reset_index(drop=True)
    want = pd.DataFrame(oracle_result.metrics)[got.columns.tolist()] \
        .sort_values(["round", "host"]).reset_index(drop=True) \
        .astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_seen_equals_enqueued_fingerprints(engine_run, oracle_result):
    """Property (SURVEY §5.2.5): seen = seeds ∪ every enqueued candidate;
    every fetched fingerprint is in seen; robots-blocked are in seen but
    may never be fetched."""
    eng, manifest = engine_run
    seen = set(eng.seen_df(manifest).toPandas().fingerprint)
    fetched = {r["fingerprint"] for r in oracle_result.crawl_order}
    assert fetched <= seen


def test_lineage_recorded(engine_run):
    eng, manifest = engine_run
    from crawlspark.engine import LINEAGE_SCHEMA
    lin = eng.store.read(eng.spark, manifest, "lineage", LINEAGE_SCHEMA) \
        .toPandas()
    assert set(lin.stage) == {"eligible", "fetched", "candidates", "enqueued"}
    assert (lin.rows >= 0).all() and len(lin) > 0


def test_order_hash_chunks_match_oracle(engine_run, oracle_result):
    """SURVEY §4.3 scale path: per-round order hashes equal the oracle's
    (the mechanism that replaces full-list comparison at 10^10 scale)."""
    import hashlib
    from collections import defaultdict
    eng, manifest = engine_run
    got = {r["round"]: (r["order_sha256"], r["n"])
           for r in eng.order_hash_df(manifest).collect()}
    by_round = defaultdict(list)
    for rec in sorted(oracle_result.crawl_order, key=lambda r: r["rank"]):
        by_round[rec["round"]].append(rec["fingerprint"])
    want = {rnd: (hashlib.sha256(",".join(fps).encode()).hexdigest(), len(fps))
            for rnd, fps in by_round.items()}
    assert got == want


def test_seen_cardinality_hll(engine_run, oracle_result):
    """A3: the HLL seen-set estimate is within 5% of the oracle's exact
    seen-set size."""
    eng, manifest = engine_run
    row = eng.seen_cardinality_df(manifest).collect()[0]
    exact = len(oracle_result.seen)
    assert row.rows_seen == exact
    assert abs(row.approx_seen - exact) <= max(1, 0.05 * exact)
