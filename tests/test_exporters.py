"""O1 feed-export formats (r4, VERDICT r03 missing #3)
[S:scrapy/exporters.py::JsonLinesItemExporter, CsvItemExporter]: the
documents table exports to JSONLines / CSV in crawl order. Round-trip
contract: export -> re-read -> span-sequence equality per doc_id, rank
order preserved, deterministic bytes across repeated exports.
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pytest

from crawlspark.exporters import documents_export_df, write_feed


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans]


@pytest.fixture(scope="module")
def exported(engine_run, tmp_path_factory):
    eng, manifest = engine_run
    out = str(tmp_path_factory.mktemp("feed"))
    jl, cs = os.path.join(out, "items_jl"), os.path.join(out, "items_csv")
    eng.export_feed(manifest, jl, fmt="jsonlines")
    eng.export_feed(manifest, cs, fmt="csv")
    docs = eng.documents_df(manifest).toPandas()
    order = eng.crawl_order_df(manifest).toPandas()
    return eng, manifest, jl, cs, docs, order


def _read_lines(path, ext):
    files = sorted(glob.glob(os.path.join(path, f"*.{ext}")))
    assert len(files) == 1          # single_file mode
    with open(files[0]) as f:
        return f.read().splitlines()


def test_jsonlines_roundtrip_span_equality(exported):
    _, _, jl, _, docs, order = exported
    lines = _read_lines(jl, "json")
    items = [json.loads(ln) for ln in lines]
    assert len(items) == len(docs) > 0
    # crawl order: ranks strictly increasing down the file
    ranks = [it["rank"] for it in items]
    assert ranks == sorted(ranks) and len(set(ranks)) == len(ranks)
    want = {r.doc_id: _span_tuples(r.spans) for r in docs.itertuples()}
    for it in items:
        got = [(s.get("kind"), s.get("text"), s.get("media_ref"),
                s.get("offset")) for s in it["spans"]]
        assert got == want[it["doc_id"]]
    # nulls are explicit (ignoreNullFields=false): media spans carry
    # text=null, and every item exposes canonical_url even when null
    assert any("text" in s and s["text"] is None
               for it in items for s in it["spans"])
    assert all("canonical_url" in it for it in items)


def test_csv_roundtrip_span_equality(exported):
    _, _, _, cs, docs, _ = exported
    files = sorted(glob.glob(os.path.join(cs, "*.csv")))
    assert len(files) == 1
    pdf = pd.read_csv(files[0])
    # r5: the CSV cell keeps the LOGICAL field name "spans" so
    # FEED_EXPORT_FIELDS applies uniformly across formats
    assert list(pdf.columns) == ["rank", "doc_id", "canonical_url",
                                 "spans"]
    assert len(pdf) == len(docs) > 0
    assert pdf["rank"].is_monotonic_increasing
    want = {r.doc_id: _span_tuples(r.spans) for r in docs.itertuples()}
    for r in pdf.itertuples():
        spans = json.loads(r.spans) if isinstance(r.spans, str) else []
        got = [(s.get("kind"), s.get("text"), s.get("media_ref"),
                s.get("offset")) for s in spans]
        assert got == want[r.doc_id]


def test_export_ranks_match_crawl_order(exported):
    eng, manifest, jl, _, docs, order = exported
    lines = _read_lines(jl, "json")
    items = [json.loads(ln) for ln in lines]
    rank_of = dict(zip(order.fingerprint, order["rank"]))
    for it in items:
        assert it["rank"] == rank_of[it["doc_id"]]


def test_export_deterministic_bytes(exported, tmp_path_factory):
    eng, manifest, jl, _, _, _ = exported
    again = str(tmp_path_factory.mktemp("feed2") / "items_jl")
    eng.export_feed(manifest, again, fmt="jsonlines")
    a = _read_lines(jl, "json")
    b = _read_lines(again, "json")
    assert a == b


def test_many_file_mode_global_order(exported, tmp_path_factory):
    """single_file=False (the 100 TB path): rows range-partition by rank
    into many part files, each internally sorted — concatenating part
    files in lexical name order must reproduce the exact single-file
    byte stream (range partitions are assigned to ascending partition
    ids, so lexical file order IS rank order)."""
    eng, manifest, jl, *_ = exported
    out = str(tmp_path_factory.mktemp("feed_many") / "items_jl")
    eng.export_feed(manifest, out, fmt="jsonlines", single_file=False)
    files = sorted(glob.glob(os.path.join(out, "*.json")))
    lines = []
    for p in files:
        with open(p) as f:
            lines.extend(f.read().splitlines())
    assert lines == _read_lines(jl, "json")


def test_unknown_format_raises(exported, spark):
    eng, manifest, *_ = exported
    with pytest.raises(ValueError, match="unsupported feed format"):
        eng.export_feed(manifest, "/tmp/never", fmt="xmlfeed")


def test_xml_roundtrip_span_equality(exported, tmp_path_factory):
    """O1 r5 (VERDICT r04 missing #3): XML feed — rootTag items / rowTag
    item, spans as nested elements in document order, ranks ascending
    down the file [S:scrapy/exporters.py::XmlItemExporter]."""
    import xml.etree.ElementTree as ET
    eng, manifest, _, _, docs, _ = exported
    out = str(tmp_path_factory.mktemp("feed_xml"))
    eng.export_feed(manifest, out, fmt="xml")
    files = sorted(glob.glob(os.path.join(out, "*.xml")))
    assert len(files) == 1
    root = ET.parse(files[0]).getroot()
    assert root.tag == "items"
    items = root.findall("item")
    assert len(items) == len(docs) > 0
    ranks = [int(it.findtext("rank")) for it in items]
    assert ranks == sorted(ranks) and len(set(ranks)) == len(ranks)
    want = {r.doc_id: _span_tuples(r.spans) for r in docs.itertuples()}
    for it in items:
        got = [(s.findtext("kind"), s.findtext("text"),
                s.findtext("media_ref"),
                int(s.findtext("offset")) if s.findtext("offset")
                is not None else None)
               for s in it.findall("spans")]
        assert got == want[it.findtext("doc_id")]


def test_feed_export_fields_selection(exported, tmp_path_factory):
    """FEED_EXPORT_FIELDS analogue (r5): explicit subset + order of the
    exported columns, honored by every format; unknown fields raise."""
    eng, manifest, _, _, docs, _ = exported
    out = str(tmp_path_factory.mktemp("feed_fields"))
    cs = os.path.join(out, "items_csv")
    eng.export_feed(manifest, cs, fmt="csv",
                    fields=["doc_id", "rank"])       # reordered subset
    files = sorted(glob.glob(os.path.join(cs, "*.csv")))
    pdf = pd.read_csv(files[0])
    assert list(pdf.columns) == ["doc_id", "rank"]   # exact order
    assert pdf["rank"].is_monotonic_increasing       # order still rank
    assert len(pdf) == len(docs)
    # rank not listed -> still used for ordering, not exported
    jl = os.path.join(out, "items_jl")
    eng.export_feed(manifest, jl, fmt="jsonlines", fields=["doc_id"])
    lines = _read_lines(jl, "json")
    assert all(set(json.loads(ln)) == {"doc_id"} for ln in lines)
    assert len(lines) == len(docs)
    with pytest.raises(ValueError, match="unknown feed fields"):
        eng.export_feed(manifest, os.path.join(out, "bad"),
                        fields=["doc_id", "nope"])


def test_legacy_null_round_documents_still_export(exported, spark):
    """Pre-r4 snapshots persisted documents without the round column
    (null on read-back); those rows fall back to a doc_id-only join
    against the fingerprint's first successful fetch instead of being
    dropped (r5, ADVICE r04)."""
    from pyspark.sql import functions as F
    from crawlspark.exporters import documents_export_df
    eng, manifest, _, _, docs, order = exported
    legacy_docs = (eng.documents_df(manifest)
                   .withColumn("round", F.lit(None).cast("int")))
    export = documents_export_df(legacy_docs,
                                 eng.crawl_order_df(manifest)).toPandas()
    assert len(export) == len(docs) > 0              # nothing dropped
    ok_rank = {r.fingerprint: r.rank for r in
               order[order.status == 200]
               .sort_values("rank").drop_duplicates("fingerprint")
               .itertuples()}
    for r in export.itertuples():
        assert r.rank == ok_rank[r.doc_id]
