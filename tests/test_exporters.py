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
    assert list(pdf.columns) == ["rank", "doc_id", "canonical_url",
                                 "spans_json"]
    assert len(pdf) == len(docs) > 0
    assert pdf["rank"].is_monotonic_increasing
    want = {r.doc_id: _span_tuples(r.spans) for r in docs.itertuples()}
    for r in pdf.itertuples():
        spans = json.loads(r.spans_json) if isinstance(r.spans_json, str) \
            else []
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
