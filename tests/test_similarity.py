"""Recall contracts for the approximate similarity family (VERDICT r01
items 2-3): every approximate path is measured against its exact baseline,
both on the driver fixture (weak-similarity regime, honest measured
floors) and on a planted high-similarity corpus (the regime near-dup
dedup actually targets, where the contract is strict).

Thresholds are pinned from measured values with margin; they are
deterministic (md5-seeded planes, fixed tie-breaks), so a regression
below a floor means the algorithm changed, not noise.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlspark.queries import QUERIES

SF_DIR = os.environ.get("CRAWLSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

# measured on the driver fixture (sf0.001 / sf0.01); see docs/COVERAGE.md
FIXTURE_ANN_RECALL_FLOOR = 0.8      # measured 9/10 both SFs (ivf + lsh)
FIXTURE_NEARDUP_RECALL_FLOOR = 0.6  # measured 5/7 (sf0.001), 12/14 (sf0.01)
PLANTED_ANN_RECALL_FLOOR = 0.9      # measured 10/10
PLANTED_NEARDUP_RECALL_FLOOR = 0.95  # measured 160/162


def _exact_state(sf_dir):
    import duckdb
    rows = duckdb.connect().execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        f"FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    norms = np.linalg.norm(x, axis=1)
    cos = (x @ x.T) / np.outer(norms, norms)
    return ids, cos


def _true_topk(ids, cos, q_vec_id=0, k=10):
    qi = int(np.where(ids == q_vec_id)[0][0])
    c = cos[:, qi].copy()
    c[qi] = -2.0
    return set(ids[np.lexsort((ids, -np.round(c, 6)))[:k]].tolist())


def _exact_pairs(ids, cos, thresh=0.45):
    iu = np.triu_indices(len(ids), 1)
    return {(int(ids[i]), int(ids[j]))
            for i, j in zip(*iu) if cos[i, j] >= thresh}


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """120 groups x 1-3 copies; copies are base + 0.45*N(0,1) noise in 64-d
    (pairwise cosine ~0.87-0.95 within a group, ~0 across groups)."""
    rng = np.random.default_rng(7)
    vids, vecs, labels = [], [], []
    vid = 0
    for b in range(120):
        base = rng.normal(size=64)
        for c in range(1 + (b % 3)):
            v = base + (0.45 * rng.normal(size=64) if c else 0.0)
            vids.append(vid)
            vecs.append(v.astype(np.float32).tolist())
            labels.append(b)
            vid += 1
    d = str(tmp_path_factory.mktemp("planted"))
    pq.write_table(pa.table({
        "vec_id": pa.array(vids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}), f"{d}/embeddings.parquet")
    return d


@pytest.mark.parametrize("name", ["emb_ann_ivf", "emb_ann_lsh"])
@pytest.mark.parametrize("corpus", ["fixture", "planted"])
def test_ann_recall_at_10(spark, planted_dir, name, corpus):
    sf = SF_DIR if corpus == "fixture" else planted_dir
    floor = (FIXTURE_ANN_RECALL_FLOOR if corpus == "fixture"
             else PLANTED_ANN_RECALL_FLOOR)
    ids, cos = _exact_state(sf)
    true10 = _true_topk(ids, cos)
    got = {r.vec_id for r in QUERIES[name][0](spark, sf).collect()}
    recall = len(got & true10) / 10.0
    assert recall >= floor, f"{name}@{corpus}: recall@10={recall}"


@pytest.mark.parametrize("corpus", ["fixture", "planted"])
def test_near_dup_bucketed_recall(spark, planted_dir, corpus):
    sf = SF_DIR if corpus == "fixture" else planted_dir
    floor = (FIXTURE_NEARDUP_RECALL_FLOOR if corpus == "fixture"
             else PLANTED_NEARDUP_RECALL_FLOOR)
    ids, cos = _exact_state(sf)
    exact = _exact_pairs(ids, cos)
    got = {(r.vec_a, r.vec_b) for r in
           QUERIES["emb_near_dup_bucketed"][0](spark, sf).collect()}
    # precision contract is absolute: every emitted pair IS a near-dup
    # (candidates are exact-cosine verified), so got must be a subset
    assert got <= exact
    recall = len(got & exact) / max(len(exact), 1)
    assert recall >= floor, f"near_dup_bucketed@{corpus}: recall={recall}"


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in {x for p in pairs for x in p}}


@pytest.mark.parametrize("corpus", ["fixture", "planted"])
def test_dedup_clusters_match_union_find(spark, planted_dir, corpus):
    """dedup_clusters must equal union-find over the SAME candidate pairs
    (self-consistency: the distributed label propagation converged to the
    true connected components)."""
    sf = SF_DIR if corpus == "fixture" else planted_dir
    pairs = {(r.vec_a, r.vec_b) for r in
             QUERIES["emb_near_dup_bucketed"][0](spark, sf).collect()}
    truth = _union_find(pairs)
    got = {r.vec_id: r.cluster_keeper for r in
           QUERIES["dedup_clusters"][0](spark, sf).collect()}
    assert got == truth


def test_dedup_clusters_planted_ground_truth(spark, planted_dir):
    """On the planted corpus the resolved clusters must agree with the
    generative groups for every covered vertex (keeper = min vec_id of
    the true group, given recall covers the group's pairs)."""
    ids, cos = _exact_state(planted_dir)
    truth = _union_find(_exact_pairs(ids, cos))
    got = {r.vec_id: r.cluster_keeper for r in
           QUERIES["dedup_clusters"][0](spark, planted_dir).collect()}
    agree = sum(1 for v, k in got.items() if truth.get(v) == k)
    assert agree / max(len(got), 1) >= 0.95


def test_label_propagation_long_chain_converges(spark):
    """VERDICT r02 finding #1: the r2 loop silently capped at 32
    iterations, returning WRONG labels for any component with diameter
    > 32. Plant a 48-vertex path graph (diameter 47) plus a disjoint
    triangle: every vertex must get the true component minimum, matching
    union-find exactly."""
    from crawlspark.similarity import label_propagation

    chain = [(i, i + 1) for i in range(47)]          # path 0-1-...-47
    tri = [(100, 101), (101, 102)]
    pairs = spark.createDataFrame(chain + tri, "a long, b long")
    got = {r.vid: r.keeper for r in
           label_propagation(pairs, "a", "b", "vid", "keeper").collect()}
    truth = _union_find(set(chain + tri))
    assert got == truth
    assert all(got[v] == 0 for v in range(48))
    assert all(got[v] == 100 for v in (100, 101, 102))


def test_label_propagation_log_rounds_on_long_chain(spark):
    """The alternating large-star/small-star algorithm converges in
    O(log n) ROUNDS, independent of diameter: a 300-vertex path (which
    plain min-label propagation needs ~300 rounds for) must finish
    within 20 and still match union-find."""
    from crawlspark.similarity import label_propagation

    chain = [(i, i + 1) for i in range(299)]
    pairs = spark.createDataFrame(chain, "a long, b long")
    got = {r.vid: r.keeper for r in
           label_propagation(pairs, "a", "b", "vid", "keeper").collect()}
    assert got == {v: 0 for v in range(300)}
    assert label_propagation.last_iters <= 20, label_propagation.last_iters


def test_label_propagation_random_graph_matches_union_find(spark):
    """Seeded random multigraph (collisions, multiple components):
    labels must equal union-find exactly."""
    import random

    from crawlspark.similarity import label_propagation

    rng = random.Random(1234)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(160)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r.vid: r.keeper for r in
           label_propagation(pairs, "a", "b", "vid", "keeper").collect()}
    truth = _union_find({tuple(sorted(e)) for e in edges})
    assert got == truth


def test_label_propagation_raises_on_cap(spark):
    """The defensive bound RAISES instead of returning non-converged
    labels (no silent wrong-answer path): one round cannot collapse a
    30-vertex path."""
    import pytest as _pytest

    from crawlspark.similarity import label_propagation

    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                  "a long, b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        label_propagation(pairs, "a", "b", "v", "k", max_iters=1)
