"""Cuckoo seen-filter kernel (crawlspark/cuckoo.py, D3 alternative;
BASELINE.json north_star: "bloom/cuckoo URL-seen filter").

Model-based: the filter is checked against a Python Counter of live
(shard, tag) occurrences — the exactness contract is NO FALSE NEGATIVES
for any inserted-not-deleted fingerprint, under arbitrary interleavings
of inserts and (discipline-respecting) deletes. Plus: native Spark
addressing == addr_py bit-for-bit, blob codec roundtrip, deterministic
overflow degradation (sticky all-maybe-seen, never an exception), and
delete-of-absent raising (a broken discipline must fail loud, not return
wrong crawl results)."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd
import pytest

from crawlspark import cuckoo as ck
from crawlspark.config import CrawlConfig

CFG = CrawlConfig(seen_filter="cuckoo")


def _fps(n: int, salt: str = "") -> list[str]:
    return [hashlib.sha1(f"{salt}{i}".encode()).hexdigest() for i in range(n)]


def _member(shards: dict[int, bytes], fp: str,
            cfg: CrawlConfig = CFG) -> bool:
    s, tag, i1, i2 = ck.addr_py(fp, cfg)
    over, arr = ck.decode(shards.get(s, b""), cfg)
    return over or (arr[i1] == tag).any() or (arr[i2] == tag).any()


def test_insert_then_member_no_false_negatives():
    fps = _fps(20000)
    shards = ck.insert_fps({}, fps, CFG)
    # ~7.6% load: no shard may overflow and every fp must be a member
    assert all(not ck.decode(b, CFG)[0] for b in shards.values())
    assert all(_member(shards, fp) for fp in fps)


def test_delete_removes_and_preserves_others():
    fps = _fps(20000)
    shards = ck.insert_fps({}, fps, CFG)
    rng = random.Random(7)
    dead = set(rng.sample(fps, 10000))
    for fp in dead:
        s, tag, i1, i2 = ck.addr_py(fp, CFG)
        over, arr = ck.decode(shards[s], CFG)
        assert ck.delete_one(arr, tag, i1, i2)
        shards[s] = ck.encode(over, arr)
    # every live fp still a member (tag collisions may only produce
    # false POSITIVES); occupancy shrank by exactly the deleted count
    assert all(_member(shards, fp) for fp in fps if fp not in dead)
    occ = sum(int((ck.decode(b, CFG)[1] != 0).sum()) for b in shards.values())
    assert occ == len(fps) - len(dead)


def test_interleaved_model_equivalence():
    """Random insert/delete interleaving vs a Counter model: membership
    must hold for every live fp at every checkpoint."""
    rng = random.Random(42)
    universe = _fps(4000, "u")
    live: set[str] = set()
    shards: dict[int, bytes] = {}
    for step in range(12):
        ins = [fp for fp in rng.sample(universe, 600) if fp not in live]
        shards = ck.insert_fps(shards, ins, CFG)
        live |= set(ins)
        dead = rng.sample(sorted(live), min(300, len(live)))
        for fp in dead:
            s, tag, i1, i2 = ck.addr_py(fp, CFG)
            over, arr = ck.decode(shards[s], CFG)
            assert ck.delete_one(arr, tag, i1, i2)
            shards[s] = ck.encode(over, arr)
        live -= set(dead)
        missing = [fp for fp in live if not _member(shards, fp)]
        assert not missing, (step, missing[:3])


def test_blob_codec_roundtrip():
    over, arr = ck.decode(b"", CFG)
    arr[5, 2] = 777
    arr[0, 0] = 1
    blob = ck.encode(True, arr)
    over2, arr2 = ck.decode(blob, CFG)
    assert over2 is True
    assert (arr2 == arr).all()
    assert len(blob) == ck.blob_nbytes(CFG)


def test_overflow_degrades_to_all_maybe_seen():
    """A deliberately tiny table (2 buckets x 4 slots per shard) must
    overflow, keep answering True for everything in the overflowed shard
    (degraded selectivity, never a false negative), and never raise."""
    tiny = CrawlConfig(seen_filter="cuckoo", cuckoo_buckets_per_shard=2,
                       cuckoo_max_kicks=8)
    fps = _fps(2000, "o")
    shards = ck.insert_fps({}, fps, tiny)
    assert any(ck.decode(b, tiny)[0] for b in shards.values())
    assert all(_member(shards, fp, tiny) for fp in fps)
    # deletes in an overflowed shard are skipped upstream (engine checks
    # the flag); membership stays all-true regardless
    never = _fps(50, "never-inserted")
    overflowed = {s for s, b in shards.items() if ck.decode(b, tiny)[0]}
    for fp in never:
        s = ck.addr_py(fp, tiny)[0]
        if s in overflowed:
            assert _member(shards, fp, tiny)


def test_delete_of_absent_raises():
    fps = _fps(100, "d")
    shards = ck.insert_fps({}, fps, CFG)
    ghost = _fps(1, "ghost")[0]
    s, tag, i1, i2 = ck.addr_py(ghost, CFG)
    over, arr = ck.decode(shards.get(s, b""), CFG)
    if not ((arr[i1] == tag).any() or (arr[i2] == tag).any()):
        ops = pd.DataFrame({"op": [-1], "ck_tag": [tag],
                            "ck_i1": [i1], "ck_i2": [i2]})
        with pytest.raises(ValueError, match="discipline"):
            ck.apply_ops(over, arr, ops, CFG)


def test_power_of_two_buckets_enforced():
    with pytest.raises(ValueError, match="power of 2"):
        ck.addr_py("0" * 40, CrawlConfig(cuckoo_buckets_per_shard=3000))


def test_native_addressing_matches_python(spark):
    """conv/substring/bitwiseXOR columns == addr_py for real sha1 fps —
    the hot-path check UDF depends on this parity."""
    from pyspark.sql import functions as F
    fps = _fps(500, "n")
    df = spark.createDataFrame(pd.DataFrame({"fingerprint": fps}))
    got = (df.select("fingerprint",
                     *ck.native_addr_cols(F.col("fingerprint"), CFG))
           .toPandas().set_index("fingerprint"))
    for fp in fps:
        s, tag, i1, i2 = ck.addr_py(fp, CFG)
        row = got.loc[fp]
        assert (row.ck_shard, row.ck_tag, row.ck_i1, row.ck_i2) \
            == (s, tag, i1, i2), fp


def test_check_udf_matches_membership(spark):
    from pyspark.sql import functions as F
    fps = _fps(3000, "c")
    shards = ck.insert_fps({}, fps[:1500], CFG)
    check = ck.make_check_udf(spark, shards, CFG)
    df = spark.createDataFrame(pd.DataFrame({"fingerprint": fps}))
    got = (df.withColumn(
        "maybe", check(*ck.native_addr_cols(F.col("fingerprint"), CFG)))
        .toPandas())
    want = np.array([_member(shards, fp) for fp in fps])
    assert (got["maybe"].to_numpy() == want).all()
    # inserted half: all True; uninserted half: overwhelmingly False
    assert got["maybe"][:1500].all()
    assert got["maybe"][1500:].mean() < 0.05
