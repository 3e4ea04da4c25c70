"""Partitioned persistent cuckoo seen-filter (SURVEY §2.3 D3 alternative;
BASELINE.json north_star names a "bloom/cuckoo URL-seen filter").

Same role as the bloom shards (`crawlspark/bloom.py`): a compact prefilter
in front of the exact J3 LEFT ANTI JOIN. What the cuckoo variant adds is
DELETION — the capability the seen-TTL re-crawl mode (config
``seen_ttl_rounds``) needs to keep filter occupancy bounded at the 10^10
design point: when a fingerprint's seen entry expires, its tag is removed,
so the filter tracks the LIVE seen set instead of growing monotonically
the way bloom bits do. (Bloom + TTL stays CORRECT — stale bits only cost
prefilter selectivity, never semantics — but saturates on a long-running
re-crawl schedule; the cuckoo filter does not.)

Exactness contract (same as bloom, SURVEY §7.3 hard-part 4): "unseen" is
trusted without confirmation, so the filter must NEVER produce a false
negative for a live fingerprint. Standard partial-key cuckoo filters give
that under an occurrence discipline the engine maintains:

  * one INSERT per becomes-live event (first enqueue, or re-enqueue /
    fetch-refresh after expiry) — never for refreshes of an already-live
    fingerprint;
  * one DELETE per expiry event (and only then).

Occurrences per (shard, tag, bucket-pair) then always >= the number of
live fingerprints mapping there, so tag-collision deletes can only create
false POSITIVES (safe — the exact anti-join confirms). A delete that finds
no occurrence indicates a broken discipline and raises. An insert that
exhausts its eviction budget restores the shard byte-for-byte and sets a
sticky per-shard OVERFLOW flag: that shard answers "maybe seen" for
everything from then on (degraded selectivity, never wrong results).

Addressing is a pure function of the sha1 fingerprint hex, computable
natively by Spark (conv/substring/bitwiseXOR — no Python in the hot path);
the check UDF is numpy fancy-indexing over a broadcast (S, B, 4) uint16
tag table, Arrow-batched:

  shard = int(fp[0:8],  16) % S
  tag   = int(fp[8:12], 16) % 65535 + 1          (16-bit, nonzero)
  i1    = int(fp[12:20], 16) % B                 (B = buckets, power of 2)
  i2    = i1 XOR ((tag * 0x5bd1e995) % B)        (involutive partial-key)

Blob layout per shard row (seen_shards table, ``shard int, bits binary``):
1 flag byte (bit0 = overflow) + B*4 little-endian uint16 tags (0 = empty).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import CrawlConfig

H_MULT = 0x5BD1E995   # MurmurHash2 magic — any odd constant works


def _nb(cfg: CrawlConfig) -> int:
    b = cfg.cuckoo_buckets_per_shard
    if b & (b - 1):
        raise ValueError(f"cuckoo_buckets_per_shard must be a power of 2: {b}")
    return b


def blob_nbytes(cfg: CrawlConfig) -> int:
    return 1 + _nb(cfg) * 4 * 2


def addr_py(fp: str, cfg: CrawlConfig) -> tuple[int, int, int, int]:
    nb = _nb(cfg)
    shard = int(fp[0:8], 16) % cfg.bloom_shards
    tag = int(fp[8:12], 16) % 0xFFFF + 1
    i1 = int(fp[12:20], 16) % nb
    i2 = i1 ^ ((tag * H_MULT) % nb)
    return shard, tag, i1, i2


def native_addr_cols(fp_col, cfg: CrawlConfig):
    """JVM-side (shard, tag, i1, i2) columns for a fingerprint hex column —
    mirrors addr_py bit-for-bit (parity pinned in tests/test_cuckoo.py)."""
    from pyspark.sql import functions as F
    nb = _nb(cfg)
    shard = (F.conv(F.substring(fp_col, 1, 8), 16, 10).cast("long")
             % cfg.bloom_shards).cast("int").alias("ck_shard")
    tag = (F.conv(F.substring(fp_col, 9, 4), 16, 10).cast("long")
           % 0xFFFF + 1).cast("int").alias("ck_tag")
    i1_raw = (F.conv(F.substring(fp_col, 13, 8), 16, 10).cast("long") % nb)
    i1 = i1_raw.cast("int").alias("ck_i1")
    i2 = (i1_raw.bitwiseXOR(
        (F.conv(F.substring(fp_col, 9, 4), 16, 10).cast("long")
         % 0xFFFF + 1) * F.lit(H_MULT) % nb)).cast("int").alias("ck_i2")
    return shard, tag, i1, i2


def empty_shards(cfg: CrawlConfig) -> pd.DataFrame:
    nbytes = blob_nbytes(cfg)
    return pd.DataFrame({
        "shard": np.arange(cfg.bloom_shards, dtype=np.int32),
        "bits": [bytes(nbytes)] * cfg.bloom_shards,
    })


def decode(blob: bytes, cfg: CrawlConfig) -> tuple[bool, np.ndarray]:
    """-> (overflowed, writable (B, 4) uint16 tag table)."""
    nb = _nb(cfg)
    if not blob or len(blob) != blob_nbytes(cfg):
        return False, np.zeros((nb, 4), dtype=np.uint16)
    arr = np.frombuffer(blob, dtype="<u2", offset=1).reshape(nb, 4).copy()
    return bool(blob[0] & 1), arr


def encode(overflowed: bool, arr: np.ndarray) -> bytes:
    return bytes([1 if overflowed else 0]) + arr.astype("<u2").tobytes()


def insert_one(arr: np.ndarray, tag: int, i1: int, i2: int,
               max_kicks: int) -> bool:
    """Add ONE occurrence of tag. False = table full on this path (caller
    sets the overflow flag; the array is restored byte-for-byte)."""
    nb = arr.shape[0]
    for i in (i1, i2):
        free = np.flatnonzero(arr[i] == 0)
        if free.size:
            arr[i, free[0]] = tag
            return True
    # deterministic eviction walk from i2; snapshot for all-or-nothing.
    # Victim slot = hash of (kick counter, current tag, bucket index) —
    # still replay-deterministic, but the walk varies across paths instead
    # of orbiting short bucket cycles (ADVICE r03: the old ``k & 3`` rule
    # could set the sticky overflow flag while free slots remained,
    # degrading the prefilter earlier than a standard cuckoo filter)
    snap = arr.copy()
    cur_i, cur_tag = i2, tag
    for k in range(max_kicks):
        j = ((cur_tag * H_MULT) ^ (cur_i * 0x9E3779B1) ^ k) & 3
        victim = int(arr[cur_i, j])
        arr[cur_i, j] = cur_tag
        cur_tag = victim
        cur_i = cur_i ^ ((victim * H_MULT) % nb)
        free = np.flatnonzero(arr[cur_i] == 0)
        if free.size:
            arr[cur_i, free[0]] = cur_tag
            return True
    arr[:] = snap
    return False


def delete_one(arr: np.ndarray, tag: int, i1: int, i2: int) -> bool:
    """Remove ONE occurrence of tag; False = not present (caller raises
    unless the shard is overflowed — a missing occurrence means the
    insert/delete discipline was broken and unseen-trust is unsound)."""
    for i in (i1, i2):
        hit = np.flatnonzero(arr[i] == tag)
        if hit.size:
            arr[i, hit[0]] = 0
            return True
    return False


def apply_ops(overflowed: bool, arr: np.ndarray, ops: pd.DataFrame,
              cfg: CrawlConfig) -> bool:
    """Apply one shard's (op, tag, i1, i2) rows — deletes (op=-1) first,
    then inserts (op=+1), each group in (tag, i1) order so replays are
    deterministic. Returns the new overflow flag. Bounded by the round's
    delta size — same cost class as the bloom merge loop."""
    ops = ops.sort_values(["op", "ck_tag", "ck_i1"], kind="mergesort")
    for op, tag, i1, i2 in zip(ops["op"].to_numpy(),
                               ops["ck_tag"].to_numpy(),
                               ops["ck_i1"].to_numpy(),
                               ops["ck_i2"].to_numpy()):
        if overflowed:
            return True   # sticky: shard is all-maybe-seen, no bookkeeping
        if op < 0:
            if not delete_one(arr, int(tag), int(i1), int(i2)):
                raise ValueError(
                    "cuckoo delete of absent tag — insert/delete discipline "
                    f"broken (tag={int(tag)}, i1={int(i1)}, i2={int(i2)})")
        else:
            if not insert_one(arr, int(tag), int(i1), int(i2),
                              cfg.cuckoo_max_kicks):
                overflowed = True
    return overflowed


def insert_fps(shard_bits: dict[int, bytes], fps,
               cfg: CrawlConfig) -> dict[int, bytes]:
    """Driver-side insert-only merge (the ttl=0 fast path + inject_seeds):
    decode each touched shard once, add one occurrence per fingerprint,
    re-encode. Bounded by the delta size — mirrors the bloom fast path."""
    dec: dict[int, tuple[bool, np.ndarray]] = {}
    for fp in fps:
        s, tag, i1, i2 = addr_py(fp, cfg)
        if s not in dec:
            dec[s] = decode(shard_bits.get(s, b""), cfg)
        over, arr = dec[s]
        if over:
            continue
        if not insert_one(arr, tag, i1, i2, cfg.cuckoo_max_kicks):
            dec[s] = (True, arr)
    out = dict(shard_bits)
    for s, (over, arr) in dec.items():
        out[s] = encode(over, arr)
    return out


def make_check_udf(spark, shard_bits: dict[int, bytes], cfg: CrawlConfig):
    """maybe_seen(shard, tag, i1, i2) -> bool over a broadcast of the shard
    tag tables — pure numpy fancy-indexing, no per-row Python (same scale
    note as bloom.make_check_udf: at 10^10 switch to a cogrouped
    shard-join with identical addressing)."""
    from pyspark.sql.functions import pandas_udf

    nb = _nb(cfg)
    mat = np.zeros((cfg.bloom_shards, nb, 4), dtype=np.uint16)
    over = np.zeros(cfg.bloom_shards, dtype=bool)
    for s, blob in shard_bits.items():
        fl, arr = decode(blob, cfg)
        mat[s] = arr
        over[s] = fl
    bc = spark.sparkContext.broadcast((mat, over))

    @pandas_udf("boolean")
    def maybe_seen(shard: pd.Series, tag: pd.Series, i1: pd.Series,
                   i2: pd.Series) -> pd.Series:
        m, o = bc.value
        sh = shard.to_numpy().astype(np.int64)
        tg = tag.to_numpy().astype(np.uint16)[:, None]
        b1 = i1.to_numpy().astype(np.int64)
        b2 = i2.to_numpy().astype(np.int64)
        out = ((m[sh, b1] == tg).any(axis=1)
               | (m[sh, b2] == tg).any(axis=1)
               | o[sh])
        return pd.Series(out, index=shard.index)

    return maybe_seen
