"""Partitioned persistent bloom seen-filter (SURVEY §2.3 D3, §4.3).

Scrapy's RFPDupeFilter holds every fingerprint in an in-RAM Python set —
the reference's core scalability ceiling ([S:scrapy/dupefilters.py]). Here
the seen-filter is S independent bloom shards, each a fixed-size bitset
stored as one binary row of the ``seen_shards`` table, rebuilt incrementally
per round. Exactness contract (SURVEY §7.3 hard-part 4): bloom "unseen" is
trusted (no false negatives by construction — every enqueued fingerprint is
inserted in the same committed round); bloom "maybe seen" is confirmed by
the exact LEFT ANTI JOIN (J3). The filter only shrinks the anti-join input.

Shard/bit addressing is a pure function of the sha1 fingerprint hex (40
nibbles), so Spark can compute it NATIVELY with ``conv(substring(...),16,10)``
— the pandas UDF only does numpy bitset gathers on integer columns:

  shard     = int(fp[0:8],  16) % S
  bit_j     = int(fp[8+8j : 16+8j], 16) % B      for j in 0..k-1  (k<=4)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import CrawlConfig


def bit_positions_py(fp: str, cfg: CrawlConfig) -> tuple[int, list[int]]:
    shard = int(fp[0:8], 16) % cfg.bloom_shards
    bits = [int(fp[8 + 8 * j: 16 + 8 * j], 16) % cfg.bloom_bits_per_shard
            for j in range(cfg.bloom_hashes)]
    return shard, bits


def native_addr_cols(fp_col, cfg: CrawlConfig):
    """JVM-side shard + bit-position columns for a fingerprint hex column."""
    from pyspark.sql import functions as F
    shard = (F.conv(F.substring(fp_col, 1, 8), 16, 10).cast("long")
             % cfg.bloom_shards).cast("int").alias("bloom_shard")
    bits = [
        (F.conv(F.substring(fp_col, 9 + 8 * j, 8), 16, 10).cast("long")
         % cfg.bloom_bits_per_shard).cast("long").alias(f"bloom_b{j}")
        for j in range(cfg.bloom_hashes)
    ]
    return shard, bits


def empty_shards(cfg: CrawlConfig) -> pd.DataFrame:
    nbytes = cfg.bloom_bits_per_shard // 8
    return pd.DataFrame({
        "shard": np.arange(cfg.bloom_shards, dtype=np.int32),
        "bits": [bytes(nbytes)] * cfg.bloom_shards,
    })


def insert_positions(shards: dict[int, bytearray], pdf: pd.DataFrame,
                     cfg: CrawlConfig) -> None:
    """Set bits for a pandas frame with bloom_shard + bloom_b{j} columns."""
    for j in range(cfg.bloom_hashes):
        col = pdf[f"bloom_b{j}"].to_numpy()
        sh = pdf["bloom_shard"].to_numpy()
        for s, b in zip(sh, col):
            buf = shards[int(s)]
            buf[int(b) >> 3] |= 1 << (int(b) & 7)


def make_check_udf(spark, shard_bits: dict[int, bytes], cfg: CrawlConfig):
    """maybe_seen(shard, b0..bk-1) -> bool, over a broadcast of the shard
    blobs (S * B/8 bytes; at 10^10 scale switch to a cogrouped shard-join —
    same addressing, no driver collect)."""
    from pyspark.sql.functions import pandas_udf

    # one dense (S, B/8) matrix so the check is pure numpy fancy-indexing —
    # no per-row Python anywhere (missing shards stay all-zero = never seen)
    mat = np.zeros((cfg.bloom_shards, cfg.bloom_bits_per_shard // 8),
                   dtype=np.uint8)
    for s, b in shard_bits.items():
        mat[s] = np.frombuffer(b, dtype=np.uint8)
    bc = spark.sparkContext.broadcast(mat)
    k = cfg.bloom_hashes

    @pandas_udf("boolean")
    def maybe_seen(shard: pd.Series, *bits: pd.Series) -> pd.Series:
        m = bc.value
        sh = shard.to_numpy().astype(np.int64)
        out = np.ones(len(sh), dtype=bool)
        for j in range(k):
            pos = bits[j].to_numpy().astype(np.int64)
            byte = m[sh, pos >> 3]
            out &= ((byte >> (pos & 7)) & 1).astype(bool)
        return pd.Series(out, index=shard.index)

    return maybe_seen
