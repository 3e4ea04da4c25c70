"""D3 bloom seen-filter: exactness contract (SURVEY §7.3 hard-part 4) —
no false negatives ever; false positives bounded and harmless (they only
route rows into the exact anti-join)."""

import numpy as np

from crawlspark import bloom
from crawlspark.config import CrawlConfig
from crawlspark.kernels.canon import fingerprint_hex

CFG = CrawlConfig(bloom_shards=8, bloom_bits_per_shard=1 << 14, bloom_hashes=4)


def _fill(fps):
    shards = {int(r.shard): bytearray(r.bits)
              for r in bloom.empty_shards(CFG).itertuples()}
    for fp in fps:
        s, bits = bloom.bit_positions_py(fp, CFG)
        for b in bits:
            shards[s][b >> 3] |= 1 << (b & 7)
    return shards


def _check(shards, fp):
    s, bits = bloom.bit_positions_py(fp, CFG)
    return all(shards[s][b >> 3] & (1 << (b & 7)) for b in bits)


def test_no_false_negatives():
    fps = [fingerprint_hex(f"https://h.test/p/{i}") for i in range(5000)]
    shards = _fill(fps)
    assert all(_check(shards, fp) for fp in fps)


def test_false_positive_rate_bounded():
    ins = [fingerprint_hex(f"https://h.test/p/{i}") for i in range(2000)]
    probe = [fingerprint_hex(f"https://other.test/q/{i}") for i in range(4000)]
    shards = _fill(ins)
    fp_rate = sum(_check(shards, f) for f in probe) / len(probe)
    # 2000 keys over 8*16384 bits with k=4 → theoretical fp ~ 0.3%; allow 5%
    assert fp_rate < 0.05, fp_rate


def test_native_addressing_matches_python(spark):
    """Spark-native conv(substring(fp)) addressing must equal
    bit_positions_py — the engine computes addresses JVM-side."""
    from pyspark.sql import functions as F
    fps = [fingerprint_hex(f"https://h.test/n/{i}") for i in range(200)]
    df = spark.createDataFrame([(f,) for f in fps], "fingerprint string")
    shard, bits = bloom.native_addr_cols(F.col("fingerprint"), CFG)
    rows = df.select(F.col("fingerprint"), shard, *bits).collect()
    for r in rows:
        s, bs = bloom.bit_positions_py(r["fingerprint"], CFG)
        assert r["bloom_shard"] == s
        assert [r[f"bloom_b{j}"] for j in range(CFG.bloom_hashes)] == bs


def test_adversarial_collisions_do_not_drop_urls():
    """Even if the filter saturates (all bits set = every probe positive),
    exactness holds because positives go through the anti-join — emulate by
    checking a saturated filter still never reports a false NEGATIVE."""
    shards = {s: bytearray(b"\xff" * (CFG.bloom_bits_per_shard // 8))
              for s in range(CFG.bloom_shards)}
    assert _check(shards, fingerprint_hex("https://h.test/whatever"))
