"""Partitioned bloom URL-seen filter (north rule; D2/F6 at scale).

The exact seen-set is a table anti-joined against the frontier.  At
10^10 URLs that anti-join shuffles both sides, so we put a bloom filter
in front: per-partition bit arrays built with mapInPandas over the seen
table, OR-merged via ``RDD.treeAggregate`` (depth 2 — log-tree merge
keeps driver traffic at O(bits), not O(partitions×bits)), broadcast
back, and probed with a vectorized pandas UDF.

EXACTNESS CONTRACT (SURVEY.md §7.4.3): the bloom is only a
*definitely-unseen* fast path.  Rows the filter calls "maybe seen"
still go through the exact anti-join; rows it calls "unseen" are
provably unseen (no false negatives in bloom filters), so they can
skip the join.  False positives only cost join input size, never
correctness.

Reference analog: the in-memory ``crawled``/``_global_hashes`` Python
sets (crawler.py:111,230) — which cap out at single-host RAM.
"""
from __future__ import annotations


import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _params(expected_items: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = 1 << max(6, (m - 1).bit_length())          # power of two → mask not mod
    k = max(1, int(round(m / max(1, expected_items) * math.log(2))))
    return m, min(k, 8)


def _hash2(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two stable 64-bit hashes per value (double hashing scheme).

    Vectorized: pandas' SipHash with two fixed keys — deterministic
    across processes/executors (what add/probe consistency needs), no
    per-row Python (north-rule input hint).
    """
    if pd.api.types.is_integer_dtype(values):
        s = values  # int64 keys hash as raw numpy — no string round-trip
    else:
        s = values.astype(str)
    h1 = pd.util.hash_pandas_object(
        s, index=False, hash_key="sparkharvest0001").to_numpy(dtype=np.uint64)
    h2 = pd.util.hash_pandas_object(
        s, index=False, hash_key="sparkharvest0002").to_numpy(dtype=np.uint64)
    return h1, h2 | np.uint64(1)


class BloomFilter:
    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    def add_series(self, values: pd.Series) -> None:
        h1, h2 = _hash2(values)
        mask = np.uint64(self.n_bits - 1)
        for j in range(self.k):
            idx = (h1 + np.uint64(j) * h2) & mask
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))

    def contains_series(self, values: pd.Series) -> np.ndarray:
        h1, h2 = _hash2(values)
        mask = np.uint64(self.n_bits - 1)
        out = np.ones(len(values), dtype=bool)
        for j in range(self.k):
            idx = (h1 + np.uint64(j) * h2) & mask
            bit = (self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                   >> (idx & np.uint64(7)).astype(np.uint8)) & 1
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self


class CuckooFilter:
    """Bucketized cuckoo filter: 4-slot buckets, 16-bit fingerprints.

    Same definitely-unseen contract as the bloom (no false negatives
    while ``overflow`` is False), plus DELETE — which a bloom cannot do
    — so a re-enqueued URL can be *unseen* again without rebuilding.
    On insert failure (eviction cycle at high load) the filter sets
    ``overflow`` and reports everything as maybe-seen: correctness
    degrades to the exact anti-join, never to a wrong answer.

    Lookup/delete are O(2 buckets); membership probes are fully
    vectorized numpy.  Merging re-inserts the other table's
    fingerprints (a stored fingerprint's bucket is always one of its
    two valid homes, so locality survives the merge).
    """

    BUCKET = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int, table: np.ndarray | None = None,
                 overflow: bool = False):
        self.n_buckets = n_buckets              # power of two
        self.table = (table if table is not None
                      else np.zeros((n_buckets, self.BUCKET), dtype=np.uint16))
        self.overflow = overflow

    @staticmethod
    def params(expected_items: int, load: float = 0.84) -> int:
        n = max(16, int(expected_items / (CuckooFilter.BUCKET * load)))
        return 1 << (n - 1).bit_length()

    def _fp_b1_b2(self, values: pd.Series):
        h1, h2 = _hash2(values)
        mask = np.uint64(self.n_buckets - 1)
        fp = (h2 % np.uint64(65535)).astype(np.uint16) + np.uint16(1)  # nonzero
        b1 = (h1 & mask).astype(np.int64)
        # partial-key displacement: alt = b1 XOR hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995))
        b2 = ((b1.astype(np.uint64) ^ fph) & mask).astype(np.int64)
        return fp, b1, b2

    def _insert_one(self, fp: int, b1: int, b2: int) -> bool:
        import random

        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        rng = random.Random(fp * 2654435761 + b1)   # deterministic kicks
        b = rng.choice((b1, b2))
        cur = fp
        for _ in range(self.MAX_KICKS):
            slot = rng.randrange(self.BUCKET)
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            # wraparound multiply done in Python ints (numpy warns on
            # intentional uint64 overflow)
            fph = (cur * 0x5BD1E9955BD1E995) & 0xFFFFFFFFFFFFFFFF
            b = (b ^ fph) & (self.n_buckets - 1)
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        self.overflow = True
        return False

    def add_series(self, values: pd.Series) -> None:
        fp, b1, b2 = self._fp_b1_b2(values)
        for i in range(len(values)):
            self._insert_one(int(fp[i]), int(b1[i]), int(b2[i]))

    def contains_series(self, values: pd.Series) -> np.ndarray:
        if self.overflow:
            return np.ones(len(values), dtype=bool)    # degrade: all maybe
        fp, b1, b2 = self._fp_b1_b2(values)
        col = fp[:, None]
        return ((self.table[b1] == col).any(axis=1)
                | (self.table[b2] == col).any(axis=1))

    def delete_series(self, values: pd.Series) -> np.ndarray:
        """Remove one stored copy per present value; returns found-mask.

        SAFETY CONTRACT (standard cuckoo-filter caveat, ADVICE r2):
        delete is only safe for keys KNOWN to have been inserted.
        Deleting a never-inserted key whose fingerprint collides with a
        stored key's (in a shared bucket) silently removes the other
        key's entry — reintroducing false negatives while ``overflow``
        stays False, which breaks the no-false-negatives contract.
        Callers must either track insertions (the crawl's re-enqueue
        path deletes only keys it previously marked seen) or guard with
        ``contains_series`` AND tolerate the collision case; when in
        doubt, rebuild the filter instead of deleting.
        """
        fp, b1, b2 = self._fp_b1_b2(values)
        out = np.zeros(len(values), dtype=bool)
        for i in range(len(values)):
            for b in (int(b1[i]), int(b2[i])):
                row = self.table[b]
                hit = np.nonzero(row == fp[i])[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        self.overflow = self.overflow or other.overflow
        mask = np.uint64(self.n_buckets - 1)
        bs, slots = np.nonzero(other.table)
        for b, s in zip(bs.tolist(), slots.tolist()):
            cur = int(other.table[b, s])
            fph = (cur * 0x5BD1E9955BD1E995) & 0xFFFFFFFFFFFFFFFF
            alt = (b ^ fph) & int(mask)
            self._insert_one(cur, b, alt)
        return self


def build_cuckoo(df: DataFrame, col: str, expected_items: int,
                 n_buckets: int | None = None) -> CuckooFilter:
    """Per-partition cuckoo tables merged via treeAggregate (same shape
    as build_bloom; the merge re-inserts fingerprints).

    ``n_buckets`` overrides the sizing so a DELTA filter can be built
    with the same geometry as an existing filter and merged into it
    (incremental seen-sketch maintenance, round 6)."""
    if n_buckets is None:
        n_buckets = CuckooFilter.params(expected_items)

    def part_filter(rows) -> Iterator[np.ndarray]:
        cf = CuckooFilter(n_buckets)
        vals = [r[0] for r in rows]
        if vals:
            cf.add_series(pd.Series(vals))
        # overflow encoded in an extra trailing row flag
        flag = np.full((1, CuckooFilter.BUCKET),
                       1 if cf.overflow else 0, dtype=np.uint16)
        yield np.vstack([cf.table, flag])

    def comb(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if a is None or not a.size:
            return b
        if b is None or not b.size:
            return a
        ca = CuckooFilter(n_buckets, a[:-1].copy(), bool(a[-1, 0]))
        cb = CuckooFilter(n_buckets, b[:-1], bool(b[-1, 0]))
        ca.merge(cb)
        flag = np.full((1, CuckooFilter.BUCKET),
                       1 if ca.overflow else 0, dtype=np.uint16)
        return np.vstack([ca.table, flag])

    zero = np.zeros((0, CuckooFilter.BUCKET), dtype=np.uint16)
    merged = (
        df.select(col).rdd.mapPartitions(part_filter)
        .treeAggregate(zero, comb, comb, depth=2)
    )
    if not merged.size:
        return CuckooFilter(n_buckets)
    return CuckooFilter(n_buckets, merged[:-1], bool(merged[-1, 0]))


def cuckoo_probe_udf(spark, cf: CuckooFilter):
    """Vectorized maybe-seen probe; broadcasts the fingerprint table."""
    bc = spark.sparkContext.broadcast((cf.n_buckets, cf.table, cf.overflow))

    def probe(values: pd.Series) -> pd.Series:
        n_buckets, table, overflow = bc.value
        f = CuckooFilter(n_buckets, table, overflow)
        return pd.Series(f.contains_series(values), index=values.index)

    return pandas_udf(probe, "boolean")


def build_bloom(df: DataFrame, col: str, expected_items: int,
                fpp: float = 0.01,
                params: tuple[int, int] | None = None) -> BloomFilter:
    """Per-partition bloom sketches merged via treeAggregate (north rule).

    ``params=(n_bits, k)`` overrides the sizing so a DELTA sketch can
    be built with the same geometry as an existing sketch and OR-merged
    into it (incremental seen-sketch maintenance, round 6): bloom adds
    are deterministic, so full-build bits == OR of same-geometry delta
    bits over a partition of the keys (unit-tested)."""
    n_bits, k = params if params is not None else _params(expected_items, fpp)

    def part_bloom(rows) -> Iterator[np.ndarray]:
        bf = BloomFilter(n_bits, k)
        vals = [r[0] for r in rows]
        if vals:
            bf.add_series(pd.Series(vals))
        yield bf.bits

    zero = np.zeros(n_bits // 8, dtype=np.uint8)
    bits = (
        df.select(col).rdd.mapPartitions(part_bloom)
        .treeAggregate(zero, lambda a, b: a | b, lambda a, b: a | b, depth=2)
    )
    return BloomFilter(n_bits, k, bits)


def bloom_probe_udf(spark, bloom: BloomFilter):
    """Vectorized maybe-seen probe; broadcasts the merged bit array."""
    bc = spark.sparkContext.broadcast((bloom.n_bits, bloom.k, bloom.bits))

    def probe(values: pd.Series) -> pd.Series:
        n_bits, k, bits = bc.value
        bf = BloomFilter(n_bits, k, bits)
        return pd.Series(bf.contains_series(values), index=values.index)

    return pandas_udf(probe, "boolean")


# ---------------------------------------------------------------------------
# Sketch snapshot sidecar (round 6, VERDICT r5 perf-weak #1): the crawl
# persists its merged seen-sketch once per round and merges ONLY the
# round's seen delta into it, instead of rebuilding from the full seen
# table every round.  Exact resume loads the sidecar; a snapshot
# without one (older runs) falls back to a full rebuild.
# ---------------------------------------------------------------------------


def save_sketch(root: str, round_no: int, sketch, capacity: int) -> str:
    """Atomically write the sketch sidecar for *round_no*."""
    import os

    d = os.path.join(root, "sketch")
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"r{round_no:06d}.npz")
    tmp = os.path.join(d, f".tmp-r{round_no:06d}-{os.getpid()}.npz")
    if isinstance(sketch, BloomFilter):
        np.savez(tmp, kind=np.array("bloom"), bits=sketch.bits,
                 n_bits=np.array(sketch.n_bits), k=np.array(sketch.k),
                 capacity=np.array(capacity))
    else:
        np.savez(tmp, kind=np.array("cuckoo"), table=sketch.table,
                 n_buckets=np.array(sketch.n_buckets),
                 overflow=np.array(1 if sketch.overflow else 0),
                 capacity=np.array(capacity))
    os.replace(tmp, final)
    return final


def load_sketch(root: str, round_no: int):
    """Load the sidecar committed at *round_no*; ``None`` when absent
    or unreadable (callers rebuild from the full seen table)."""
    import os

    p = os.path.join(root, "sketch", f"r{round_no:06d}.npz")
    if not os.path.exists(p):
        return None
    try:
        z = np.load(p)
        cap = int(z["capacity"])
        if str(z["kind"]) == "bloom":
            return BloomFilter(int(z["n_bits"]), int(z["k"]),
                               z["bits"].copy()), cap
        return CuckooFilter(int(z["n_buckets"]), z["table"].copy(),
                            bool(int(z["overflow"]))), cap
    except Exception:  # noqa: BLE001 — any corrupt sidecar ⇒ full rebuild
        return None


def anti_join_with_probe(
    frontier: DataFrame,
    seen: DataFrame,
    keys: list[str],
    probe,
    probe_col: str,
) -> DataFrame:
    """Exact anti-join with a maybe-seen prefilter UDF (bloom or cuckoo).

    definitely-unseen rows skip the shuffle join entirely; maybe-seen
    rows take the exact anti-join.  Result == plain anti-join.
    """
    flagged = frontier.withColumn("__maybe_seen", probe(F.col(probe_col)))
    unseen_fast = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    checked = maybe.join(seen, keys, "left_anti")
    return unseen_fast.unionByName(checked)


def anti_join_with_bloom(
    frontier: DataFrame,
    seen: DataFrame,
    keys: list[str],
    bloom: BloomFilter | None,
    probe_col: str,
) -> DataFrame:
    """Back-compat wrapper: bloom-prefiltered exact anti-join."""
    if bloom is None:
        return frontier.join(seen, keys, "left_anti")
    probe = bloom_probe_udf(frontier.sparkSession, bloom)
    return anti_join_with_probe(frontier, seen, keys, probe, probe_col)
