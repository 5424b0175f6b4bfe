#!/usr/bin/env python
"""Stage an sf1-scale fact workload for the bench's large-scale section.

The driver ships parquet at sf0.001/0.01/0.1 only (TESTDATA.md). For
the perf-only sf1 evidence (round-3 VERDICT stretch item: "exercise AQE
skew-join + bloom pruning at sf1"), this script scales the FACT tables
10x by unioning key-shifted copies of sf0.1 — orderkeys offset per copy
so lineitem keeps joining orders 1:N exactly as before, customer keys
left untouched so dimension joins stay valid — and copies the dimension
tables as-is. ~170 MB on disk; used by bench.py's sf1 section ONLY (the
correctness gate never reads it: oracle inputs stay the driver's own
parquet, per the task spec).

Usage: python tools/stage_sf1.py  (idempotent; writes under
$SPARK_GRAFT_STAGING_DIR/sf1_bench, default /tmp/bigdata_dfa_staging)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COPIES = 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# keys in sf0.1 are < ~6e6; a 100M stride keeps every copy disjoint
STRIDE = 100_000_000

# facts 10x with the JOIN key shifted; documents/embeddings 10x with
# their OWN id shifted (doc_id < 50k per copy, typo-variant ids add
# 5e6 — both stay inside each copy's 100M stride, so the dedup
# fixtures' id arithmetic never collides across copies)
FACTS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    # r7 (r6 VERDICT task 6): the streaming sf1 row needs 10x events.
    # event_id shifts per copy; ts and user_id stay — 10x event DENSITY
    # over the same time range and user population, which is what a
    # windowed-rollup scale row should measure.
    "events": "event_id",
}

_AZ = "abcdefghijklmnopqrstuvwxyz"


def _perturb(tbl: str, df, i: int):
    """Decorrelate copy i's CONTENT, not just its ids: a verbatim 10x
    copy would make every document/vector a near-duplicate of its 9
    twins, inflating dedup candidate sets ~100x and turning the sf1
    rows into a duplicate-blowup stress test instead of a scale
    measurement. Copy i Caesar-shifts document text by i (length,
    token structure and char-frequency SHAPE preserved; all q-grams
    changed) and rotates embedding dimensions by i (norms preserved;
    cross-copy cosine ~ 0 for these near-random vectors). Copies
    >= 26 ALSO reverse the text (the rotation group has order 26, so
    copy 26+i would otherwise be a verbatim twin of copy i; reversed
    q-grams share nothing with forward ones while length and
    char-frequency shape still hold) — keeps the decorrelation
    honest for the r11 sf5 staging (50 copies)."""
    from pyspark.sql import functions as F

    if i == 0:
        return df
    if tbl == "documents":
        if i < 52:
            # the r3/r11 transform, byte-for-byte: restaging sf1/sf5
            # reproduces the committed probe corpora exactly
            shifted = _AZ[i % 26:] + _AZ[: i % 26]
            text = F.translate("text", _AZ, shifted)
            if i >= 26:
                text = F.reverse(text)
        else:
            # r12 (sf25 = 250 copies): the Caesar(+reverse) group has
            # order 52, so copy 52+j would be a verbatim twin of copy
            # j — the cross-copy duplicate blowup _perturb exists to
            # prevent. A per-copy seeded alphabet PERMUTATION (26!
            # transforms) keeps length, token structure, and the
            # frequency-multiset shape while sharing no q-grams
            # across copies.
            import random

            perm = list(_AZ)
            random.Random(i).shuffle(perm)
            text = F.translate("text", _AZ, "".join(perm))
        return df.withColumn("text", text)
    if tbl == "embeddings":
        r = i % 64
        emb = F.concat(
            F.slice("embedding", r + 1, 64 - r),
            F.slice("embedding", 1, r),
        )
        if i >= 64:
            # rotation group has order 64; for 250 copies add a
            # per-copy seeded sign-flip pattern (2^64 transforms):
            # norms preserved, cross-copy cosine ~0 for these
            # near-random vectors
            import random

            rng = random.Random(i)
            signs = F.array(
                *[F.lit(float(rng.choice((-1.0, 1.0)))) for _ in range(64)]
            )
            emb = F.zip_with(emb, signs, lambda x, s: x * s)
        return df.withColumn("embedding", emb)
    return df
DIMS = ("customer", "supplier", "part", "nation", "region")


def sf1_dir() -> Path:
    from bigdata_deepfakeanalysis_spark.catalog import staging_dir

    return staging_dir("sf1_bench")


def scale_dir(label: str) -> Path:
    """Staging dir for an arbitrary key-shifted scale-up (r11 scale
    probe: label='sf5' => 50 copies of sf0.1)."""
    from bigdata_deepfakeanalysis_spark.catalog import staging_dir

    return staging_dir(f"{label}_bench")


def _staged(out: Path, tbl: str) -> bool:
    return (out / f"{tbl}.parquet" / "_SUCCESS").exists()


def stage(spark) -> Path:
    return _stage_at(spark, sf1_dir(), COPIES, b"v3-events")


def stage_scale(
    spark, label: str, copies: int, tables: set[str] | None = None
) -> Path:
    """Same key-shifted/perturbed scale-up as :func:`stage` at an
    arbitrary multiplier — perf evidence only, never oracle input
    (same contract as sf1). ``copies`` counts sf0.1 replicas, so
    copies=50 ~ sf5. ``tables`` restricts which FACT tables are
    staged (dims always copy — they're tiny): the sf25 probe reads
    only documents/embeddings, and 250-copy lineitem would cost
    staging minutes nothing consumes. Per-table idempotence means a
    later call with more tables upgrades the same dir in place."""
    return _stage_at(spark, scale_dir(label), copies, b"v1-scale", tables)


def _stage_at(
    spark,
    out: Path,
    copies: int,
    version: bytes,
    tables: set[str] | None = None,
) -> Path:
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table

    marker = out / ".complete"
    # per-table idempotence (r5 added documents/embeddings — an older
    # staging dir upgrades in place without re-writing the facts)
    for tbl, key in FACTS.items():
        if tables is not None and tbl not in tables:
            continue
        if _staged(out, tbl):
            continue
        if tbl == "events":
            # RAW read, not catalog.table: the catalog normalizes ts
            # (timestamp + ts_ns columns), but the staged copy must
            # keep the source's physical shape (ts as INT64) so
            # catalog.table's EVENTS_READ_SCHEMA + magnitude
            # normalization apply identically to the staged dir.
            from bigdata_deepfakeanalysis_spark.catalog import (
                EVENTS_READ_SCHEMA,
            )

            src = spark.read.schema(EVENTS_READ_SCHEMA).parquet(
                f"{SRC}/events.parquet"
            )
        else:
            src = table(spark, SRC, tbl)
        scaled = None
        for i in range(copies):
            c = _perturb(
                tbl, src.withColumn(key, F.col(key) + F.lit(i * STRIDE)), i
            )
            scaled = c if scaled is None else scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(str(out / f"{tbl}.parquet"))
    for tbl in DIMS:
        if not _staged(out, tbl):
            table(spark, SRC, tbl).write.mode("overwrite").parquet(
                str(out / f"{tbl}.parquet")
            )
    marker.write_bytes(version)
    return out


if __name__ == "__main__":
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from bigdata_deepfakeanalysis_spark.session import get_spark

    path = stage(get_spark("stage-sf1"))
    print(f"staged: {path}")
