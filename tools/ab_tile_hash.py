#!/usr/bin/env python
"""Interleaved A/B: hash-tiled vs residue-tiled grid assignment.

Round-10 re-expressed q_mutual_nn_alignment / q_knn_classifier by
swapping pmod(id, g) tile assignment for pmod(xxhash64(id), g) (the
residue form collapses under congruent-id skew). Per the bench
discipline, every same-round re-expression gets ONE interleaved
old-vs-new timing so the delta is separated from host drift.

The old form is resurrected WITHOUT a code fork: the similarity
module's `F` attribute is swapped for a proxy whose xxhash64 is a
bigint-cast passthrough — pmod(xxhash64(id), g) evaluates as
pmod(id, g), byte-identical to the pre-r10 tiling on non-negative
ids. Arms interleave within one session.

Usage: python tools/ab_tile_hash.py [rounds]
Prints one JSON line per query.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


class _ResidueShim:
    """functions-module proxy: xxhash64 -> bigint passthrough."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, name):
        if name == "xxhash64":
            return lambda c: self._real.col(c).cast("bigint")
        return getattr(self._real, name)


def main():
    from pyspark.sql import SparkSession

    from bigdata_deepfakeanalysis_spark import session
    from bigdata_deepfakeanalysis_spark.operators import similarity as sim

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session.tune(
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ab-tile-hash")
        .getOrCreate()
    )
    real_f = sim.F
    shim = _ResidueShim(real_f)

    def run(qfn) -> float:
        t0 = time.monotonic()
        qfn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for qname in ("q_mutual_nn_alignment", "q_knn_classifier"):
        qfn = getattr(sim, qname)
        run(qfn)  # warm-up
        hash_t, residue_t = [], []
        for _ in range(ROUNDS):
            sim.F = real_f
            hash_t.append(run(qfn))
            sim.F = shim
            try:
                residue_t.append(run(qfn))
            finally:
                sim.F = real_f
        print(
            json.dumps(
                {
                    "metric": "tile_hash_ab",
                    "query": qname,
                    "sf_dir": SF_DIR,
                    "hash_sec": round(min(hash_t), 3),
                    "residue_sec": round(min(residue_t), 3),
                    "hash_all": [round(t, 3) for t in hash_t],
                    "residue_all": [round(t, 3) for t in residue_t],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
