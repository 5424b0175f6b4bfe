#!/usr/bin/env python
"""Regenerate PLANS.md — formatted physical plans of flagship queries,
the direct evidence behind the scale claims (broadcasts, pushed
filters, zero-Exchange bucketed ops, WindowGroupLimit, pinned
fingerprints, partition-local ranking).

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

FLAGSHIPS = [
    ("q5_regional_revenue",
     "4-way star join: every dimension broadcast, date+region filters "
     "pushed to the parquet scan"),
    ("q_window_topk_per_group",
     "per-group top-k: two-phase WindowGroupLimit (Partial below the "
     "Exchange — each mapper ships at most k rows per group)"),
    ("q_bucketed_agg",
     "bucketed scan satisfies the aggregation's distribution — no "
     "Exchange below the per-key aggregate"),
    ("q_simhash_hamming",
     "fingerprints pinned (Scan ExistingRDD) before the band self-join "
     "— the vote aggregate runs once, not once per side"),
    ("q_minhash_near_dup",
     "MinHash banding: row-local signature HOFs, one shuffle to the "
     "band join"),
    ("q_zorder_layout",
     "stats pass -> broadcast scalars -> row-local Morton interleave "
     "(codegen) -> one groupBy on the file prefix"),
    ("q_global_rownum",
     "global row numbers without a single-partition window: ranking "
     "window partitioned by the range-partition id"),
    ("q_not_in_anti_join",
     "NOT IN planned as null-aware anti join (LeftAnti flag true) vs "
     "NOT EXISTS's plain LeftAnti"),
    ("q_lateral_topn",
     "LATERAL correlated top-2 decorrelated to a ranked window join "
     "with WindowGroupLimit — no per-outer-row nested loop"),
    ("q_recursive_cte_chain",
     "WITH RECURSIVE through the UnionLoop operator — one frontier "
     "join per step"),
    ("q_hilbert_layout",
     "8-level Hilbert walk unrolled to integer CASE expressions — "
     "row-local codegen, one groupBy on the key prefix"),
    ("q_quantile_band_join",
     "broadcast decile boundaries + row-local band assignment — the "
     "production equi-depth shape, no global sort"),
    # round-5 flagships
    ("q_edit_distance_join",
     "Ed-Join r5 shape: strings carried in the pinned prefix index, "
     "bounded levenshtein on the raw gram join, dedup only of the "
     "verified pairs (no 700k-pair distinct)"),
    ("q_kmv_distinct",
     "global K-smallest hash via TakeOrderedAndProject — distributed "
     "top-K, never a global sort"),
    ("q_bucket_pruned_lookup",
     "IN-list on the bucket key skips bucket files at scan "
     "(SelectedBucketsCount below total)"),
    ("q_skyline_pareto",
     "sort-based Pareto frontier: running-max window PARTITIONED BY "
     "segment over pre-aggregated rows — no quadratic dominance join"),
    ("q_sparse_cosine_pairs",
     "postings-wise sparse similarity join: df-banded inverted index, "
     "pinned weights feed norms and both join sides"),
    # round-7 flagships
    ("q_equidepth_histogram",
     "exact equi-depth tiles without a global sort (r7): two-pass "
     "range-partitioned rownum + arithmetic NTILE from (rn, broadcast "
     "total) — bit-identical buckets to the window function"),
    ("q_bucket_coalesced_join",
     "mismatched bucket counts join shuffle-free (r7): the 8-bucket "
     "scan coalesces to 4 at read — zero Exchange below the merge "
     "join, the layout-evolution guarantee"),
    ("q_permutation_importance",
     "deterministic permutation importance (r7): md5-bucketed cyclic "
     "shift, windows partitioned by (dim, bucket) — never corpus-wide"),
    ("q_knn_classifier",
     "5-NN hold-out classifier (late-r9 re-expression): the 10% test "
     "side is NO LONGER broadcast (a corpus-scaling fraction was "
     "mislabeled '10-query set' in the BNLJ allowlist) — pairs "
     "enumerate on the mutual-NN 2-D tile grid via an ordinary "
     "equi-join, scoring stays codegen fixed-point cosine, and the "
     "top-5 window keeps its map-side WindowGroupLimit Partial, so "
     "only ~5 rows per query per task reach the shuffle; zero "
     "BroadcastNestedLoopJoin in the plan"),
    ("q_mutual_nn_alignment",
     "exact bipartite mutual-NN (r9 2-D grid form; r10 hash tiling): "
     "a g x g tile grid (g ~ sqrt(shuffle.partitions)) — A lands in "
     "row xxhash64(a) mod g replicated across columns, B in column "
     "xxhash64(b) mod g replicated across rows (HASH, not residue: "
     "ids all congruent mod g would collapse one side into a single "
     "grid row — the r10 skew property test), so each (a, b) pair "
     "materializes in "
     "exactly ONE cell and each cell holds |A|/g + |B|/g rows "
     "(both sides' task memory bounded). Per cell an Arrow cogroup "
     "kernel (FlatMapCoGroupsInPandas, visible below) computes the "
     "distance block as one integer-exact float64 matmul and emits "
     "only per-point argmin partials; one min(struct(d2, other)) "
     "aggregate over (side, key) composes the global argmins, and "
     "mutuality is a second narrow aggregate over the normalized "
     "undirected pair (count = 2 ⟺ both directions chose it) — a "
     "LINEAR chain with no self-join, so the kernel executes exactly "
     "once (the join form's pushed side-filters split the aggregate "
     "exchange and re-ran it per side). No CartesianProduct/BNLJ "
     "pair enumeration exists (the r8 broadcast cross pair-set "
     "re-expressed twice over; the scalar n_mutual total is the one "
     "sanctioned 1-row BNLJ build)"),
    # round-10 flagship
    ("q_frequent_triples",
     "apriori face pruning under a COUNT-GUARDED broadcast (r10): "
     "the checkpointed level-2 pair set carries no stats, so neither "
     "the threshold nor AQE can elect a broadcast — the query "
     "MEASURES the materialized set (one cheap count) and hints only "
     "under a 200k-row guard; a corpus-grown set (frequent pairs "
     "scale with baskets at fixed absolute support) falls back to "
     "shuffle joins instead of OOMing. measured-then-hinted, the "
     "pattern the forced-broadcast hygiene scan enforces everywhere"),
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from bigdata_deepfakeanalysis_spark.registry import all_queries
    from bigdata_deepfakeanalysis_spark.session import get_spark

    spark = get_spark("plans")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    qs = all_queries()
    out = [
        "# PLANS — flagship physical plans (generated by tools/dump_plans.py)",
        "",
        "`.explain(formatted)` output at sf0.01, 8 shuffle partitions. The",
        "plan-shape assertions in `tests/test_plans.py` keep these properties",
        "from regressing; this file is the human-readable snapshot.",
        "",
    ]
    for name, why in FLAGSHIPS:
        df = qs[name](spark, SF_DIR)
        jpm = df._jdf.queryExecution()
        mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = jpm.explainString(mode)
        # keep the operator tree + the interesting node details, not
        # every column list
        lines = plan.splitlines()
        tree_end = next(
            (i for i, ln in enumerate(lines) if not ln.strip()), len(lines)
        )
        tree = lines[:tree_end]
        detail = [
            ln
            for ln in lines[tree_end:]
            if any(
                k in ln
                for k in (
                    "PushedFilters", "ReadSchema", "Bucketed",
                    "SelectedBucketsCount", "PartitionFilters",
                )
            )
        ]
        out += [f"## {name}", "", why, "", "```"]
        out += tree + (["", *detail] if detail else [])
        out += ["```", ""]
    (ROOT / "PLANS.md").write_text("\n".join(out) + "\n")
    print(f"wrote {ROOT / 'PLANS.md'} ({len(FLAGSHIPS)} plans)")


if __name__ == "__main__":
    main()
