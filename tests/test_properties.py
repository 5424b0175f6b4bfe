"""Property-based checks (hypothesis) for the algorithmic dedup cores.

Each property batches all generated documents into ONE DataFrame and
runs ONE Spark job per example (per-row Spark jobs would be minutes);
max_examples stays small — the point is randomized structural coverage
beyond the fixed synthetic corpus, not fuzzing volume.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TOKENS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc = st.lists(st.sampled_from(_TOKENS), min_size=2, max_size=30)
_corpus = st.lists(_doc, min_size=2, max_size=20)


def _hamming(a: tuple, b: tuple) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus)
def test_simhash_band_pairs_equal_bruteforce(spark, docs):
    """Pigeonhole exactness: the banded self-join must find EXACTLY the
    brute-force Hamming<=3 pairs — for any corpus, not just the
    fixture."""
    from bigdata_deepfakeanalysis_spark.operators.dedup import (
        simhash64,
        simhash_band_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    sim = simhash64(df, "text", "doc_id")
    fp = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in sim.collect()
    }
    brute = {
        (a, b)
        for a in fp
        for b in fp
        if a < b and _hamming(fp[a], fp[b]) <= 3
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in simhash_band_pairs(sim, ham_max=3).collect()
    }
    assert banded == brute


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus)
def test_repetition_stats_match_python_reference(spark, docs):
    """The sorted-run HOF formulation == a direct Counter reference."""
    from bigdata_deepfakeanalysis_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in repetition_stats(df, "text", "doc_id").collect()
    }
    for i, toks in enumerate(docs):
        bigrams = [
            f"{toks[p]} {toks[p+1]}" for p in range(len(toks) - 1)
        ]
        uni = Counter(toks)
        r = got[i]
        assert r.n_tokens == len(toks)
        assert r.n_bigrams == len(bigrams)
        top = max(Counter(bigrams).values()) if bigrams else 0
        if bigrams:
            assert abs(r.top_bigram_frac - top / len(bigrams)) < 1e-8
        repeated = sum(c for c in uni.values() if c > 1)
        assert abs(r.dup_token_frac - repeated / len(toks)) < 1e-8


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-0.999, max_value=0.999, allow_nan=False),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_fixed_point_dot_is_order_free_and_bounded(spark, vecs):
    """quantize/dot_fixed: |q| <= 2^20 per element, so any 64-element
    dot stays far below int64 overflow, and the integer sum equals the
    Python big-int reference exactly (order independence)."""
    import math

    from bigdata_deepfakeanalysis_spark.operators.similarity import (
        dot_fixed,
        quantize,
    )
    from pyspark.sql import functions as F

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    out = (
        df.select("vec_id", quantize("vec").alias("q"))
        .withColumn("n2", dot_fixed("q", "q"))
        .collect()
    )
    for r in out:
        ref_q = [math.floor(v * (1 << 20)) for v in vecs[r.vec_id]]
        assert list(r.q) == ref_q
        assert r.n2 == sum(x * x for x in ref_q)


def test_contamination_flags_planted_benchmark_dupes(spark):
    """The planted near-dup variants of benchmark docs (doc 0 and 485
    are both %97==0 and %5==0 at sf0.01) fully contain the original
    text, so they MUST surface with high contamination (the appended
    ' near dup tail' mints a few clean grams, so ≈0.85, not 1.0)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = {
        r.doc_id: r
        for r in all_queries()["q_contamination_check"](spark, SF_DIR).collect()
    }
    for planted in (1000000, 1000485):
        assert planted in rows, planted
        assert rows[planted].contam_ratio > 0.8, rows[planted]


def test_sequence_packing_conserves_tokens(spark):
    """Bin token totals must sum to the corpus token total per lang —
    packing moves documents, never drops or splits them."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    packed = (
        all_queries()["q_sequence_packing"](spark, SF_DIR)
        .groupBy("lang")
        .agg(F.sum("bin_tokens").alias("t"))
    )
    direct = (
        table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
    )
    got = {r.lang: r.t for r in packed.collect()}
    want = {r.lang: r.t for r in direct.collect()}
    assert got == want


def test_cms_never_undercounts(spark):
    """CMS estimates are ≥ the true count for EVERY term (structural
    guarantee of count-min), and exact for the clear heavy hitters
    here (w=256 >> vocab size ⇒ few collisions)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_cms_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_est >= r.true_cnt, r


def test_zorder_files_bound_both_dimensions(spark):
    """Every z-order file must span ≤ ~1/4 of BOTH key domains: the
    4-bit prefix fixes 2 high bits of each 16-bit dimension. A
    single-key sort would leave the second dimension unbounded."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    li = table(spark, SF_DIR, "lineitem")
    g = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    p_dom = g[1] - g[0]
    s_dom = g[3] - g[2]
    files = all_queries()["q_zorder_layout"](spark, SF_DIR).collect()
    assert len(files) > 1
    # quarter of the domain + one normalization cell of slack
    for f in files:
        assert f.p_hi - f.p_lo <= p_dom / 4 + p_dom / 65535 + 1, f
        assert f.s_hi - f.s_lo <= s_dom / 4 + s_dom / 65535 + 1, f


def test_hll_merge_is_lossless_and_tight(spark):
    """HLL union of per-shard sketches estimates the same cardinality
    as one sketch over the whole stream to within 1% (identical in
    dense mode; the sparse→dense promotion inside the union gadget
    costs a fraction of the configured error below the threshold),
    and every estimate lands within 5% of exact at lgConfigK=12.
    Also: the global exact must be < the sum of shard exacts
    (customers span shards) — the reason a counter sum is the wrong
    merge."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    from bigdata_deepfakeanalysis_spark.operators.sketches import (
        hll_distinct_merge_raw,
    )

    rows = {r.scope: r for r in
            hll_distinct_merge_raw(spark, SF_DIR).collect()}
    direct, union = rows["global_direct"], rows["global_union"]
    assert abs(direct.hll_est - union.hll_est) <= 0.01 * direct.exact
    assert direct.exact == union.exact
    assert direct.rel_err <= 0.05
    shard_sum = sum(r.exact for r in rows.values()
                    if r.scope.startswith("shard:"))
    assert shard_sum > direct.exact
    for r in rows.values():
        assert r.rel_err <= 0.05, r
    # the registered (oracled) summary folds the same invariants into
    # hashable booleans — all must hold
    summary = all_queries()["q_hll_distinct_merge"](spark, SF_DIR).collect()
    assert len(summary) == len(rows) + 1  # + union_vs_direct row
    assert all(r.est_within_5pct for r in summary), summary


def test_approx_quantiles_respect_gk_rank_bound(spark):
    """percentile_approx(accuracy=1000) guarantees rank error
    ≤ n/1000: for every group and every p, the number of group values
    ≤ the approx quantile must sit within n/1000 (+1 slack for ties)
    of the target rank n*p."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    from bigdata_deepfakeanalysis_spark.operators.sketches import (
        approx_quantile_profile_raw,
    )

    prof = {r.l_returnflag: r for r in
            approx_quantile_profile_raw(spark, SF_DIR).collect()}
    li = table(spark, SF_DIR, "lineitem")
    for flag, r in prof.items():
        for p, approx in [(0.50, r.p50_approx), (0.95, r.p95_approx),
                          (0.99, r.p99_approx)]:
            rank = (
                li.where(
                    (F.col("l_returnflag") == flag)
                    & (F.col("l_extendedprice") <= approx)
                ).count()
            )
            tol = r.n / 1000 + 1
            assert abs(rank - r.n * p) <= tol, (flag, p, rank, r.n)
    # the registered (oracled) profile computes the same bound as
    # hashable booleans — all must hold
    summary = all_queries()["q_approx_quantile_profile"](
        spark, SF_DIR
    ).collect()
    assert all(
        r.p50_rank_ok and r.p95_rank_ok and r.p99_rank_ok for r in summary
    ), summary


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus)
def test_doc_chunking_is_minimal_cover(spark, docs):
    """Chunking property vs a direct Python reference: chunks start at
    i·stride, every token is covered, consecutive chunks overlap by
    chunk-stride, and no chunk is redundant (the previous chunk did
    not already reach the end) — for any corpus."""
    import hashlib
    import math

    from bigdata_deepfakeanalysis_spark.operators.text import (
        _CHUNK,
        _STRIDE,
        chunk_docs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = chunk_docs(df).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, toks in enumerate(docs):
        n = len(toks)
        want_n = max(math.ceil((n - _CHUNK) / _STRIDE), 0) + 1
        rows = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert len(rows) == want_n
        for r in rows:
            start = r.chunk_idx * _STRIDE
            window = toks[start : start + _CHUNK]
            assert r.start_tok == start
            assert r.chunk_tokens == len(window)
            assert r.chunk_fp == hashlib.md5(
                " ".join(window).encode()
            ).hexdigest()
        # cover: last chunk reaches the end; no redundant chunk
        last = rows[-1]
        assert last.start_tok + last.chunk_tokens == n
        if len(rows) > 1:
            prev = rows[-2]
            assert prev.start_tok + _CHUNK < n


def test_bpe_eight_steps_match_oracle_with_flat_plan(spark, duck):
    """The per-step localCheckpoint keeps BPE plan depth constant: at 8
    merges the final plan must contain NO stacked replace() history
    (each step reads the previous step's pinned output), and the full
    8-step merge table + post-merge counts must still match the DuckDB
    closed-form recursion — proving the pin changes cost, not
    semantics."""
    from bigdata_deepfakeanalysis_spark.operators.text import (
        bpe_merges,
        bpe_oracle_sql,
    )

    from .conftest import SF_DIR, assert_matches_oracle

    df = bpe_merges(spark, SF_DIR, steps=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "replace(" not in plan, plan[:2000]
    assert_matches_oracle(df, duck, bpe_oracle_sql(8))


def test_zorder_pruning_skips_most_files(spark):
    """The Z-order span guarantee (every file covers <= ~1/4 of each
    domain) implies a 1/8-domain probe scans at most ~(1/4 + 1/8) of
    the files — i.e. prunes at least half of them on both dims."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = {
        r.probe: r
        for r in all_queries()["q_zorder_pruning"](spark, SF_DIR).collect()
    }
    for probe, r in rows.items():
        assert r.files_scanned * 2 <= r.files_total, (probe, r)
        assert r.rows_matched <= r.rows_scanned, (probe, r)


def test_compaction_bins_stay_near_target(spark):
    """Cumulative-sum binning: every merge bin holds at least target
    bytes minus one file (no underfull bin except a partition's last)
    and at most target plus one file (no overshoot beyond the
    straddling file)."""
    from bigdata_deepfakeanalysis_spark.operators.layout import (
        _COMPACT_TARGET,
    )
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_compaction_plan"](spark, SF_DIR).collect()
    assert rows, "no undersized files planned — fixture broke"
    bins_by_part: dict = {}
    for r in rows:
        bins_by_part.setdefault(r.part, []).append(r.bin)
        # every input file is undersized, so a bin never overshoots
        # the target by more than one (undersized) file
        assert r.bytes_in < 2 * _COMPACT_TARGET, r
    for part, bins in bins_by_part.items():
        # cumulative-sum binning yields contiguous bin ids 0..max
        # (a gap would mean bytes were skipped or double-counted)
        assert sorted(bins) == list(range(max(bins) + 1)), (part, bins)


def test_hilbert_files_bound_both_dimensions(spark):
    """Each Hilbert file (4-bit prefix = 16 contiguous curve segments)
    must be a connected region spanning <= ~1/4 of BOTH key domains —
    the same data-skipping guarantee as Z-order, without Morton's
    seam-jump worst case."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_hilbert_layout"](spark, SF_DIR).collect()
    assert len(rows) == 16
    p_dom = max(r.p_hi for r in rows) - min(r.p_lo for r in rows)
    s_dom = max(r.s_hi for r in rows) - min(r.s_lo for r in rows)
    for r in rows:
        assert (r.p_hi - r.p_lo) <= 0.27 * p_dom, r
        assert (r.s_hi - r.s_lo) <= 0.27 * s_dom, r


def test_winnowing_density_and_guarantee(spark):
    """Winnowing: realized fingerprint density per doc should sit near
    the expected 2/(w+1), and a doc sharing a long substring with
    another must share at least one fingerprint (the no-false-negative
    guarantee for matches >= k + w - 1)."""
    from bigdata_deepfakeanalysis_spark.operators.text import _WIN_W
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_winnowing_fingerprints"](spark, SF_DIR).collect()
    assert len(rows) > 0
    expected = 2.0 / (_WIN_W + 1)
    densities = [r.n_fp / r.n_windows for r in rows if r.n_windows > 50]
    assert densities
    avg = sum(densities) / len(densities)
    # window-min selections dedupe, so realized density is below the
    # per-window expectation but must stay the same order of magnitude
    assert 0.3 * expected < avg <= 1.0, avg


def test_weighted_sample_prefers_heavy_rows(spark):
    """Efraimidis-Spirakis: the weighted sample's mean weight must
    exceed the population mean weight (heavier rows likelier), and the
    draw must be deterministic across runs."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    sample = all_queries()["q_weighted_sample"](spark, SF_DIR).toPandas()
    assert (sample.groupby("o_orderpriority").size() == 20).all()
    pop_mean = (
        table(spark, SF_DIR, "orders")
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    assert sample["o_totalprice"].mean() > pop_mean
    again = all_queries()["q_weighted_sample"](spark, SF_DIR).toPandas()
    assert sample["o_orderkey"].tolist() == again["o_orderkey"].tolist()


def test_ks_drift_bounds(spark):
    """KS statistic must be in [0, 1] and consistent with its integer
    numerator; identical-distribution sanity: comparing a sample to
    itself gives 0 (checked via the numerator formula on one segment)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_ks_drift"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ks_stat <= 1.0
        assert abs(r.ks_stat - r.ks_num / (r.n_ref * r.n_cur)) < 1e-12


def test_blocking_quality_is_lossless_on_planted(spark):
    """The Ed-Join prefix blocking must report perfect pairs
    completeness on the planted ground truth and a very high reduction
    ratio (the whole point of blocking)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    r = all_queries()["q_blocking_quality"](spark, SF_DIR).collect()[0]
    assert r.completeness_ppm == 1000000, r
    assert r.reduction_ratio_ppm > 900000, r
    assert r.n_candidates < r.n_total_pairs
    assert r.n_planted_found == r.n_planted > 0


def test_ngram_novelty_flags_recrawls(spark):
    """Planted re-crawl variants (same text + short fresh tail) must
    score near-zero novelty; first-crawl docs near one."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_ngram_novelty"](spark, SF_DIR).collect()
    planted = [r for r in rows if r.doc_id >= 1000000]
    originals = [r for r in rows if r.doc_id < 50]
    assert planted and originals
    assert all(r.novelty_ppm < 300000 for r in planted), planted
    assert all(r.novelty_ppm > 700000 for r in originals), originals


def test_kcore_reached_fixed_point_and_min_degree(spark):
    """Every node remaining after the fixed peel rounds must have
    core degree >= k (i.e., the peeling converged within the round
    budget — otherwise some row would show a smaller degree)."""
    from bigdata_deepfakeanalysis_spark.operators.graph import _KCORE_K
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_kcore"](spark, SF_DIR).collect()
    assert rows, "k-core unexpectedly empty"
    assert min(r.core_degree for r in rows) >= _KCORE_K


def test_vad_segments_consistent(spark):
    """Per clip: segment chunks sum to active chunks, longest segment
    bounded by actives, 8 chunks per clip."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_audio_vad_segments"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_chunks == 8
        assert 0 <= r.longest_seg <= r.n_active <= 8
        if r.n_active:
            assert 1 <= r.n_segments <= r.n_active
            assert r.longest_seg >= (r.n_active + r.n_segments - 1) // r.n_segments
        else:
            assert r.n_segments == 0 and r.first_active_chunk is None


def test_robust_scale_outlier_fraction_sane(spark):
    """|z| > 0.8 under median/IQR scaling: for the near-uniform price
    fixture this is its outer ~20% of mass — nonzero, under half."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_robust_scale"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        frac = r.n_beyond_08 / r.n
        assert 0.0 < frac < 0.5, (r.l_returnflag, frac)
        assert r.iqr > 0


def test_largest_remainder_allocates_exact_budget(spark):
    """Hamilton apportionment invariants: allocations sum to exactly
    the budget, every source gets >= its floor quota, and no source
    tops up by more than 1."""
    from bigdata_deepfakeanalysis_spark.operators.sampling import (
        _LR_BUDGET,
    )
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_largest_remainder"](spark, SF_DIR).toPandas()
    assert df["alloc_slots"].sum() == _LR_BUDGET
    assert (df["alloc_slots"] >= df["base_slots"]).all()
    assert (df["alloc_slots"] - df["base_slots"] <= 1).all()


def test_bootstrap_ci_brackets_point_estimate(spark):
    """The half-sample bootstrap CI must bracket the full-population
    mean and be deterministic across runs (hash-bit membership,
    never rand())."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    row = all_queries()["q_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert row["ci_lo"] < row["point_mean"] < row["ci_hi"]
    again = all_queries()["q_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert (row["ci_lo"], row["ci_hi"]) == (again["ci_lo"], again["ci_hi"])


def test_grid_dbscan_covers_all_dense_points(spark):
    """Every dense cell lands in exactly one cluster: summed cluster
    sizes equal the dense-point total computed independently, and
    cluster ids are member cell ids (min-label)."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.ml import _DBS_MINPTS, _DBS_SCALE
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    clusters = all_queries()["q_grid_dbscan"](spark, SF_DIR).toPandas()
    emb = table(spark, SF_DIR, "embeddings")
    dense_total = (
        emb.select(
            F.expr(
                f"CAST(floor(CAST(embedding[0] AS DOUBLE) * {_DBS_SCALE})"
                " AS INT)"
            ).alias("cx"),
            F.expr(
                f"CAST(floor(CAST(embedding[1] AS DOUBLE) * {_DBS_SCALE})"
                " AS INT)"
            ).alias("cy"),
        )
        .groupBy("cx", "cy")
        .count()
        .where(F.col("count") >= _DBS_MINPTS)
        .agg(F.sum("count"))
        .collect()[0][0]
    )
    assert clusters["n_points"].sum() == (dense_total or 0)


def test_centroid_silhouette_separation_is_sane(spark):
    """Silhouette scores live in [-1e6, 1e6] micro units and the
    separated fraction is a valid ppm share."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_centroid_silhouette"](spark, SF_DIR).toPandas()
    assert len(df) == 10
    assert df["mean_sil_micro"].between(-1_000_000, 1_000_000).all()
    assert df["frac_separated_ppm"].between(0, 1_000_000).all()


def test_table_checksum_is_partitioning_invariant(spark):
    """The checksum is a commutative BIGINT sum — recomputing it over
    an adversarially repartitioned input must give the identical
    value."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    ref = all_queries()["q_table_checksum"](spark, SF_DIR).collect()[0]
    h = (
        "CAST(conv(substr(md5(concat("
        "CAST(c_custkey AS STRING), '|', c_name, '|',"
        "CAST(c_nationkey AS STRING), '|',"
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING),"
        " '|', c_mktsegment)), 1, 8), 16, 10) AS BIGINT)"
    )
    shuffled = (
        table(spark, SF_DIR, "customer")
        .repartition(17, "c_mktsegment")
        .select(F.expr(h).alias("h"))
        .agg(F.sum("h").alias("checksum"))
        .collect()[0]
    )
    assert shuffled["checksum"] == ref["checksum"]


def test_mmr_rerank_is_relevant_and_diverse(spark):
    """MMR invariants: 5 distinct picks, pick #1 is the relevance
    argmax (no prior set, max_sim_prev = 0), and every row satisfies
    the scoring identity score = 7·rel − 3·max_sim_prev (sims may be
    negative — the embeddings are roughly centered)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_mmr_rerank"](spark, SF_DIR).toPandas()
    assert len(df) == 5
    assert df["vec_id"].nunique() == 5
    first = df[df["rank"] == 1].iloc[0]
    assert first["max_sim_prev"] == 0
    assert first["rel"] == df["rel"].max()
    assert (
        df["mmr_score"] == 7 * df["rel"] - 3 * df["max_sim_prev"]
    ).all()


def test_incremental_pickup_prunes_at_listing(spark):
    """modifiedAfter must drop the old batch from the FILE LIST, not
    filter rows later — the returned DataFrame's inputFiles contain
    only the new batch's file."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_incremental_file_pickup"](spark, SF_DIR)
    files = df.inputFiles()
    assert files, "expected at least one input file"
    assert all("/new/" in f for f in files), files


def test_rake_top_phrase_is_multiword(spark):
    """RAKE's defining property: degree-weighted scoring prefers
    multi-word phrases — the top keyphrase must contain a space, and
    scores must be positive."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_rake_keywords"](spark, SF_DIR).toPandas()
    assert (df["score_milli"] > 0).all()
    assert " " in df.iloc[0]["phrase"]


def test_shapley_efficiency_identity(spark):
    """Shapley's defining axiom: the values sum to the grand-coalition
    gain. In the 6x integer space this is EXACT: sum(phi6) ==
    6*(v(all) - v(none)) would need v0/v7, but phi6 telescoping means
    sum over channels equals 6*(v7 - v0) by construction — assert the
    emitted columns obey it via the floor relation and per-channel
    phi_ppm == floor(phi6/6)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_shapley_attribution"](spark, SF_DIR).toPandas()
    assert len(df) == 3
    import math

    for _, row in df.iterrows():
        assert row["phi_ppm"] == math.floor(row["phi6_ppm"] / 6)
    # telescoping: sum over channels of phi6 = 2*(v7-v0)+...(=6*(v7-v0))
    # v7 - v0 is not emitted, but the sum must be divisible into a
    # plausible conversion-rate delta: |sum/6| <= 1e6 (rates are ppm).
    assert abs(df["phi6_ppm"].sum()) <= 6_000_000


def test_price_volume_mix_bridge_sums_exactly(spark):
    """price + volume + mix == delta for every brand — the mix term is
    defined as the exact remainder, so this is an identity, and the
    divisions inside price/volume are positive-operand only."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_price_volume_mix"](spark, SF_DIR).toPandas()
    assert len(df) > 0
    assert (
        df["price_eff_c"] + df["volume_eff_c"] + df["mix_eff_c"]
        == df["delta_c"]
    ).all()


def test_rbo_bounds_and_self_overlap(spark):
    """RBO lives in [0, 1] (micro units) and overlap-at-depth is
    bounded by the depth itself."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_rank_biased_overlap"](spark, SF_DIR).toPandas()
    row = df.iloc[0]
    assert 0 <= row["rbo_micro"] <= 1_000_000
    assert 0 <= row["overlap_at_5"] <= 5
    assert 0 <= row["overlap_at_10"] <= 10


def test_qte_deciles_monotone(spark):
    """Order statistics must be nondecreasing in the decile for BOTH
    groups — a violated monotonicity means the rank positions were
    computed wrong."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = (
        all_queries()["q_quantile_treatment_effect"](spark, SF_DIR)
        .toPandas()
        .sort_values("decile")
    )
    assert len(df) == 9
    assert df["q_treat_c"].is_monotonic_increasing
    assert df["q_ctrl_c"].is_monotonic_increasing


def test_knee_is_unique_and_on_curve(spark):
    """Exactly one knee row; cumulative share hits 1e6 ppm at the last
    rank; deviations are nonnegative at the knee (the curve is above
    the chord for a concave concentration curve)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_knee_detection"](spark, SF_DIR).toPandas()
    assert df["is_knee"].sum() == 1
    last = df.sort_values("rk").iloc[-1]
    assert last["cum_share_ppm"] == 1_000_000
    knee = df[df["is_knee"] == 1].iloc[0]
    assert knee["dev"] == df["dev"].max()


def test_logrank_observed_within_events(spark):
    """Group-1 observed events cannot exceed total events, and the
    variance must be positive when both groups are at risk."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_logrank_test"](spark, SF_DIR).toPandas()
    row = df.iloc[0]
    assert row["n_treat"] > 0 and row["n_ctrl"] > 0
    assert 0 <= row["observed_1"]
    assert row["variance_micro"] > 0
    # expected (micro) must lie between 0 and total-events * 1e6
    assert 0 < row["expected_1_micro"]


def test_theil_decomposition_adds_up(spark):
    """Within + between (fixed-point) equals the total by definition
    of the emitted columns; all parts nonnegative for a positive
    revenue distribution (Theil T >= 0)."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_theil_index"](spark, SF_DIR).toPandas()
    row = df.iloc[0]
    assert row["theil_within_micro"] >= 0
    assert row["theil_between_micro"] >= 0
    # totals are floored separately; allow the 1-unit floor gap
    assert (
        abs(
            row["theil_total_micro"]
            - row["theil_within_micro"]
            - row["theil_between_micro"]
        )
        <= 1
    )


def test_ams_f2_estimate_in_band(spark):
    """With 32 sign counters the AMS mean-of-squares estimator has
    relative std ~ sqrt(2/32) ~ 25%; assert the emitted rel error is
    under 4 sigma (100%) — a deterministic fixture, so this is a
    regression pin, not a flaky statistical test."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    df = all_queries()["q_ams_f2_sketch"](spark, SF_DIR).toPandas()
    row = df.iloc[0]
    assert row["exact_f2"] > 0
    assert row["rel_err_ppm"] <= 1_000_000


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=400
    ),
    k=st.integers(min_value=1, max_value=9),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_two_pass_rownum_and_ntile_match_window_functions(
    spark, vals, k, n_parts
):
    """The r7 de-globalization primitives must be BIT-IDENTICAL to the
    window functions they replace, for any data, partition count, tie
    pattern, and n<k / n%k edge: two_pass_rownum == partition-less
    ROW_NUMBER, and ntile_expr(rn, n_tot) == NTILE(k), both over the
    same deterministic total order (value, uid)."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.operators.parity import (
        ntile_expr,
        two_pass_rownum,
    )

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v int, uid int"
    )
    got = (
        two_pass_rownum(df, ["v", "uid"], n_parts=n_parts)
        .crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias("n_tot")))
        )
        .select("uid", "rn", F.expr(ntile_expr(k)).alias("tile"))
        .toPandas()
        .set_index("uid")
        .sort_index()
    )
    want = (
        df.select(
            "uid",
            F.expr("ROW_NUMBER() OVER (ORDER BY v, uid)").alias("rn"),
            F.expr(f"NTILE({k}) OVER (ORDER BY v, uid)").alias("tile"),
        )
        .toPandas()
        .set_index("uid")
        .sort_index()
    )
    assert (got["rn"] == want["rn"]).all()
    assert (got["tile"] == want["tile"]).all()


# ---------------------------------------------------------------------------
# avro_lite codec fuzz: a hand-written binary codec earns randomized
# structural coverage beyond the golden spec bytes — boundary integers
# (64-bit extremes), arbitrary unicode, raw bytes, NULL unions, and
# block boundaries all round-trip bit-exactly through both codecs.
# These are pure-Python (no SparkSession), so examples are cheap.
# ---------------------------------------------------------------------------

_AVRO_FUZZ_SCHEMA = {
    "type": "record",
    "name": "fuzz",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
}

_avro_record = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False),  # NaN != NaN breaks tuple equality
    st.booleans(),
    st.binary(max_size=32),
)


@settings(max_examples=25, deadline=None)
@given(
    recs=st.lists(_avro_record, max_size=40),
    codec=st.sampled_from(["null", "deflate"]),
    block=st.integers(min_value=1, max_value=7),
)
def test_avro_lite_roundtrip_fuzz(tmp_path_factory, recs, codec, block):
    from bigdata_deepfakeanalysis_spark.operators import avro_lite as al

    p = tmp_path_factory.mktemp("avro") / "f.avro"
    al.write_container(
        p, _AVRO_FUZZ_SCHEMA, iter(recs), codec, block_records=block
    )
    schema2, it = al.read_container(p)
    assert schema2 == _AVRO_FUZZ_SCHEMA
    assert list(it) == recs
    # the block index + per-block ranged reads replay the same stream
    _, blocks = al.block_index(p)
    ranged = list(al.read_blocks(p, [o for o, _, _ in blocks]))
    assert ranged == recs
    # the Arrow-batch decoder (flat-offset hot loop) agrees with the
    # row decoder value-for-value, whole-file and ranged alike
    arrow_rows = [
        tuple(d.values())
        for b in al.arrow_blocks(p)
        for d in b.to_pylist()
    ]
    assert arrow_rows == recs
    arrow_ranged = [
        tuple(d.values())
        for b in al.arrow_blocks(p, [o for o, _, _ in blocks])
        for d in b.to_pylist()
    ]
    assert arrow_ranged == recs


@settings(max_examples=15, deadline=None)
@given(
    ints=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=60
    )
)
def test_avro_zigzag_varint_roundtrip_fuzz(ints):
    import io

    from bigdata_deepfakeanalysis_spark.operators import avro_lite as al

    buf = io.BytesIO(b"".join(al.zigzag_encode(n) for n in ints))
    assert [al.zigzag_decode(buf) for _ in ints] == ints
    assert not buf.read(1)  # every byte consumed — no trailing slack


@settings(max_examples=10, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.text(max_size=8), st.text(max_size=12)),
            max_size=10,
        ),
        max_size=6,
    ),
    roll=st.integers(min_value=30, max_value=400),
)
def test_pylog_batched_reads_see_every_record_once(
    tmp_path_factory, batches, roll
):
    """Stateful fuzz: alternate append_log / cursor reads; the
    concatenation of all batch reads must equal the full append stream
    in order, regardless of segment roll points."""
    from bigdata_deepfakeanalysis_spark.streaming import pylog

    d = str(tmp_path_factory.mktemp("pylog") / "log")
    cur = {"seg": 0, "pos": 0}
    seen = []
    expected = []
    for batch in batches:
        pylog.append_log(d, batch, roll_bytes=roll)
        expected.extend(batch)
        rows, cur = pylog._read_range(d, cur, None)
        seen.extend((r[0], r[1]) for r in rows)
    assert seen == expected


@settings(max_examples=25, deadline=None)
@given(
    n_good=st.integers(min_value=0, max_value=5),
    torn_len=st.integers(min_value=1, max_value=700),
    window=st.integers(min_value=8, max_value=128),
)
def test_pylog_torn_tail_repair_survives_any_window_ratio(
    tmp_path_factory, n_good, torn_len, window
):
    """Fuzz the backward-window torn-tail scan (VERDICT r8 task 5):
    whatever the ratio of torn-record length to scan window — shorter,
    equal, or many windows long, with or without preceding good
    records — repair must truncate to exactly the last acknowledged
    newline (or to empty) and never leave torn bytes for a subsequent
    append to merge into."""
    import os

    from bigdata_deepfakeanalysis_spark.streaming import pylog

    d = str(tmp_path_factory.mktemp("pylogfuzz") / "log")
    if n_good:
        pylog.append_log(
            d, [(f"k{i}", f"v{i}") for i in range(n_good)],
            roll_bytes=1 << 30,
        )
    else:
        os.makedirs(d)
    seg0 = os.path.join(d, "00000000.jsonl")
    open(seg0, "ab").close()
    good = os.path.getsize(seg0)
    with open(seg0, "rb") as f:
        good_bytes = f.read()
    with open(seg0, "ab") as f:
        f.write(b'{"k":"torn","v":"' + b"z" * torn_len)
    pylog._repair_torn_tail(seg0, window=window)
    with open(seg0, "rb") as f:
        repaired = f.read()
    assert repaired == good_bytes  # exactly the acknowledged prefix
    assert os.path.getsize(seg0) == good
    # and the log accepts appends cleanly afterwards
    pylog.append_log(d, [("after", "ok")], roll_bytes=1 << 30)
    rows, _ = pylog._read_range(d, {"seg": 0, "pos": 0}, None)
    assert [(r[0], r[1]) for r in rows] == [
        (f"k{i}", f"v{i}") for i in range(n_good)
    ] + [("after", "ok")]


# ---------------------------------------------------------------------------
# Oracle-parity helper fuzz (VERDICT r10 stretch 7): the decimal-
# through-aggregation and rank-over-md5 idioms are load-bearing for
# every oracle hash — a Spark or DuckDB version bump that changed
# either engine's double->decimal rounding, decimal arithmetic, or
# md5/string casts would silently invalidate the whole evidence base.
# Fuzz IN-CONTRACT doubles (<= scale decimal digits — money/measure
# semantics, the way every call site uses them — plus +-0, denormals
# and sub-scale dust that rounds to zero) and assert BIT-EXACT
# Spark==DuckDB on every helper output.
#
# The strategy deliberately pins the input contract the first fuzz
# run DISCOVERED (documented in operators/parity.py): arbitrary
# doubles whose shortest repr ties one digit past the scale
# (123456.78905) legitimately diverge (Spark rounds the shortest
# repr HALF_UP, DuckDB rounds the exact binary value), and
# dmul2_sum factors with |a*b| >= ~9.2e10 overflow DuckDB's int64
# DECIMAL(18) multiply. NaN/inf are forbidden by the same contract
# (Spark NULLs, DuckDB hard-errors — out-of-contract inputs fail
# oracles loudly, never silently).
# ---------------------------------------------------------------------------

_parity_val = st.one_of(
    # exactly-4-decimal-digit values, |x| <= 300: keeps dmul2
    # products inside DuckDB's int64 multiply AND every scaled
    # intermediate sum (incl. stddev's scale-8 sum of squares) well
    # under 2^53, the bit-parity bound the first fuzz run discovered
    # (see the parity.py contract note)
    st.integers(min_value=-(3 * 10**6), max_value=3 * 10**6).map(
        lambda n: n / 10**4
    ),
    st.sampled_from([0.0, -0.0, 5e-324, 1e-310, 0.1, 0.0001, -0.0001]),
)
_parity_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), _parity_val, _parity_val),
    min_size=2,
    max_size=60,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_parity_rows, seed=st.integers(min_value=0, max_value=999))
def test_parity_helpers_bit_exact_vs_duckdb(spark, rows, seed):
    import duckdb as _duck
    import pandas as pd

    from bigdata_deepfakeanalysis_spark.operators import parity as P

    rows = [(i,) + r for i, r in enumerate(rows)]
    sdf = spark.createDataFrame(rows, "uid int, grp int, x double, y double")
    con = _duck.connect()
    con.register(
        "t", pd.DataFrame(rows, columns=["uid", "grp", "x", "y"])
    )

    # grouped decimal aggregates + global stddev, one job per engine
    got = (
        sdf.groupBy("grp")
        .agg(
            P.dsum("x", "sx"),
            P.davg("x", "ax"),
            P.dmul2_sum("x", "y", "pxy"),
        )
        .orderBy("grp")
        .collect()
    )
    want = con.execute(
        f"SELECT grp, {P.dsum_sql('x', 'sx')}, {P.davg_sql('x', 'ax')}, "
        f"{P.dmul2_sum_sql('x', 'y', 'pxy')} FROM t GROUP BY grp ORDER BY grp"
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    g_std = sdf.agg(P.stddev_expr("x", "sd")).collect()[0][0]
    w_std = con.execute(
        f"SELECT {P.stddev_sql('x', 'sd')} FROM t"
    ).fetchone()[0]
    # NaN-aware: a ~0 variance can round to a tiny negative under the
    # double subtraction, and SQRT(neg) must then be NaN on BOTH sides
    assert repr(g_std) == repr(w_std)

    # rank-over-md5: the seeded deterministic order must agree
    # position-for-position (integer keys only: CAST(int AS STRING)
    # agrees across engines, CAST(double AS ...) does NOT — double
    # string formats differ and double->int rounds in DuckDB but
    # truncates in Spark, which is why no call site keys md5_order
    # on a raw double)
    got_order = [
        r.uid
        for r in sdf.select("uid")
        .withColumn("h", P.md5_order("uid * 7 + " + str(seed % 13), seed))
        .orderBy("h")
        .collect()
    ]
    want_order = [
        r[0]
        for r in con.execute(
            "SELECT uid FROM (SELECT uid, "
            f"{P.md5_order_sql(f'uid * 7 + {seed % 13}', seed)} AS h "
            "FROM t) ORDER BY h"
        ).fetchall()
    ]
    assert got_order == want_order
    con.close()
