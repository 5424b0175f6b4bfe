"""Deduplication operators (SURVEY §2.8 M11 — north-star extensions).

Five dedup families over the ``documents`` / ``embeddings`` tables:

- exact (hash-groupBy, deterministic min-id survivor)
- MinHash + LSH banding (shingle → K minhashes → banded signature →
  bucket self-join for candidate pairs)
- SimHash (per-token bit votes → 16-bit fingerprint → Hamming pairs)
- n-gram Jaccard verification (exact set overlap on shared shingles)
- embedding-cosine near-dup (blocked pair join + decimal-exact dot)

Scale design (100 TB): every op is a shuffle-on-key pipeline — shingle
explode is a flatMap (no shuffle), minhash is one groupBy(doc, hash_i),
band bucketing is one groupBy(doc, band), and the candidate join keys on
(band, signature) so only colliding docs meet. Nothing is pairwise over
the full corpus: the quadratic step is confined to LSH buckets (MinHash)
or explicit blocks (SimHash: (lang, source); cosine: label). Hashes are
md5 (hex-lexicographic min == numeric min) so Spark and DuckDB agree
bit-for-bit; at production scale xxhash64 drops in for speed without
changing the shape.

No reference counterpart (the reference has no dedup — SURVEY §2.8);
semantics follow the standard MinHash/SimHash constructions (Broder;
Charikar) as used in LLM-corpus pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# ---------------------------------------------------------------------------
# Augmented corpora: the driver's documents/embeddings are duplicate-free,
# so dedup demos union in deterministic near-copies (1 in 5 docs gets a
# variant with a 3-token tail; 1 in 5 vectors a scaled copy). Both engines
# derive the same fixture (CTE below == Spark builder).
# ---------------------------------------------------------------------------

AUG_DOCS_CTE = """
aug_docs AS (
    SELECT doc_id, text, lang, source, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' near dup tail', lang, source,
           n_chars + 14
    FROM documents WHERE doc_id % 5 = 0)
"""


def aug_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    variants = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 14).alias("n_chars"),
    )
    return docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        variants
    )


AUG_EMB_CTE = """
aug_emb AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
    FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01) AS vec
    FROM embeddings WHERE vec_id % 5 = 0)
"""


def aug_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    scaled = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x.cast("double") * 1.01).alias("vec"),
    )
    return base.unionByName(scaled)


# ---------------------------------------------------------------------------
# Engine ops — composable DataFrame transforms
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: deterministic min-id survivor per identical text.

    (``dropDuplicates`` keeps an arbitrary row; min-per-group is stable
    across runs/cluster sizes.) One hash-aggregate shuffle on the text —
    at scale, group on md5(text) instead of the raw text to keep shuffle
    rows narrow."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("_h")
    )


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: flatMap, no shuffle until
    the DISTINCT (which co-partitions by (doc, shingle))."""
    concat_args = ", ".join(f"_t[p + {j}]" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(_t) >= {n} THEN "
        f"transform(sequence(0, size(_t) - {n}), "
        f"p -> concat_ws(' ', {concat_args})) ELSE array() END"
    )
    return (
        df.withColumn("_t", F.split(F.col(text_col), " "))
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("sh"))
        .distinct()
    )


def minhash_bands(
    sh_df: DataFrame, k: int = 12, band_rows: int = 3
) -> DataFrame:
    """K md5-minhashes per doc, folded into K/band_rows banded signature
    strings. ONE shuffle: a single groupBy(doc) computes all K mins as
    parallel MIN aggregates (map-side partial agg keeps shuffle rows at
    one per (doc, partition)); bands are row-local concats, then an
    unpivot (flatMap, no shuffle)."""
    mins = sh_df.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat_ws("|", F.lit(str(i)), F.col("sh")))
            ).alias(f"mh{i}")
            for i in range(k)
        ]
    )
    n_bands = k // band_rows
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_rows + j}") for j in range(band_rows)]
            ).alias("sig"),
        )
        for b in range(n_bands)
    ]
    return mins.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Self-join on (band, sig): docs collide iff one band matches.
    The join key is the signature hash, so the shuffle is uniform unless
    a bucket is degenerate (all-identical docs) — AQE skew-split covers
    that."""
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash: per-token md5, bit j = high bit of hex char j,
    count-weighted ±1 votes, fingerprint = Σ 2^j [vote_j > 0]."""
    tok = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.md5("w"))
    )
    votes = (
        tok.select(
            "doc_id",
            "cnt",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
        )
        .withColumn(
            "bit_hi",
            F.expr("instr('0123456789abcdef', substr(h, j + 1, 1)) - 1 >= 8"),
        )
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(F.col("bit_hi"), F.col("cnt")).otherwise(-F.col("cnt"))
            ).alias("vote")
        )
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(1, j)")).otherwise(0)
        )
        .cast("int")
        .alias("simhash")
    )


def cosine_pairs(
    vec_df: DataFrame, block_col: str, threshold: float
) -> DataFrame:
    """Blocked cosine near-dup: pairs within a block, decimal-exact dot
    and norms, cosine rounded to 1e-9 (decimal→double ULP guard).

    Two-phase plan (the 100 TB shape): (1) candidate generation —
    ``applyInPandas`` per block computes the block's pairwise cosine
    matrix with one vectorized matmul and emits only pairs above
    ``threshold - 1e-6`` (float64 error bound; one shuffle on the block
    key, quadratic work confined to blocks); (2) exact rescore — the few
    surviving pairs get decimal-exact dot products (order-free, equal to
    the oracle's exploded decimal SUMs) and the true threshold filter.
    At scale the block column is the coarse quantizer (IVF cell / LSH
    bucket), keeping per-block pair counts bounded."""
    import pandas as pd  # noqa: F401  (worker-side module, std in env)

    approx_cut = threshold - 1e-6

    # self-contained closure: numpy/pandas only, no engine package needed
    def block_pairs(pdf):
        import numpy as _np
        import pandas as _pd

        X = _np.asarray(pdf["vec"].tolist(), dtype=_np.float64)
        ids = pdf["vec_id"].to_numpy()
        norms = _np.sqrt((X * X).sum(axis=1))
        M = (X @ X.T) / _np.outer(norms, norms)
        ia, ib = _np.where(M >= approx_cut)
        keep = ids[ia] < ids[ib]
        return _pd.DataFrame(
            {"vec_a": ids[ia][keep], "vec_b": ids[ib][keep]}
        )

    cands = (
        vec_df.select("vec_id", block_col, "vec")
        .groupBy(block_col)
        .applyInPandas(block_pairs, "vec_a long, vec_b long")
    )

    dot = (
        "CAST(aggregate(zip_with({a}, {b}, (x, y) ->"
        " CAST(CAST(x AS DECIMAL(12,9)) * CAST(y AS DECIMAL(12,9))"
        " AS DECIMAL(38,18))), CAST(0 AS DECIMAL(38,18)),"
        " (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) AS DOUBLE)"
    )
    va = vec_df.select(
        F.col("vec_id").alias("vec_a"),
        F.col("vec").alias("va"),
        F.expr(dot.format(a="vec", b="vec")).alias("na"),
    )
    vb = vec_df.select(
        F.col("vec_id").alias("vec_b"),
        F.col("vec").alias("vb"),
        F.expr(dot.format(a="vec", b="vec")).alias("nb"),
    )
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.expr(dot.format(a="va", b="vb"))
                / (F.sqrt("na") * F.sqrt("nb")),
                9,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Oracle-checked queries
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
shingled AS (
    SELECT doc_id, toks, UNNEST(range(1, greatest(len(toks) - 1, 1))) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM aug_docs) t),
shingles AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos + 1] || ' ' || toks[pos + 2] AS sh
    FROM shingled)
"""


@query(
    "q_exact_dedup",
    f"""
    WITH {AUG_DOCS_CTE.strip()},
    survivors AS (
        SELECT md5(text) AS h, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM aug_docs GROUP BY md5(text))
    SELECT n_copies, COUNT(*) AS n_texts, MIN(doc_id) AS min_survivor
    FROM survivors
    GROUP BY n_copies
    ORDER BY n_copies
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the augmented corpus: texts with a near-dup tail
    stay singletons, true copies collapse to min-id survivors."""
    deduped = exact_dedup(aug_docs(spark, sf_dir), "text", "doc_id")
    return (
        deduped.groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_texts"),
            F.min("doc_id").alias("min_survivor"),
        )
        .orderBy("n_copies")
    )


@query(
    "q_minhash_near_dup",
    f"""
    WITH {AUG_DOCS_CTE.strip()},
    {_SHINGLES_CTE.strip()},
    hashed AS (
        SELECT doc_id, i, md5(CAST(i AS VARCHAR) || '|' || sh) AS h
        FROM shingles, (SELECT UNNEST(range(0, 12)) AS i)),
    mins AS (
        SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY doc_id, i),
    bands AS (
        SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
               string_agg(mh, '|' ORDER BY i) AS sig
        FROM mins GROUP BY doc_id, i // 3),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """,
)
def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(K=12) + LSH(4 bands × 3 rows) candidate pairs over the
    augmented corpus — finds the planted near-dup variants."""
    sh = shingles(aug_docs(spark, sf_dir), "text", "doc_id")
    pairs = lsh_candidate_pairs(minhash_bands(sh, k=12, band_rows=3))
    return pairs.orderBy("doc_a", "doc_b")


@query(
    "q_simhash_hamming",
    f"""
    WITH {AUG_DOCS_CTE.strip()},
    tok AS (
        SELECT doc_id, w, COUNT(*) AS cnt, md5(w) AS h
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
              FROM aug_docs) t
        GROUP BY doc_id, w),
    votes AS (
        SELECT doc_id, j,
               SUM(CASE WHEN strpos('0123456789abcdef', substr(h, j + 1, 1))
                             - 1 >= 8
                        THEN cnt ELSE -cnt END) AS vote
        FROM tok, (SELECT UNNEST(range(0, 16)) AS j)
        GROUP BY doc_id, j),
    sim AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0 THEN (1 << j) ELSE 0 END)
                    AS INTEGER) AS simhash
        FROM votes GROUP BY doc_id),
    blocked AS (SELECT s.doc_id, d.lang, d.source, s.simhash
                FROM sim s JOIN aug_docs d ON s.doc_id = d.doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM blocked a JOIN blocked b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b
    """,
)
def q_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit fingerprints, (lang, source)-blocked pair
    join, Hamming distance <= 3."""
    docs = aug_docs(spark, sf_dir)
    sim = simhash16(docs, "text", "doc_id").join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )
    a = sim.select(
        F.col("doc_id").alias("doc_a"), "lang", "source",
        F.col("simhash").alias("sim_a"),
    )
    b = sim.select(
        F.col("doc_id").alias("doc_b"), "lang", "source",
        F.col("simhash").alias("sim_b"),
    )
    return (
        a.join(b, ["lang", "source"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sim_a ^ sim_b")).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q_ngram_jaccard",
    f"""
    WITH {AUG_DOCS_CTE.strip()},
    {_SHINGLES_CTE.strip()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shingles a JOIN shingles b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= 5)
    SELECT doc_a, doc_b,
           ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 9) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.5 over pairs sharing >= 5 shingles —
    the verification stage downstream of LSH candidates."""
    sh = shingles(aug_docs(spark, sf_dir), "text", "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= 5)
    )
    return (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                9,
            ),
        )
        .where(
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
            >= 0.5
        )
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q_cosine_near_dup",
    f"""
    WITH {AUG_EMB_CTE.strip()},
    cells AS (
        SELECT vec_id, label, pos, vec[pos + 1] AS val
        FROM aug_emb, (SELECT UNNEST(range(0, 64)) AS pos)),
    norms AS (
        SELECT vec_id,
               CAST(SUM(CAST(val AS DECIMAL(12,9)) * CAST(val AS DECIMAL(12,9)))
                    AS DOUBLE) AS n2
        FROM cells GROUP BY vec_id),
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(SUM(CAST(a.val AS DECIMAL(12,9))
                        * CAST(b.val AS DECIMAL(12,9))) AS DOUBLE) AS dot
        FROM cells a JOIN cells b
          ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id)
    SELECT vec_a, vec_b,
           ROUND(dot / (SQRT(na.n2) * SQRT(nb.n2)), 9) AS cosine
    FROM dots
    JOIN norms na ON vec_a = na.vec_id
    JOIN norms nb ON vec_b = nb.vec_id
    WHERE ROUND(dot / (SQRT(na.n2) * SQRT(nb.n2)), 9) >= 0.999
    ORDER BY vec_a, vec_b
    """,
)
def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: label-blocked pairs with cosine >=
    0.999 — catches the planted scaled copies (cosine exactly 1)."""
    return cosine_pairs(aug_emb(spark, sf_dir), "label", 0.999).orderBy(
        "vec_a", "vec_b"
    )
