"""Similarity search over the embeddings table (north-star extension).

Two tiers:
- brute-force cosine top-k — the exactness baseline (O(Q·N·d))
- random-hyperplane LSH bucketing — the scale path: each vector lands in
  one of 2^planes buckets, candidate set = same-bucket vectors, so a
  1000-executor job shuffles by bucket instead of cross-joining 100 TB.

All math is sequential double-precision folds shared exactly with the
DuckDB oracle; cosines are rounded to 6 dp before ranking so top-k order
(with vec_id tiebreak) is engine-independent.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.functions import vectors as V
from mediawiki_to_notion_spark.operators.registry import register
from mediawiki_to_notion_spark.sources.tables import load_table

N_QUERIES = 5       # query vectors: vec_id 0..4
TOP_K = 10
N_PLANES = 4        # 16 LSH buckets


@register(
    "similarity_topk_bruteforce",
    oracle=V.hygiene_oracle(f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
               AS cosine_r
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
      SELECT query_id, vec_id, cosine_r,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_r DESC, vec_id) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, cosine_r FROM ranked WHERE rn <= {TOP_K}
    """),
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector: broadcast the (tiny)
    query side, score every candidate, rank per query.  NULL/empty
    vectors are hygiene-filtered (V.hygiene) before the math."""
    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select("vec_id", "embedding")
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(V.cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cosine_r"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


def _bucket_sql() -> str:
    terms = [
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {V.hyperplane_sql(j)}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    ]
    return " + ".join(terms)


def _bucket_col() -> F.Column:
    out = F.lit(0)
    for j in range(N_PLANES):
        out = out + F.when(
            V.dot(F.col("embedding"), V.hyperplane(j)) > 0, F.lit(1 << j)
        ).otherwise(0)
    return out


@register(
    "similarity_lsh_bucketed",
    oracle=V.hygiene_oracle(f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
               AS cosine_r
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND c.vec_id != q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
      SELECT query_id, vec_id, cosine_r,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_r DESC, vec_id) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, cosine_r FROM ranked WHERE rn <= {TOP_K}
    """),
)
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane (SRP) LSH — sign-bit bucket
    per vector, candidates restricted to the query's bucket.  The
    bucket equi-join is the 100 TB shape: shuffle by bucket, never
    all-pairs.  (Charikar 2002 similarity-preserving hashing.)
    NULL/empty vectors hygiene-filtered before bucketing."""
    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    bucketed = e.select("vec_id", "embedding", _bucket_col().alias("bucket"))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id", "vec_id",
            F.round(V.cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cosine_r"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@register(
    "embedding_norm_stats",
    oracle=V.hygiene_oracle("""
    SELECT label, count(*) AS n_vectors,
           CAST(SUM(CAST(round(sqrt(list_dot_product(embedding::DOUBLE[],
                                                     embedding::DOUBLE[])), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS total_norm,
           min(len(embedding)) AS min_dim, max(len(embedding)) AS max_dim
    FROM embeddings GROUP BY label
    """),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm bookkeeping (norms rounded then summed as
    decimals so the aggregate is accumulation-order-independent).
    NULL/empty vectors hygiene-filtered before the norm fold."""
    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(
            F.round(V.norm(F.col("embedding")), 6).cast("decimal(18,6)")
        ).cast("double").alias("total_norm"),
        F.min(F.size("embedding")).alias("min_dim"),
        F.max(F.size("embedding")).alias("max_dim"),
    )


def _subquery(name: str) -> str:
    from mediawiki_to_notion_spark.operators.registry import ORACLES

    return ORACLES[name].strip().rstrip(";")


@register(
    "similarity_lsh_recall",
    oracle=None,  # assembled lazily below to avoid registration-order coupling
)
def similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality measurement: recall@{TOP_K} of the SRP-LSH bucketed
    search against the exact brute-force top-k, per query vector.  This
    is the evaluation loop an ANN deployment runs after every re-index —
    the approximate path is only trustworthy with its recall measured
    on the same engine that serves it.  Both operands are the already-
    registered queries, so the measurement and the measured share one
    plan library."""
    bf = similarity_topk_bruteforce(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("bf_vec")
    )
    lsh = similarity_lsh_bucketed(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("lsh_vec")
    )
    hits = bf.join(
        lsh,
        (bf.query_id == lsh.query_id) & (F.col("bf_vec") == F.col("lsh_vec")),
        "left_semi",
    )
    n_bf = bf.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_recalled"))
    return (
        n_bf.join(n_hit, "query_id", "left")
        .select(
            "query_id", "n_exact",
            F.coalesce("n_recalled", F.lit(0)).alias("n_recalled"),
            (F.coalesce("n_recalled", F.lit(0)).cast("double") / F.col("n_exact"))
            .alias("recall"),
        )
    )


def _register_recall_oracle() -> None:
    from mediawiki_to_notion_spark.operators.registry import ORACLES

    ORACLES["similarity_lsh_recall"] = f"""
    WITH bf AS ({_subquery("similarity_topk_bruteforce")}),
    lsh AS ({_subquery("similarity_lsh_bucketed")}),
    n_bf AS (SELECT query_id, count(*) AS n_exact FROM bf GROUP BY query_id),
    n_hit AS (
      SELECT bf.query_id, count(*) AS n_recalled
      FROM bf WHERE EXISTS (
        SELECT 1 FROM lsh
        WHERE lsh.query_id = bf.query_id AND lsh.vec_id = bf.vec_id
      )
      GROUP BY bf.query_id
    )
    SELECT n_bf.query_id, n_exact,
           coalesce(n_recalled, 0) AS n_recalled,
           coalesce(n_recalled, 0)::DOUBLE / n_exact AS recall
    FROM n_bf LEFT JOIN n_hit ON n_bf.query_id = n_hit.query_id
    """


_register_recall_oracle()


PQ_M = 8        # subspaces
PQ_DSUB = 8     # dims per subspace (8 x 8 = 64-dim embeddings)
PQ_K = 16       # centroids per subspace codebook (vec_id < 16)


def _pq_subvectors() -> F.Column:
    """Array of {PQ_M} double sub-vectors sliced from `embedding`."""
    emb_d = V.to_double_array(F.col("embedding"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda j: F.slice(emb_d, j * PQ_DSUB + 1, PQ_DSUB),
    )


def _pq_subcodebook(e: DataFrame) -> DataFrame:
    """(centroid_id, j, c_sub) — the per-subspace codebook rows."""
    return e.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.posexplode(_pq_subvectors()).alias("j", "c_sub"),
    )


def _pq_codes(e: DataFrame) -> DataFrame:
    """(vec_id, j, code): nearest sub-centroid per subspace, cosine
    metric, deterministic tiebreak — the Spark twin of pq_codes."""
    cb = _pq_subcodebook(e)
    vs = e.select("vec_id", F.posexplode(_pq_subvectors()).alias("j", "v_sub"))
    scored = vs.join(F.broadcast(cb), "j").select(
        "vec_id", "j", "centroid_id",
        F.round(V.cosine(F.col("v_sub"), F.col("c_sub")), 6).alias("sim"),
    )
    w = W.partitionBy("vec_id", "j").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "j", F.col("centroid_id").alias("code"))
    )


_PQ_CODES_SQL = f"""
    cb AS (
      SELECT c.vec_id AS centroid_id, u.j,
             (c.embedding::DOUBLE[])[u.j*{PQ_DSUB}+1 : u.j*{PQ_DSUB}+{PQ_DSUB}]
               AS c_sub
      FROM embeddings c,
           LATERAL (SELECT unnest(range(0, {PQ_M})) AS j) u
      WHERE c.vec_id < {PQ_K}
    ), vs AS (
      SELECT e.vec_id, u.j,
             (e.embedding::DOUBLE[])[u.j*{PQ_DSUB}+1 : u.j*{PQ_DSUB}+{PQ_DSUB}]
               AS v_sub
      FROM embeddings e,
           LATERAL (SELECT unnest(range(0, {PQ_M})) AS j) u
    ), pq_scored AS (
      SELECT v.vec_id, v.j, cb.centroid_id,
             row_number() OVER (
               PARTITION BY v.vec_id, v.j
               ORDER BY round(list_cosine_similarity(v.v_sub, cb.c_sub), 6)
                 DESC, cb.centroid_id
             ) AS rn
      FROM vs v JOIN cb ON v.j = cb.j
    ), pq_codes AS (
      SELECT vec_id, j, centroid_id AS code FROM pq_scored WHERE rn = 1
    )
"""


@register(
    "similarity_pq_encode",
    oracle=V.hygiene_oracle(f"""
    WITH {_PQ_CODES_SQL}
    SELECT vec_id,
           {', '.join(
               f"max(CASE WHEN j = {j} THEN code END) AS code{j}"
               for j in range(PQ_M)
           )}
    FROM pq_codes GROUP BY vec_id
    """),
)
def similarity_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al., IVF-PQ's compression half):
    split every {PQ_M * PQ_DSUB}-dim embedding into {PQ_M} sub-vectors
    and replace each with the id of its nearest codebook centroid
    (deterministic codebook: the first {PQ_K} vectors, cosine metric —
    the inner-product quantizer), compressing each vector to {PQ_M}
    byte-sized codes for ADC scanning.

    Scale shape: the codebook ({PQ_K}×{PQ_M} sub-vectors) broadcasts, so
    scoring is a map-side equi-join on the subspace index — the big side
    is exploded ×{PQ_M} but never shuffled until the argmin window keyed
    (vec_id, j), which WindowGroupLimit prunes to the top row before the
    exchange; the final pivot is one partial-agg groupBy.  No pair of
    data vectors is ever compared."""
    from mediawiki_to_notion_spark.plans.pipeline import ensure_parallelism

    e = ensure_parallelism(
        V.hygiene(load_table(spark, "embeddings", sf_dir))
    )
    codes = _pq_codes(e)
    return codes.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("j") == j, F.col("code"))).alias(f"code{j}")
            for j in range(PQ_M)
        ]
    )


PQ_QUERIES = 5   # query vectors: vec_id < 5
PQ_TOP_K = 10


@register(
    "similarity_pq_adc",
    oracle=V.hygiene_oracle(f"""
    WITH {_PQ_CODES_SQL},
    lut AS (
      SELECT q.vec_id AS query_id, q.j, cb.centroid_id AS code,
             round(list_cosine_similarity(q.v_sub, cb.c_sub), 6) AS sim
      FROM vs q JOIN cb ON q.j = cb.j
      WHERE q.vec_id < {PQ_QUERIES}
    ), adc AS (
      SELECT l.query_id, c.vec_id,
             CAST(sum(CAST(l.sim AS DECIMAL(18,6))) AS DOUBLE) AS score
      FROM pq_codes c JOIN lut l ON c.j = l.j AND c.code = l.code
      WHERE c.vec_id != l.query_id
      GROUP BY l.query_id, c.vec_id
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rn
      FROM adc
    )
    SELECT query_id, vec_id, score FROM ranked WHERE rn <= {PQ_TOP_K}
    """),
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation over PQ codes (the query half of
    IVF-PQ): each query builds a {PQ_M}×{PQ_K} lookup table of
    sub-vector similarities against the codebook, and every database
    vector is scored by summing {PQ_M} table lookups addressed by its
    codes — the compressed-domain scan that never touches the original
    vectors.

    Scale shape: the LUT ({PQ_QUERIES}×{PQ_M}×{PQ_K} rows) broadcasts,
    so scoring is a map-side equi-join on (j, code) over the codes
    table followed by one partial-agg shuffle keyed (query_id, vec_id);
    top-k is a per-query window.  Exact-sum parity: per-lookup sims are
    6-dp rounded then summed as DECIMAL(18,6)."""
    from mediawiki_to_notion_spark.plans.pipeline import ensure_parallelism

    e = ensure_parallelism(
        V.hygiene(load_table(spark, "embeddings", sf_dir))
    )
    codes = _pq_codes(e)
    cb = _pq_subcodebook(e)
    qs = e.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(_pq_subvectors()).alias("j", "q_sub"),
    )
    lut = qs.join(F.broadcast(cb), "j").select(
        "query_id", "j",
        F.col("centroid_id").alias("code"),
        F.round(V.cosine(F.col("q_sub"), F.col("c_sub")), 6).alias("sim"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["j", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum(F.col("sim").cast("decimal(18,6)"))
            .cast("double").alias("score")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOP_K)
        .drop("rn")
    )


RRF_K = 60       # the standard reciprocal-rank-fusion constant
RRF_TOP = 15


@register("hybrid_search_rrf", oracle=None)  # assembled below from parts
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 lexical top-k and the dense
    cosine top-k (query vector 0) by reciprocal-rank fusion,
    score = Σ 1/({RRF_K}+rank) — the standard RAG-stack retriever that
    needs no score calibration between the two systems.

    Both operands are the already-registered queries, so the fusion
    shares one plan library with its parts; the rank windows run over
    already-top-k'd (tiny) inputs and the fusion is a full outer join
    on doc id — nothing here touches the corpus again."""
    from mediawiki_to_notion_spark.operators.text_analysis import (
        keyword_search_bm25,
    )

    lex = keyword_search_bm25(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    dense = (
        similarity_topk_bruteforce(spark, sf_dir)
        .filter(F.col("query_id") == 0)
        # the per-query top-k already bounds this to TOP_K rows; the
        # explicit limit makes the bound *physical* (GlobalLimit in the
        # plan) so the global dense-rank window below is provably tiny —
        # the blanket no-unpartitioned-corpus-window gate checks this
        .limit(TOP_K)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(W.orderBy(F.desc("cosine_r"), F.asc("vec_id")))
            .alias("dense_rank"),
        )
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id", "lex_rank", "dense_rank", rrf.alias("rrf_score")
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(RRF_TOP)


def _register_rrf_oracle() -> None:
    """Called from load_all() once every module is imported: the fusion
    oracle embeds the BM25 oracle, which text_analysis registers after
    this module in import order."""
    from mediawiki_to_notion_spark.operators.registry import ORACLES

    ORACLES["hybrid_search_rrf"] = f"""
    WITH bm AS ({_subquery("keyword_search_bm25")}),
    lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM bm
    ),
    bf AS ({_subquery("similarity_topk_bruteforce")}),
    dr AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY cosine_r DESC, vec_id) AS dense_rank
      FROM bf WHERE query_id = 0
    )
    SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank,
           coalesce(1.0::DOUBLE / ({RRF_K} + l.lex_rank), 0.0)
           + coalesce(1.0::DOUBLE / ({RRF_K} + d.dense_rank), 0.0) AS rrf_score
    FROM lexr l FULL JOIN dr d ON l.doc_id = d.doc_id
    ORDER BY rrf_score DESC, coalesce(l.doc_id, d.doc_id)
    LIMIT {RRF_TOP}
    """


N_NEGATIVES = 3  # hard negatives per anchor (ranks 2..4 in-bucket)


@register(
    "contrastive_triplet_mining",
    oracle=None,  # assembled below from the bucketed-candidate oracle
)
def contrastive_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR / SimCSE
    data prep): per anchor, the in-bucket nearest neighbour is the
    positive and the next {N_NEGATIVES} ranks are the hard negatives —
    near the anchor in the ANN index, so they carry actual training
    signal, unlike random negatives.

    Composed from similarity_lsh_bucketed's candidate set (same SRP
    buckets the index serves), so mining cost is the index probe plus
    two tiny windows — nothing new shuffles at corpus scale.  Anchors
    whose bucket has no further candidates emit an empty negative
    list, deterministically."""
    cand = similarity_lsh_bucketed(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine_r"), F.asc("vec_id")
    )
    ranked = cand.withColumn("rn", F.row_number().over(w))
    pos = ranked.filter(F.col("rn") == 1).select(
        F.col("query_id").alias("anchor_id"),
        F.col("vec_id").alias("positive_id"),
        F.col("cosine_r").alias("positive_cos"),
    )
    negs = (
        ranked.filter(
            (F.col("rn") >= 2) & (F.col("rn") <= 1 + N_NEGATIVES)
        )
        .groupBy(F.col("query_id").alias("anchor_id"))
        .agg(
            # rank-ordered negatives as a space-joined string: scalar,
            # driver-hashable (list columns crash the pandas
            # canonicalizer, CORRECTNESS_r03), and the usual TSV shape
            # of a mined-triplet export
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("vec_id")))
                    ),
                    lambda s: s["vec_id"].cast("string"),
                ),
                " ",
            ).alias("neg_ids"),
            F.count(F.lit(1)).alias("n_negatives"),
        )
    )
    return pos.join(negs, "anchor_id", "left").select(
        "anchor_id", "positive_id", "positive_cos",
        F.coalesce(F.col("neg_ids"), F.lit("")).alias("neg_ids"),
        F.coalesce(F.col("n_negatives"), F.lit(0)).alias("n_negatives"),
    )


def _register_triplet_oracle() -> None:
    from mediawiki_to_notion_spark.operators.registry import ORACLES

    ORACLES["contrastive_triplet_mining"] = f"""
    WITH lsh AS ({_subquery("similarity_lsh_bucketed")}),
    ranked AS (
      SELECT query_id, vec_id, cosine_r,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_r DESC, vec_id) AS rn
      FROM lsh
    ),
    pos AS (
      SELECT query_id AS anchor_id, vec_id AS positive_id,
             cosine_r AS positive_cos
      FROM ranked WHERE rn = 1
    ),
    negs AS (
      SELECT query_id AS anchor_id,
             string_agg(vec_id, ' ' ORDER BY rn) AS neg_ids,
             count(*) AS n_negatives
      FROM ranked WHERE rn BETWEEN 2 AND {1 + N_NEGATIVES}
      GROUP BY query_id
    )
    SELECT pos.anchor_id, positive_id, positive_cos,
           coalesce(neg_ids, '') AS neg_ids,
           coalesce(n_negatives, 0) AS n_negatives
    FROM pos LEFT JOIN negs USING (anchor_id)
    """


_register_triplet_oracle()


@register("knn_label_predict", oracle=None)  # assembled below
def knn_label_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the ANN index: each query vector's
    label is predicted by majority vote of its in-bucket top-k
    neighbours' labels (ties break to the smaller label id), and
    compared to its true label — the classify-by-similarity op (and
    the eval harness for embedding quality) running entirely on the
    SRP bucket probe.

    Scale shape: the candidate set IS similarity_lsh_bucketed's output
    (top-{TOP_K} per query); voting adds a broadcast label join and
    two tiny windows."""
    cand = similarity_lsh_bucketed(spark, sf_dir)
    e = load_table(spark, "embeddings", sf_dir)
    # a neighbour with an unknown label cannot vote (and engines also
    # disagree on NULL placement in the tie-break order — NULLS FIRST
    # in Spark asc vs NULLS LAST in SQL: the NULL-injection sweep
    # caught a NULL "label" winning the vote on one engine only)
    labels = e.filter(F.col("label").isNotNull()).select("vec_id", "label")
    votes = (
        cand.join(labels, "vec_id")
        .groupBy(F.col("query_id"), F.col("label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("pred_label")
    )
    pred = votes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    # truth side stays UNfiltered: a query whose own label is unknown
    # still gets its prediction (is_correct = NULL), matching the oracle
    truth = e.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        "query_id", "true_label", "pred_label", "n_votes",
        (F.col("pred_label") == F.col("true_label")).alias("is_correct"),
    )


def _register_knn_oracle() -> None:
    from mediawiki_to_notion_spark.operators.registry import ORACLES

    ORACLES["knn_label_predict"] = f"""
    WITH lsh AS ({_subquery("similarity_lsh_bucketed")}),
    votes AS (
      SELECT l.query_id, e.label AS pred_label, count(*) AS n_votes
      FROM lsh l JOIN embeddings e ON l.vec_id = e.vec_id
      WHERE e.label IS NOT NULL
      GROUP BY l.query_id, e.label
    ),
    pred AS (
      SELECT query_id, pred_label, n_votes,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, pred_label) AS rn
      FROM votes
    )
    SELECT p.query_id, e.label AS true_label, pred_label, n_votes,
           pred_label = e.label AS is_correct
    FROM pred p JOIN embeddings e ON p.query_id = e.vec_id
    WHERE rn = 1
    """


_register_knn_oracle()


MRL_TIERS = (8, 16, 32)   # truncation tiers vs the full 64-dim truth
MRL_QUERIES = 20
MRL_K = 10


def _mrl_scored_sql() -> str:
    tiers = list(MRL_TIERS) + [64]
    parts = []
    for d in tiers:
        sl = f"[1:{d}]" if d < 64 else ""
        parts.append(f"""SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {d} AS tier,
             round(list_cosine_similarity(
               (q.embedding{sl})::DOUBLE[], (c.embedding{sl})::DOUBLE[]
             ), 6) AS cosine_r
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {MRL_QUERIES}""")
    return "\n      UNION ALL ".join(parts)


@register(
    "embedding_matryoshka_recall",
    oracle=V.hygiene_oracle(f"""
    WITH scored AS (
      {_mrl_scored_sql()}
    ),
    ranked AS (
      SELECT query_id, vec_id, tier,
             row_number() OVER (PARTITION BY query_id, tier
                                ORDER BY cosine_r DESC, vec_id) AS rn
      FROM scored
    ),
    truth AS (
      SELECT query_id, vec_id FROM ranked WHERE tier = 64 AND rn <= {MRL_K}
    ),
    approx AS (
      SELECT query_id, vec_id, tier FROM ranked
      WHERE tier != 64 AND rn <= {MRL_K}
    )
    SELECT a.query_id, a.tier AS dim_tier,
           CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
           round(count(t.vec_id)::DOUBLE / {MRL_K}, 6) AS recall_at_k
    FROM approx a LEFT JOIN truth t
      ON t.query_id = a.query_id AND t.vec_id = a.vec_id
    GROUP BY a.query_id, a.tier
    """),
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation eval: for each query vector, exact
    cosine top-{MRL_K} under PREFIX dimensions {MRL_TIERS} versus the
    full 64-dim ground truth, reported as recall@{MRL_K} per (query,
    tier) — the measurement that decides how far stored embeddings can
    be truncated (for cheap first-stage retrieval or index shrink)
    before ranking quality collapses (Kusupati et al. 2022).

    100 TB shape (r7 rewrite, VERDICT r6 "What's wrong" #2): all tier
    cosines are COLUMNS of one candidate pass — a single Arrow kernel
    accumulates the dot/norm sums dimension-sequentially and snapshots
    them at each tier boundary, so the 8-dim prefix work is shared by
    the 16/32/64 tiers instead of re-folded per tier, and no 4x
    struct-array explode ever multiplies the candidate rows.  Per-tier
    rank is then 4 row_numbers over the SAME query_id partitioning —
    one exchange, 4 in-partition sorts of N rows (vs one sort of 4N
    exploded rows); only the ~queries x tiers x k surviving top-k rows
    are exploded into (tier, rank) form for the overlap join."""
    import numpy as np
    import pandas as pd

    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    q = e.filter(F.col("vec_id") < MRL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select("vec_id", "embedding")
    tiers = list(MRL_TIERS) + [64]
    cand = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")) \
        .select("query_id", "vec_id", "q_emb", "embedding")

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.stack(pdf["q_emb"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = len(pdf)
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            out = {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"]}
            next_tier = 0
            for k in range(A.shape[1]):  # left-fold order, engine-identical
                dot += A[:, k] * B[:, k]
                na += A[:, k] * A[:, k]
                nb += B[:, k] * B[:, k]
                if next_tier < len(tiers) and k + 1 == tiers[next_tier]:
                    out[f"cos{tiers[next_tier]}"] = (
                        dot / (np.sqrt(na) * np.sqrt(nb)))
                    next_tier += 1
            yield pd.DataFrame(out)

    schema = "query_id BIGINT, vec_id BIGINT, " + ", ".join(
        f"cos{d} DOUBLE" for d in tiers)
    scored = cand.mapInPandas(score, schema).select(
        "query_id", "vec_id",
        *[F.round(F.col(f"cos{d}"), 6).alias(f"cos{d}") for d in tiers],
    )
    r = scored
    for d in tiers:
        wd = W.partitionBy("query_id").orderBy(
            F.desc(f"cos{d}"), F.asc("vec_id"))
        r = r.withColumn(f"rn{d}", F.row_number().over(wd))
    r = r.filter(
        functools.reduce(
            lambda acc, d: acc | (F.col(f"rn{d}") <= MRL_K), tiers[1:],
            F.col(f"rn{tiers[0]}") <= MRL_K,
        )
    )
    tier_hits = F.filter(
        F.array(*[
            F.struct(F.lit(d).alias("tier"), F.col(f"rn{d}").alias("rn"))
            for d in tiers
        ]),
        lambda s: s["rn"] <= MRL_K,
    )
    # r10 (guide §2.4): ~queries x tiers x k rows — materialize before
    # the truth/approx split, whose two subtrees otherwise re-run the
    # whole candidate Arrow kernel + 4 row_number windows TWICE (the
    # before-plan shows 2 MapInPandas + 8 Window nodes; after: 1 + 4).
    ranked = r.select(
        "query_id", "vec_id", F.explode(tier_hits).alias("tc")
    ).select(
        "query_id", "vec_id", F.col("tc.tier").alias("tier")
    ).localCheckpoint()
    truth = ranked.filter(F.col("tier") == 64).select(
        F.col("query_id").alias("t_query"), F.col("vec_id").alias("t_vec")
    )
    approx = ranked.filter(F.col("tier") != 64) \
        .select("query_id", "vec_id", "tier")
    joined = approx.join(
        F.broadcast(truth),
        (F.col("query_id") == F.col("t_query"))
        & (F.col("vec_id") == F.col("t_vec")),
        "left",
    ).select("query_id", "vec_id", "tier", "t_vec")
    return (
        joined.groupBy("query_id", F.col("tier").alias("dim_tier"))
        .agg(
            F.count("t_vec").alias("n_overlap"),
            F.round(F.count("t_vec").cast("double") / MRL_K, 6)
            .alias("recall_at_k"),
        )
    )


# --- MMR diversified re-ranking ----------------------------------------

MMR_C = 16            # relevance-ranked candidate pool per query
MMR_K = 5             # diversified results selected per query
MMR_LAMBDA_NUM = 7    # lambda = 0.7 as the exact integer pair (7, 3)
MMR_DIV_NUM = 3       # score_u = 7*rel_u - 3*maxsim_u (micro-units x10)


def _mmr_oracle() -> str:
    cands = f"""
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             CAST(round(round(list_cosine_similarity(
               q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) * 1000000)
               AS BIGINT) AS rel_u
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), cands AS (
      SELECT query_id, vec_id, rel_u FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel_u DESC, vec_id) AS rn
        FROM scored) WHERE rn <= {MMR_C}
    ), sims AS (
      SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
             CAST(round(round(list_cosine_similarity(
               ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) * 1000000)
               AS BIGINT) AS sim_u
      FROM cands a
      JOIN cands b ON a.query_id = b.query_id AND a.vec_id != b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ), sel0 AS (
      SELECT query_id, vec_id, rel_u,
             CAST({MMR_LAMBDA_NUM} * rel_u AS BIGINT) AS score_u,
             0 AS step
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY rel_u DESC, vec_id) AS rn
            FROM cands) WHERE rn = 1
    )"""
    levels = []
    for i in range(1, MMR_K):
        prev = " UNION ALL ".join(f"SELECT * FROM sel{j}" for j in range(i))
        levels.append(f"""
    prev{i} AS ({prev}),
    scored{i} AS (
      SELECT c.query_id, c.vec_id, c.rel_u,
             CAST({MMR_LAMBDA_NUM} * c.rel_u - {MMR_DIV_NUM} * max(s.sim_u)
                  AS BIGINT) AS score_u
      FROM cands c
      JOIN prev{i} p ON p.query_id = c.query_id AND p.vec_id != c.vec_id
      JOIN sims s ON s.query_id = c.query_id AND s.va = c.vec_id
                 AND s.vb = p.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM prev{i} q
                        WHERE q.query_id = c.query_id
                          AND q.vec_id = c.vec_id)
      GROUP BY c.query_id, c.vec_id, c.rel_u
    ),
    sel{i} AS (
      SELECT query_id, vec_id, rel_u, score_u, {i} AS step
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY score_u DESC, vec_id) AS rn
            FROM scored{i}) WHERE rn = 1
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM sel{j}" for j in range(MMR_K))
    body = f"""
    WITH {cands},{','.join(levels)}
    SELECT query_id, CAST(step AS BIGINT) AS step, vec_id, rel_u, score_u
    FROM ({union})
    """
    return V.hygiene_oracle(body)


def _mmr_greedy_select(cands_pdf, sims_pdf):
    """Per-query greedy MMR walk, the exact integer recurrence of the
    unrolled-SQL oracle: step 0 picks argmax rel_u (ties to smaller
    vec_id), step i picks argmax 7*rel_u - 3*max(sim_u to selected).
    State is <= MMR_C rows per query — a Python loop IS the right
    physical plan; int64 in, int64 out, no floats anywhere."""
    import pandas as pd

    if len(cands_pdf) == 0:
        return pd.DataFrame(
            columns=["query_id", "step", "vec_id", "rel_u", "score_u"])
    qid = int(cands_pdf["query_id"].iloc[0])
    rel = {int(r.vec_id): int(r.rel_u) for r in cands_pdf.itertuples()}
    sim: dict[tuple[int, int], int] = {
        (int(r.va), int(r.vb)): int(r.sim_u) for r in sims_pdf.itertuples()
    }
    selected: list[int] = []
    rows = []
    for step in range(MMR_K):
        best = None
        for v, r in rel.items():
            if v in selected:
                continue
            if step == 0:
                score = MMR_LAMBDA_NUM * r
            else:
                pair_sims = [sim[(v, s)] for s in selected if (v, s) in sim]
                if not pair_sims:  # inner-join semantics of the oracle
                    continue
                score = MMR_LAMBDA_NUM * r - MMR_DIV_NUM * max(pair_sims)
            if best is None or (score, -v) > (best[0], -best[1]):
                best = (score, v, r)
        if best is None:
            break
        rows.append((qid, step, best[1], best[2], best[0]))
        selected.append(best[1])
    return pd.DataFrame(
        rows, columns=["query_id", "step", "vec_id", "rel_u", "score_u"])


@register("similarity_mmr_rerank", oracle=_mmr_oracle())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the diversified top-k every RAG retrieval stack runs
    between ANN candidate generation and the context window: greedily
    select argmax of lambda*relevance - (1-lambda)*max-similarity-to-
    already-selected, so near-duplicate passages don't crowd out
    coverage.  Per query: top-{MMR_C} relevance candidates, {MMR_K}
    MMR selections at lambda 0.7.

    Exact cross-engine arithmetic: cosines round to 6 dp then become
    integer MICRO-UNITS; the MMR objective is the pure-int64
    score_u = {MMR_LAMBDA_NUM}*rel_u - {MMR_DIV_NUM}*maxsim_u
    (lambda x10), ties to the smaller vec_id — no float comparison
    anywhere in the selection, so the greedy path is deterministic in
    both engines.  The greedy recurrence is UNROLLED into {MMR_K}
    explicit levels in both engines (the unigram-LM materialized-DP
    discipline): each level is one anti-membership join + per-query
    max-sim aggregate + a rank-1 window.

    100 TB shape: candidate generation is the broadcast-query
    brute-force pass (swap in the SRP/IVF path for web-scale corpora —
    MMR only ever sees the top-{MMR_C} pool); everything after is
    bounded by queries x {MMR_C} rows ({MMR_C}^2 pair sims per query),
    localCheckpointed once so the {MMR_K} level plans don't re-derive
    the corpus scan."""
    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    rel_u = F.round(
        F.round(V.cosine(F.col("q_emb"), F.col("embedding")), 6) * 1_000_000
    ).cast("long")
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "embedding", rel_u.alias("rel_u"))
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("rel_u"), F.asc("vec_id"))
    cands = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= MMR_C)
        .drop("rn")
        .localCheckpoint()  # bounded: N_QUERIES x MMR_C rows
    )
    a = cands.select("query_id", F.col("vec_id").alias("va"),
                     F.col("embedding").alias("ea"))
    b = cands.select("query_id", F.col("vec_id").alias("vb"),
                     F.col("embedding").alias("eb"))
    sim_u = F.round(
        F.round(V.cosine(F.col("ea"), F.col("eb")), 6) * 1_000_000
    ).cast("long")
    sims = (
        a.join(b, ["query_id"])
        .filter(F.col("va") != F.col("vb"))
        .select("query_id", "va", "vb", sim_u.alias("sim_u"))
        # bounded (N_QUERIES x MMR_C^2 rows); also disambiguates the
        # cogroup below, whose two sides otherwise share cands' lineage
        .localCheckpoint()
    )
    cands_slim = cands.select("query_id", "vec_id", "rel_u")
    # The greedy MMR_K-step selection is PURE int64 arithmetic over a
    # per-query state of <= MMR_C rows — r7's 5 unrolled level plans
    # (anti-join + agg + rank-1 window each) cost ~6.8 s of FIXED plan
    # overhead at every scale (soak exp -0.04).  One cogrouped
    # applyInPandas replays the identical integer recurrence per query
    # (no floats touch the selection path, so the oracle's unrolled-SQL
    # greedy walk stays bit-identical); everything float-parity-
    # critical (cosine rounding) stays in the Spark columns above.
    out = cands_slim.groupBy("query_id").cogroup(
        sims.groupBy("query_id")
    ).applyInPandas(
        _mmr_greedy_select,
        "query_id long, step long, vec_id long, rel_u long, score_u long",
    )
    return out.select("query_id", "step", "vec_id", "rel_u", "score_u")


# --- Rocchio pseudo-relevance feedback -----------------------------------

PRF_K = 8             # feedback depth (round-1 docs folded into q')
PRF_TOP = 10          # re-ranked results returned per query
# beta/|Dr| = 0.75/8 = 3/32: exact in binary AND in DECIMAL(7,5), so the
# expanded query is bit-identical cross-engine (alpha = 1)
PRF_BETA_OVER_K = "0.09375"


def _prf_oracle() -> str:
    body = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), rel AS (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(
               q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS rel_r
      FROM q JOIN embeddings c ON c.vec_id != q.query_id
    ), fb AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel_r DESC, vec_id) AS rn
        FROM rel) WHERE rn <= {PRF_K}
    ), cent AS (
      SELECT f.query_id, u.k,
             sum(CAST(round(e.embedding[u.k + 1]::DOUBLE, 6)
                      AS DECIMAL(18,6))) AS s
      FROM fb f
      JOIN embeddings e ON e.vec_id = f.vec_id,
           LATERAL (SELECT unnest(range(0, {V.EMB_DIM})) AS k) u
      GROUP BY f.query_id, u.k
    ), qexp AS (
      SELECT c.query_id,
             list(CAST(CAST(round(q.embedding[c.k + 1]::DOUBLE, 6)
                            AS DECIMAL(18,6))
                       + CAST({PRF_BETA_OVER_K} AS DECIMAL(7,5)) * c.s
                       AS DOUBLE) ORDER BY c.k) AS emb
      FROM cent c JOIN q ON q.query_id = c.query_id
      GROUP BY c.query_id
    ), scored2 AS (
      SELECT x.query_id, c.vec_id,
             round(list_cosine_similarity(x.emb, c.embedding::DOUBLE[]), 6)
               AS cos_exp_r
      FROM qexp x JOIN embeddings c ON c.vec_id != x.query_id
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, cos_exp_r
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_exp_r DESC, vec_id) AS rn
          FROM scored2)
    WHERE rn <= {PRF_TOP}
    """
    return V.hygiene_oracle(body)


@register("similarity_prf_rocchio", oracle=_prf_oracle())
def similarity_prf_rocchio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback (Rocchio 1971, the classic
    query-expansion loop every retrieval stack still runs): take the
    round-1 top-{PRF_K} by cosine, fold their centroid into the query
    (q' = q + 0.75 * centroid, i.e. alpha 1, beta 0.75), and re-rank
    the corpus against q' — documents sharing structure with the
    feedback set surface even when the ORIGINAL query missed them
    entirely (the vocabulary/modality-mismatch case pinned in
    tests/test_prf_rocchio.py: a doc orthogonal to q enters the
    expanded top-{PRF_TOP}).

    Cross-engine exactness of q': embedding components quantize
    through round(x, 6) -> DECIMAL(18,6) (the proven two-step), the
    centroid sum is a DECIMAL aggregate (order-independent), and the
    blend multiplies by DECIMAL {PRF_BETA_OVER_K} = 3/32 exactly — so
    both engines cast bit-identical expanded queries to double before
    the (already-pinned) 6-dp cosine fold.  Floats never accumulate
    in engine-dependent order.

    100 TB shape: two broadcast-query corpus passes (round-1 scoring,
    round-2 re-scoring) — the same slope as similarity_topk_bruteforce,
    with the SRP/IVF probe as the drop-in candidate path at web scale;
    everything between them (feedback set, centroid, q') is bounded by
    queries x {PRF_K} x {V.EMB_DIM} rows."""
    from decimal import Decimal

    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    rel = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "embedding",
            F.round(V.cosine(F.col("q_emb"), F.col("embedding")), 6)
            .alias("rel_r"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("rel_r"), F.asc("vec_id"))
    fb = (
        rel.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= PRF_K)
        .select("query_id", F.posexplode("embedding").alias("k", "v"))
    )
    cent = fb.groupBy("query_id", "k").agg(
        F.sum(
            F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)")
        ).alias("s")
    )
    q_comp = q.select("query_id", F.posexplode("q_emb").alias("k", "qv"))
    blended = cent.join(q_comp, ["query_id", "k"]).select(
        "query_id", "k",
        (
            F.round(F.col("qv").cast("double"), 6).cast("decimal(18,6)")
            + F.lit(Decimal(PRF_BETA_OVER_K)) * F.col("s")
        ).cast("double").alias("xv"),
    )
    qexp = (
        blended.groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("k"), F.col("xv")))
                ),
                lambda st: st["xv"],
            ).alias("emb")
        )
    )
    scored2 = (
        e.join(F.broadcast(qexp), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(V.cosine(F.col("emb"), F.col("embedding")), 6)
            .alias("cos_exp_r"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("cos_exp_r"), F.asc("vec_id")
    )
    return (
        scored2.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= PRF_TOP)
        .select(
            "query_id", F.col("rn").cast("long").alias("rank"),
            "vec_id", "cos_exp_r",
        )
    )


# --- Embedding dimension health audit ------------------------------------

DIM_DEAD_VAR_MICRO = 100  # var < 1e-4 in micro-units = a dead dimension


@register(
    "embedding_dim_variance_audit",
    oracle=V.hygiene_oracle(f"""
    WITH comp AS (
      SELECT u.k,
             CAST(round(embedding[u.k + 1]::DOUBLE, 6) AS DECIMAL(18,6)) AS v
      FROM embeddings,
           LATERAL (SELECT unnest(range(0, {V.EMB_DIM})) AS k) u
    ), agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s1, sum(v * v) AS s2
      FROM comp GROUP BY k
    )
    SELECT k AS dim,
           CAST(round((n * s2 - s1 * s1)::DOUBLE / (n::DOUBLE * n) * 1000000)
                AS BIGINT) AS var_micro,
           CAST(round(s1::DOUBLE / n * 1000000) AS BIGINT) AS mean_micro,
           round((n * s2 - s1 * s1)::DOUBLE / (n::DOUBLE * n) * 1000000)
             < {DIM_DEAD_VAR_MICRO} AS is_dead,
           CAST(row_number() OVER (
             ORDER BY round((n * s2 - s1 * s1)::DOUBLE / (n::DOUBLE * n)
                            * 1000000) DESC, k) AS BIGINT) AS variance_rank
    FROM agg
    """),
)
def embedding_dim_variance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding variance audit — the representation-
    collapse / anisotropy monitor an embedding pipeline checks after
    every encoder change: a dimension whose variance is ~0 is DEAD
    (wasted storage, and under cosine it biases every similarity the
    same direction), and a few dimensions holding most variance means
    the effective dimensionality is far below the nominal {V.EMB_DIM}
    (the anisotropy problem motivating whitening and Matryoshka
    truncation — this audit says how far embedding_matryoshka_recall
    can cut).  Output: per dimension, mean and variance in micro-units,
    a dead flag, and the variance rank.

    Exactness: components quantize round(x,6) -> DECIMAL(18,6) (the
    PRF pattern), so s1/s2 are exact order-independent decimal sums
    and variance = (n*s2 - s1^2)/n^2 divides exact operands once.

    100 TB shape: ONE corpus pass exploding each vector to (k, v)
    pairs feeding a map-side-partial groupBy(k) — {V.EMB_DIM} output
    rows; the ranking window runs over those {V.EMB_DIM} rows."""
    e = V.hygiene(load_table(spark, "embeddings", sf_dir))
    comp = e.select(
        F.posexplode("embedding").alias("k", "raw")
    ).select(
        "k",
        F.round(F.col("raw").cast("double"), 6)
        .cast("decimal(18,6)").alias("v"),
    )
    agg = comp.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    var_micro_raw = F.round(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n").cast("double") * F.col("n")) * 1_000_000
    )
    return agg.select(
        F.col("k").alias("dim"),
        var_micro_raw.cast("long").alias("var_micro"),
        F.round(F.col("s1").cast("double") / F.col("n") * 1_000_000)
        .cast("long").alias("mean_micro"),
        (var_micro_raw < DIM_DEAD_VAR_MICRO).alias("is_dead"),
        F.row_number().over(
            W.orderBy(F.desc(var_micro_raw), F.asc("k"))
        ).cast("long").alias("variance_rank"),
    )
