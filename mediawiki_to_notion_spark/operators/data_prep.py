r"""Corpus-preparation operators beyond dedup/quality: paragraph-level
dedup with document reassembly, PII redaction, n-gram novelty scoring,
and int8 embedding quantization (north-star extensions — the remaining
standard stages of a pretraining data pipeline).

Scale notes per operator are in the docstrings; the common theme is one
hash-partitioned shuffle on the natural key (chunk hash / shingle hash /
vec_id) plus broadcast for anything corpus-global (per-dimension ranges,
match counts), mirroring the shapes pinned in test_plan_quality.py.

Cross-engine parity: chunk text and positions are compared raw (no
floats); ratios are single divisions of exact integers rounded once;
quantization arithmetic fixes the operation order ``((val - lo) /
(hi - lo)) * 255`` so Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.operators.dedup import _SHINGLES_SQL, _hashed_shingles
from mediawiki_to_notion_spark.operators.registry import register
from mediawiki_to_notion_spark.sources.tables import load_table

CHUNK_WORDS = 16        # "paragraph" = 16-word window (synthetic docs have
                        # no newlines; real corpora would split on \n\n)
# Survivor keys are lexicographic (doc_id, chunk_idx) STRUCT mins, never
# doc_id*BASE+idx composite integers: a composite aliases across
# documents once any document exceeds BASE chunks (VERDICT r5 flagged
# exactly this class in dedup_substring_cut).


@register(
    "dedup_paragraph_chunks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id, u.i AS chunk_idx,
             array_to_string(
               t[u.i*{CHUNK_WORDS}+1 : u.i*{CHUNK_WORDS}+{CHUNK_WORDS}], ' '
             ) AS chunk
      FROM toks, LATERAL (
        SELECT unnest(range(0, ((len(t)-1)//{CHUNK_WORDS})+1)) AS i) u
    ),
    firsts AS (
      SELECT chunk, min({{'doc_id': doc_id, 'chunk_idx': chunk_idx}}) AS first_pos
      FROM chunks GROUP BY chunk
    ),
    occ AS (
      SELECT doc_id, chunk_idx, chunk,
             {{'doc_id': doc_id, 'chunk_idx': chunk_idx}} = first_pos AS kept
      FROM chunks JOIN firsts USING (chunk)
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           count(*) FILTER (kept) AS n_kept,
           coalesce(
             string_agg(chunk, ' ' ORDER BY chunk_idx) FILTER (kept), ''
           ) AS dedup_text
    FROM occ GROUP BY doc_id
    """,
)
def dedup_paragraph_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with reassembly (CCNet §3.1 / Dolma's
    paragraph dedup): split every document into {CHUNK_WORDS}-word
    chunks, keep only the globally FIRST occurrence of each chunk
    (ordered by doc_id then position), and rebuild each document from
    its surviving chunks.

    Reference parity: the reference dedups whole uploads by content key
    (process-mw-dump.py writes one object per page); this is the
    finer-grained variant every pretraining corpus runs.

    100 TB shape: chunking is a linear scan (no shuffle); first-occurrence
    is ONE groupBy on the chunk text with a map-side partial min; the
    join back is on the same key so AQE reuses the hash partitioning;
    reassembly is one shuffle on doc_id.  Never all-pairs, never a
    window over the corpus.  At real scale the chunk string would be
    token_hash60'd before the shuffle (see _hashed_shingles) — kept raw
    here so the oracle compares the exact text."""
    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    n_last = ((F.size("t") - F.lit(1)) / CHUNK_WORDS).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_last),
        lambda i: F.concat_ws(
            " ", F.slice("t", i * CHUNK_WORDS + F.lit(1), F.lit(CHUNK_WORDS))
        ),
    )
    chunks = toks.select(
        "doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    ).withColumn(
        "pos", F.struct("doc_id", "chunk_idx")
    )
    firsts = chunks.groupBy("chunk").agg(F.min("pos").alias("first_pos"))
    occ = chunks.join(firsts, "chunk").withColumn(
        "kept", F.col("pos") == F.col("first_pos")
    )
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("kept"),
                            F.struct(
                                F.col("chunk_idx").alias("chunk_idx"),
                                F.col("chunk").alias("chunk"),
                            ),
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
        ).alias("dedup_text"),
    )


# Same dialect-portable patterns as corpus_quality's detection gate
# (character classes + bounded repetition work identically in Java regex
# and RE2); \b is an ASCII word boundary in both.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


@register(
    "text_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user-' || doc_id::VARCHAR || '@example.com'
                  || ' ip 10.0.' || (doc_id % 256)::VARCHAR || '.'
                  || (doc_id % 100)::VARCHAR
                  || ' phone 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ipv4,
           len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM aug
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact emails / IPv4s / phone numbers
    (the C4 / RefinedWeb cleanup step; corpus_filter_funnel only DETECTS
    PII, this op rewrites the text for release).

    The synthetic corpus contains no organic PII, so each document is
    deterministically augmented with doc_id-derived email/IP/phone
    strings — identically in Spark and the oracle — to exercise the
    extraction and redaction machinery end to end.

    100 TB shape: pure JVM-side regexp expressions inside one
    whole-stage-codegen'd scan; zero shuffles, zero Python.  Redaction
    order (email → IP → phone) is fixed so the passes compose
    identically in both engines."""
    d = load_table(spark, "documents", sf_dir)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user-"), did.cast("string"), F.lit("@example.com"),
        F.lit(" ip 10.0."), (did % 256).cast("string"),
        F.lit("."), (did % 100).cast("string"),
        F.lit(" phone 555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    t = d.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(IPV4_RE), F.lit(0)))
         .alias("n_ipv4"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), F.lit(0)))
         .alias("n_phones"),
        clean.alias("clean_text"),
    )


@register(
    "ngram_novelty_rate",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    firsts AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h)
    SELECT doc_id,
           count(*) AS n_distinct_ngrams,
           count(*) FILTER (first_doc = doc_id) AS n_novel_ngrams,
           round(count(*) FILTER (first_doc = doc_id)::DOUBLE / count(*), 6)
             AS novelty_rate
    FROM sh JOIN firsts USING (h)
    GROUP BY doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's distinct
    word-trigrams whose global first occurrence (min doc_id) is this
    document.  Curriculum/mixture builders use this "new information
    rate" to down-weight documents that only repeat earlier corpus
    content (complement of dedup_containment's pairwise view).

    100 TB shape: one groupBy on the 60-bit shingle hash (map-side
    partial min) + a join back on the SAME key — AQE reuses the hash
    partitioning, so effectively one shuffle — then one doc_id
    aggregate.  Never materializes pairs."""
    d = load_table(spark, "documents", sf_dir)
    sh = _hashed_shingles(d)  # distinct (doc_id, h)
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    joined = sh.join(firsts, "h")
    n_novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        n_novel.alias("n_novel_ngrams"),
    ).select(
        "doc_id", "n_distinct_ngrams", "n_novel_ngrams",
        F.round(
            F.col("n_novel_ngrams").cast("double") / F.col("n_distinct_ngrams"),
            6,
        ).alias("novelty_rate"),
    )


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH dims AS (
      SELECT vec_id, u.i AS dim, embedding[u.i+1]::DOUBLE AS val
      FROM embeddings,
           LATERAL (SELECT unnest(range(0, len(embedding))) AS i) u
    ),
    mm AS (SELECT dim, min(val) AS lo, max(val) AS hi FROM dims GROUP BY dim),
    q AS (
      SELECT vec_id, dim, val, lo, hi,
             CASE WHEN hi = lo THEN 0
                  ELSE round(((val - lo) / (hi - lo)) * 255)::INT END AS code
      FROM dims JOIN mm USING (dim)
    )
    SELECT vec_id,
           string_agg(code, ' ' ORDER BY dim) AS codes,
           round(max(abs(val - (lo + (code / 255.0) * (hi - lo)))), 6)
             AS max_abs_err
    FROM q GROUP BY vec_id
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column: per-dimension
    corpus [min, max] ranges mapped to 0..255 codes, plus the max
    absolute reconstruction error per vector.  The standard 4× memory
    compression before ANN indexing (Faiss SQ8 / vector-DB scalar
    quantization) — complements similarity_pq_* (product quantization)
    with the simpler, exactly-invertible-bounds variant.

    100 TB shape: posexplode is linear; the per-dimension range aggregate
    produces ONE row per dimension (64 here) with map-side partial
    min/max, broadcast back to the exploded stream (no shuffle of the
    big side); the only full shuffle is the final vec_id regroup.  The
    operation order ``((val - lo) / (hi - lo)) * 255`` is fixed —
    see module docstring."""
    e = load_table(spark, "embeddings", sf_dir)
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "valf")
    ).select("vec_id", "dim", F.col("valf").cast("double").alias("val"))
    mm = dims.groupBy("dim").agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    )
    q = dims.join(F.broadcast(mm), "dim").withColumn(
        "code",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.round(
                ((F.col("val") - F.col("lo")) / (F.col("hi") - F.col("lo")))
                * 255
            ).cast("int")
        ),
    )
    err = F.abs(
        F.col("val")
        - (F.col("lo") + (F.col("code") / F.lit(255.0))
           * (F.col("hi") - F.col("lo")))
    )
    # codes serialize as a space-joined string: one scalar column per
    # vector (driver-hashable — Arrow list columns crash the driver's
    # pandas canonicalizer, CORRECTNESS_r03) and the same shape an SQ8
    # code TEXT export takes; the fixed-width binary form would be the
    # cluster variant.
    return q.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("dim").alias("dim"), F.col("code").alias("code"))
                    )
                ),
                lambda s: s["code"].cast("string"),
            ),
            " ",
        ).alias("codes"),
        F.round(F.max(err), 6).alias("max_abs_err"),
    )


@register(
    "score_robust_calibrate",
    oracle="""
    WITH stats AS (
      SELECT source,
             quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.5) AS med,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents GROUP BY source
    )
    SELECT doc_id, d.source, n_chars,
           CASE WHEN q3 = q1 THEN 0.0
                ELSE round((CAST(n_chars AS DOUBLE) - med) / (q3 - q1), 6)
           END AS robust_z
    FROM documents d JOIN stats USING (source)
    """,
)
def score_robust_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration by robust scaling: each document's
    score (n_chars stands in for a model quality score) centered on its
    SOURCE's median and scaled by its source's IQR, so scores from
    sources with different scales become comparable before mixing
    (the per-source analog of events_anomaly_zscore's mean/std — median
    and IQR shrug off the heavy tails real quality scores have).

    100 TB shape: the per-source quartile aggregate yields one tiny row
    per source and broadcasts back onto the scan; exact percentiles
    sort per group at this SF — the 100 TB call-site swaps in
    approx_percentile (mergeable sketch), same join shape.  Spark's
    `percentile` and DuckDB's `quantile_cont` share the interpolation
    rule (pinned by percentile_event_values)."""
    d = load_table(spark, "documents", sf_dir)
    stats = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.5)").alias("med"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    return d.join(F.broadcast(stats), "source").select(
        "doc_id", "source", "n_chars",
        F.when(F.col("q3") == F.col("q1"), F.lit(0.0)).otherwise(
            F.round(
                (F.col("n_chars").cast("double") - F.col("med"))
                / (F.col("q3") - F.col("q1")),
                6,
            )
        ).alias("robust_z"),
    )


SKEW_HOT_FACTOR = 2  # a key is "hot" above this multiple of the mean


@register(
    "join_key_skew_profile",
    oracle=f"""
    WITH counts AS (
      SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    ), mean AS (
      SELECT sum(n)::DOUBLE / count(*) AS mean_n FROM counts
    )
    SELECT count(*) AS n_keys,
           -- BIGINT cast: DuckDB SUM(BIGINT) is HUGEINT, which fetches
           -- as float64 on the driver's pandas hash path (the
           -- pack_sequences_greedy r2 failure class)
           CAST(sum(n) AS BIGINT) AS n_rows,
           max(n) AS max_key_rows,
           round(quantile_cont(n, 0.99), 6) AS p99_key_rows,
           round(max(n) / mean_n, 6) AS skew_ratio,
           count(*) FILTER (n > {SKEW_HOT_FACTOR} * mean_n) AS n_hot_keys
    FROM counts, mean
    GROUP BY mean_n
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic for a prospective join/groupBy key
    (orders.o_custkey): key cardinality, hottest-key row count, p99,
    max/mean skew ratio, and how many keys exceed {SKEW_HOT_FACTOR}x
    the mean.  This is the measurement that decides between a plain
    shuffle join, AQE skew splitting, and salted_join (operators/
    physical.py) — the reference's FAQ.md:68 hot page is exactly the
    pathology this quantifies before it takes down a stage.

    100 TB shape: one map-side-combined groupBy on the key, then a
    single-row aggregate over the (much smaller) per-key counts; the
    profile costs one shuffle of key cardinality, not data volume."""
    o = load_table(spark, "orders", sf_dir)
    # materialize the per-key counts once: three consumers below (summary
    # stats, the mean, the hot-key count) would otherwise each re-run the
    # o_custkey shuffle — the one genuinely big stage of this query
    counts = (
        o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_key_rows"),
    ).withColumn(
        "mean_n", F.col("n_rows").cast("double") / F.col("n_keys")
    )
    hot = counts.crossJoin(F.broadcast(stats.select("mean_n"))).agg(
        F.count(F.when(F.col("n") > SKEW_HOT_FACTOR * F.col("mean_n"), 1))
         .alias("n_hot_keys"),
    )
    return stats.crossJoin(hot).select(
        "n_keys", "n_rows", "max_key_rows", "p99_key_rows",
        F.round(F.col("max_key_rows") / F.col("mean_n"), 6)
         .alias("skew_ratio"),
        "n_hot_keys",
    )


N_ID_PARTITIONS = 8  # fixed so the range partitioning is reproducible


@register(
    "dense_global_ids",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) - 1 AS dense_id
    FROM documents
    """,
)
def dense_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0..N-1 ids in doc_id order WITHOUT a global sort — the
    zipWithIndex pattern every training-shard writer needs (example
    ids, row pointers) expressed scale-first:

    1. repartitionByRange(doc_id): rows land in doc_id-ordered ranges;
    2. per-partition local ranks via one Arrow mapInPandas pass (a
       running counter per partition — the one semantics DataFrame
       built-ins cannot express without re-shuffling by partition id);
    3. per-partition row counts (tiny: one row per partition) become
       cumulative offsets via a window over {N_ID_PARTITIONS} rows,
       broadcast back;  dense_id = offset + local_rank.

    A window `row_number() OVER (ORDER BY doc_id)` — the oracle's
    formulation — would funnel the corpus through ONE task at 100 TB;
    this plan's only wide ops are the range partitioning and a
    broadcast of {N_ID_PARTITIONS} offset rows."""
    return _dense_ranks(
        load_table(spark, "documents", sf_dir).select("doc_id"),
        ["doc_id"],
    ).select("doc_id", F.col("rank").alias("dense_id"))


def _dense_ranks(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Contiguous 0..N-1 ranks of ``df`` in ``order_cols`` order WITHOUT
    a global sort (the zipWithIndex pattern, shared by
    ``dense_global_ids`` and ``training_epoch_shuffle``):

    1. repartitionByRange(order_cols): ordered ranges;
    2. per-partition local ranks via one Arrow mapInPandas pass;
    3. per-partition counts (one row per partition) become cumulative
       offsets via a window over {N_ID_PARTITIONS} rows, broadcast
       back; rank = offset + local_rank.

    Emits ``df``'s columns plus ``rank``."""
    from pyspark.sql import Window as W

    cols = df.columns
    d = (
        df.repartitionByRange(N_ID_PARTITIONS, *order_cols)
        .sortWithinPartitions(*order_cols)
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", pid int, local_rank long"

    def local_ranks(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            out = pdf.copy()
            out["pid"] = pid
            out["local_rank"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield out

    # Materialize ONCE: the offsets subtree and the final join both
    # consume `ranked`.  Without this, the range shuffle + sort + Python
    # rank pass would run per consumer — and, worse, correctness would
    # silently depend on Spark reusing the range exchange between the
    # two executions (RangePartitioner re-samples boundaries per run,
    # so divergent partitionings would skip/duplicate ids).
    ranked = d.mapInPandas(local_ranks, schema).localCheckpoint()
    sizes = ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    offsets = sizes.select(
        "pid",
        (F.sum("n").over(W.orderBy("pid")) - F.col("n")).alias("offset"),
    )
    return ranked.join(F.broadcast(offsets), "pid").select(
        *cols, (F.col("offset") + F.col("local_rank")).alias("rank")
    )


PCA_COMPONENTS = 2  # leading principal components to report
PCA_REDUCE_FANIN = 32  # max Gram-partial rows the driver ever collects


def pca_gram_reduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy executor-side-reduced Gram partials for
    :func:`embedding_pca_power`: one Arrow-batched ``mapInPandas``
    pass emits a (n, d, colsum, gram) partial per batch, then an
    ``applyInPandas`` tier keyed on ``spark_partition_id() %
    PCA_REDUCE_FANIN`` folds those down to at most
    ``PCA_REDUCE_FANIN`` rows ON THE EXECUTORS.  Exposed separately
    so the plan-quality suite can assert the reduction tier sits
    between the scan kernel and the driver collect."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, "embeddings", sf_dir).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    ).select("embedding")

    def gram_partials(batches):
        for pdf in batches:
            vecs = [np.asarray(v, dtype=np.float64)
                    for v in pdf["embedding"]]
            if not vecs:
                continue
            x = np.stack(vecs)
            yield pd.DataFrame({
                "n": [x.shape[0]],
                "d": [x.shape[1]],
                "colsum": [(x.sum(axis=0)).tobytes()],
                "gram": [(x.T @ x).ravel().tobytes()],
            })

    partial_schema = "n long, d int, colsum binary, gram binary"

    def sum_partials(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # One group's per-batch partials -> one row.  Mixed d is a
        # data error; detect it executor-side so it can't silently
        # mis-shape the frombuffer below.
        d0 = int(pdf["d"].iloc[0])
        if (pdf["d"] != d0).any():
            raise ValueError("mixed embedding dimensionality")
        colsum = np.zeros(d0, dtype=np.float64)
        gram = np.zeros(d0 * d0, dtype=np.float64)
        for b in pdf["colsum"]:
            colsum += np.frombuffer(b, dtype=np.float64)
        for b in pdf["gram"]:
            gram += np.frombuffer(b, dtype=np.float64)
        return pd.DataFrame({
            "n": [int(pdf["n"].sum())],
            "d": [d0],
            "colsum": [colsum.tobytes()],
            "gram": [gram.tobytes()],
        })

    return (
        e.mapInPandas(gram_partials, partial_schema)
        .withColumn("tag", F.spark_partition_id() % PCA_REDUCE_FANIN)
        .groupBy("tag")
        .applyInPandas(
            lambda pdf: sum_partials(pdf.drop(columns=["tag"])),
            partial_schema,
        )
    )


@register("embedding_pca_power")  # rows-only: float eigensolve
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal components of the embedding matrix — the
    whitening/decorrelation step before quantization or outlier
    screening (and the classic "remove the dominant direction"
    embedding post-process).  The corpus-sized work is ONE
    Arrow-batched pass: each mapInPandas task computes its batch's
    X'X Gram matrix, column sum, and row count with numpy BLAS and
    emits them as ONE d*d-float row; the driver sums the per-batch
    partials (batch-count-sized traffic, ~32 KB each at d=64) and
    eigensolves the resulting 64 x 64 covariance — the same
    driver-holds-the-codebook discipline as kmeans_lloyd_refine.
    Deterministic sign: each component's largest-|loading| entry is
    made positive.

    No SQL oracle (iterative float eigensolve); pytest pins the
    distributed moment computation and the components against a pure
    numpy PCA of the same vectors, and ``pca_power_certificate``
    hash-gates the eigenpair properties at the driver gate.

    100 TB shape: one scan, then a THREE-tier reduction that is all
    code: numpy within an Arrow batch, an executor-side
    ``applyInPandas`` partial-sum keyed on ``spark_partition_id() %
    PCA_REDUCE_FANIN`` that folds the per-batch Gram rows down to at
    most ``PCA_REDUCE_FANIN`` rows, and only THOSE reach the driver —
    at 40 M Arrow batches the driver still ingests ~32 KB x fan-in,
    not terabytes.  A first implementation expanded d(d+1)/2 product
    structs per row in Catalyst expressions; the Arrow/BLAS kernel is
    ~8x faster at sf0.1 and is the shape a real job would ship."""
    import numpy as np

    # Executor-side reduction tier (see pca_gram_reduced): the driver
    # collects at most PCA_REDUCE_FANIN pre-summed Gram rows.
    partials = pca_gram_reduced(spark, sf_dir).collect()

    schema = ("component int, dim int, mean double, loading double, "
              "eigenvalue double")
    if not partials:  # empty corpus: no dimensionality to decompose
        return spark.createDataFrame([], schema)
    d_dim = partials[0].d
    if any(r.d != d_dim for r in partials):
        raise ValueError("mixed embedding dimensionality")
    n = sum(r.n for r in partials)
    mu = sum(np.frombuffer(r.colsum, dtype=np.float64) for r in partials) / n
    gram = sum(
        np.frombuffer(r.gram, dtype=np.float64).reshape(d_dim, d_dim)
        for r in partials
    )
    cov = gram / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    out_rows = []
    for k in range(PCA_COMPONENTS):
        v = evecs[:, -(k + 1)]
        lam = float(evals[-(k + 1)])
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        for dim in range(d_dim):
            out_rows.append((k, dim, float(mu[dim]), float(v[dim]), lam))
    return spark.createDataFrame(out_rows, schema)


# Eigenpair-residual tolerance for pca_power_certificate: float64
# eigh residuals sit at ~1e-15 of the eigenvalue scale; 1e-8 leaves
# seven orders of headroom while still failing instantly on a wrong
# covariance assembly or a non-eigenpair.
PCA_RESIDUAL_TOL = 1e-8


@register(
    "pca_power_certificate",
    oracle=f"""
    -- arity mirrors the Spark side: zero rows when no usable vectors
    -- survive the pca_gram_reduced input filter, else one TRUE row
    -- per reported component
    SELECT CAST(u.k AS INT) AS component,
           TRUE AS residual_within_band,
           TRUE AS unit_norm,
           TRUE AS eigenvalue_nonneg,
           TRUE AS ordered_nonincreasing,
           TRUE AS explained_ratio_in_unit
    FROM (SELECT unnest(range(0, {PCA_COMPONENTS})) AS k) u
    WHERE EXISTS (SELECT 1 FROM embeddings
                  WHERE embedding IS NOT NULL AND len(embedding) > 0)
    ORDER BY component
    """,
)
def pca_power_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKABLE certificate for ``embedding_pca_power`` (VERDICT
    r7 brief #7 — the sketch families' within-band pattern applied to
    the eigensolve): rebuilds the covariance from the SAME distributed
    Gram reduction, then certifies per reported component that
    (lambda, v) is a genuine eigenpair of that covariance —
    ||C v - lambda v|| <= {PCA_RESIDUAL_TOL} * max(lambda, 1e-12),
    ||v|| = 1, lambda >= 0 (covariance PSD), eigenvalues
    non-increasing, and explained-variance ratio lambda/trace(C) in
    [0, 1] (zero allowed: degenerate spectra are legitimate).  The oracle predicts TRUE everywhere, so a hash-green
    driver row certifies the distributed moment assembly AND the
    eigensolve — the numpy-pinned pytest covers the component VALUES,
    this covers them at the driver gate.  Float tolerance note: the
    booleans are load-and-order-independent because the partials are
    summed in one deterministic driver loop (same as the primary)."""
    import numpy as np

    partials = pca_gram_reduced(spark, sf_dir).collect()
    schema = ("component int, residual_within_band boolean, "
              "unit_norm boolean, eigenvalue_nonneg boolean, "
              "ordered_nonincreasing boolean, "
              "explained_ratio_in_unit boolean")
    if not partials:
        return spark.createDataFrame([], schema)
    d_dim = partials[0].d
    n = sum(r.n for r in partials)
    mu = sum(np.frombuffer(r.colsum, dtype=np.float64) for r in partials) / n
    gram = sum(
        np.frombuffer(r.gram, dtype=np.float64).reshape(d_dim, d_dim)
        for r in partials
    )
    cov = gram / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    trace = float(np.trace(cov))
    rows = []
    prev_lam = None
    for k in range(PCA_COMPONENTS):
        v = evecs[:, -(k + 1)]
        lam = float(evals[-(k + 1)])
        resid = float(np.linalg.norm(cov @ v - lam * v))
        ratio = lam / trace if trace > 0 else 0.0
        rows.append((
            k,
            bool(resid <= PCA_RESIDUAL_TOL * max(lam, 1e-12)),
            bool(abs(float(np.linalg.norm(v)) - 1.0) <= 1e-9),
            bool(lam >= -1e-12),
            bool(prev_lam is None or lam <= prev_lam + 1e-12),
            # [0, 1] with fp headroom — a ZERO eigenvalue (constant or
            # perfectly collinear corpus, the adversarial sweep's
            # degenerate case) is a legitimate spectrum, not a defect
            bool(-1e-12 <= ratio <= 1.0 + 1e-12),
        ))
        prev_lam = lam
    return spark.createDataFrame(rows, schema)


EPOCH_SEEDS = (7, 13)  # two epochs: proves a seed change reorders


@register(
    "training_epoch_shuffle",
    oracle=f"""
    WITH epochs AS (
      SELECT unnest([{', '.join(str(s) for s in EPOCH_SEEDS)}]) AS seed
    ),
    keyed AS (
      SELECT seed, doc_id,
             ('0x' || substr(md5(seed::VARCHAR || ':' || doc_id::VARCHAR),
                             1, 15))::BIGINT AS skey
      FROM documents, epochs
    )
    SELECT CAST(seed AS INT) AS seed, doc_id,
           CAST(row_number() OVER (
                  PARTITION BY seed ORDER BY skey, doc_id) - 1
                AS BIGINT) AS shuffle_rank
    FROM keyed
    """,
)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded, REPRODUCIBLE global training order, one permutation per
    epoch — the shuffle a dataloader needs to be restartable: the order
    must be a pure function of (seed, doc_id), never of partitioning,
    timing, or ``rand()``.  Each document's sort key is the 60-bit md5
    of ``"<seed>:<doc_id>"`` (ties broken by doc_id), so any two runs —
    and any two ENGINES — produce the identical permutation, and a new
    seed is a new epoch order.

    100 TB shape: the oracle's ``row_number() OVER (ORDER BY skey)``
    would funnel the corpus through one task; here the ranks come from
    the shared ``_dense_ranks`` two-pass prefix sum (range partition on
    the hash key → per-partition Arrow ranks → broadcast offsets).

    r10 (guide §2.4): ONE ``_dense_ranks`` pass ranks every epoch —
    the per-doc seeds explode beside the scan and the global order
    (seed, skey, doc_id) puts each epoch in a contiguous rank block,
    so ``shuffle_rank = rank − epoch_index·n``.  One range shuffle +
    checkpoint + offsets round over #epochs·n rows replaces #epochs
    full passes of that machinery (the rows moved are the same; the
    fixed per-pass costs halve), at the price of one metadata-cheap
    corpus count."""
    from mediawiki_to_notion_spark.functions import hashing as H

    d = load_table(spark, "documents", sf_dir).select("doc_id")
    n_docs = d.count()
    seeds = sorted(EPOCH_SEEDS)
    keyed = d.select(
        F.explode(F.array(*[F.lit(s) for s in seeds])).alias("seed"),
        "doc_id",
    ).select(
        "seed", "doc_id",
        H.token_hash60(
            F.concat(F.col("seed").cast("string"), F.lit(":"),
                     F.col("doc_id").cast("string"))
        ).alias("skey"),
    )
    ranked = _dense_ranks(keyed, ["seed", "skey", "doc_id"])
    # epochs are contiguous in the global (seed, skey, doc_id) order —
    # the per-seed base is epoch_index·n exactly
    base = F.lit(0).cast("long")
    for i, s in enumerate(seeds):
        base = F.when(F.col("seed") == s, F.lit(i * n_docs).cast("long")) \
            .otherwise(base)
    return ranked.select(
        F.col("seed").cast("int").alias("seed"),
        "doc_id",
        (F.col("rank") - base).alias("shuffle_rank"),
    )


# doc_id-rotated decomposed-unicode suffixes (the PII-injection
# precedent: the synthetic corpus is pure ASCII, so the normalization
# machinery is exercised on deterministic injected sequences).  Cases:
# combining acute (composes to e-acute), ring/diaeresis (Angstrom),
# multi-combining canonical reordering (s + dot-below + dot-above ->
# U+1E69), and an already-NFC string (the no-op path).
_NFC_SUFFIXES = (
    " café",
    " Ångström",
    " ṩtudy",
    " café",
)


@register(
    "text_unicode_nfc_normalize",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE doc_id % 4
               WHEN 0 THEN ' cafe' || chr(769)
               WHEN 1 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
               WHEN 2 THEN ' s' || chr(803) || chr(775) || 'tudy'
               ELSE ' caf' || chr(233) END AS t
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_cp_before,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS n_cp_after,
           nfc_normalize(t) != t AS changed,
           md5(nfc_normalize(t)) AS norm_md5
    FROM aug
    """,
)
def text_unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the canonical-composition pass every
    multilingual corpus needs before hashing/dedup (decomposed and
    composed renderings of the same text MUST collide: 'e'+U+0301 vs
    U+00E9 would otherwise defeat exact dedup, n-gram overlap, and
    tokenizer vocab lookups).  Each document is augmented with a
    doc_id-rotated decomposed suffix (combining marks, canonical
    reordering, and an already-composed no-op case), normalized with
    Python's unicodedata (UCD tables), and certified by code-point
    counts plus the md5 of the normalized text — DuckDB's
    ``nfc_normalize`` computes the oracle side, so a hash-green row
    pins two INDEPENDENT UCD implementations against each other.

    100 TB shape: one Arrow-batched mapInPandas pass, zero shuffles;
    NFC has no cross-row state so the kernel parallelizes trivially."""

    def normalize(batches):
        import hashlib
        import unicodedata

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text + _NFC_SUFFIXES[int(doc_id) % 4]
                norm = unicodedata.normalize("NFC", t)
                rows.append((
                    int(doc_id), len(t), len(norm), norm != t,
                    hashlib.md5(norm.encode("utf-8")).hexdigest(),
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_cp_before", "n_cp_after",
                               "changed", "norm_md5"],
            )

    # NULL text is the quarantine concern of ingest (the media-frame
    # boundary rule, multimodal.py:_media_frame) — filtered before the
    # kernel, mirrored by the oracle's WHERE
    d = (load_table(spark, "documents", sf_dir)
         .filter(F.col("text").isNotNull())
         .select("doc_id", "text"))
    return d.mapInPandas(
        normalize,
        "doc_id long, n_cp_before long, n_cp_after long, "
        "changed boolean, norm_md5 string",
    )
