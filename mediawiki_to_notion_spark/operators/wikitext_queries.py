r"""Oracle-checked queries for the wikitext transform suite (SURVEY §2.2-2.3).

The documents table carries plain text, so each query first *synthesizes*
wiki markup from its columns deterministically, then applies the engine's
rules — giving DuckDB a fully SQL-expressible twin.  Backreference
translation (Python/Java ``$1`` vs RE2 ``\1``) and the `(?i)` inline flag
are exactly the parity traps SURVEY §2.3 calls out; these queries pin
them against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.functions import wikitext as wt
from mediawiki_to_notion_spark.operators.registry import register
from mediawiki_to_notion_spark.sources.tables import load_table


def _synth_markup(d: DataFrame) -> DataFrame:
    """Wrap document text in the wiki constructs the cleanup rules target."""
    return d.select(
        "doc_id",
        F.concat(
            F.lit("[[Category:"), F.col("lang"), F.lit("]]\n"),
            F.lit("== Table of Contents ==\n__TOC__\n"),
            F.lit("<nowiki>"), F.substring("text", 1, 60), F.lit("</nowiki>\n"),
            F.lit("[[File:img"), F.col("doc_id"), F.lit(".png|300px|thumb]]\n"),
            F.lit("{{:Transcluded/Page}}\n"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("{{Mystery|arg}}\n")).otherwise(F.lit("")),
            F.substring("text", 1, 40),
        ).alias("wikitext"),
    )


@register(
    "wikitext_rule_chain",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             '[[Category:' || lang || ']]' || chr(10) ||
             '== Table of Contents ==' || chr(10) || '__TOC__' || chr(10) ||
             '<nowiki>' || substr(text, 1, 60) || '</nowiki>' || chr(10) ||
             '[[File:img' || doc_id || '.png|300px|thumb]]' || chr(10) ||
             '{{:Transcluded/Page}}' || chr(10) ||
             CASE WHEN doc_id % 7 = 0 THEN '{{Mystery|arg}}' || chr(10) ELSE '' END ||
             substr(text, 1, 40) AS wikitext
      FROM documents
    )
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(wikitext, '\[\[Category:.+\]\]', '', 'g'),
                '</?nowiki>', '', 'g'),
              '=+ Table of Contents =+' || chr(10) || '__TOC__', '', 'g'),
            '__TOC__', '', 'g'),
          '\[\[File:([^\|]+)\|.+\]\]', '[[File:\1]]', 'g'),
        '\{\{\:.+\}\}', '', 'g') AS cleaned
    FROM synth
    """,
)
def wikitext_rule_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic cleanup chain (process-mw-dump.py:198-211,243-244) — the
    five pre-fence rules + transclusion removal as one codegen'd pass."""
    d = load_table(spark, "documents", sf_dir)
    synth = _synth_markup(d)
    rules = wt.PRE_FENCE_RULES + wt.POST_FENCE_RULES
    return synth.select(
        "doc_id", wt.apply_rules(F.col("wikitext"), rules).alias("cleaned")
    )


@register(
    "template_rewrite_rules",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             '{{attention}} note' || chr(10) ||
             '{{RFC|' || (doc_id % 9999) || '|Proto ' || (doc_id % 13) || '}}' || chr(10) ||
             '{{MSKB|' || (100000 + doc_id) || '|KB title ' || doc_id || '}}' || chr(10) ||
             '{{sourcelink|http://a/' || doc_id || '|t' || doc_id || '}} and ' ||
             '{{sourcelink|http://b/' || doc_id || ' t' || doc_id || '|comment}}' || chr(10) ||
             '{{VMwareKB|' || (1000 + doc_id) || '}}' AS wikitext
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(wikitext,
                  '(?i)\{\{Attention\}\}', '💡 ', 'g'),
                '\{\{RFC\|([-\w\d]+)(?:\|(.+))?\}\}',
                '[https://tools.ietf.org/html/\1 RFC \1 \2]', 'g'),
              '\{\{MSKB\|(\d+)\|(.+)\}\}',
              '[http://support.microsoft.com/kb/\1 \2]', 'g'),
            '\{\{sourcelink\|(\S+)\|(.+?)\}\}', '(source: [\1 \2])', 'g'),
          '\{\{sourcelink\|(\S+)\s(.+?)\|.+?\}\}', '(source: [\1 \2])', 'g'),
        '\{\{VMwareKB\|(\d+)(?:\|(.+))?\}\}', '[http://kb.vmware.com/kb/\1 \2]', 'g')
        AS rewritten
    FROM synth
    """,
)
def template_rewrite_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template rewrites incl. the case-insensitive flag, optional capture
    groups, and the order-sensitive sourcelink pair
    (process-mw-dump.py:295-386)."""
    d = load_table(spark, "documents", sf_dir)
    synth = d.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.concat(
            F.lit("{{attention}} note\n"),
            F.lit("{{RFC|"), F.col("doc_id") % 9999,
            F.lit("|Proto "), F.col("doc_id") % 13, F.lit("}}\n"),
            F.lit("{{MSKB|"), F.col("doc_id") + 100000,
            F.lit("|KB title "), F.col("doc_id"), F.lit("}}\n"),
            F.lit("{{sourcelink|http://a/"), F.col("doc_id"),
            F.lit("|t"), F.col("doc_id"), F.lit("}} and "),
            F.lit("{{sourcelink|http://b/"), F.col("doc_id"),
            F.lit(" t"), F.col("doc_id"), F.lit("|comment}}\n"),
            F.lit("{{VMwareKB|"), F.col("doc_id") + 1000, F.lit("}}"),
        ).alias("wikitext"),
    )
    names = {"attention_emoji", "rfc_link", "mskb_link",
             "sourcelink_pipe", "sourcelink_space", "vmwarekb_link"}
    rules = [r for r in wt.TEMPLATE_RULES if r.name in names]
    return synth.select(
        "doc_id", wt.apply_rules(F.col("wikitext"), rules).alias("rewritten")
    )


@register(
    "unhandled_template_detector",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN 'text {{Mystery' || doc_id || '|x}} more {{Other}}'
                  ELSE 'clean ' || substr(text, 1, 20) END AS wikitext
      FROM documents
    )
    SELECT doc_id, regexp_extract(wikitext, '\{\{.+?\}\}') AS tpl
    FROM synth
    WHERE regexp_extract(wikitext, '\{\{.+?\}\}') <> ''
    """,
)
def unhandled_template_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leftover-template WARNING side-output (process-mw-dump.py:251-254):
    lazy-match extract + non-empty filter → warnings DF."""
    d = load_table(spark, "documents", sf_dir)
    synth = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("text {{Mystery"), F.col("doc_id"), F.lit("|x}} more {{Other}}")),
        ).otherwise(F.concat(F.lit("clean "), F.substring("text", 1, 20))).alias("wikitext"),
    )
    out = synth.select("doc_id", wt.unhandled_template(F.col("wikitext")).alias("tpl"))
    return out.filter(F.col("tpl") != "")


@register(
    "title_filename_projection",
    oracle=r"""
    WITH titles AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN 'Category:Net/Ops #' || doc_id || '!'
                  WHEN doc_id % 4 = 1 THEN 'File:img ' || doc_id || '.png'
                  ELSE 'Plain page ' || doc_id END AS title,
             CASE WHEN doc_id % 4 IN (0, 1) THEN 14 ELSE 0 END AS ns_id
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN ns_id > 0 THEN regexp_replace(title, '^[^:]*:', '')
                ELSE title END AS bare_title,
           rtrim(regexp_replace(
             replace(CASE WHEN ns_id > 0 THEN regexp_replace(title, '^[^:]*:', '')
                          ELSE title END, '/', '-'),
             '[^\p{L}\p{N} ._-]', '', 'g')) AS filename
    FROM titles
    """,
)
def title_filename_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title de-namespacing (process-mw-dump.py:114-115) + filename
    sanitizer (:123-128) as pure projections."""
    d = load_table(spark, "documents", sf_dir)
    titles = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("Category:Net/Ops #"), F.col("doc_id"), F.lit("!")))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit("File:img "), F.col("doc_id"), F.lit(".png")))
         .otherwise(F.concat(F.lit("Plain page "), F.col("doc_id"))).alias("title"),
        F.when(F.col("doc_id") % 4 < 2, 14).otherwise(0).alias("ns_id"),
    )
    bare = wt.title_without_namespace(F.col("title"), F.col("ns_id"))
    return titles.select(
        "doc_id", bare.alias("bare_title"), wt.safe_filename(bare).alias("filename")
    )


@register(
    "redirect_empty_filters",
    oracle=r"""
    WITH pages AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN '#REDIRECT [[Target]]'
                  WHEN doc_id % 13 = 0 THEN ''
                  ELSE text END AS wikitext
      FROM documents
    )
    SELECT doc_id FROM pages
    WHERE wikitext IS NOT NULL AND wikitext <> ''
      AND wikitext NOT LIKE '#REDIRECT%'
    """,
)
def redirect_empty_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-page + redirect filters (process-mw-dump.py:194-196,261-263)."""
    d = load_table(spark, "documents", sf_dir)
    pages = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit("#REDIRECT [[Target]]"))
         .when(F.col("doc_id") % 13 == 0, F.lit(""))
         .otherwise(F.col("text")).alias("wikitext"),
    )
    return pages.filter(
        ~wt.is_empty_page(F.col("wikitext")) & ~wt.is_redirect(F.col("wikitext"))
    ).select("doc_id")


@register(
    "namespace_router",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN ns_id = 0 THEN 'wikitext'
                WHEN ns_id = 14 THEN 'wikitext'
                WHEN ns_id = 6 THEN 'file'
                ELSE 'skip' END AS route
    FROM (
      SELECT doc_id, CAST(doc_id % 16 AS INTEGER) AS ns_id FROM documents
    )
    """,
)
def namespace_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Namespace dispatch (process-mw-dump.py:46-79): Main/Category →
    wikitext pipeline, File → file pipeline, everything else →
    skip-with-warning side output."""
    d = load_table(spark, "documents", sf_dir)
    ns = (F.col("doc_id") % 16).cast("int")
    return d.select(
        "doc_id",
        F.when(ns.isin(0, 14), "wikitext")
         .when(ns == 6, "file")
         .otherwise("skip").alias("route"),
    )


@register(
    "code_fence_state",
    oracle=r"""
    WITH lines AS (
      SELECT t.doc_id, u.i - 1 AS line_no, t.lns[u.i] AS line
      FROM (SELECT doc_id, string_split(text_block, chr(10)) AS lns FROM (
              SELECT doc_id,
                     'para ' || doc_id || chr(10) ||
                     '  indented ' || doc_id || chr(10) ||
                     CASE WHEN doc_id % 2 = 0 THEN '  still code' ELSE 'closing text' END
                     || chr(10) || 'tail' AS text_block
              FROM documents WHERE doc_id < 50)) t,
      LATERAL (SELECT unnest(generate_series(1, len(t.lns))) AS i) u
    ), classed AS (
      SELECT doc_id, line_no, line,
             CASE WHEN regexp_matches(line, '^[ \t]+[^ \t]') THEN 'open'
                  WHEN regexp_matches(line, '^[^ \t]') THEN 'close'
                  ELSE NULL END AS boundary
      FROM lines
    )
    SELECT doc_id, line_no, line,
           coalesce(last_value(boundary IGNORE NULLS) OVER (
             PARTITION BY doc_id ORDER BY line_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'close') = 'open'
           AS in_code
    FROM classed
    """,
)
def code_fence_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful code-fencer's per-line state (process-mw-dump.py:213-241)
    computed *relationally*: classify each line open/close/neutral, then
    `last_value(... IGNORE NULLS)` over the line order — a distributed
    window scan instead of a sequential loop.  (The full text
    reconstruction stays in the pandas UDF; this query pins the state
    machine itself against the oracle.)"""
    d = load_table(spark, "documents", sf_dir)
    synth = d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat(
            F.lit("para "), F.col("doc_id"), F.lit("\n"),
            F.lit("  indented "), F.col("doc_id"), F.lit("\n"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("  still code"))
             .otherwise(F.lit("closing text")),
            F.lit("\ntail"),
        ).alias("text_block"),
    )
    lines = synth.select(
        "doc_id", F.posexplode(F.split("text_block", "\n")).alias("line_no", "line")
    )
    classed = lines.withColumn(
        "boundary",
        F.when(F.col("line").rlike(r"^[ \t]+[^ \t]"), "open")
         .when(F.col("line").rlike(r"^[^ \t]"), "close"),
    )
    w = W.partitionBy("doc_id").orderBy("line_no").rowsBetween(W.unboundedPreceding, W.currentRow)
    return classed.select(
        "doc_id", "line_no", "line",
        (F.coalesce(F.last("boundary", ignorenulls=True).over(w), F.lit("close")) == "open")
        .alias("in_code"),
    )


@register(
    "filename_collision_detect",
    oracle=r"""
    WITH titles AS (
      SELECT doc_id,
             (CASE WHEN (doc_id // 50) % 2 = 0 THEN 'Guide ' ELSE 'guide ' END)
               || (doc_id % 50)::VARCHAR AS title
      FROM documents
    ),
    named AS (
      SELECT doc_id, title,
             rtrim(regexp_replace(replace(title, '/', '-'),
                                  '[^\p{L}\p{N} ._-]', '', 'g')) AS filename
      FROM titles
    )
    SELECT lower(filename) AS collision_key,
           count(*) AS n_pages,
           count(DISTINCT filename) AS n_variants,
           min(doc_id) AS first_doc
    FROM named
    GROUP BY lower(filename)
    HAVING count(DISTINCT filename) > 1
    """,
)
def filename_collision_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-collision audit for the markdown output tree: sanitized
    filenames that differ only by case clobber each other on
    case-insensitive filesystems — the exact pathology reference
    FAQ.md:24-28 warns about (it keeps filenames case-sensitive and
    tells users to use a case-sensitive volume).  This query finds
    every lower-cased filename claimed by more than one distinct
    sanitized name, with the first page involved, BEFORE any file is
    written.  Titles are doc_id-derived with alternating case so the
    machinery is value-checked (same construction in both engines).

    100 TB shape: one groupBy on the folded key with partial
    aggregation; output is only the colliding groups."""
    from mediawiki_to_notion_spark.functions.wikitext import safe_filename

    d = load_table(spark, "documents", sf_dir)
    titles = d.select(
        "doc_id",
        F.concat(
            F.when((F.col("doc_id") / 50).cast("long") % 2 == 0, F.lit("Guide "))
            .otherwise(F.lit("guide ")),
            (F.col("doc_id") % 50).cast("string"),
        ).alias("title"),
    )
    named = titles.select(
        "doc_id", safe_filename(F.col("title")).alias("filename")
    )
    return (
        named.groupBy(F.lower("filename").alias("collision_key"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("filename").alias("n_variants"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_variants") > 1)
    )
