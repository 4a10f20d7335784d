"""Text analysis over the documents table (token counts, fingerprints, tf-idf, language-ID, quality scoring) plus the sequencer end-to-end flagship."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from small_etl_spark.queries._registry import register
from small_etl_spark.llm import textstats
from small_etl_spark.operators.projections import keep_only_fields
from small_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# North-star text analysis (documents table)
# --------------------------------------------------------------------------


@register(
    "token_count",
    r"""
    SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS INT)
             AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_computed
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for data budgeting (llm.textstats.token_count)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textstats.token_count("text").alias("n_tokens"),
        textstats.char_count("text").cast("int").alias("n_chars_computed"),
    )


@register(
    "fingerprint",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of normalized text (llm.textstats)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.fingerprint("text").alias("fingerprint"))


@register(
    "exact_dedup_docs",
    r"""
    SELECT min(doc_id) AS doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    """,
    headline=True,
)
def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via fingerprint groupBy: canonical doc per
    normalized-content hash (the 100 TB exact-dedup shape: one shuffle
    on a 16-byte key, partial agg map-side)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", textstats.fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "fingerprint", "n_copies")
    )


@register(
    "tfidf_top_terms",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE)/dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), r AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by tf·idf (llm.textstats.tfidf_top_terms):
    explode → two combined aggregations → broadcast df join → window
    top-k. Scores rounded before ranking for cross-engine order."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.tfidf_top_terms(docs, k=3)


@register(
    "gopher_quality",
    rf"""
    WITH m AS (
      SELECT doc_id,
             regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks,
             length(text) AS n_chars,
             length(regexp_replace(text, '[A-Za-z0-9_\s]', '', 'g')) AS n_sym,
             len(list_filter(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                 x -> x IN ({", ".join(f"'{w}'" for w in textstats.STOPWORDS["en"])})))
               AS en_hits
      FROM documents
    ), f AS (
      SELECT doc_id,
             len(toks) BETWEEN 20 AND 100000 AS ok_word_count,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / len(toks) BETWEEN 3.0 AND 10.0
             ELSE FALSE END AS ok_mean_word_len,
             CASE WHEN n_chars > 0
                  THEN CAST(n_sym AS DOUBLE)/n_chars <= 0.3 ELSE TRUE END
               AS ok_symbol_ratio,
             en_hits >= 2 AS ok_stopwords
      FROM m
    )
    SELECT doc_id, ok_word_count, ok_mean_word_len, ok_symbol_ratio, ok_stopwords,
           (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio AND ok_stopwords)
             AS gopher_keep
    FROM f
    """,
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filter flags (llm.textstats.
    gopher_quality_flags): word-count bounds, mean-word-length band,
    symbol density, has-common-words — the standard pre-training
    corpus filter, exact-arithmetic and oracle-checked."""
    from small_etl_spark.llm.textstats import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_quality_flags(docs).drop("text")


def _stopword_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textstats.STOPWORDS[lang])
    return (
        "CAST(len(list_filter(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),"
        f" x -> x IN ({words}))) AS INT)"
    )


@register(
    "lang_id",
    f"""
    WITH hits AS (
      SELECT doc_id,
             {_stopword_sql("en")} AS h_en,
             {_stopword_sql("es")} AS h_es,
             {_stopword_sql("fr")} AS h_fr,
             {_stopword_sql("de")} AS h_de
      FROM documents
    )
    SELECT doc_id,
           CASE
             WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en > 0 THEN 'en'
             WHEN h_es >= h_fr AND h_es >= h_de AND h_es > 0 THEN 'es'
             WHEN h_fr >= h_de AND h_fr > 0 THEN 'fr'
             WHEN h_de > 0 THEN 'de'
             ELSE 'und'
           END AS lang_pred
    FROM hits
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-argmax language ID (llm.textstats.lang_id); ties break
    by language order en > es > fr > de."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.lang_id("text").alias("lang_pred"))


@register(
    "lang_confusion",
    f"""
    WITH hits AS (
      SELECT doc_id, lang,
             {_stopword_sql("en")} AS h_en,
             {_stopword_sql("es")} AS h_es,
             {_stopword_sql("fr")} AS h_fr,
             {_stopword_sql("de")} AS h_de
      FROM documents
    ), pred AS (
      SELECT lang,
             CASE
               WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en > 0
                 THEN 'en'
               WHEN h_es >= h_fr AND h_es >= h_de AND h_es > 0 THEN 'es'
               WHEN h_fr >= h_de AND h_fr > 0 THEN 'fr'
               WHEN h_de > 0 THEN 'de'
               ELSE 'und'
             END AS lang_pred
      FROM hits
    )
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-detector language confusion matrix: the declared
    ``lang`` column against stopword-argmax lang_id — off-diagonal
    mass = mislabeled or code-switched docs to re-route before
    training. One groupBy over the map-side detector, no extra
    scans."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", textstats.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "quality_score",
    r"""
    SELECT doc_id,
           (least(CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS DOUBLE), 200.0)
              / 200.0
            + CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9_]+')) > 0
                    AND CAST(length(text) AS DOUBLE)
                        / CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS DOUBLE)
                        BETWEEN 3.0 AND 10.0
                   THEN 1.0 ELSE 0.0 END
            + CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9_]+')) > 0
                   THEN 1.0 ELSE 0.0 END
           ) / 3.0 AS quality
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (llm.textstats.quality_score)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.quality_score("text").alias("quality"))


# --------------------------------------------------------------------------
# §3.3 sequencer end-to-end (the flagship surface, data path only)
# --------------------------------------------------------------------------


@register(
    "sequence_two_stage",
    """
    WITH extract_stage AS (
      SELECT o_orderkey AS id, o_totalprice AS total, o_orderstatus AS status
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT id, total, status,
           'enriched_' || status AS status_src,
           TRUE AS processed, 'enrich' AS processed_by
    FROM extract_stage
    """,
)
def q_sequence_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage declarative sequence through the real sequencer
    (plans.sequencer.run_sequence): file source + F5 filter + P1
    rename (stage 1) → S5 previous source + J3 lookup stub + P8
    markers (stage 2). Oracle = the equivalent CTE chain."""
    from small_etl_spark.plans.sequencer import run_sequence
    from small_etl_spark.plans.spec import sequence_from_dict

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "extract",
                    "source": {
                        "type": "file",
                        "path": f"{sf_dir}/orders.parquet",
                        "filters": {"o_orderstatus": "F"},
                    },
                    "transform": {
                        "field_mapping": {
                            "o_orderkey": "id",
                            "o_totalprice": "total",
                            "o_orderstatus": "status",
                        },
                        "keep_only_fields": ["id", "total", "status"],
                        "add_markers": False,
                    },
                },
                {
                    "name": "enrich",
                    "depends_on": ["extract"],
                    "source": {"type": "previous", "previous_pipeline": "extract"},
                    "transform": {"lookup_data": {"status": "status_src"}},
                },
            ]
        }
    )
    ctx = run_sequence(spark, seq)
    return ctx.results[-1].df


@register(
    "url_canonicalize_docs",
    """
    SELECT doc_id,
           'https://' || source || '.example.co.uk/d/' || doc_id
             || '?p=' || (doc_id % 7) AS canon,
           'example.co.uk' AS dom
    FROM documents
    """,
)
def q_url_canonicalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain extraction
    (functions/text.py::canonicalize_url / registrable_domain): each
    doc gets a deterministically messy URL — uppercase scheme/host,
    ``www.``, an explicit ``:443``, a ``utm_*`` tracking param, and a
    fragment — and the canonical form plus eTLD+1 must equal the
    independently-derived clean value in the oracle (expected-value
    oracle, not a replay — the SQL never sees the messy input). URL
    dedup is the cheapest dedup pass a crawl pipeline has (exact
    string groupBy before any signatures); the whole chain is
    regexp_replace/split built-ins that fuse into the scan stage."""
    from small_etl_spark.functions.text import (
        canonicalize_url,
        registrable_domain,
    )

    docs = load_table(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.co.uk:443/d/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=x&p="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#frag"),
    )
    return docs.select(
        "doc_id",
        canonicalize_url(messy).alias("canon"),
        registrable_domain(messy).alias("dom"),
    )
