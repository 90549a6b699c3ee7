"""End-to-end corpus-curation pipeline workload: the LLM-data operators
COMPOSED (quality gate → exact dedup → LSH near-dup removal → stats),
with a DuckDB oracle that replays every stage bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import pipeline as P
from ..sources import io
from . import query
from .dedup import _sig_sql
from .text import SQL_TOKS, sql_md5_long

_ORACLE = f"""
WITH q AS (
  SELECT * FROM documents
  WHERE len({SQL_TOKS}) >= 5
    AND floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
              / greatest(length(text), 1) * 1000000 + 0.5) / 1000000 >= 0.5
),
ex AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY {sql_md5_long('text')}
                                 ORDER BY doc_id) AS rn
    FROM q
  ) WHERE rn = 1
),
sig AS ({_sig_sql('ex')}),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
   AND ((l.mh0 = r.mh0 AND l.mh1 = r.mh1) OR (l.mh2 = r.mh2 AND l.mh3 = r.mh3))
),
final AS (
  SELECT ex.* FROM ex LEFT JOIN (SELECT DISTINCT b FROM pairs) rm
    ON ex.doc_id = rm.b
  WHERE rm.b IS NULL
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(len({SQL_TOKS})) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM final GROUP BY lang
"""


@query("pipeline_corpus_curation", oracle=_ORACLE, headline=True)
def pipeline_corpus_curation(spark, sf_dir):
    """The LLM-data operators composed end-to-end as one lazy plan:
    quality gate (narrow filter) → exact dedup (one content-hash
    shuffle, min-id keeper) → minhash/LSH near-dup removal (bucket
    join + anti join) → per-language corpus stats. The oracle replays
    all four stages, so a hash match certifies the COMPOSITION, not
    just each operator in isolation."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    curated = P.curate(docs, min_tokens=5, min_alpha=0.5)
    return P.corpus_stats(curated, by="lang")


_FP = sql_md5_long(r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')")

_INC_ORACLE = f"""
WITH corpus AS (
  SELECT {_FP} AS fp FROM documents WHERE doc_id % 4 != 0
),
batch AS (
  SELECT doc_id, lang, {_FP} AS fp,
         len({SQL_TOKS}) >= 5 AS gated
  FROM documents WHERE doc_id % 4 = 0
),
keeper AS (
  SELECT fp, min(doc_id) AS kd FROM batch WHERE gated GROUP BY fp
),
flags AS (
  SELECT b.doc_id, b.lang, b.gated,
         b.gated AND k.kd = b.doc_id AS self_kept,
         b.gated AND k.kd = b.doc_id
           AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
           AS is_new
  FROM batch b LEFT JOIN keeper k ON b.fp = k.fp
)
SELECT lang,
       count(*) AS n_arrived,
       count(*) FILTER (gated) AS n_gated,
       count(*) FILTER (self_kept) AS n_self_kept,
       count(*) FILTER (is_new) AS n_new
FROM flags GROUP BY lang
"""


@query("pipeline_incremental_update", oracle=_INC_ORACLE)
def pipeline_incremental_update(spark, sf_dir):
    """INCREMENTAL corpus ingestion — the production counterpart of
    pipeline_corpus_curation's full recompute: an arriving batch
    (doc_id % 4 = 0 simulates the delta) is quality-gated,
    self-deduped, then anti-joined against the EXISTING corpus's
    fingerprint set, so only genuinely new content survives; the
    funnel report (arrived → gated → self-kept → new) is what the
    ingest dashboard shows per batch. Scale: the existing corpus
    contributes ONLY its 56-bit fingerprint column (at 100 TB that
    fingerprint table is ~1% of corpus bytes and lives pre-computed
    next to it — this query derives it inline because the harness has
    no side state); both dedup joins hash-partition on fp; everything
    else is narrow flag arithmetic folded in ONE conditional agg.
    Batch-boundary determinism: keeper = min doc_id per fingerprint,
    the same keeper rule as dedup_exact."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    from ..llm import text as X

    fp = X.fingerprint(F.col("text"))
    corpus_fp = (
        docs.filter(F.col("doc_id") % 4 != 0).select(fp.alias("fp")).distinct()
    )
    batch = docs.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", "lang", fp.alias("fp"),
        (F.size(X.tokens(F.col("text"))) >= 5).alias("gated"),
    )
    keeper = (
        batch.filter("gated").groupBy("fp").agg(F.min("doc_id").alias("kd"))
    )
    in_corpus = corpus_fp.withColumn("hit", F.lit(1))
    flags = (
        batch.join(keeper, "fp", "left")
        .join(in_corpus, "fp", "left")
        .select(
            "lang", "gated",
            (F.col("gated") & (F.col("kd") == F.col("doc_id"))).alias("self_kept"),
            (
                F.col("gated")
                & (F.col("kd") == F.col("doc_id"))
                & F.col("hit").isNull()
            ).alias("is_new"),
        )
    )
    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_arrived"),
        F.count(F.when(F.col("gated"), 1)).alias("n_gated"),
        F.count(F.when(F.col("self_kept"), 1)).alias("n_self_kept"),
        F.count(F.when(F.col("is_new"), 1)).alias("n_new"),
    )


@query(
    "pipeline_dataset_fingerprint",
    oracle="""
    WITH d AS (
      SELECT 'documents' AS tbl, count(*)::HUGEINT AS n,
             sum(CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|'
                  || text), 1, 14)) AS BIGINT) AS HUGEINT)) AS fp
      FROM documents
      UNION ALL
      SELECT 'orders', count(*)::HUGEINT,
             sum(CAST(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)
                  || '|' || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
                  || '|' || o_orderstatus), 1, 14)) AS BIGINT) AS HUGEINT))
      FROM orders
      UNION ALL
      SELECT 'embeddings', count(*)::HUGEINT,
             sum(CAST(CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR) || '|'
                  || CAST(len(embedding) AS VARCHAR)), 1, 14)) AS BIGINT) AS HUGEINT))
      FROM embeddings
    )
    SELECT tbl, CAST(n AS BIGINT) AS n_rows,
           CAST(fp % 9223372036854775783 AS BIGINT) AS fingerprint
    FROM d
    """,
)
def pipeline_dataset_fingerprint(spark, sf_dir):
    """Dataset FINGERPRINTING for reproducibility manifests (the DVC /
    lakeFS primitive): each input table reduces to (row_count,
    content_fingerprint) where the fingerprint is the SUM of per-row
    md5 hashes over the row's semantic content, reduced mod the
    largest 63-bit prime — summation is commutative, so the
    fingerprint is independent of partitioning, task order, engine,
    and file layout (an XOR or sorted-concat scheme would also work;
    sum keeps it one map-side-combinable agg). Two runs disagree on a
    fingerprint ⟺ some row's content changed — the cheap precondition
    check before reusing cached downstream artifacts, and the exact
    lineage stamp a training-run manifest should record next to the
    config hash. Doubles enter the hash only through the repo's
    canonical quantization (cents), never raw float repr. One narrow
    scan + single-row agg per table."""
    t = io.load_tables(spark, sf_dir, "documents", "orders", "embeddings")
    dec = "decimal(38,0)"
    P = "9223372036854775783"

    def fp(df, expr_sql, name):
        return df.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum(
                F.expr(
                    "CAST(conv(substring(md5(" + expr_sql + "), 1, 14), 16, 10)"
                    f" AS {dec})"
                )
            ).alias("fp"),
        )

    d = fp(t["documents"].df,
           "concat(CAST(doc_id AS STRING), '|', text)", "documents")
    o = fp(t["orders"].df,
           "concat(CAST(o_orderkey AS STRING), '|',"
           " CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING),"
           " '|', o_orderstatus)", "orders")
    e = fp(t["embeddings"].df,
           "concat(CAST(vec_id AS STRING), '|',"
           " CAST(size(embedding) AS STRING))", "embeddings")
    return (
        d.unionByName(o).unionByName(e)
        .select(
            "tbl", F.col("n").cast("bigint").alias("n_rows"),
            F.expr(f"CAST(fp % {P} AS BIGINT)").alias("fingerprint"),
        )
    )


_FUNNEL_ORACLE = f"""
WITH q AS (
  SELECT * FROM documents
  WHERE len({SQL_TOKS}) >= 5
    AND floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
              / greatest(length(text), 1) * 1000000 + 0.5) / 1000000 >= 0.5
),
ex AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY {sql_md5_long('text')}
                                 ORDER BY doc_id) AS rn
    FROM q
  ) WHERE rn = 1
),
sig AS ({_sig_sql('ex')}),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
   AND ((l.mh0 = r.mh0 AND l.mh1 = r.mh1) OR (l.mh2 = r.mh2 AND l.mh3 = r.mh3))
),
final AS (
  SELECT ex.* FROM ex LEFT JOIN (SELECT DISTINCT b FROM pairs) rm
    ON ex.doc_id = rm.b
  WHERE rm.b IS NULL
),
c AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_input,
         (SELECT count(*) FROM q)::BIGINT AS n_after_quality,
         (SELECT count(*) FROM ex)::BIGINT AS n_after_exact,
         (SELECT count(*) FROM final)::BIGINT AS n_after_neardup
)
SELECT n_input, n_after_quality, n_after_exact, n_after_neardup,
       n_input - n_after_quality AS drop_quality,
       n_after_quality - n_after_exact AS drop_exact,
       n_after_exact - n_after_neardup AS drop_neardup,
       CAST(n_after_neardup::HUGEINT * 1000000 // n_input AS BIGINT)
         AS yield_ppm
FROM c
"""


@query("pipeline_curation_funnel", oracle=_FUNNEL_ORACLE)
def pipeline_curation_funnel(spark, sf_dir):
    """Per-stage ATTRITION of the curation pipeline — the funnel table
    every corpus run logs (llm/pipeline.curate_funnel): survivors
    after the quality gate, exact dedup, and LSH near-dup removal,
    each stage's drop count, and the end-to-end yield in exact ppm.
    The oracle replays all three gates, so a hash match certifies
    that every drop is attributed to the right stage — the audit that
    turns 'the corpus shrank 4% this run' from a mystery into a
    diff."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    return P.curate_funnel(docs, min_tokens=5, min_alpha=0.5)


_RAG_ORACLE = f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE len({SQL_TOKS}) >= 5
),
ex AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY {sql_md5_long('text')}
                                 ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t != '') AS tk
  FROM ex
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(tk[i*24 + 1 : i*24 + 32], ' ') AS chunk
  FROM toks,
       unnest(generate_series(0, greatest((len(tk)-1)//24, 0))) AS t(i)
),
buckets AS (
  SELECT CAST(concat('0x', substr(md5('rag' || '|' || chunk), 1, 14))
              AS BIGINT) % 256 AS bucket
  FROM chunks
),
occ AS (SELECT bucket, count(*)::BIGINT AS n FROM buckets GROUP BY bucket)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs_in,
       (SELECT count(*) FROM gated)::BIGINT AS n_after_gate,
       (SELECT count(*) FROM ex)::BIGINT AS n_after_dedup,
       (SELECT count(*) FROM chunks)::BIGINT AS n_chunks,
       (SELECT count(*) FROM occ)::BIGINT AS n_buckets_used,
       (SELECT max(n) FROM occ)::BIGINT AS max_bucket
"""


@query("pipeline_rag_corpus_prep", oracle=_RAG_ORACLE)
def pipeline_rag_corpus_prep(spark, sf_dir):
    """RAG INGESTION composed as ONE lazy plan — the retrieval-corpus
    twin of pipeline_corpus_curation's training-corpus pipeline:
    quality gate (narrow) → exact dedup (one content-hash shuffle) →
    context-window CHUNKING (the text_chunk_windows stride-24/width-32
    split, zero-shuffle) → hash-bucketed index assignment (the LSH
    bucket layout an ANN index ingests, 256 buckets) → one manifest
    row with per-stage counts and the index's occupancy skew (max
    bucket — the mega-bucket early warning from dedup_lsh_bucket_stats
    applied at ingest time). Every stage is an operator the registry
    verifies in isolation; this row certifies the COMPOSITION, which
    is what an ingestion job actually ships."""
    from pyspark.sql import Window

    from ..llm.text import md5_long, tokens as toks_fn

    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    gated = docs.filter(F.size(toks_fn(F.col("text"))) >= 5).select(
        "doc_id", "text"
    )
    w = Window.partitionBy(md5_long(F.col("text"))).orderBy("doc_id")
    from ..plans.cache import pin

    ex = pin(
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    tk = ex.select("doc_id", toks_fn(F.col("text")).alias("tk"))
    chunks = pin(
        tk.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, greatest(CAST((size(tk) - 1)"
                    " div 24 AS INT), 0)), i ->"
                    " array_join(slice(tk, i * 24 + 1, 32), ' '))"
                )
            ).alias("chunk_idx", "chunk"),
        )
    )
    occ = (
        chunks.select(
            (
                F.expr(
                    "CAST(conv(substring(md5(concat('rag', '|', chunk)),"
                    " 1, 14), 16, 10) AS BIGINT)"
                )
                % 256
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c = lambda df, name: df.agg(F.count(F.lit(1)).alias(name))
    return (
        c(docs, "n_docs_in")
        .crossJoin(c(gated, "n_after_gate"))
        .crossJoin(c(ex, "n_after_dedup"))
        .crossJoin(c(chunks, "n_chunks"))
        .crossJoin(
            occ.agg(
                F.count(F.lit(1)).alias("n_buckets_used"),
                F.max("n").alias("max_bucket"),
            )
        )
    )
