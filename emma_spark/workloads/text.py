"""Text-analysis workloads over the `documents` table, each mirrored by
a DuckDB oracle that reproduces the exact same math (md5-derived hashes,
identical regexes, identical rounding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import text as X
from ..sources import io
from . import query

# SQL fragment: lowercased whitespace tokens, empties dropped
SQL_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t != '')"
# SQL fragment: md5 -> 56-bit bigint
def sql_md5_long(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 14)) AS BIGINT)"


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id, len({SQL_TOKS}) AS n_tokens FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Whitespace token counting — pure Column expr, no shuffle."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    return docs.select("doc_id", X.token_count(F.col("text")).cast("bigint").alias("n_tokens"))


@query(
    "text_quality",
    oracle=rf"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           len({SQL_TOKS})::BIGINT AS n_tokens,
           CASE WHEN len({SQL_TOKS}) > 0
                THEN floor(length(text)::DOUBLE / len({SQL_TOKS}) * 10000 + 0.5) / 10000
                ELSE 0.0 END AS avg_token_len,
           floor(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))::DOUBLE
                 / greatest(length(text), 1) * 1000000 + 0.5) / 1000000 AS punct_ratio,
           floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                 / greatest(length(text), 1) * 1000000 + 0.5) / 1000000 AS alpha_ratio,
           CASE WHEN len({SQL_TOKS}) > 0
                THEN floor(len(list_filter({SQL_TOKS},
                     t -> t IN ('the','a','of','and','to','in','is','it','for','on')))::DOUBLE
                     / len({SQL_TOKS}) * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS stopword_ratio
    FROM documents
    """,
)
def text_quality(spark, sf_dir):
    """Quality-scoring feature block (length/punct/stopword ratios)."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    metrics = X.quality_metrics(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in metrics.items()])


def _lang_sql() -> str:
    counts = {
        lang: f"len(list_filter({SQL_TOKS}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in X.STOPWORDS.items()
    }
    # cascade identical to llm.text.lang_id: first lang in LANG_ORDER at max wins
    expr = "'und'"
    for lang in reversed(X.LANG_ORDER):
        others = " , ".join(c for o, c in counts.items() if o != lang)
        expr = (
            f"CASE WHEN {counts[lang]} > 0 AND {counts[lang]} >= greatest({others}) "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return f"SELECT doc_id, {expr} AS lang_guess FROM documents"


@query("text_lang_id", oracle=_lang_sql())
def text_lang_id(spark, sf_dir):
    """Stopword-heuristic language ID (argmax cascade, fixed tie-break)."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    return docs.select("doc_id", X.lang_id(F.col("text")).alias("lang_guess"))


_FP_NORM = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {sql_md5_long(_FP_NORM)} AS fp FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of whitespace-normalized text as bigint."""
    docs = io.fan_out(io.read_parquet(spark, f"{sf_dir}/documents.parquet").df)
    return docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))
