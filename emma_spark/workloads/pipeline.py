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
