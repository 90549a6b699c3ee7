"""Shared core of the adversarial fuzz harnesses (tools/fuzzcheck.py,
tools/fuzzcheck_events.py) — corpus-agnostic: build any synthetic
table(s), point a DuckDB connection at them, and every registry query
whose oracle touches ONLY those tables is run through the SAME
driver-faithful comparator as tools/diffcheck.py (pandas fetchdf /
toPandas canonicalization, full-precision float repr, DESCRIBE
type-identity gate) — NOT a more-forgiving local normalization, so a
fuzz 'ok' carries the same weight as a diffcheck 'ok'.

Eligibility matches table names with word-boundary regexes (padded
substring checks misclassified oracles ending in 'FROM part\\n' or
table names at line ends — r6 ADVICE).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from tools.diffcheck import compare_one  # noqa: E402

ALL_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def table_refs(oracle_sql: str) -> set[str]:
    """Registry tables referenced by an oracle, via word-boundary
    match (a name inside another word does not count)."""
    low = oracle_sql.lower()
    return {t for t in ALL_TABLES if re.search(rf"\b{t}\b", low)}


def eligible(oracle_sql: str, allowed: set[str]) -> bool:
    refs = table_refs(oracle_sql)
    return bool(refs) and refs <= allowed


def run_fuzz(
    spark,
    con,
    sf_dir: str,
    allowed_tables: set[str],
    only=None,
    exclude_prefixes: tuple[str, ...] = (),
    quiet: bool = False,
):
    """Run every eligible registry query differentially over the fuzz
    corpus at ``sf_dir``. Returns (n_ok, n_skip, failures) where
    failures is a list of 'name: detail' strings."""
    from emma_spark.workloads import load_all

    qs = load_all()
    n_ok = n_skip = 0
    failures: list[str] = []
    for name, q in qs.items():
        if only and name not in only:
            continue
        if not q.oracle:
            continue
        if name.startswith(exclude_prefixes):
            continue
        if not eligible(q.oracle, allowed_tables):
            continue
        status, detail = compare_one(spark, con, name, q.fn, q.oracle, sf_dir)
        if status == "ok":
            n_ok += 1
        elif status == "engine-error":
            # BOTH-sides corpus-shape errors (e.g. a filter leaves zero
            # rows and each engine's raise-on-empty contract fires) are
            # SKIPs, not differential reds. One-sided errors
            # ('spark-error'/'duck-error') fall through to the failure
            # branch below — a crash on one engine while the other
            # returns rows is exactly the ANSI-divergence class the
            # NaN/degenerate tiers exist to catch (r8 ADVICE). Branch
            # on the STATUS, never the detail text — mismatch details
            # embed row data that can contain the word 'error' (the
            # events corpus generates event_type='error').
            n_skip += 1
            if not quiet:
                print(f"SKIP  {name}: {detail[:140]}")
        else:
            failures.append(f"{name}: {detail[:300]}")
            if not quiet:
                print(f"FAIL  {name}: {detail[:300]}")
    return n_ok, n_skip, failures
