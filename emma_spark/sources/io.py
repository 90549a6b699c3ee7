"""Sources & sinks (SURVEY §2.1).

Reference: typed CSV/Parquet/text readers with per-type codec derivation
(``api/DataBag.scala:407-448``; CSV format config ``io/csv/CSV.scala:23-55``
— header, delimiter, quote, escape, comment, nullValue, charset;
Parquet ``io/parquet/Parquet.scala:24-60``). The Spark backend maps these
straight onto DataFrameReader options (``SparkDataset.scala:168-193``) —
so do we, plus schema derivation from Python dataclasses standing in for
emma's ``Meta``/``ExpressionEncoder`` derivation
(``emma-spark/.../api/spark/package.scala:63``).
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import enum
import typing
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import DataBag

_PRIMITIVES = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    _dt.datetime: T.TimestampType(),
    _dt.date: T.DateType(),
}


def schema_of(cls) -> T.StructType:
    """Derive a StructType from a dataclass — the ``Meta[A]``/encoder
    analog (SURVEY §1.2): primitives, Optional -> nullable, list ->
    ArrayType, dict -> MapType, nested dataclass -> nested struct."""
    fields = []
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        tp = hints[f.name]
        dt, nullable = _to_spark_type(tp)
        fields.append(T.StructField(f.name, dt, nullable))
    return T.StructType(fields)


def _to_spark_type(tp) -> tuple[T.DataType, bool]:
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            dt, _ = _to_spark_type(args[0])
            return dt, True
        raise TypeError(f"unsupported union {tp}")
    if origin in (list, tuple):
        (elem,) = typing.get_args(tp)[:1]
        dt, n = _to_spark_type(elem)
        return T.ArrayType(dt, n), False
    if origin is dict:
        k, v = typing.get_args(tp)
        kt, _ = _to_spark_type(k)
        vt, vn = _to_spark_type(v)
        return T.MapType(kt, vt, vn), False
    if dataclasses.is_dataclass(tp):
        return schema_of(tp), False
    if isinstance(tp, type) and issubclass(tp, enum.Enum):
        # enum column codec (reference: io/csv/CSVColumn.scala:40-80
        # derives codecs for scala.Enumeration / Java enums): IntEnum
        # persists by VALUE (long), any other Enum by NAME (string) —
        # both round-trip losslessly through CSV and Parquet.
        if issubclass(tp, enum.IntEnum):
            return T.LongType(), False
        return T.StringType(), False
    if tp in _PRIMITIVES:
        return _PRIMITIVES[tp], False
    raise TypeError(f"unsupported type {tp}")


def rows_of(items) -> list[tuple]:
    """Encode dataclass instances to row tuples under the same codec
    ``schema_of`` derives the schema with: enums by name/value, nested
    dataclasses as nested tuples — the write half of the reference's
    per-type CSV/Parquet converter derivation
    (``io/csv/CSVConverter.scala:37,94-116``)."""

    def encode(v):
        if isinstance(v, enum.IntEnum):
            return int(v)
        if isinstance(v, enum.Enum):
            return v.name
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return tuple(encode(getattr(v, f.name)) for f in dataclasses.fields(v))
        if isinstance(v, (list, tuple)):
            return [encode(x) for x in v]
        return v

    return [
        tuple(encode(getattr(it, f.name)) for f in dataclasses.fields(it))
        for it in items
    ]


def read_text(spark: SparkSession, path: str) -> DataBag:
    """(``api/DataBag.scala:407``; ``SparkDataset.scala:168-170``)."""
    return DataBag(spark.read.text(path))


def _list_input_files(spark: SparkSession, path: str) -> list[str]:
    """Resolve a file/dir/glob path to its data files the way Spark's
    own file index does (Hadoop ``globStatus`` + non-hidden children),
    metadata-only. Sorted for a deterministic union order."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    files: list[str] = []
    for st in fs.globStatus(jpath) or []:
        if st.isDirectory():
            for child in fs.listStatus(st.getPath()):
                name = child.getPath().getName()
                if child.isFile() and not name.startswith(("_", ".")):
                    files.append(child.getPath().toString())
        elif st.isFile():
            files.append(st.getPath().toString())
    return sorted(files)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | type | None = None,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    comment: str | None = None,
    null_value: str = "",
    charset: str = "UTF-8",
    skip_rows: int = 0,
    mode: str = "PERMISSIVE",
    multi_line: bool = False,
) -> DataBag:
    """Typed CSV read; options mirror ``io/csv/CSV.scala:23-55`` mapped as
    in ``SparkDataset.scala:172-183``.

    ``mode`` governs malformed records (real-world ingestion):
    PERMISSIVE (default — bad fields null out), DROPMALFORMED (bad
    rows vanish), FAILFAST (raise). At 100 TB you almost always want
    DROPMALFORMED plus a separate count of dropped rows, never a
    pipeline that dies at row 10^12.

    ``skip_rows`` (the reference's ``skipRows``) drops the first N
    PHYSICAL lines of EACH file before parsing ("starting at the
    beginning of the file", ``io/csv/CSV.scala:33``). Spark's CSV
    reader has no such option, so the skip path enumerates the input
    files (Hadoop FS metadata only — no data read), gives each file
    its own ``textFile().zipWithIndex()`` (indices are per-file, so N
    means N *in that file*, not N across the whole glob), drops each
    non-first file's header line itself (the RDD-backed CSV reader
    only recognizes ONE leading header), and unions. A documented RDD
    round-trip on this cold IO path only; the per-file driver loop
    touches metadata, never rows.

    ``multi_line`` enables quoted fields containing record
    delimiters (newlines). Correctness/parallelism tradeoff: Spark
    cannot split a multiline CSV file, so each file becomes ONE task
    — treat multiline CSV as a landing format and convert once
    (incompatible with ``skip_rows``, which is line-oriented)."""
    if multi_line and skip_rows > 0:
        raise ValueError("multi_line is incompatible with skip_rows")
    if isinstance(schema, type) and dataclasses.is_dataclass(schema):
        schema = schema_of(schema)
    if skip_rows > 0:
        sc = spark.sparkContext
        files = _list_input_files(spark, path)
        if not files:
            raise FileNotFoundError(path)
        parts = []
        for i, f in enumerate(files):
            # first file keeps its header line (the reader consumes it);
            # every other file drops header + skipped rows entirely
            drop = skip_rows if (i == 0 or not header) else skip_rows + 1
            parts.append(
                sc.textFile(f)
                .zipWithIndex()
                .filter(lambda t, _n=drop: t[1] >= _n)
                .keys()
            )
        lines = sc.union(parts) if len(parts) > 1 else parts[0]
        reader = spark.read.options(
            header=header, delimiter=delimiter, quote=quote, escape=escape,
            nullValue=null_value, inferSchema=schema is None, mode=mode,
        )
        if comment:
            reader = reader.option("comment", comment)
        if schema is not None:
            reader = reader.schema(schema)
        return DataBag(reader.csv(lines))
    reader = spark.read.options(
        header=header,
        delimiter=delimiter,
        quote=quote,
        escape=escape,
        nullValue=null_value,
        charset=charset,
        inferSchema=schema is None,
        mode=mode,
        multiLine=multi_line,
    )
    if comment:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
    return DataBag(reader.csv(path))


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str | type | None = None
) -> DataBag:
    """JSON-Lines source — the interchange format LLM corpora actually
    ship in (one JSON document per line). Schema is REQUIRED at scale:
    without it Spark runs a full inference pre-scan over every byte
    before the real read (2x the 100 TB I/O), so passing ``schema=None``
    here is for ad-hoc exploration only. Malformed lines surface in the
    standard ``_corrupt_record`` pattern under PERMISSIVE mode rather
    than failing the job. No reference analog (io/csv, io/parquet only
    — ``io/csv/CSV.scala:23-55`` is the nearest sibling); JSONL is part
    of the training-data surface this engine adds."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, type):
            schema = schema_of(schema)
        reader = reader.schema(schema)
    return DataBag(reader.json(path))


def read_orc(spark: SparkSession, path: str, schema=None) -> DataBag:
    """ORC columnar source — the other splittable columnar format a
    Spark shop inherits from Hive-era lakes. Same pushdown/pruning
    properties as parquet (PushedFilters/ReadSchema reach the scan);
    schema optional (ORC files are self-describing, no inference
    scan). No reference analog (io/csv, io/parquet only); added for
    lake interop like read_jsonl."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, type):
            schema = schema_of(schema)
        reader = reader.schema(schema)
    return DataBag(reader.orc(path))


def read_parquet(spark: SparkSession, path: str, schema=None) -> DataBag:
    """(``api/DataBag.scala:427``; ``SparkDataset.scala:185-193``).
    Column pruning + predicate pushdown reach the scan via Catalyst —
    check ``.explain`` shows PushedFilters/ReadSchema.

    timestamp[ns] parquet columns (Spark reads them as long under
    ``spark.sql.legacy.parquet.nanosAsLong``) are converted to
    microsecond timestamps, matching DuckDB's truncation.

    **Session-wide side effect (by contract):** if the file contains
    naive (NTZ) timestamp columns — top-level or nested inside
    struct/array/map — this call pins ``spark.sql.session.timeZone``
    to UTC for the remainder of the session and casts them to
    TIMESTAMP_LTZ. This engine's timestamp contract is "naive wall
    times are UTC instants"; the pin is what makes the NTZ→LTZ cast
    mean that on any machine. Consequence for callers: later
    string↔timestamp parsing/rendering in the same session also
    happens in UTC, not the JVM-local zone. Pin your own zone AFTER
    the reads if you need different rendering semantics."""
    ns_cols = _ns_timestamp_columns(path)
    if ns_cols:
        # Session-independent: the driver harness provides its own vanilla
        # SparkSession, so the conf must be set here (runtime-settable SQL
        # conf), not only in emma_spark.session.get_spark. The conf is
        # deliberately NOT restored after the read: the returned plan is
        # lazy and physical planning re-reads the conf at action time, so
        # a save/restore would break execution of the very frame built
        # here. Leaving it set is harmless within this engine — every ns
        # read goes through this helper, which always applies the
        # matching div-1000 micros fixup; without the conf the same read
        # would hard-error (PARQUET_TYPE_ILLEGAL), not change meaning.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if isinstance(schema, type) and dataclasses.is_dataclass(schema):
        reader = reader.schema(schema_of(schema))
    elif schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for col in ns_cols:
        # integer `div`, NOT `/`: float division of int64 nanos loses
        # precision past 2^53 and lands ±1µs off after floor
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Naive (isAdjustedToUTC=false) µs/ms parquet timestamps infer as
    # TIMESTAMP_NTZ under Spark's default inferTimestampNTZ — but NTZ
    # is rejected by withWatermark (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    # and diverges from this engine's timestamp contract: naive wall
    # times are TIMESTAMP_LTZ in a UTC session (exactly what the ns
    # shim above produces), so DuckDB's naive TIMESTAMP and Spark
    # render identical instants. Normalize here, at the IO layer, so a
    # vanilla driver session gets the same types as get_spark's; the
    # TZ pin makes the NTZ→LTZ cast read the naive value AS UTC on any
    # machine (cast interprets NTZ in the session zone). Like
    # nanosAsLong above, the confs stay set — restoring them would
    # change the meaning of the lazy plan built here.
    ntz_casts = [
        (f.name, rewritten)
        for f in df.schema.fields
        for rewritten in (_ntz_to_ltz(f.dataType),)
        if rewritten is not f.dataType
    ]
    if ntz_casts:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for c, dt in ntz_casts:
            df = df.withColumn(c, F.col(c).cast(dt))
    return DataBag(df)


def _ntz_to_ltz(dt):
    """Rewrite TIMESTAMP_NTZ → TIMESTAMP_LTZ recursively through
    struct/array/map so nested naive timestamps get the same UTC
    normalization as top-level ones (Spark casts struct→struct /
    array→array fieldwise). Returns the ORIGINAL object when nothing
    changed, so callers can cheaply test `is not`."""
    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampType()
    if isinstance(dt, T.ArrayType):
        elem = _ntz_to_ltz(dt.elementType)
        return dt if elem is dt.elementType else T.ArrayType(elem, dt.containsNull)
    if isinstance(dt, T.MapType):
        k, v = _ntz_to_ltz(dt.keyType), _ntz_to_ltz(dt.valueType)
        if k is dt.keyType and v is dt.valueType:
            return dt
        return T.MapType(k, v, dt.valueContainsNull)
    if isinstance(dt, T.StructType):
        fields = [
            T.StructField(f.name, _ntz_to_ltz(f.dataType), f.nullable, f.metadata)
            for f in dt.fields
        ]
        if all(nf.dataType is of.dataType for nf, of in zip(fields, dt.fields)):
            return dt
        return T.StructType(fields)
    return dt


_NS_COLS_MEMO: dict = {}


def _ns_timestamp_columns(path: str) -> list[str]:
    """Memoized per (path, mtime, size): the pyarrow footer probe costs
    tens of ms and every query re-opens its tables — across a
    50-query harness run that is seconds of pure metadata re-reading."""
    import os

    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, None, None)
    if key in _NS_COLS_MEMO:
        return _NS_COLS_MEMO[key]
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        cols = [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        cols = []
    _NS_COLS_MEMO[key] = cols
    return cols


def fan_out(df, min_parts: int | None = None):
    """Widen a narrow plan before a compute-heavy projection.

    A small single-row-group parquet file scans as ONE task no matter
    how many cores the cluster has (parquet splits only at row-group
    boundaries), so an expensive narrow pass (e.g. hashing every
    shingle of every document) runs on one core. A round-robin
    repartition spreads it. No-op when the input is already wide — the
    100 TB case, where inputs arrive thousands of partitions wide and
    an extra shuffle would be pure loss.

    Width is estimated from Catalyst's size statistics
    (``sizeInBytes / maxPartitionBytes`` ≈ the scan's split count) —
    a driver-side metadata lookup, NOT ``df.rdd.getNumPartitions()``,
    which forces an RDD conversion of the whole plan on every call.
    Plans without file statistics report a huge default sizeInBytes
    and correctly no-op."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        digits = "".join(ch for ch in raw if ch.isdigit())
        max_bytes = int(digits) if digits else 134217728
        est_parts = max(1, size // max_bytes)
    except Exception:
        est_parts = target  # estimation unavailable -> assume wide (no-op)
    if est_parts >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df, table: str, buckets: int, *keys: str, sort_cols: tuple[str, ...] = (),
) -> None:
    """Bucketed managed table — the co-located-join path (SURVEY brief:
    'bucketing for co-located joins').

    Two tables bucketed by the same keys into the same bucket count
    join WITHOUT an exchange: each bucket pairs 1:1, so at 100 TB the
    recurring shuffle of a fact-fact join is paid ONCE at write time
    and amortized over every subsequent join/aggregation on those keys
    (`spark.sql.sources.bucketing.enabled`, on by default)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataBag]:
    """Load the driver's TPC-H-ish parquet tables (TESTDATA.md)."""
    if not names:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    return {n: read_parquet(spark, f"{sf_dir}/{n}.parquet") for n in names}
