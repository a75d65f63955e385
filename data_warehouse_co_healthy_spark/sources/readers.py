"""Source connectors (SURVEY §2.1, S1-S6).

The reference extracts by driver-side psycopg2 fetchall + inferred
createDataFrame (S1/S2, reference conection.py:55-63, 18 ingest sites),
pandas read_excel (S4, dimension.py:62-64) and a Socrata REST client
(S5, dimension.py:123-130). Here every connector returns a LAZY Spark
DataFrame with an explicit schema; nothing materializes on the driver
except genuinely driver-side payloads (REST pages, spreadsheet files),
which are bounded by contract (dims ≤ ~1200 rows in the reference).

Scale posture: parquet/CSV/JSON/JDBC reads are distributed scans with
predicate/column pushdown. JDBC reads accept partitioning options so a
big table scan fans out across executors instead of one connection
(the reference read the whole table through one cursor)."""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S1-analog primary scan. Schema optional: parquet footers are
    already explicit."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV with a REQUIRED explicit schema — inferSchema re-reads the
    data and guesses; the engine never infers (SURVEY §1.3)."""
    return spark.read.schema(schema).csv(path, header=header)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    return spark.read.schema(schema).json(path)


CORRUPT_COL = "_corrupt_record"


def read_jsonl_robust(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingest with corrupt-record quarantine: returns
    (good_rows, bad_rows). Bad lines keep their raw text in
    ``_corrupt_record`` instead of killing the job (PERMISSIVE mode) —
    at crawl scale some malformed lines are a certainty and a fail-fast
    reader is unusable. The explicit schema is mandatory: schema
    inference would scan the corpus twice.
    """
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark requires a checkpoint/cache boundary before filtering on
        # the corrupt-record column (SPARK-21610: the pushed-down filter
        # would otherwise reference a column the parser hasn't produced)
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC source — same columnar pushdown/pruning posture as parquet
    (predicate pushdown + column pruning reach the ORC reader); schema
    optional because ORC files carry their own."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Raw-media ingest via the ``binaryFile`` source: one row per file
    with (path, modificationTime, length, content BINARY) — the
    distributed on-ramp that turns a directory of images/audio/video
    into the opaque-binary multimodal column the llm.multimodal
    operators consume. File listing and reads are executor-side (no
    driver loop over files), so a 100 TB media lake ingests at cluster
    parallelism; ``pathGlobFilter`` prunes non-matching files BEFORE
    any bytes are read. Pair with
    ``spark.sql.files.maxPartitionBytes`` so many small media files
    coalesce into sane tasks."""
    r = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw text-corpus ingest via the ``text`` source. Default mode is
    one row per line (``value`` STRING) — splittable, so a single huge
    file still fans out across tasks. ``whole_file=True`` flips to
    doc-per-file (``wholetext``), the right grain when each file IS one
    document — NOT splittable, so use it for many small files, never
    one giant one. A custom ``line_sep`` handles record-separated dumps
    (e.g. ``\\0``-delimited corpora)."""
    r = spark.read.format("text").option("wholetext", str(whole_file).lower())
    if line_sep is not None:
        r = r.option("lineSep", line_sep)
    df = r.load(path)
    if whole_file:
        # carry provenance: doc-per-file rows are useless without the
        # originating path (dedup/audit joins key on it)
        df = df.select(
            F.input_file_name().alias("path"), F.col("value").alias("text")
        )
    return df


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S3-analog JDBC read (reference medical_formula_process.py:71-97
    et al.), with optional partitioned fan-out — the piece the
    reference's single-cursor scan lacks for large tables."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_excel_catalog(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """S4-analog spreadsheet catalog (reference dimension.py:62-64 reads
    medicamentos.xls via pandas). Spreadsheets are driver-side by nature
    (no splittable format); the result is immediately a Spark DF with an
    explicit schema. Prefers pandas' engine when one is installed;
    otherwise falls back to the vendored minimal BIFF8 reader
    (sources/xls.py), so the REAL .xls catalog parses in engine-less
    environments too — closing SURVEY §2.1 S4."""
    try:
        import pandas as pd  # noqa: PLC0415

        pdf = pd.read_excel(path)
        return spark.createDataFrame(pdf, schema=schema)
    except ImportError:  # no xlrd/openpyxl — env-dependent
        from .xls import read_xls_rows  # noqa: PLC0415

        header, rows = read_xls_rows(path)
        expected = [f.name for f in schema.fields]
        if header != expected:
            raise ValueError(
                f"catalog columns {header} != schema {expected}"
            ) from None

        def coerce(v: object, dt: T.DataType) -> object:
            # spreadsheet cells are (str | float); land them on the
            # DECLARED schema — integral floats destined for string
            # keys become canonical digit strings ("1012", not
            # "1012.0"), matching the reference's int-inferred codes
            if v is None:
                return None
            if isinstance(dt, T.StringType):
                if isinstance(v, float) and v.is_integer():
                    return str(int(v))
                return str(v)
            if isinstance(dt, (T.DoubleType, T.FloatType)):
                return float(v)
            if isinstance(dt, (T.LongType, T.IntegerType)):
                return int(v)
            return v

        typed = [
            [coerce(v, f.dataType) for v, f in zip(row, schema.fields)]
            for row in rows
        ]
        return spark.createDataFrame(typed, schema=schema)


def read_rest_json(
    spark: SparkSession,
    fetch: Callable[[], Iterable[dict]],
    schema: T.StructType,
    limit: int | None = None,
) -> DataFrame:
    """S5-analog open-data/REST source (reference dimension.py:123-130,
    Socrata ``get(dataset, limit=1200)``). ``fetch`` is injected so the
    connector is testable offline; rows land with an explicit schema
    instead of dict-sampling inference."""
    rows = list(fetch())
    if limit is not None:
        rows = rows[:limit]
    names = [f.name for f in schema.fields]
    data = [tuple(r.get(n) for n in names) for r in rows]
    return spark.createDataFrame(data, schema)
