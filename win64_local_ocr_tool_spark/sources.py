"""Source readers (SURVEY §2.1): the documented ways documents enter
the engine.

Reference analog: the folder scan (sorted dir listing with extension
filter, ``segmentation/utils.py:16-38``, SURVEY S1) and upload ingest
(``routes.py:63-81``, S2). At cluster scale the canonical source is the
Iceberg/parquet ``documents`` table; for dev-time crawling a directory
of raw page files, Spark's ``binaryFile`` source is the folder-scan
twin. Payload-level normalization (decompression, charset recovery)
deliberately does NOT happen here — it lives in ``kernels/ingest.py``
inside the extraction UDF, so a source swap can never change extracted
bytes.

All readers pin an explicit schema: schema inference over 10^12 rows
is a full-data pass, and an empty directory has no footers to infer
from (the same reason ``pipeline.run_extraction`` reads its own output
with an explicit schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .corpus import DOCUMENTS_SCHEMA


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """The canonical source: a parquet/Iceberg documents table.

    Catalyst pushes column pruning + predicate pushdown into this scan
    (verify: ``.explain`` shows ReadSchema/PushedFilters); partition /
    bucket pruning applies when the table is laid out by
    ``hash(url)`` buckets or ``warc_ts`` days.
    """
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)


def with_ingest_metadata(docs: DataFrame) -> DataFrame:
    """Record scan-prunable metadata at INGEST WRITE time (idempotent if
    already present). ``n_bytes`` is the payload size as a plain long
    column: once it lives in the stored table, the mega/normal branch
    split in ``extract_all`` becomes a pushed parquet filter with
    row-group statistics pruning instead of a second full scan of the
    binary column (the Iceberg-metadata pattern the reference's local
    file sizes give it for free)."""
    if "n_bytes" in docs.columns:
        return docs
    return docs.withColumn("n_bytes", F.length("html").cast("long"))


def read_raw_pages(
    spark: SparkSession,
    directory: str,
    *,
    glob: str = "*.{html,htm,pdf,gz}",
    lang: str = "",
) -> DataFrame:
    """Dev-time folder scan: raw page files -> documents-shaped rows.

    The binaryFile source twin of the reference's sorted dir listing
    with extension filter (S1): ``pathGlobFilter`` is the ``.png/.jpg``
    allowlist, file path becomes the url, file mtime the crawl
    timestamp. ``text`` is left empty — it is the *raw visible text*
    column of the synthetic table, not something a raw file carries.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(lang).alias("lang"),
        # the source's file size IS the ingest metadata column — free
        F.col("length").cast("long").alias("n_bytes"),
    )


def documents_from_rows(spark: SparkSession, rows) -> DataFrame:
    """Small-corpus helper: python rows -> documents DataFrame with the
    pinned schema (tests, notebooks)."""
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


# --------------------------------------------------------------------------
# Python DataSource V2: the synthetic corpus as a first-class source
# --------------------------------------------------------------------------

try:  # pyspark >= 4 only
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _CorpusPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class CorpusDataSource(DataSource):
        """``spark.read.format("synthetic_corpus")`` — the deterministic
        corpus exposed through the Python DataSource V2 API.

        Demonstrates the engine's source contract end-to-end: schema is
        declared (never inferred), the planner gets real input
        partitions (id ranges — generation is a pure function of
        (seed, i), so any executor can produce any range), and rows
        reach the JVM as Arrow batches, not pickled tuples. Options:
        ``n`` (row count), ``seed``, ``partitions``.
        """

        @classmethod
        def name(cls) -> str:
            return "synthetic_corpus"

        def schema(self) -> str:
            return DOCUMENTS_SCHEMA

        def reader(self, schema) -> "CorpusReader":
            return CorpusReader(self.options)

    class CorpusReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.seed = int(options.get("seed", 42))
            self.n_parts = int(options.get("partitions", 32))

        def partitions(self):
            step = -(-self.n // self.n_parts) or 1
            return [
                _CorpusPartition(lo, min(lo + step, self.n))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            import pyarrow as pa

            from .corpus import corpus_pandas

            pdf = corpus_pandas(
                range(partition.start, partition.end), self.seed
            )
            pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us, UTC]")
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    def register_corpus_source(spark: SparkSession) -> None:
        spark.dataSource.register(CorpusDataSource)

except ImportError:  # pragma: no cover - older pyspark

    def register_corpus_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "Python DataSource V2 requires pyspark >= 4"
        )
