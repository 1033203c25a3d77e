"""Table IO (SURVEY.md §2.1 S1-S8, re-expressed).

The target deployment reads the transcripts table from an Iceberg catalog
(BASELINE.json input_hint); this sandbox has no Iceberg jars, so reads go
through a capability probe: `catalog.table` names use the Iceberg reader when
`spark.sql.catalog.*` is configured, otherwise paths fall back to parquet with
hive-style partition discovery. The parquet layout (partitionBy on lang /
shard_group, zstd) is the same physical design either way — Iceberg adds
snapshots/manifests on top, which our per-stage `_manifest.json` approximates
(index/build.py).

Reference mapping: S1 JSON corpus scan -> spark.read (schema asserted);
S4/S5/S6 pickle+shard store/parallel load -> partitioned parquet (Spark shards
and parallel-loads natively); S8 gzip experiment -> zstd codec (session conf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jconf = spark.sparkContext.getConf()
        return any(
            k.startswith("spark.sql.catalog.") for k, _ in jconf.getAll()
        )
    except Exception:
        return False


def read_transcripts(spark: SparkSession, location: str) -> DataFrame:
    """Read the transcripts table from an Iceberg table name (`cat.db.tbl`)
    or a parquet path; asserts the authoritative input schema."""
    from .snapshots import SnapshotTable, is_snapshot_table

    if is_snapshot_table(location):
        # local Iceberg-style snapshot table (sources/snapshots.py): read
        # the current snapshot's explicit file list. Checked FIRST — a
        # snapshot dir on disk is unambiguous, while the table-name
        # heuristic below would misroute a relative path to the catalog.
        df = SnapshotTable(spark, location).read()
    elif "://" not in location and not location.startswith("/") and _iceberg_available(spark):
        df = spark.read.table(location)
    elif location.endswith(".json"):
        # dev fallback mirroring the reference's corpus.json scan (S1)
        from ..fixtures.transcripts import transcripts_schema

        df = spark.read.schema(transcripts_schema()).json(location)
    else:
        df = spark.read.parquet(location)
    required = {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"transcripts table missing columns: {sorted(missing)}")
    return df


def write_table(
    df: DataFrame, location: str, partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def write_submission_csv(topk: DataFrame, path: str) -> None:
    """Reference submission sink (S3): (id, docids) rows, docids = stringified
    ranked list (`bm25_ranking.ipynb cell 7:1-5`)."""
    sub = (
        topk.groupBy("query_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "docid"))),
                    lambda s: s["docid"],
                )
            ).alias("docids")
        )
        .withColumnRenamed("query_id", "id")
    )
    sub.coalesce(1).write.mode("overwrite").csv(path, header=True)
