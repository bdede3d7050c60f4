"""Stage `save_records`: partitions ⋈ embeddings ⋈ tags -> MemoryRecords.

Re-expresses SaveRecordsHandler.PrepareRecord (archived/km-v1/service/Core/
Handlers/SaveRecordsHandler.cs:375-441) column-for-column:

- reserved tags: __document_id (:397), __file_type (:404), __file_id (:408),
  __file_part (:426), __part_n / __sect_n (:429-430), then user tags copied
  (:438) — reserved names from Abstractions/Constants.cs:119-128;
- payload: file, url, text, vector_provider, vector_generator, last_update
  (:411-436) + schema version "20231218A" (MemoryRecord.cs:10-13);
- record id `d={documentId}//p={partId}` (:32-43);
- purge of superseded executions via keep-set anti-join (:297-323).

Join strategy: embeddings are derived 1:1 from partitions and both are
produced partitioned by their shared key, so the equi-join on partition_id
shuffles once on a uniform synthetic key (no skew); doc-level user tags are
a doc_id equi-join (AQE broadcasts it when the tag table is dimension-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kernel_memory_spark import schema as S
from kernel_memory_spark.sources.tables import TableCatalog

SCHEMA_VERSION = S.PAYLOAD_SCHEMA_VERSION

# TagCollection.ValidateKey (archived/km-v1/service/Abstractions/Models/
# TagCollection.cs:180-198): tag keys must not contain ':' or '=' (both
# reserved for the key:value wire format).
_INVALID_TAG_KEY_CHARS = r"[:=]"


def valid_tag_key(key_col) -> "F.Column":
    """Boolean Column: True when a tag key passes TagCollection.ValidateKey."""
    return ~key_col.rlike(_INVALID_TAG_KEY_CHARS)


def sanitize_user_tags(tags_col) -> "F.Column":
    """Drop user-tag entries whose key fails validation (':'/'=' chars).

    The reference THROWS on invalid keys at collection-build time
    (TagCollection.cs:180-198); in a distributed batch the per-row analog is
    filter + quarantine (operators/quarantine.py routes the dropped rows)."""
    return F.map_filter(tags_col, lambda k, _v: valid_tag_key(k))


def merge_tags(reserved, user_tags) -> "F.Column":
    """Merge reserved + user tag maps, concatenating value lists on key
    collision — TagCollection.CopyTo merges values instead of failing
    (TagCollection.cs:139-148), whereas map_concat would throw
    DUPLICATED_MAP_KEY when a user tag reuses a reserved key like
    __document_id."""
    return F.map_zip_with(
        reserved,
        user_tags,
        lambda _k, v1, v2: F.when(v1.isNull(), v2)
        .when(v2.isNull(), v1)
        .otherwise(F.concat(v1, v2)),
    )


def build_records(
    partitions: DataFrame,
    embeddings: DataFrame,
    doc_tags: DataFrame | None,
    extracted: DataFrame,
    execution_id: str,
    last_update: str = "1970-01-01T00:00:00",
) -> DataFrame:
    """-> RECORDS (schema.RECORDS). `last_update` is injected, not computed,
    so record content is reproducible (needed for exact resume re-runs)."""

    recs = partitions.join(
        embeddings.select("partition_id", "vector", "vector_provider", "vector_generator"),
        "partition_id",
    ).join(
        extracted.select("doc_id", "mime_type"),
        "doc_id",
    )

    if doc_tags is not None:
        recs = recs.join(doc_tags, "doc_id", "left")
        user_tags = F.coalesce(
            F.col("tags"),
            F.create_map().cast("map<string,array<string>>"),
        )
    else:
        user_tags = F.create_map().cast("map<string,array<string>>")

    reserved = F.create_map(
        F.lit(S.TAG_DOCUMENT_ID), F.array(F.col("doc_id")),
        F.lit(S.TAG_FILE_TYPE), F.array(F.col("mime_type")),
        F.lit(S.TAG_FILE_ID), F.array(F.col("file_id")),
        F.lit(S.TAG_FILE_PART), F.array(F.col("partition_id")),
        F.lit(S.TAG_PART_N), F.array(F.col("partition_number").cast("string")),
        F.lit(S.TAG_SECT_N), F.array(F.col("section_number").cast("string")),
    )

    payload = F.struct(
        F.col("text").alias("text"),
        F.concat(F.col("doc_id"), F.lit(".txt")).alias("file"),
        F.lit("").alias("url"),
        F.lit(last_update).alias("last_update"),
        F.col("vector_provider").alias("vector_provider"),
        F.col("vector_generator").alias("vector_generator"),
        F.lit(SCHEMA_VERSION).alias("schema"),
    )

    return recs.select(
        F.format_string("d=%s//p=%s", "doc_id", "partition_id").alias("id"),
        F.col("vector"),
        merge_tags(reserved, sanitize_user_tags(user_tags)).alias("tags"),
        payload.alias("payload"),
        F.col("doc_id"),
        F.lit(execution_id).alias("execution_id"),
    )


def upgrade_records(records: DataFrame) -> DataFrame:
    """Schema self-upgrade (MemoryRecord.cs:95-143): records missing the
    payload schema field gain url='' and schema='20231218A'."""
    needs = F.col("payload.schema").isNull() | (F.col("payload.schema") == "")
    upgraded = F.struct(
        F.col("payload.text").alias("text"),
        F.col("payload.file").alias("file"),
        F.when(needs, F.coalesce(F.col("payload.url"), F.lit("")))
        .otherwise(F.col("payload.url"))
        .alias("url"),
        F.col("payload.last_update").alias("last_update"),
        F.col("payload.vector_provider").alias("vector_provider"),
        F.col("payload.vector_generator").alias("vector_generator"),
        F.when(needs, F.lit(SCHEMA_VERSION))
        .otherwise(F.col("payload.schema"))
        .alias("schema"),
    )
    return records.withColumn("payload", upgraded)


def save_records(
    spark: SparkSession,
    catalog: TableCatalog,
    records: DataFrame,
    table: str = "records",
) -> int:
    """Idempotent upsert keyed by record id (S5/S6: per-record + batch upsert
    become one MERGE)."""
    return catalog.merge(spark, table, records, ["id"])


def purge_previous_executions(
    spark: SparkSession,
    catalog: TableCatalog,
    current: DataFrame,
    table: str = "records",
) -> int:
    """DeletePreviousRecordsAsync (SaveRecordsHandler.cs:297-323): records of
    the same documents from other executions are deleted unless their record
    id is in the current execution's keep-set (J4 left anti-join)."""
    if not catalog.exists(table):
        return 0
    old = catalog.read(spark, table)
    keep = current.select("id", "doc_id", "execution_id")
    doomed = (
        old.join(keep.select("doc_id").distinct(), "doc_id", "left_semi")
        .join(keep.select("id"), "id", "left_anti")
        .select("id")
    )
    survivors = old.join(doomed, "id", "left_anti")
    return catalog.overwrite(survivors, table)
