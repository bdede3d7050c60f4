"""Citations: matched MemoryRecords -> Citation structs.

Re-expresses SearchClient.ProcessMemoryRecord (archived/km-v1/service/Core/
Search/SearchClient.cs:298-393) + the Citation model (Abstractions/Models/
Citation.cs:9-120):

- one Citation per distinct `link` = "{index}/{documentId}/{fileId}"
  (SearchClient.cs:305), carrying index / documentId / fileId /
  sourceContentType (= __file_type tag) / sourceName (= payload.file) /
  sourceUrl (= payload.url);
- each matched record contributes a Partition entry (text, relevance,
  partitionNumber = __part_n tag, sectionNumber = __sect_n tag, lastUpdate,
  tags) appended to its citation (SearchClient.cs:386-393);
- partitions are ordered by relevance desc (the reference appends in
  retrieval order, which is score order), partitionNumber asc on ties.

Spark shape: one projection (tag/payload field extraction — pure column
ops) + one groupBy(link) with collect_list; the list is sorted with a JVM
comparator, so nothing leaves whole-stage codegen until the aggregation.
The group key is (doc, file) — bounded fan-in (records per file), no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark import schema as S


def _tag0(key: str):
    return F.col("tags").getItem(key).getItem(0)


def citation_rows(matches: DataFrame, index: str = "default") -> DataFrame:
    """Flat per-record citation projection (the reference's per-record field
    derivation, SearchClient.cs:298-315). Expects RECORDS columns
    (tags, payload, ...) plus a `relevance` column."""
    doc_id = _tag0(S.TAG_DOCUMENT_ID)
    file_id = _tag0(S.TAG_FILE_ID)
    return matches.select(
        F.format_string("%s/%s/%s", F.lit(index), doc_id, file_id).alias("link"),
        F.lit(index).alias("index"),
        doc_id.alias("document_id"),
        file_id.alias("file_id"),
        _tag0(S.TAG_FILE_TYPE).alias("source_content_type"),
        F.col("payload.file").alias("source_name"),
        F.col("payload.url").alias("source_url"),
        F.col("payload.text").alias("text"),
        F.col("relevance").cast("double").alias("relevance"),
        _tag0(S.TAG_PART_N).cast("int").alias("partition_number"),
        _tag0(S.TAG_SECT_N).cast("int").alias("section_number"),
        F.col("payload.last_update").alias("last_update"),
        F.col("tags"),
    )


def build_citations(matches: DataFrame, index: str = "default") -> DataFrame:
    """-> one row per citation with a partitions array<struct>, mirroring
    Citation.Partitions (Citation.cs:76-120)."""
    rows = citation_rows(matches, index)
    part = F.struct(
        "text", "relevance", "partition_number", "section_number",
        "last_update", "tags",
    )
    collected = rows.groupBy(
        "link", "index", "document_id", "file_id",
        "source_content_type", "source_name", "source_url",
    ).agg(F.collect_list(part).alias("partitions"))
    ordered = F.array_sort(
        F.col("partitions"),
        lambda l, r: F.when(l["relevance"] > r["relevance"], -1)
        .when(l["relevance"] < r["relevance"], 1)
        .otherwise(
            F.when(l["partition_number"] < r["partition_number"], -1)
            .when(l["partition_number"] > r["partition_number"], 1)
            .otherwise(0)
        ),
    )
    return collected.withColumn("partitions", ordered)


def flatten_citations(citations: DataFrame) -> DataFrame:
    """Citation rows -> flat (citation fields x partition fields) rows with
    the partition's ordinal inside the citation (for SQL-comparable output)."""
    exploded = citations.select(
        "link", "index", "document_id", "file_id",
        "source_content_type", "source_name",
        F.posexplode("partitions").alias("partition_order", "p"),
    )
    return exploded.select(
        "link", "index", "document_id", "file_id",
        "source_content_type", "source_name", "partition_order",
        F.col("p.text").alias("text"),
        F.col("p.relevance").alias("relevance"),
        F.col("p.partition_number").alias("partition_number"),
        F.col("p.section_number").alias("section_number"),
    )
