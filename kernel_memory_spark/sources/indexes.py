"""Index lifecycle over the snapshot catalog (SURVEY §2 "index lifecycle").

Re-expresses the reference's index semantics:

- name normalization: trim + lowercase + [\\s\\/._:]+ -> '-', empty ->
  default (SimpleVectorDb.cs:196-205 NormalizeIndexName; the same regex as
  functions/text.normalize_index_name, applied driver-side here because
  index names are metadata, not data);
- create is idempotent (IndexCreationTest.ItDoesntFailIfTheIndexExistsAlready);
- delete of a missing index is a no-op
  (MissingIndexTest.ItHandlesMissingIndexesConsistently);
- reads/searches of a missing index return EMPTY, not an error
  (MissingIndexTest: SearchAsync on missing index -> 0 results);
- upsert creates the index on IndexNotFound and retries — the
  create-once-then-retry loop of SaveRecordsHandler.cs:261-295;
- list returns the normalized names (IndexListTest.ItListsIndexes).

Each index is a records table named `idx__{name}` in the TableCatalog, so
every index keeps the catalog's snapshot-isolation guarantees.
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame, SparkSession

from kernel_memory_spark import schema as S
from kernel_memory_spark.sources.tables import TableCatalog

_PREFIX = "idx__"
_NORMALIZE_RE = re.compile(r"[\s\\/._:]+")


class IndexNotFoundError(KeyError):
    """IndexNotFoundException analog — raised only by strict read paths;
    query paths translate it to an empty result."""


def normalize_index_name(name: str | None, default: str = "default") -> str:
    """SimpleVectorDb.NormalizeIndexName: trim, lowercase, squash the
    reserved separator class to '-'; empty -> default."""
    cleaned = _NORMALIZE_RE.sub("-", (name or "").strip().lower()).strip()
    return cleaned or default


class IndexCatalog:
    def __init__(self, catalog: TableCatalog):
        self.catalog = catalog

    def _table(self, index: str) -> str:
        return _PREFIX + normalize_index_name(index)

    # -- lifecycle ----------------------------------------------------------

    def list_indexes(self) -> List[str]:
        import os

        out = []
        root = self.catalog.root
        for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
            if d.startswith(_PREFIX) and self.catalog.exists(d):
                out.append(d[len(_PREFIX):])
        return out

    def index_exists(self, index: str) -> bool:
        return self.catalog.exists(self._table(index))

    def create_index(self, spark: SparkSession, index: str) -> None:
        """Idempotent create: an existing index is left untouched."""
        if self.index_exists(index):
            return
        empty = spark.createDataFrame([], S.RECORDS)
        self.catalog.overwrite(empty, self._table(index))

    def delete_index(self, index: str) -> None:
        """No-op when the index does not exist."""
        self.catalog.drop(self._table(index))

    # -- data paths ---------------------------------------------------------

    def read(self, spark: SparkSession, index: str) -> DataFrame:
        """Query-path read: a missing index yields an EMPTY frame (the
        MissingIndexTest contract), never an exception."""
        if not self.index_exists(index):
            return spark.createDataFrame([], S.RECORDS)
        return self.catalog.read(spark, self._table(index))

    def read_strict(self, spark: SparkSession, index: str) -> DataFrame:
        if not self.index_exists(index):
            raise IndexNotFoundError(normalize_index_name(index))
        return self.catalog.read(spark, self._table(index))

    def upsert(self, spark: SparkSession, index: str, records: DataFrame,
               n_buckets: int = 16) -> int:
        """Create-on-miss + upsert (SaveRecordsHandler.SaveRecordAsync:
        UpsertAsync -> IndexNotFound -> CreateIndexOnce -> retry).

        Bucket-scoped: records hash-bucket on doc_id (a record id embeds its
        doc_id, so id-keyed replacement is bucket-deterministic) and an
        upsert rewrites only the buckets it touches — at 100TB an
        incremental ingest is O(batch), not O(index)."""
        self.create_index(spark, index)
        return self.catalog.merge_bucketed(
            spark, self._table(index), records, ["id"],
            bucket_col="doc_id", n_buckets=n_buckets,
        )

    def delete_document(self, spark: SparkSession, index: str, doc_id: str) -> None:
        """Delete all records of one document; no-op on a missing index
        (MissingIndexTest: delete doc from non-existing index). Rewrites
        only the doc's hash bucket on a bucketed index."""
        if not self.index_exists(index):
            return
        self.catalog.delete_keys(
            spark, self._table(index), "doc_id", [doc_id]
        )
