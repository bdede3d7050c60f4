"""MemoryRecord semantics: PrepareRecord tags/payload, id format, schema
self-upgrade, purge-on-reupload (FIXTURES.md §4/§6)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from kernel_memory_spark import schema as S
from kernel_memory_spark.operators import (
    embeddings as emb,
    extract as ext,
    partition as prt,
    save_records as sav,
)
from kernel_memory_spark.sources.tables import TableCatalog
from kernel_memory_spark.synth import synth_corpus, synth_doc_tags


def build(spark, n_docs=10):
    corpus = synth_corpus(spark, n_docs)
    tags = synth_doc_tags(spark, n_docs)
    extracted = ext.extract(corpus)
    parts = prt.partition(extracted, max_tokens=60, overlap=0)
    vecs = emb.gen_embeddings(parts)
    return sav.build_records(parts, vecs, tags, extracted, "exec-1")


class TestPrepareRecord:
    def test_reserved_tags_present(self, spark):
        rec = build(spark).first()
        tags = rec.tags
        for key in [S.TAG_DOCUMENT_ID, S.TAG_FILE_ID, S.TAG_FILE_PART,
                    S.TAG_PART_N, S.TAG_SECT_N, S.TAG_FILE_TYPE]:
            assert key in tags, key
        assert tags[S.TAG_FILE_TYPE] == ["text/plain"]
        # user tags copied (tags.CopyTo, SaveRecordsHandler.cs:438)
        assert "type" in tags and "ext" in tags and "user" in tags

    def test_record_id_format(self, spark):
        recs = build(spark)
        bad = recs.filter(
            ~F.col("id").rlike(r"^d=doc-\d{9}//p=[0-9a-f]{32}\.partition\.\d+$")
        ).count()
        assert bad == 0

    def test_payload_fields(self, spark):
        rec = build(spark).first()
        p = rec.payload
        assert p.schema == S.PAYLOAD_SCHEMA_VERSION
        assert p.file == rec.doc_id + ".txt"
        assert p.url == ""
        assert p.vector_provider == "feature-hash"
        assert p.text  # partition content present
        # vector is unit-normalized float32
        import math
        norm = math.sqrt(sum(v * v for v in rec.vector))
        assert abs(norm - 1.0) < 1e-3

    def test_schema_self_upgrade(self, spark):
        # MemoryRecord.cs:111-143: missing schema -> url='' + stamp version
        df = spark.createDataFrame(
            [
                Row(
                    id="d=x//p=y",
                    vector=[1.0],
                    tags={},
                    payload=Row(
                        text="t", file="f", url=None, last_update="lu",
                        vector_provider="vp", vector_generator="vg", schema=None,
                    ),
                    doc_id="x",
                    execution_id="e",
                )
            ],
            S.RECORDS,
        )
        up = sav.upgrade_records(df).first().payload
        assert up.schema == S.PAYLOAD_SCHEMA_VERSION
        assert up.url == ""

    def test_upgrade_preserves_existing(self, spark):
        df = spark.createDataFrame(
            [
                Row(
                    id="d=x//p=y", vector=[1.0], tags={},
                    payload=Row(
                        text="t", file="f", url="http://u", last_update="lu",
                        vector_provider="vp", vector_generator="vg",
                        schema="20231218A",
                    ),
                    doc_id="x", execution_id="e",
                )
            ],
            S.RECORDS,
        )
        up = sav.upgrade_records(df).first().payload
        assert up.url == "http://u" and up.schema == "20231218A"


class TestPurge:
    def test_purge_on_reupload(self, spark, tmp_catalog_root):
        # SaveRecordsHandler.DeletePreviousRecordsAsync (:297-323): records of
        # the same docs from prior executions die unless their id is kept.
        cat = TableCatalog(tmp_catalog_root)

        def rec(id_, doc, exe):
            return Row(
                id=id_, vector=[1.0], tags={},
                payload=Row(text="t", file="f", url="", last_update="lu",
                            vector_provider="vp", vector_generator="vg",
                            schema="20231218A"),
                doc_id=doc, execution_id=exe,
            )

        old = spark.createDataFrame(
            [rec("d=a//p=1", "a", "e1"), rec("d=a//p=2", "a", "e1"),
             rec("d=b//p=9", "b", "e1")],
            S.RECORDS,
        )
        cat.overwrite(old, "records")

        # re-upload doc a: keeps p=1 (same id), drops p=2, adds p=3
        new = spark.createDataFrame(
            [rec("d=a//p=1", "a", "e2"), rec("d=a//p=3", "a", "e2")], S.RECORDS
        )
        sav.purge_previous_executions(spark, cat, new)
        cat.merge(spark, "records", new, ["id"])

        ids = {r.id for r in cat.read(spark, "records").collect()}
        assert ids == {"d=a//p=1", "d=a//p=3", "d=b//p=9"}
        # untouched doc b survives; superseded d=a//p=2 purged
        exe = {r.id: r.execution_id for r in cat.read(spark, "records").collect()}
        assert exe["d=a//p=1"] == "e2"  # upserted to current execution


class TestJsonRoundTrip:
    def test_record_json_round_trip(self, spark):
        # MemoryRecordTest.cs:11-107: JSON round-trip preserves id/tags/payload
        from pyspark.sql import functions as F
        from kernel_memory_spark import schema as S

        recs = build(spark, 5).drop("vector")  # float32 json round-trip excluded
        as_json = recs.select(F.to_json(F.struct(*recs.columns)).alias("j"))
        schema_no_vec = "struct<" + ",".join(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in S.RECORDS.fields if f.name != "vector"
        ) + ">"
        back = as_json.select(F.from_json("j", schema_no_vec).alias("r")).select("r.*")
        a = sorted(recs.collect(), key=lambda r: r.id)
        b = sorted(back.collect(), key=lambda r: r.id)
        assert [r.id for r in a] == [r.id for r in b]
        assert [r.tags for r in a] == [r.tags for r in b]
        assert [r.payload for r in a] == [r.payload for r in b]
        assert all(r.payload.schema == S.PAYLOAD_SCHEMA_VERSION for r in b)
