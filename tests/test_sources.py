"""Catalog commit/resume semantics + synthetic corpus properties."""

import pytest
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.sources.catalog import ParquetCatalog
from chameleon_entity_linking_spark.sources.synth import SynthConfig, synth_tables


@pytest.fixture()
def catalog(tmp_path):
    return ParquetCatalog(str(tmp_path / "warehouse"))


class TestCatalog:
    def test_commit_and_read(self, spark, catalog):
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        snap = catalog.write("t", df, lineage={"stage": "unit"})
        assert snap.snapshot_id == 0 and snap.row_count == 10
        back = catalog.read(spark, "t")
        assert back.count() == 10
        assert catalog.exists("t") and not catalog.exists("nope")

    def test_append_accumulates(self, spark, catalog):
        catalog.write("t", spark.range(5))
        catalog.write("t", spark.range(5, 8), mode="append")
        assert catalog.read(spark, "t").count() == 8
        assert catalog.current_snapshot("t").snapshot_id == 1

    def test_overwrite_replaces(self, spark, catalog):
        catalog.write("t", spark.range(5))
        catalog.write("t", spark.range(2))
        assert catalog.read(spark, "t").count() == 2

    def test_time_travel(self, spark, catalog):
        catalog.write("t", spark.range(5))
        catalog.write("t", spark.range(100))
        assert catalog.read_snapshot(spark, "t", 0).count() == 5

    def test_uncommitted_raises(self, spark, catalog):
        with pytest.raises(FileNotFoundError):
            catalog.read(spark, "missing")

    def test_per_partition_lineage(self, spark, catalog):
        # north rule "per-partition lineage + metrics": the manifest
        # records one entry per written file/partition with its row
        # count (from parquet footers — no data re-scan), summing to
        # the snapshot row_count
        df = spark.range(100).withColumn(
            "cls", F.when(F.col("id") % 2 == 0, "even").otherwise("odd")
        )
        snap = catalog.write("t", df, partition_by=["cls"])
        assert snap.row_count == 100
        assert snap.partitions, "per-partition entries missing"
        assert sum(p["rows"] for p in snap.partitions) == 100
        prefixes = {p["path"].split("/")[0] for p in snap.partitions}
        assert prefixes == {"cls=even", "cls=odd"}


class TestSynth:
    @pytest.fixture(scope="class")
    def tables(self, spark):
        cfg = SynthConfig(n_entities=40, seed=42)
        return synth_tables(spark, cfg), cfg

    def test_schema_matches_input_hint(self, tables):
        docs = tables[0]["documents"]
        assert [f.name for f in docs.schema.fields] == ["doc_id", "spans"]
        span_type = docs.schema["spans"].dataType.elementType
        assert [f.name for f in span_type.fields] == [
            "kind",
            "text",
            "media_ref",
            "offset",
        ]

    def test_deterministic(self, spark):
        cfg = SynthConfig(n_entities=12, seed=7)
        a = synth_tables(spark, cfg)["documents"].orderBy("doc_id").collect()
        b = synth_tables(spark, cfg)["documents"].orderBy("doc_id").collect()
        assert a == b

    def test_offsets_are_span_order(self, tables):
        docs = tables[0]["documents"]
        bad = docs.select(
            F.exists(
                F.expr(
                    "transform(spans, (s, i) -> s.offset = i)"
                ),
                lambda ok: ~ok,
            ).alias("bad")
        ).where("bad")
        assert bad.count() == 0

    def test_labels_reference_existing_docs(self, tables):
        t = tables[0]
        ids = t["documents"].select("doc_id")
        orphans = (
            t["labels"]
            .select(F.col("doc_a").alias("doc_id"))
            .union(t["labels"].select("doc_b"))
            .join(ids, "doc_id", "left_anti")
        )
        assert orphans.count() == 0

    def test_has_positives_and_hard_negatives(self, tables):
        labels = tables[0]["labels"]
        counts = dict(
            labels.groupBy("is_match").count().rdd.map(tuple).collect()
        )
        assert counts.get(True, 0) > 20
        assert counts.get(False, 0) > 10

    def test_clusters_cover_all_docs(self, tables):
        t = tables[0]
        assert (
            t["expected_clusters"].count() == t["documents"].count()
        )

    def test_media_refs_exact_within_entity(self, tables):
        docs = tables[0]["documents"]
        refs = docs.select(
            F.substring("doc_id", 1, 9).alias("ent"),
            F.array_sort(
                F.transform(
                    F.filter("spans", lambda s: s["media_ref"] != ""),
                    lambda s: s["media_ref"],
                )
            ).alias("refs"),
        )
        distinct_per_ent = refs.groupBy("ent").agg(
            F.countDistinct("refs").alias("n")
        )
        assert distinct_per_ent.where("n > 1").count() == 0


class TestAppendTotals:
    def test_total_rows_accumulates_across_appends(self, spark, catalog):
        """row_count stays the per-commit delta; total_rows is the
        table-level count read() exposes — the number driver-side
        sizing (connected_components canonical_count) must use."""
        catalog.write("acc", spark.range(10))
        snap = catalog.write("acc", spark.range(5), mode="append")
        assert snap.row_count == 5
        assert snap.total_rows == 15
        assert catalog.read(spark, "acc").count() == 15
        over = catalog.write("acc", spark.range(3))
        assert over.row_count == 3 and over.total_rows == 3
