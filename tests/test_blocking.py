"""Blocking: pair completeness, canonicalization, salting exactness
(SURVEY.md §5.1 "salting (pair generated exactly once)")."""

import pytest
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.operators.block import (
    BlockConfig,
    blocking_keys,
    candidate_pairs,
)
from chameleon_entity_linking_spark.operators.normalize import normalize


def _docs(spark, rows):
    """rows: list of (doc_id, text, media_refs)."""
    data = [
        (
            doc_id,
            [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
            + [
                {"kind": "image", "text": "", "media_ref": m, "offset": i + 1}
                for i, m in enumerate(media)
            ],
        )
        for doc_id, text, media in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


class TestBlockingKeys:
    def test_key_families(self, spark):
        docs = _docs(spark, [("d1", "Acme Corp", ["mAAA"])])
        norm = normalize(docs)
        cfg = BlockConfig(debug_keys=True)
        keys = {r.key for r in blocking_keys(norm, cfg).collect()}
        assert "t:acme" in keys and "t:corp" in keys
        assert "m:mAAA" in keys
        assert sum(k.startswith("l:") for k in keys) == 16

    def test_hashed_keys_are_int64_and_family_disjoint(self, spark):
        # default (non-debug) keys are int64 — compact shuffle rows;
        # the same doc must still emit all three families
        docs = _docs(spark, [("d1", "Acme Corp", ["mAAA"])])
        df = blocking_keys(normalize(docs), BlockConfig())
        assert dict(df.dtypes)["key"] == "bigint"
        # 2 token keys + 16 band keys + 1 media key, all distinct
        assert df.count() == 19
        assert df.select("key").distinct().count() == 19

    def test_no_key_family_raises(self, spark):
        docs = _docs(spark, [("d1", "x", [])])
        cfg = BlockConfig(
            use_token_keys=False, use_lsh_keys=False, use_media_keys=False
        )
        with pytest.raises(ValueError, match="key family"):
            blocking_keys(normalize(docs), cfg)

    def test_media_only_doc_still_keyed(self, spark):
        docs = spark.createDataFrame(
            [("d1", [{"kind": "image", "text": "", "media_ref": "mX", "offset": 0}])],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        keys = {
            r.key
            for r in blocking_keys(
                normalize(docs), BlockConfig(debug_keys=True)
            ).collect()
        }
        assert "m:mX" in keys


class TestCandidatePairs:
    def test_shared_token_pairs(self, spark):
        docs = _docs(
            spark,
            [
                ("d1", "acme corp", []),
                ("d2", "acme inc", []),
                ("d3", "zebra ltd", []),
            ],
        )
        pairs, _ = candidate_pairs(normalize(docs), BlockConfig(use_lsh_keys=False))
        got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        assert ("d1", "d2") in got
        assert not any("d3" in p for p in got)

    def test_canonical_and_unique(self, spark):
        docs = _docs(
            spark,
            [(f"d{i}", "same exact name text", ["mS"]) for i in range(6)],
        )
        pairs, _ = candidate_pairs(normalize(docs), BlockConfig())
        rows = pairs.collect()
        assert all(r.doc_a < r.doc_b for r in rows)
        assert len(rows) == len({(r.doc_a, r.doc_b) for r in rows}) == 15

    def test_salting_generates_every_pair_exactly_once(self, spark):
        # one hot key with 40 members, cap 5 -> salted path (s=8 groups)
        n = 40
        docs = _docs(spark, [(f"d{i:02d}", "hotword", []) for i in range(n)])
        cfg = BlockConfig(use_lsh_keys=False, hot_key_cap=5, max_salts=16)
        pairs, metrics = candidate_pairs(normalize(docs), cfg)
        rows = pairs.collect()
        expected = {
            (f"d{i:02d}", f"d{j:02d}")
            for i in range(n)
            for j in range(i + 1, n)
        }
        assert {(r.doc_a, r.doc_b) for r in rows} == expected
        assert len(rows) == len(expected)  # exactly once
        classes = {r["class"]: r.n_docs for r in metrics.collect()}
        assert classes.get("salted") == n

    def test_ultra_hot_key_dropped_and_counted(self, spark):
        docs = _docs(spark, [(f"d{i:02d}", "stopword", []) for i in range(30)])
        cfg = BlockConfig(use_lsh_keys=False, hot_key_cap=2, max_salts=2)
        pairs, metrics = candidate_pairs(normalize(docs), cfg)
        assert pairs.count() == 0
        dropped = metrics.where(F.col("class") == "dropped").collect()
        assert len(dropped) == 1 and dropped[0].n_docs == 30

    def test_singleton_keys_generate_nothing(self, spark):
        docs = _docs(
            spark, [("d1", "unique alpha", []), ("d2", "unique beta", [])]
        )
        pairs, _ = candidate_pairs(
            normalize(docs), BlockConfig(use_lsh_keys=False)
        )
        got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        assert got == {("d1", "d2")}  # only via shared 'unique' token

    def test_fused_sketch_prefilter_equivalence(self, spark):
        # fusing the sketch cut into pair generation must equal
        # plain pair generation followed by the standalone prefilter
        from chameleon_entity_linking_spark.operators.score import (
            ScoreConfig,
            sketch_prefilter,
        )

        docs = _docs(
            spark,
            [(f"d{i}", f"entity number {i % 7} common words", []) for i in range(20)]
            + [("m1", "", ["mX"]), ("m2", "", ["mX"])],
        )
        dn = normalize(docs)
        cfg = BlockConfig()
        scfg = ScoreConfig()
        plain, _ = candidate_pairs(dn, cfg)
        fused, _ = candidate_pairs(dn, cfg, score_cfg=scfg)
        expected = {
            (r.doc_a, r.doc_b)
            for r in sketch_prefilter(plain, dn, scfg)
            .select("doc_a", "doc_b")
            .collect()
        }
        got = {(r.doc_a, r.doc_b) for r in fused.select("doc_a", "doc_b").collect()}
        assert got == expected and len(got) > 0
        # media-only docs pass the cut without any lexical signal
        assert ("m1", "m2") in got

    def test_md5_tokens_lsh_family_matches_kernel(self, spark):
        from chameleon_entity_linking_spark.functions.minhash import minhash_md5

        docs = _docs(spark, [("d1", "alpha beta gamma", [])])
        cfg = BlockConfig(
            use_token_keys=False,
            use_media_keys=False,
            lsh_family="md5_tokens",
            lsh_hashes=8,
            lsh_bands=4,
            debug_keys=True,
        )
        keys = sorted(r.key for r in blocking_keys(normalize(docs), cfg).collect())
        mh = minhash_md5(["alpha", "beta", "gamma"], n_hashes=8)
        want = sorted(
            f"l:b{i}:{mh[2 * i]}{mh[2 * i + 1]}" for i in range(4)
        )
        assert keys == want

    def test_lsh_blocks_near_duplicates_without_shared_name_tokens(self, spark):
        text_a = "the quick brown fox jumps over the lazy dog tonight"
        text_b = "the quick brown fox jumps over the lazy dog tonite"
        docs = spark.createDataFrame(
            [
                ("d1", [
                    {"kind": "text", "text": "nameone", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": text_a, "media_ref": "", "offset": 1},
                ]),
                ("d2", [
                    {"kind": "text", "text": "nametwo", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": text_b, "media_ref": "", "offset": 1},
                ]),
            ],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        cfg = BlockConfig(use_token_keys=False, use_media_keys=False)
        pairs, _ = candidate_pairs(normalize(docs), cfg)
        assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == {("d1", "d2")}


class TestFamilyCeilingBelowCap:
    def test_dropped_class_matches_pair_stream(self, spark):
        """A family ceiling BELOW hot_key_cap is legal (drop-above-N,
        never salt); keys between the ceiling and the cap must be
        CLASSIFIED dropped — the committed metrics have to match what
        the expansion actually emitted."""
        from chameleon_entity_linking_spark.operators.block import (
            expand_key_pairs,
        )

        keys = spark.createDataFrame(
            [(f"d{i}", 100, "l") for i in range(6)]  # 6-member 'l' key
            + [(f"d{i}", 200, "t") for i in range(3)],  # 3-member 't'
            "doc_id string, key long, fam string",
        )
        cfg = BlockConfig(
            hot_key_cap=8, max_key_docs=16, family_ceilings={"l": 4}
        )
        pairs, metrics = expand_key_pairs(keys, cfg)
        by_key = {r.key: r["class"] for r in metrics.collect()}
        assert by_key[100] == "dropped"  # 6 > ceiling 4, though <= cap
        assert by_key[200] == "normal"
        got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        assert got == {("d0", "d1"), ("d0", "d2"), ("d1", "d2")}
