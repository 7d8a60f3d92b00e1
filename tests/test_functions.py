"""Unit tests for the vectorized kernels (SURVEY.md §5.1)."""

import duckdb
import numpy as np
import pytest

from chameleon_entity_linking_spark.functions.embed import cosine_batch, encode_batch
from chameleon_entity_linking_spark.functions.minhash import (
    band_keys_from_signature,
    minhash_fast_batch,
    minhash_md5,
)
from chameleon_entity_linking_spark.functions.strsim import (
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein,
    levenshtein_batch,
    levenshtein_ratio_batch,
)
from chameleon_entity_linking_spark.functions.textstats import (
    detect_lang,
    rolling_fingerprint,
    simhash64,
)
from chameleon_entity_linking_spark.functions.tokenize import bpe_ish_tokens, char_shingles


class TestLevenshtein:
    @pytest.mark.parametrize(
        "a,b,d",
        [
            ("", "", 0),
            ("a", "", 1),
            ("", "abc", 3),
            ("abc", "abc", 0),
            ("kitten", "sitting", 3),
            ("flaw", "lawn", 2),
            ("ab", "ba", 2),
            ("über", "uber", 1),
        ],
    )
    def test_known_values(self, a, b, d):
        assert levenshtein(a, b) == d

    def test_batch(self):
        out = levenshtein_batch(["kitten", "x"], ["sitting", "x"])
        assert out.tolist() == [3, 0]

    def test_ratio(self):
        out = levenshtein_ratio_batch(["abcd", "", "ab"], ["abcd", "", "cd"])
        assert out.tolist() == [1.0, 1.0, 0.0]

    def test_duckdb_parity_random(self):
        rng = np.random.RandomState(1)
        letters = np.array(list("abcdef "))
        con = duckdb.connect()
        for _ in range(150):
            a = "".join(rng.choice(letters, rng.randint(0, 18)))
            b = "".join(rng.choice(letters, rng.randint(0, 18)))
            assert levenshtein(a, b) == con.execute(
                "select levenshtein(?, ?)", [a, b]
            ).fetchone()[0]


class TestJaroWinkler:
    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("martha", "marhta", 0.9611111111111111),
            ("dixon", "dicksonx", 0.8133333333333332),
            ("dwayne", "duane", 0.8400000000000001),
            ("a", "a", 1.0),
            ("", "", 0.0),  # DuckDB/rapidfuzz convention
            ("ab", "ba", 0.0),
        ],
    )
    def test_known_values(self, a, b, expected):
        assert jaro_winkler(a, b) == pytest.approx(expected, abs=1e-12)

    def test_duckdb_parity_random(self):
        rng = np.random.RandomState(2)
        letters = np.array(list("abcde"))
        con = duckdb.connect()
        for _ in range(200):
            a = "".join(rng.choice(letters, rng.randint(0, 15)))
            b = "".join(rng.choice(letters, rng.randint(0, 15)))
            dj, djw = con.execute(
                "select jaro_similarity(?,?), jaro_winkler_similarity(?,?)",
                [a, b, a, b],
            ).fetchone()
            assert jaro(a, b) == pytest.approx(dj, abs=1e-12), (a, b)
            assert jaro_winkler(a, b) == pytest.approx(djw, abs=1e-12), (a, b)

    def test_batch(self):
        out = jaro_winkler_batch(["martha"], ["marhta"])
        assert out[0] == pytest.approx(0.9611111111111111)


class TestBatchKernelsMatchScalar:
    """The 2-D vectorized batch kernels must be BIT-identical to the
    scalar references (which are themselves DuckDB-parity-tested):
    random mixed-length pairs + adversarial edges in one batch."""

    def _cases(self):
        rng = np.random.RandomState(3)
        letters = np.array(list("abcdef é中 .-"))
        cases = [
            ("", ""), ("", "abc"), ("abc", ""), ("a", "a"),
            ("martha", "marhta"), ("dixon", "dicksonx"),
            ("ab", "ba"), ("aaaa", "aaaa"), ("éclair", "eclair"),
        ]
        for _ in range(400):
            a = "".join(rng.choice(letters, rng.randint(0, 60)))
            b = "".join(rng.choice(letters, rng.randint(0, 60)))
            cases.append((a, b))
        return cases

    def test_levenshtein_batch_equals_scalar(self):
        cases = self._cases()
        out = levenshtein_batch([a for a, _ in cases], [b for _, b in cases])
        for i, (a, b) in enumerate(cases):
            assert out[i] == levenshtein(a, b), (a, b)

    def test_jaro_winkler_batch_equals_scalar(self):
        cases = self._cases()
        out = jaro_winkler_batch([a for a, _ in cases], [b for _, b in cases])
        for i, (a, b) in enumerate(cases):
            assert out[i] == jaro_winkler(a, b), (a, b)


class TestMinhash:
    def test_md5_family_deterministic(self):
        s = ["abc", "bcd", "cde"]
        assert minhash_md5(s) == minhash_md5(list(reversed(s)))
        assert minhash_md5([]) == ["f" * 16] * 16

    def test_fast_batch_similarity_monotone(self):
        a = char_shingles(["the", "quick", "brown", "fox"])
        b = char_shingles(["the", "quick", "brown", "fix"])  # near-dup
        c = char_shingles(["entirely", "different", "words"])
        sigs = minhash_fast_batch([a, b, c], n_hashes=128)
        sim_ab = (sigs[0] == sigs[1]).mean()
        sim_ac = (sigs[0] == sigs[2]).mean()
        assert sim_ab > 0.5 > sim_ac

    def test_fast_batch_deterministic(self):
        a = [char_shingles(["hello", "world"])]
        s1 = minhash_fast_batch(a)
        s2 = minhash_fast_batch(a)
        np.testing.assert_array_equal(s1, s2)

    def test_band_keys(self):
        sig = list(range(64))
        keys = band_keys_from_signature(sig, n_bands=16, rows_per_band=4)
        assert len(keys) == 16 and len(set(keys)) == 16
        assert keys[0].startswith("b0:")


class TestEmbed:
    def test_shapes_and_norm(self):
        m = encode_batch([["hello", "world"], [], ["x"]])
        assert m.shape == (3, 64)
        norms = np.linalg.norm(m, axis=1)
        assert norms[0] == pytest.approx(1.0, abs=1e-6)
        assert norms[1] == 0.0

    def test_cosine_separates(self):
        m = encode_batch(
            [
                ["acme", "corporation", "builds", "rockets"],
                ["acme", "corporatoin", "builds", "rockets"],
                ["zebra", "penguin", "iceberg"],
            ]
        )
        near = cosine_batch(m[0:1], m[1:2])[0]
        far = cosine_batch(m[0:1], m[2:3])[0]
        assert near > 0.6 > far

    def test_cosine_zero_safe(self):
        z = np.zeros((1, 4), dtype=np.float32)
        assert cosine_batch(z, z)[0] == 0.0


class TestTextStats:
    def test_detect_lang(self):
        en = "the cat sat on the mat and it was happy".split()
        de = "der hund ist nicht in der stadt und das ist gut".split()
        assert detect_lang(en) == "en"
        assert detect_lang(de) == "de"
        assert detect_lang(["zzz"]) == "und"
        assert detect_lang([]) == "und"

    def test_detect_lang_tie_breaks_alphabetically_first(self):
        # one marker from each of de and en -> tied scores; the kernel
        # must agree with q_lang_id's earliest-alphabetical tie-break
        tied = ["der", "the"]
        assert detect_lang(tied) == "de"

    def test_fingerprint_stability(self):
        base = "the quick brown fox jumps over the lazy dog " * 3
        assert rolling_fingerprint(base) == rolling_fingerprint(base)
        # a single distant edit keeps most winnowed mins
        edited = base[:-1] + "!"
        a = set(rolling_fingerprint(base).split("-"))
        b = set(rolling_fingerprint(edited).split("-"))
        assert len(a & b) >= 2

    def test_simhash_near(self):
        a = simhash64("the quick brown fox jumps high".split())
        b = simhash64("the quick brown fox jumps higher".split())
        c = simhash64("totally unrelated set of words".split())
        ham_ab = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        ham_ac = bin((a ^ c) & ((1 << 64) - 1)).count("1")
        assert ham_ab < ham_ac
        assert simhash64([]) == 0

    def test_bpe_ish(self):
        assert bpe_ish_tokens("Hello, world42!") == ["Hello", ",", "world", "42", "!"]
