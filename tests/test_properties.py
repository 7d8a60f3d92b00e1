"""Property-based tests (hypothesis) for the similarity kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from chameleon_entity_linking_spark.functions.minhash import (
    band_keys_from_signature,
    minhash_fast_batch,
)
from chameleon_entity_linking_spark.functions.strsim import (
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein,
    levenshtein_batch,
)

TEXT = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=30)


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_levenshtein_symmetry_and_bounds(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@settings(max_examples=100, deadline=None)
@given(TEXT, TEXT, TEXT)
def test_levenshtein_triangle_inequality(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_jaro_winkler_bounds_and_symmetry(a, b):
    j = jaro(a, b)
    jw = jaro_winkler(a, b)
    assert 0.0 <= j <= 1.0 and 0.0 <= jw <= 1.0
    assert jw >= j - 1e-12  # winkler boost never decreases
    assert jaro(b, a) == j
    if a and b and a == b:
        assert jw == 1.0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=40))
def test_batch_kernels_bit_identical_to_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    lv = levenshtein_batch(a, b)
    jv = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert lv[i] == levenshtein(x, y), (x, y)
        assert jv[i] == jaro_winkler(x, y), (x, y)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), max_size=20))
def test_minhash_permutation_invariant(shingles):
    import numpy as np

    a = minhash_fast_batch([shingles])
    b = minhash_fast_batch([list(reversed(shingles))])
    np.testing.assert_array_equal(a, b)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=64, max_size=64))
def test_band_keys_stable_and_distinct_prefixes(sig):
    keys = band_keys_from_signature(sig, 16, 4)
    assert keys == band_keys_from_signature(list(sig), 16, 4)
    assert [k.split(":")[0] for k in keys] == [f"b{i}" for i in range(16)]
