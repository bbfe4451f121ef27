"""Glob operator: translation, suffix semantics, fallback — property-
tested against fnmatch plus the reference's own doc examples
(/root/reference/src/glob_utils.rs:8-15)."""

import fnmatch

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.glob import (
    GlobError,
    glob_to_regex,
    matches_any_pattern,
    matches_glob,
    oracle_regex,
)

PATTERNS = ["lib/**", "src/**/*.ts"]


def test_reference_doc_examples():
    # the exact cases in glob_utils.rs's doc comment
    assert matches_any_pattern("/project/lib/utils.ts", PATTERNS)
    assert matches_any_pattern("/project/src/components/Button.ts", PATTERNS)
    assert not matches_any_pattern("/project/tests/unit.rs", PATTERNS)


def test_empty_patterns_match_everything():
    assert matches_any_pattern("/any/path.rs", [])


def test_component_semantics():
    assert matches_glob("a/b/c.ts", "a/**/*.ts")
    assert matches_glob("a/c.ts", "a/**/*.ts")  # ** spans zero components
    assert matches_glob("x.md", "**/*.md")
    assert matches_glob("a/b/x.md", "**/*.md")
    assert matches_glob("a/b", "a/**")
    assert not matches_glob("a", "a/**")  # 'a/**' excludes bare 'a'
    assert not matches_glob("a/b/c", "a/*")  # '*' never crosses '/'
    assert matches_glob("a/b", "a/?")
    assert not matches_glob("a/bc", "a/?")  # '?' is exactly one char
    assert not matches_glob("a/b/c", "a/?")  # and never crosses '/'


def test_suffix_trick_only_for_wildcards():
    # wildcard pattern matched against every '/'-suffix
    assert matches_glob("/abs/path/to/lib/f.ts", "lib/**")
    # non-wildcard pattern: full path only (leading slashes stripped)
    assert matches_glob("/etc/conf", "etc/conf")
    assert not matches_glob("/a/etc/conf", "etc/conf")


def test_char_classes_and_braces():
    assert matches_glob("ab", "a[bc]")
    assert not matches_glob("ad", "a[bc]")
    assert not matches_glob("ab", "a[!bc]")
    assert matches_glob("ad", "a[!bc]")
    assert matches_glob("f.rs", "*.{rs,py}")
    assert matches_glob("f.py", "*.{rs,py}")
    assert not matches_glob("f.go", "*.{rs,py}")


def test_class_body_escaping_cross_engine():
    """'[', '&&', and leading ']' inside a class body must be escaped so
    the one emitted regex is valid on java.util.regex (Spark rlike) as
    well as RE2 (DuckDB oracle) and Python re."""
    assert matches_glob("f_[1].rs", "f_[[]1].rs")
    assert not matches_glob("f_x1].rs", "f_[[]1].rs")
    assert matches_glob("a&b", "a[&&]b")
    assert matches_glob("a]b", "a[]]b")
    assert matches_glob("axb", "a[!]]b")
    assert not matches_glob("a]b", "a[!]]b")
    # the emitted strings carry no bare '[', '&&', or leading ']' in a class
    for pat in ("f_[[]1].rs", "a[&&]b", "a[]]b"):
        rx = oracle_regex(pat)
        assert "[[" not in rx and "&&" not in rx.replace("\\&", "")


def test_invalid_glob_substring_fallback():
    # unbalanced class -> substring containment (glob_utils.rs:55-63)
    with pytest.raises(GlobError):
        glob_to_regex("[invalid")
    assert matches_glob("path/[invalid/x", "[invalid")
    assert not matches_glob("path/valid/x", "[invalid")
    with pytest.raises(GlobError):
        glob_to_regex("a{b,c")
    assert oracle_regex("[invalid") is None


@settings(max_examples=300, deadline=None)
@given(
    name=st.text(alphabet="abc./_", min_size=0, max_size=10),
    pattern=st.text(alphabet="abc.*?_", min_size=1, max_size=8),
)
def test_property_vs_fnmatch_single_component(name, pattern):
    """Where glob and fnmatch semantics coincide (no '/', '[', '{' in
    the pattern; '*'/'?' restricted to one component), the translator
    must agree with fnmatchcase exactly."""
    if "/" in name:
        return  # fnmatch '*' crosses '/', glob '*' doesn't — out of scope
    assert matches_glob(name, pattern) == fnmatch.fnmatchcase(name, pattern)


@settings(max_examples=200, deadline=None)
@given(
    parts=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=4
    ),
    ext=st.sampled_from(["rs", "py", "md"]),
)
def test_property_star_star_prefix(parts, ext):
    """'**/*.<ext>' matches every path ending in .<ext>, any depth."""
    path = "/".join(parts) + f".{ext}"
    assert matches_glob(path, f"**/*.{ext}")
    assert not matches_glob(path, "**/*.nope")
