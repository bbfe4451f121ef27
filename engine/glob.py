"""Glob path-pattern matching — translation, suffix semantics, fallback.

Re-expresses the reference's glob utilities
(/root/reference/src/glob_utils.rs:17-65) for Spark:

- glob -> regex translation (``*`` stays within one path component,
  ``**`` crosses components, ``?`` one char, ``[...]`` classes,
  ``{a,b}`` alternation — globset semantics);
- the match-every-path-suffix trick: ``lib/**`` must match
  ``/project/lib/utils.ts`` — a wildcard pattern is tried against the
  path and every '/'-suffix of it (one anchored regex does all suffixes
  at once: ``(?:^|/)<glob-regex>$``);
- the invalid-glob substring fallback: a pattern that fails to compile
  degrades to plain substring containment (glob_utils.rs:55-63);
- empty pattern list matches everything (glob_utils.rs:18-20).

Spark-side the whole operator is ONE ``rlike`` per pattern (JVM regex,
whole-stage codegen) — translation happens once on the driver.  The
generated regexes avoid lookaround so the identical string runs on RE2
engines (DuckDB oracle) and java.util.regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class GlobError(ValueError):
    """Pattern failed to compile (unbalanced class/alternation)."""


def glob_to_regex(pattern: str) -> str:
    """Translate a glob into an (unanchored) regex body.

    Raises GlobError on unbalanced ``[`` / ``{`` so callers can apply
    the substring fallback.  Component semantics follow globset:
    ``*``/``?`` never cross ``/``; ``**`` as a full component matches
    zero or more components; ``[!a-z]`` negates a class.
    """
    out: list[str] = []
    brace_depth = 0
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 2] == "**":
                # '**' component forms: '**/', '/**' (at end), bare '**'
                if (i == 0 or pattern[i - 1] == "/") and pattern[i + 2 : i + 3] == "/":
                    out.append("(?:[^/]*/)*")  # '**/' -> zero+ components
                    i += 3
                    continue
                if pattern[i + 2 : i + 3] in ("", "}", ","):
                    out.append(".*")  # trailing '**' -> anything incl '/'
                    i += 2
                    continue
                out.append(".*")  # embedded '**' (globset treats as '.*')
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":  # ']' first = literal
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                raise GlobError(f"unbalanced character class in {pattern!r}")
            cls = pattern[i + 1 : j]
            if cls.startswith("!"):
                cls = "^" + cls[1:]
            neg = cls.startswith("^")
            body = cls[1:] if neg else cls
            # Escape tokens whose class-body meaning differs across regex
            # engines: java.util.regex treats an unescaped '[' as a nested
            # class opener (PatternSyntaxException), '&&' as intersection,
            # and a leading ']' as a syntax error; RE2/Python accept the
            # escaped forms identically, so the one emitted string stays
            # valid on both the Spark (JVM) and DuckDB (RE2) sides.
            body = body.replace("\\", "\\\\").replace("[", "\\[").replace("&", "\\&")
            if body.startswith("]"):
                body = "\\" + body
            out.append("[" + ("^" if neg else "") + body + "]")
            i = j
        elif c == "{":
            brace_depth += 1
            out.append("(?:")
        elif c == "}":
            if brace_depth == 0:
                raise GlobError(f"unbalanced '}}' in {pattern!r}")
            brace_depth -= 1
            out.append(")")
        elif c == "," and brace_depth > 0:
            out.append("|")
        else:
            if c in r"\.+()|^$":
                out.append("\\" + c)
            else:
                out.append(c)
        i += 1
    if brace_depth != 0:
        raise GlobError(f"unbalanced '{{' in {pattern!r}")
    return "".join(out)


def _anchored_regex(pattern: str) -> str:
    """Full regex implementing the reference's per-pattern semantics in
    ONE anchored expression: try the full path, the path without leading
    slashes, and (for wildcard patterns) every '/'-component suffix."""
    body = glob_to_regex(pattern)
    if "*" in pattern or "?" in pattern:
        # suffix trick: match starting at ^ or after any '/'
        return f"(?:^/*|/)(?:{body})$"
    return f"^/*(?:{body})$"


def matches_glob(path: str, pattern: str) -> bool:
    """Single-pattern match with reference semantics (incl. fallback)."""
    import re

    try:
        return re.search(_anchored_regex(pattern), path) is not None
    except GlobError:
        return pattern in path  # invalid glob -> substring containment


def matches_any_pattern(path: str, patterns: list[str]) -> bool:
    """Driver-side mirror of glob_utils.rs::matches_any_pattern."""
    if not patterns:
        return True
    return any(matches_glob(path, p) for p in patterns)


def glob_match_col(col: Column, pattern: str) -> Column:
    """Spark Column: does ``col`` match ``pattern``?  One rlike (or one
    contains for the invalid-glob fallback) — JVM-side, codegen'd."""
    try:
        return col.rlike(_anchored_regex(pattern))
    except GlobError:
        return col.contains(pattern)


def glob_filter_expr(col: Column, patterns: list[str]) -> Column:
    """OR across patterns; empty list matches everything."""
    if not patterns:
        return F.lit(True)
    expr = glob_match_col(col, patterns[0])
    for p in patterns[1:]:
        expr = expr | glob_match_col(col, p)
    return expr


def oracle_regex(pattern: str) -> str | None:
    """The anchored regex as a literal for an external SQL oracle
    (RE2-compatible: no lookaround emitted).  None => substring fallback."""
    try:
        return _anchored_regex(pattern)
    except GlobError:
        return None
