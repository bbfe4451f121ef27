"""Gitignore-pattern compiler — pattern list -> exclusion predicate.

Re-expresses the ignore-file semantics the reference gets from the
``ignore`` crate's standard filters
(/root/reference/src/indexer/file_walker/mod.rs:77-84: WalkBuilder with
``standard_filters(true)`` / ``git_ignore(true)``), as (a) a compiled
rule list, (b) ONE Spark Column predicate, (c) a driver-side evaluator
for property tests and tiny listings.  Semantics follow gitignore(5):

- blank lines and ``#`` comments are skipped; trailing unescaped
  spaces are stripped; a leading ``\\#`` / ``\\!`` escapes the marker;
- ``!pattern`` negates (re-includes); the LAST matching rule wins;
- a trailing ``/`` makes the rule directory-only;
- a rule containing a ``/`` (other than a trailing one) is ANCHORED to
  the ignore file's root; otherwise it matches the basename at any
  depth;
- glob syntax is the shared translator in :mod:`engine.glob`
  (``*``/``?`` stay within a component, ``**`` crosses components,
  classes, alternation);
- once a DIRECTORY is ignored everything below it is ignored — deeper
  negations cannot re-include (git never descends into an excluded
  directory).

Spark shape (100-TB): the predicate is pure JVM codegen, no UDF.  For a
path ``a/b/c.txt`` we evaluate the rule chain on every '/'-prefix
(``a`` [dir], ``a/b`` [dir], ``a/b/c.txt`` [file]) via
``transform(sequence(...))`` + ``exists`` higher-order functions; each
prefix's status is a when()-chain in REVERSE rule order
(last-match-wins), and the path is excluded iff ANY prefix resolves to
"ignored" — exactly the no-descend rule.  Cost is O(components x
rules) branch evaluations per row, all whole-stage codegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .glob import GlobError, glob_to_regex


@dataclass(frozen=True)
class Rule:
    pattern: str  # cleaned glob body (no '!' prefix, no trailing '/')
    negated: bool
    dir_only: bool
    anchored: bool
    regex: str  # anchored regex evaluated against each path prefix


def _clean_line(line: str) -> str | None:
    """gitignore(5) line cleanup; None => not a rule."""
    if not line or line.startswith("#"):
        return None
    # strip trailing spaces unless backslash-escaped
    stripped = re.sub(r"(?<!\\) +$", "", line)
    if not stripped:
        return None
    return stripped


def compile_rules(lines: list[str]) -> list[Rule]:
    rules: list[Rule] = []
    for raw in lines:
        line = _clean_line(raw.rstrip("\n"))
        if line is None:
            continue
        negated = line.startswith("!")
        if negated:
            line = line[1:]
        if line.startswith("\\#") or line.startswith("\\!"):
            line = line[1:]
        dir_only = line.endswith("/")
        if dir_only:
            line = line.rstrip("/")
        anchored = "/" in line
        if anchored:
            line = line.lstrip("/")
        if not line:
            continue
        try:
            body = glob_to_regex(line)
        except GlobError:
            body = re.escape(line)  # invalid glob -> literal (glob.py policy)
        # anchored rules match the prefix path from the root; unanchored
        # rules match its basename at any depth
        rx = f"^(?:{body})$" if anchored else f"(?:^|/)(?:{body})$"
        rules.append(Rule(line, negated, dir_only, anchored, rx))
    return rules


def _chain_status_col(d: Column, is_dir: Column, rules: list[Rule]) -> Column:
    """Status of ONE prefix: when()-chain in reverse rule order (the
    first listed branch checked is the LAST rule -> last-match-wins);
    no rule matching => not ignored."""
    expr = None
    for r in reversed(rules):
        cond = d.rlike(r.regex)
        if r.dir_only:
            cond = cond & is_dir
        branch_val = F.lit(not r.negated)
        expr = (
            F.when(cond, branch_val)
            if expr is None
            else expr.when(cond, branch_val)
        )
    return F.lit(False) if expr is None else expr.otherwise(F.lit(False))


def ignored_col(path: Column, rules: list[Rule]) -> Column:
    """True iff ``path`` (a '/'-separated file path, no leading slash)
    is excluded by ``rules``.  Pure built-in HOFs — codegen, no UDF."""
    if not rules:
        return F.lit(False)
    comps = F.split(path, "/")
    n = F.size(comps)
    prefixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.array_join(F.slice(comps, 1, i), "/").alias("d"),
            (i < n).alias("isdir"),
        ),
    )
    return F.exists(
        prefixes, lambda s: _chain_status_col(s["d"], s["isdir"], rules)
    )


def ignored_path(path: str, rules: list[Rule]) -> bool:
    """Driver-side twin of :func:`ignored_col` (same rule objects, the
    Python ``re`` engine).  For tiny listings and the property test
    pinning the Spark HOF construction to this reference."""
    comps = path.split("/")
    for i in range(1, len(comps) + 1):
        d = "/".join(comps[:i])
        is_dir = i < len(comps)
        status = False
        for r in rules:  # forward fold: later rules overwrite
            if r.dir_only and not is_dir:
                continue
            if re.search(r.regex, d):
                status = not r.negated
        if status:
            return True
    return False


def oracle_predicate_sql(path_sql: str, rules: list[Rule]) -> str:
    """DuckDB boolean SQL equivalent of :func:`ignored_col` for driver
    oracles: list_transform over path prefixes + a reverse-order CASE
    chain per prefix."""
    if not rules:
        return "FALSE"

    def case_chain(d: str, isdir: str) -> str:
        branches = []
        for r in reversed(rules):
            cond = f"regexp_matches({d}, '{r.regex}')"
            if r.dir_only:
                cond += f" AND {isdir}"
            branches.append(f"WHEN {cond} THEN {'FALSE' if r.negated else 'TRUE'}")
        return "CASE " + " ".join(branches) + " ELSE FALSE END"

    chain = case_chain("array_to_string(string_split(" + path_sql + ", '/')[1:CAST(i AS INTEGER)], '/')",
                       f"i < len(string_split({path_sql}, '/'))")
    return (
        f"len(list_filter(range(1, len(string_split({path_sql}, '/')) + 1), "
        f"i -> {chain})) > 0"
    )
