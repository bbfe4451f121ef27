"""Gitignore compiler: gitignore(5) semantic cases, a property test
over generated paths, and Spark-column/driver-evaluator parity
(r4 VERDICT Missing #1 / r5 task 5)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from engine.gitignore import compile_rules, ignored_col, ignored_path

RULES = compile_rules(
    [
        "*.log",
        "!keep.log",
        "build/",
        "!build/important.md",
        "/docs/*.md",
        "temp*",
        "!temp_keep/",
        "**/node_modules/",
        "f[0-2].md",
        "# a comment",
        "",
        "   ",
    ]
)

# (path, expected_ignored) — each pins one gitignore(5) behavior
CASES = [
    ("app.log", True),  # unanchored glob
    ("keep.log", False),  # basename negation, last-match-wins
    ("src/deep/x.log", True),  # unanchored matches at any depth
    ("src/deep/keep.log", False),
    ("build/a.txt", True),  # dir-only rule excludes contents
    ("build/important.md", True),  # negation under excluded dir: stays
    ("x/build/a.txt", True),  # unanchored dir rule matches anywhere
    ("buildx/a.txt", False),  # dir rule is exact on the component
    ("docs/readme.md", True),  # root-anchored
    ("sub/docs/readme.md", False),  # anchored => not at depth
    ("docs/sub/readme.md", False),  # '*' does not cross '/'
    ("temporary/file.txt", True),  # trailing-* prefix on a dir name
    ("temp_keep/file.txt", False),  # negated dir re-included
    ("a/b/node_modules/x/y.js", True),  # '**/' crosses components
    ("node_modules/y.js", True),  # '**/' matches zero components
    ("f1.md", True),  # character class
    ("f5.md", False),
    ("src/main.py", False),  # no rule matches
]


def test_gitignore_semantic_cases():
    for path, want in CASES:
        assert ignored_path(path, RULES) is want, path


def test_comments_and_blanks_skipped():
    assert len(compile_rules(["# c", "", "   ", "a.txt"])) == 1


def test_empty_rules_keep_everything(spark):
    df = spark.createDataFrame([("a/b.txt",)], ["p"])
    kept = df.filter(~ignored_col(F.col("p"), [])).count()
    assert kept == 1


def test_spark_column_matches_driver_on_cases(spark):
    df = spark.createDataFrame([(p,) for p, _ in CASES], ["p"])
    got = {
        r.p: r.ig
        for r in df.select(
            "p", ignored_col(F.col("p"), RULES).alias("ig")
        ).collect()
    }
    for path, want in CASES:
        assert got[path] is want, path


# independent naive evaluator: pure-Python fnmatch-free re-derivation of
# the spec (no shared regex machinery) for the property test
def _naive_glob_match(glob: str, s: str) -> bool:
    def rec(gi: int, si: int) -> bool:
        while gi < len(glob):
            g = glob[gi]
            if glob[gi : gi + 2] == "**":
                rest = gi + 2
                if rest < len(glob) and glob[rest] == "/":
                    rest += 1
                return any(
                    rec(rest, k)
                    for k in range(si, len(s) + 1)
                    if k == si or True
                )
            if g == "*":
                return any(
                    rec(gi + 1, k)
                    for k in range(si, len(s) + 1)
                    if all(c != "/" for c in s[si:k])
                )
            if g == "?":
                if si >= len(s) or s[si] == "/":
                    return False
                gi, si = gi + 1, si + 1
                continue
            if si >= len(s) or s[si] != g:
                return False
            gi, si = gi + 1, si + 1
        return si == len(s)

    return rec(0, 0)


def _naive_ignored(path: str, lines: list[str]) -> bool:
    comps = path.split("/")
    for i in range(1, len(comps) + 1):
        d, is_dir = "/".join(comps[:i]), i < len(comps)
        status = False
        for raw in lines:
            if not raw or raw.startswith("#"):
                continue
            pat, neg = raw, False
            if pat.startswith("!"):
                pat, neg = pat[1:], True
            dir_only = pat.endswith("/")
            pat = pat.rstrip("/")
            anchored = "/" in pat
            pat = pat.lstrip("/")
            if dir_only and not is_dir:
                continue
            target = d if anchored else d.split("/")[-1]
            if anchored:
                hit = _naive_glob_match(pat, target)
            else:
                hit = _naive_glob_match(pat, target)
            if hit:
                status = not neg
        if status:
            return True
    return False


_COMP = st.sampled_from(["a", "b", "build", "docs", "keep", "x.log", "f1.md", "tempz"])
_LINES = st.lists(
    st.sampled_from(
        ["*.log", "!keep.log", "build/", "/docs/*.md", "temp*", "a", "!a", "b/a"]
    ),
    min_size=0,
    max_size=5,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_COMP, min_size=1, max_size=4), _LINES)
def test_property_matches_naive_evaluator(comps, lines):
    path = "/".join(comps)
    assert ignored_path(path, compile_rules(lines)) == _naive_ignored(path, lines)
