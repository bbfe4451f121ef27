"""End-to-end training-corpus prep: gate order, keep-first shadowing,
near-dup drop, funnel arithmetic, and the CLI."""

import json

from engine.prep import FUNNEL_STAGES, prepare_training_corpus

EN = "the cat and the dog of the house sat on the mat and looked at the door "
EN2 = "a river runs through the green valley and every stone of its bed shines "


def _docs(spark):
    """One planted document per funnel outcome."""
    rows = [
        # 1: survives everything
        (1, EN * 4),
        # 2: exact duplicate of 1 -> dropped by keep-first (id 1 wins)
        (2, EN * 4),
        # 3: too short (fails len gate before anything else)
        (3, "the and of"),
        # 4: right length, no English stopwords (fails lang gate)
        (4, "lorem ipsum dolor sit amet " * 8),
        # 5: right length + English, punctuation-soaked (fails quality)
        (5, (EN[:40] + "!!!???;;;###$$$%%%&&&***((()))" ) * 4),
        # 6: near-dup of 7 (one word changed) -> larger id dropped.
        # Distinct base text from doc 1: shingle sets are SETS, so a
        # repeated shared base would near-dup 6/7 against 1 as well.
        (6, EN2 * 3 + "and the final sentence of the corpus here now"),
        (7, EN2 * 3 + "and the final MUTATED of the corpus here now"),
        # 8: exact duplicate of a QUALITY FAILURE (5) that itself
        #    passes: must NOT be shadowed by 5's smaller id
        (8, (EN[:40] + "!!!???;;;###$$$%%%&&&***((()))" ) * 4),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prepare_training_corpus_funnel_and_kept(spark):
    kept, funnel = prepare_training_corpus(_docs(spark))
    stages = {r["stage"]: r["n"] for r in funnel.collect()}
    assert set(stages) == set(FUNNEL_STAGES)
    assert stages["ingested"] == 8
    assert stages["len_ok"] == 7          # 3 is too short
    assert stages["lang_ok"] == 6         # 4 has no stopwords
    # 5 and 8 fail the punctuation gate
    assert stages["quality_ok"] == 4      # 1, 2, 6, 7
    assert stages["exact_deduped"] == 3   # 2 loses to 1
    assert stages["near_deduped"] == 2    # 7 loses to 6 (greedy)
    assert {r["doc_id"] for r in kept.collect()} == {1, 6}
    assert kept.columns == ["doc_id", "text"]


def test_prepare_training_corpus_shadow_case(spark):
    """Keep-first must pick the min id among QUALITY SURVIVORS of a sha
    group: a failing copy with a smaller id does not shadow the
    surviving copy."""
    rows = [
        (1, "x" * 50),        # fails len gate (short, and no stopwords)
        (2, EN * 4),          # passes; sha twin is 9 below
        (9, EN * 4),          # exact dup of 2 -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept, funnel = prepare_training_corpus(df)
    stages = {r["stage"]: r["n"] for r in funnel.collect()}
    assert stages["exact_deduped"] == 1 and stages["near_deduped"] == 1
    assert {r["doc_id"] for r in kept.collect()} == {2}


def test_prepare_training_corpus_components_policy(spark):
    """A near-dup chain keeps only the component minimum under the
    exact policy."""
    a = EN * 3 + "alpha beta gamma delta epsilon zeta eta theta iota kap"
    b = a.replace("beta", "MUT1")
    c = b.replace("eta ", "MUT2 ")
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    kept, _ = prepare_training_corpus(df, drop_policy="components")
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_prepare_corpus_cli(spark, tmp_path, capsys):
    from engine.jobs.prepare_corpus import main as prep_main

    src = str(tmp_path / "docs")
    _docs(spark).write.parquet(src)
    out = str(tmp_path / "kept")
    assert prep_main(["--input", src, "--output", out]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["funnel"]["ingested"] == 8
    assert line["funnel"]["near_deduped"] == 2
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 6}

    out2 = str(tmp_path / "funnel")
    assert prep_main(["--input", src, "--output", out2,
                      "--emit", "funnel"]) == 0
    got = {r["stage"]: r["n"] for r in spark.read.parquet(out2).collect()}
    assert got["ingested"] == 8 and got["near_deduped"] == 2
