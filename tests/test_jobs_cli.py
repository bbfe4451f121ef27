"""spark-submit entrypoint: op dispatch end-to-end on a tmp table."""

import json

from engine import corpus
from engine.jobs.maintain import main
from engine.tablefmt import Table


def test_maintain_cli_pipeline(spark, tmp_path, capsys):
    root = str(tmp_path / "t")
    src = str(tmp_path / "src")
    corpus.generate_corpus(spark, n_files=120, n_repos=4, partitions=4).write.parquet(src)

    assert main(["--table", root, "--op", "create"]) == 0
    assert main(["--table", root, "--op", "append", "--input", src, "--num-files", "6"]) == 0
    assert main(["--table", root, "--op", "compact", "--target-mb", "64"]) == 0
    assert main(["--table", root, "--op", "cluster", "--curve", "hilbert"]) == 0
    assert main(["--table", root, "--op", "rewrite-manifests"]) == 0
    assert main(["--table", root, "--op", "expire", "--retain-last", "1"]) == 0
    assert main(["--table", root, "--op", "verify"]) == 0

    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    by_op = {d["op"]: d for d in lines}
    assert by_op["append"]["added_rows"] == 120
    assert by_op["compact"]["files_in"] == 6 and by_op["compact"]["files_out"] == 1
    assert by_op["verify"]["rows"] == 120
    assert Table.load(root).total_rows() == 120
    # merge a delta through the CLI
    delta_dir = str(tmp_path / "delta")
    base = corpus.generate_corpus(spark, n_files=120, n_repos=4, partitions=4, version_col=True)
    corpus.bump_versions(base.limit(3)).drop("version").write.parquet(delta_dir)
    assert main(["--table", root, "--op", "merge", "--input", delta_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_updated"] == 3 and out["rows_inserted"] == 0
