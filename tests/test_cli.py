"""CLI tests (reference ``cli/cli.py`` verbs on the Spark engine)."""

import json

from gordo_components_spark.__main__ import main

CONFIG = """
globals:
  dataset: {resolution: "1D"}
machines:
  - name: machine-cli-t
    dataset: {tags: [click, view, purchase],
              train_start_date: "2024-01-01T00:00:00Z",
              train_end_date: "2024-01-20T00:00:00Z"}
"""


def test_cli_build_status_score(spark, sf_dir, tmp_path, capsys):
    cfg = tmp_path / "machines.yaml"
    cfg.write_text(CONFIG)
    reg = str(tmp_path / "registry")

    assert main(["build", "--config", str(cfg), "--sf-dir", sf_dir, "--registry", reg]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["machine"] == "machine-cli-t" and built["total_threshold"] > 0

    assert main(["status", "--registry", reg]) == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["healthy"] is True and status["model_key"] == built["model_key"]

    out = str(tmp_path / "scored")
    assert main(
        ["score", "--sf-dir", sf_dir, "--start", "2024-01-05T00:00:00",
         "--end", "2024-01-12T00:00:00", "--out", out]
    ) == 0
    scored = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert scored["rows"] > 0
