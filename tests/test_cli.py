"""`python -m pipeflow_ray` job entrypoint (the `ray job submit` target)."""

from __future__ import annotations

import json

from pipeflow_ray.__main__ import main


def test_cli_list_prints_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "[oracle]" in out
    assert len(out.strip().splitlines()) >= 70


def test_cli_query_inside_existing_session(capsys):
    """Inside an existing Ray session the CLI is a pure library call: it
    must not re-init or shut the session down (the conftest session keeps
    running for the rest of the suite)."""
    import ray

    assert ray.is_initialized()
    assert main(["query", "filter_project", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] > 0 and "l_orderkey" in rec["schema"]
    assert ray.is_initialized()  # untouched


def test_cli_unknown_query_is_an_error(capsys):
    assert main(["query", "no_such_pipeline"]) == 2


def test_cli_flagship_resume(tmp_path, capsys):
    from pipeflow_ray.fixtures import ensure_transcripts

    path = ensure_transcripts(0.001)
    out = str(tmp_path / "flag")
    assert main(["flagship", "--input", path, "--out", out, "--partitions", "4"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows"] > 0 and first["skipped"] == 0
    # second run: every partition already committed → skipped, same rows
    assert main(["flagship", "--input", path, "--out", out, "--partitions", "4"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["skipped"] == second["partitions"]
    assert second["rows"] == first["rows"]
