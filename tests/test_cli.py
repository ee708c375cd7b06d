"""CLI surface tests (python -m plugin_serdes_ray)."""

import json

import pyarrow.parquet as pq
import pytest


def test_cli_convert_and_infer(tmp_path, capsys, sf_dir):
    from plugin_serdes_ray.__main__ import main

    src = f"{sf_dir}/region.parquet"
    out_jsonl = str(tmp_path / "region.jsonl")
    rc = main(["convert", src, out_jsonl])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == pq.read_metadata(src).num_rows

    rc = main(["infer", out_jsonl])
    assert rc == 0
    avsc = json.loads(capsys.readouterr().out)
    assert avsc["type"] == "record"
    assert {f["name"] for f in avsc["fields"]} == {"r_regionkey", "r_name"}


def test_cli_unsupported_format(tmp_path, sf_dir):
    from plugin_serdes_ray.__main__ import main

    with pytest.raises(SystemExit):
        main(["convert", f"{sf_dir}/region.parquet", str(tmp_path / "x.docx")])
