"""CLI front-end (`python -m armon_tpu`)."""

import numpy as np
import pytest

from armon_tpu.__main__ import main, _parse


def test_parse_values():
    assert _parse("true") is True and _parse("False") is False
    assert _parse("100,100") == (100, 100)
    assert _parse("0.5") == 0.5
    assert _parse("Sod") == "Sod"


def test_cli_run(tmp_path, capsys):
    rc = main(["test=Sod", "N=20,20", "maxcycle=2", "silent=4",
               f"output_dir={tmp_path}", "write_output=true",
               "output_file=o.csv"])
    assert rc == 0
    assert (tmp_path / "o.csv").exists()
    out = capsys.readouterr().out
    assert "cycles:      2" in out


def test_cli_bad_arg(capsys):
    assert main(["whoops"]) == 2
