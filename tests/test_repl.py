"""REPL helper parity: completion, dot-commands, output modes.

Parity target: /root/reference/src/cli/helper.rs (SQL-keyword +
table/column + dot-command completion with case-following replacement,
helper.rs:226-280; DOT_COMMANDS helper.rs:170-172) — driven through
`Repl.handle_line` / `Repl.completions` without a TTY.
"""

from __future__ import annotations

import pytest

from iceberg_query_engine_spark.engine import Engine
from iceberg_query_engine_spark.repl import DOT_COMMANDS, Repl


@pytest.fixture(scope="module")
def repl(spark, sf_oracle):
    eng = Engine(spark)
    eng.register_sf_dir(sf_oracle)
    return Repl(eng)


def test_keyword_completion_case_following(repl):
    """Uppercase prefix completes uppercase, lowercase completes
    lowercase (helper.rs:246-259)."""
    assert "SELECT" in repl.completions("SEL", "SEL")
    assert "select" in repl.completions("sel", "sel")
    assert "WHERE" in repl.completions("WH", "SELECT * FROM t WH")


def test_table_and_column_completion(repl):
    got = repl.completions("nat", "SELECT * FROM nat")
    assert "nation" in got
    got = repl.completions("n_nat", "SELECT n_nat")
    assert "n_nationkey" in got


def test_dot_command_completion(repl):
    assert repl.completions(".ta", ".ta") == [".tables"]
    assert set(repl.completions(".", ".")) == set(DOT_COMMANDS)


def test_dot_tables_and_schema(repl):
    assert "nation" in repl.handle_line(".tables").splitlines()
    schema_out = repl.handle_line(".schema nation")
    assert "n_nationkey" in schema_out and "int" in schema_out
    assert repl.handle_line(".schema") == "usage: .schema TABLE"


def test_dot_help_quit_unknown(repl):
    assert ".mode FMT" in repl.handle_line(".help")
    assert repl.handle_line(".q") is None
    assert repl.handle_line(".quit") is None
    assert "unknown command .bogus" in repl.handle_line(".bogus now")
    assert repl.handle_line("") == ""


def test_sql_execution_and_modes(repl):
    out = repl.handle_line("SELECT COUNT(*) AS n FROM nation;")
    assert "25" in out and "1 rows" in out  # table format
    assert "output format: json" in repl.handle_line(".mode json")
    out = repl.handle_line("SELECT 1 AS one")
    assert out.strip() == '{"one": 1}'
    assert "output format: csv" in repl.handle_line(".format csv")
    out = repl.handle_line("SELECT 2 AS two")
    assert out.splitlines() == ["two", "2"]
    repl.handle_line(".mode table")
    assert "usage: .mode" in repl.handle_line(".mode nope")


def test_sql_error_keeps_session(repl):
    out = repl.handle_line("SELECT * FROM no_such_table_xyz")
    assert out.startswith("error:")
    assert "25" in repl.handle_line("SELECT COUNT(*) AS n FROM nation")


def test_dot_load_and_tpch(repl, sf_oracle, tmp_path):
    out = repl.handle_line(f".load nation2 {sf_oracle}/nation.parquet")
    assert out == "registered nation2"
    assert "25" in repl.handle_line("SELECT COUNT(*) AS n FROM nation2")
    out = repl.handle_line(f".tpch {sf_oracle}")
    assert out.startswith("registered") and "lineitem" in out
    assert repl.handle_line(".load onlyname") == "usage: .load NAME PATH"
