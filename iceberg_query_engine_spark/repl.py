"""Interactive SQL REPL with completion, history, and dot-commands.

Parity target: /root/reference/src/cli/helper.rs (rustyline helper —
SQL-keyword + table/column + dot-command completion, case-following
keyword replacement, history) and the dot-command surface of
/root/reference/src/cli (DOT_COMMANDS, helper.rs:170-172: .help .h
.quit .exit .q .tables .schema .load .tpch .mode .format).

Design: `Repl` is a plain object whose `handle_line` /
`completions` methods are unit-testable without a TTY; `run` wires
them to stdlib readline (tab completion + persistent history file) —
the Python analogue of the reference's rustyline Editor.
"""

from __future__ import annotations

import os
import sys

# SQL_KEYWORDS parity (helper.rs:13-168) — the completion vocabulary.
SQL_KEYWORDS = [
    # data query
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER", "ASC",
    "DESC", "LIMIT", "OFFSET", "DISTINCT", "ALL", "AS", "CASE", "WHEN",
    "THEN", "ELSE", "END",
    # joins
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "CROSS", "ON",
    "USING", "NATURAL", "SEMI", "ANTI",
    # set ops
    "UNION", "INTERSECT", "EXCEPT", "MINUS",
    # predicates
    "AND", "OR", "NOT", "IN", "EXISTS", "BETWEEN", "LIKE", "ILIKE", "IS",
    "NULL", "TRUE", "FALSE",
    # aggregates
    "COUNT", "SUM", "AVG", "MIN", "MAX", "FIRST", "LAST",
    # scalar functions
    "COALESCE", "NULLIF", "CAST", "EXTRACT", "SUBSTRING", "SUBSTR",
    "TRIM", "UPPER", "LOWER", "LENGTH", "CONCAT", "REPLACE", "POSITION",
    "STRPOS", "ROUND", "FLOOR", "CEIL", "CEILING", "ABS", "POWER",
    "SQRT", "EXP", "LN", "LOG", "DATE", "TIME", "TIMESTAMP", "INTERVAL",
    "YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND",
    # data types
    "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "FLOAT", "DOUBLE",
    "REAL", "DECIMAL", "NUMERIC", "VARCHAR", "CHAR", "TEXT", "BOOLEAN",
    # misc
    "WITH", "VALUES", "OVER", "PARTITION", "ROWS", "RANGE", "PRECEDING",
    "FOLLOWING", "CURRENT", "ROW", "UNBOUNDED", "QUALIFY",
]

# DOT_COMMANDS parity (helper.rs:170-172).
DOT_COMMANDS = [
    ".help", ".h", ".quit", ".exit", ".q", ".tables", ".schema", ".load",
    ".tpch", ".mode", ".format",
]

_HELP = """\
.help | .h            show this help
.quit | .exit | .q    leave the repl
.tables               list registered tables
.schema TABLE         show TABLE's columns and types
.load NAME PATH       register a parquet file/dir as table NAME
.tpch DIR             register all TPC-H tables from parquet DIR
.mode FMT             set output format: table vertical csv json
.format FMT           alias of .mode
any other input       executed as SQL (Trino spellings accepted)"""

HISTORY_FILE = os.path.expanduser("~/.iceberg_query_engine_spark_history")


class Repl:
    """One REPL session over an Engine. `handle_line` returns the text
    to print (or None when the session should end); `completions`
    mirrors helper.rs's Completer::complete."""

    def __init__(self, engine, fmt: str = "table"):
        from . import engine as _engine_mod

        self._formats = _engine_mod._FORMATS
        self.engine = engine
        self.fmt = fmt

    # -- completion (helper.rs:226-280) ---------------------------------
    def completions(self, word: str, line: str) -> list[str]:
        """Candidates for `word` being completed within `line`: dot-
        commands when the line starts with '.', else SQL keywords
        (case-following: lowercase prefix → lowercase completion,
        helper.rs:246-259) + table names + their column names."""
        word_lower = word.lower()
        out: list[str] = []
        if line.lstrip().startswith("."):
            return [c for c in DOT_COMMANDS if c.startswith(word_lower)]
        want_upper = word[:1].isupper() if word else True
        for kw in SQL_KEYWORDS:
            if kw.lower().startswith(word_lower):
                out.append(kw if want_upper else kw.lower())
        try:
            for t in self.engine.tables():
                if t.lower().startswith(word_lower):
                    out.append(t)
                for col, _ in self.engine.schema(t):
                    if col.lower().startswith(word_lower) and col not in out:
                        out.append(col)
        except Exception:
            pass  # catalog hiccups must never break typing
        return out

    # -- dispatch --------------------------------------------------------
    def handle_line(self, line: str) -> str | None:
        """Execute one input line; returns printable output, '' for
        nothing, or None to signal exit."""
        line = line.strip().rstrip(";").strip()
        if not line:
            return ""
        if line in {".quit", ".exit", ".q", "exit", "quit"}:
            return None
        if line in {".help", ".h"}:
            return _HELP
        if line == ".tables":
            return "\n".join(self.engine.tables())
        if line.startswith(".schema"):
            parts = line.split()
            if len(parts) != 2:
                return "usage: .schema TABLE"
            try:
                return "\n".join(f"  {n}  {t}" for n, t in self.engine.schema(parts[1]))
            except Exception as exc:
                return f"error: {exc}"
        if line.startswith(".load"):
            parts = line.split()
            if len(parts) != 3:
                return "usage: .load NAME PATH"
            try:
                self.engine.register_parquet(parts[1], parts[2])
                return f"registered {parts[1]}"
            except Exception as exc:
                return f"error: {exc}"
        if line.startswith(".tpch"):
            parts = line.split()
            if len(parts) != 2:
                return "usage: .tpch DIR"
            try:
                tables = self.engine.register_sf_dir(parts[1])
                return f"registered {len(tables)} tables: {' '.join(sorted(tables))}"
            except Exception as exc:
                return f"error: {exc}"
        if line.startswith((".mode", ".format")):
            parts = line.split()
            if len(parts) != 2 or parts[1] not in self._formats:
                return f"usage: .mode {{{'|'.join(sorted(self._formats))}}}"
            self.fmt = parts[1]
            return f"output format: {self.fmt}"
        if line.startswith("."):
            return f"unknown command {line.split()[0]} (try .help)"
        try:
            return self._formats[self.fmt](self.engine.sql(line))
        except Exception as exc:  # noqa: BLE001 — REPL keeps going
            return f"error: {exc}"

    # -- interactive loop -----------------------------------------------
    def run(self, prompt: str = "sql> ") -> None:
        """Wire readline (tab completion + persistent history) and
        loop. History survives sessions via HISTORY_FILE, like
        rustyline's Editor::load_history/save_history."""
        readline = None
        try:
            import readline  # noqa: F811 — absent on some builds

            readline.set_completer(self._readline_completer)
            readline.set_completer_delims(" \t\n,()=<>+-*/'\"")
            readline.parse_and_bind("tab: complete")
            try:
                readline.read_history_file(HISTORY_FILE)
            except OSError:
                pass
        except ImportError:
            pass
        try:
            while True:
                try:
                    line = input(prompt)
                except EOFError:
                    break
                except KeyboardInterrupt:
                    print()
                    continue
                out = self.handle_line(line)
                if out is None:
                    break
                if out:
                    print(out) if not out.startswith("error:") else print(
                        out, file=sys.stderr
                    )
        finally:
            if readline is not None:
                try:
                    readline.set_history_length(1000)
                    readline.write_history_file(HISTORY_FILE)
                except OSError:
                    pass

    def _readline_completer(self, text: str, state: int):
        import readline

        buf = readline.get_line_buffer()
        matches = self.completions(text, buf)
        return matches[state] if state < len(matches) else None
