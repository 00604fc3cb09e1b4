"""Execute the generated Snowflake SQL against DuckDB as a stand-in
warehouse (SURVEY.md §2.1 S3; reference semantics add_output.py:421-448,
delete strategies add_output.py:138-150).

Why this exists: ``sinks/snowflake.py`` generates the staged
COPY-INTO + MERGE statements a live Snowflake would run, but without an
account the strings were only ever asserted, never *executed* — a MERGE
syntax/semantics bug would ship. This module parses and runs those exact
strings against DuckDB, so the e2e test
(tests/test_snowflake_merge_exec.py) drives batches through the real SQL
and compares the warehouse snapshot to ``operators/upsert.py``.

Dialect notes:

- identifier qualification ``DB.SCHEMA.TABLE`` → bare table name (DuckDB
  connections are single-catalog here);
- ``TIMESTAMP_NTZ``/``NUMBER(p,s)``/``VARIANT`` → ``TIMESTAMP`` /
  ``DECIMAL(p,s)`` / ``VARCHAR``;
- ``COPY INTO t FROM '<stage>' … TYPE = PARQUET … CASE_INSENSITIVE`` →
  ``INSERT INTO t BY NAME SELECT * FROM read_parquet('<stage>/*.parquet')``
  (DuckDB matches BY NAME case-insensitively, mirroring
  MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE);
- ``MERGE INTO`` — unsupported before DuckDB 1.4 (this environment ships
  1.0) — is rewritten into an equivalent DELETE / UPDATE / INSERT
  sequence that preserves MERGE's first-matching-branch semantics: branch
  i runs under its own condition AND the negation of every earlier
  matched-branch condition. The not-matched probe runs after the deletes,
  which is equivalent to MERGE's statement-start semantics *given the
  sink's contract that staging holds at most one row per key*
  (write_batch reduces with latest_by_key first): the only source row
  whose key a delete removes is the deleting row itself, and its branch
  conditions already exclude re-insertion.
"""

from __future__ import annotations

import re

_QUALIFIED = re.compile(r"\b([A-Z_][A-Z0-9_$]*)\.([A-Z_][A-Z0-9_$]*)\.([A-Z_][A-Z0-9_$]*)")
_COPY = re.compile(
    r"COPY INTO (\S+) FROM '([^']+)' "
    r"FILE_FORMAT = \(TYPE = PARQUET\) MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE$"
)
_MERGE_HEAD = re.compile(r"^MERGE INTO (\S+) t USING (\S+) s ON (.+)$")
_W_DELETE = re.compile(r"^WHEN MATCHED(?: AND (.+?))? THEN DELETE$")
_W_UPDATE = re.compile(r"^WHEN MATCHED(?: AND (.+?))? THEN UPDATE SET (.+)$")
_W_INSERT = re.compile(r"^WHEN NOT MATCHED(?: AND (.+?))? THEN INSERT \((.+?)\) VALUES \((.+)\)$")


def _strip_qualifiers(sql: str) -> str:
    return _QUALIFIED.sub(r"\3", sql)


def _t_refs(expr: str, target: str) -> str:
    """Rewrite ``t.COL`` alias references to the bare target table name
    (DuckDB DELETE/UPDATE statements don't take a target alias)."""
    return re.sub(r"\bt\.", f"{target}.", expr)


def _ddl(sql: str) -> str:
    s = _strip_qualifiers(sql)
    s = s.replace("TIMESTAMP_NTZ", "TIMESTAMP").replace("VARIANT", "VARCHAR")
    s = re.sub(r"\bNUMBER\(", "DECIMAL(", s)
    return s


def _copy(sql: str) -> str:
    m = _COPY.fullmatch(_strip_qualifiers(sql).strip())
    if not m:
        raise ValueError(f"unrecognized COPY INTO shape: {sql!r}")
    table, path = m.groups()
    # hive_partitioning off: the stage path ends in `batch=N`, which DuckDB
    # would otherwise infer as a partition column Snowflake's COPY never sees
    return (
        f"INSERT INTO {table} BY NAME SELECT * FROM "
        f"read_parquet('{path}/*.parquet', hive_partitioning = false)"
    )


def _merge(sql: str) -> list[str]:
    lines = [ln.strip() for ln in _strip_qualifiers(sql).splitlines() if ln.strip()]
    head = _MERGE_HEAD.match(lines[0])
    if not head:
        raise ValueError(f"unrecognized MERGE head: {lines[0]!r}")
    tgt, stg, on = head.groups()
    on_t = _t_refs(on, tgt)

    out: list[str] = []
    prior_matched: list[str] = []  # accumulated negations (branch order)
    for ln in lines[1:]:
        if m := _W_DELETE.match(ln):
            cond = m.group(1) or "TRUE"
            guard = " AND ".join([f"({_t_refs(cond, tgt)})"] + [f"NOT ({c})" for c in prior_matched])
            out.append(
                f"DELETE FROM {tgt} WHERE EXISTS "
                f"(SELECT 1 FROM {stg} s WHERE {on_t} AND {guard})"
            )
            prior_matched.append(_t_refs(cond, tgt))
        elif m := _W_UPDATE.match(ln):
            cond = m.group(1) or "TRUE"
            sets = ", ".join(re.sub(r"^t\.", "", a.strip()) for a in m.group(2).split(","))
            guard = " AND ".join([f"({_t_refs(cond, tgt)})"] + [f"NOT ({c})" for c in prior_matched])
            out.append(
                f"UPDATE {tgt} SET {sets} FROM {stg} s WHERE {on_t} AND {guard}"
            )
            prior_matched.append(_t_refs(cond, tgt))
        elif m := _W_INSERT.match(ln):
            cond, cols, vals = m.group(1) or "TRUE", m.group(2), m.group(3)
            out.append(
                f"INSERT INTO {tgt} ({cols}) SELECT {vals} FROM {stg} s "
                f"WHERE ({cond}) AND NOT EXISTS (SELECT 1 FROM {tgt} WHERE {on_t})"
            )
        else:
            raise ValueError(f"unrecognized MERGE branch: {ln!r}")
    return out


def translate_statement(sql: str) -> list[str]:
    """One generated Snowflake statement → the DuckDB statement(s) that
    execute it. Raises on any unrecognized shape (format drift in the
    generator should fail loudly, not silently no-op)."""
    s = sql.strip()
    if s.startswith(("CREATE", "ALTER TABLE")):
        # ALTER TABLE ADD COLUMN IF NOT EXISTS (E2 widen_ddl) shares the
        # CREATE path: qualifier strip + type mapping; DuckDB supports
        # the IF NOT EXISTS form natively
        return [_ddl(s)]
    if s.startswith("COPY INTO"):
        return [_copy(s)]
    if s.startswith("MERGE INTO"):
        return _merge(s)
    raise ValueError(f"unrecognized statement: {s[:80]!r}")


def execute_snowflake_sql(con, stmts: list[str]) -> None:
    """Run a ``SnowflakeMergeSink.write_batch`` statement list on a DuckDB
    connection."""
    for stmt in stmts:
        for d in translate_statement(stmt):
            con.execute(d)
