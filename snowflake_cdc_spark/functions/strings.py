"""String function surface (SURVEY.md §2.6).

The reference's SQL dialect exposes ``STRING_FORMAT('{0}.{1}', a, b)`` and
``REGEXP_REPLACE`` (README.md:29-31); both map to built-ins.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\{(\d+)\}")


def string_format(template: str, *cols: Column) -> Column:
    """``STRING_FORMAT('{0}.{1}', a, b)`` — positional-placeholder
    interpolation (README.md:31) compiled to ``format_string`` (JVM-side).
    """
    args: list[Column] = []

    def repl(m: re.Match) -> str:
        args.append(cols[int(m.group(1))])
        return "%s"

    fmt = _PLACEHOLDER.sub(repl, template.replace("%", "%%"))
    return F.format_string(fmt, *args)


def actual_full_table_name(
    database_name: Column | str = "database_name",
    table_name: Column | str = "table_name",
) -> Column:
    """Re-merge horizontally sharded tables by stripping a ``_part_<N>``
    suffix — the calculated field of README.md:29-31:
    ``STRING_FORMAT('{0}.{1}', data.database_name,
    REGEXP_REPLACE(data.table_name, '_part_\\d+$', ''))``."""
    db = F.col(database_name) if isinstance(database_name, str) else database_name
    tbl = F.col(table_name) if isinstance(table_name, str) else table_name
    return string_format("{0}.{1}", db, F.regexp_replace(tbl, r"_part_\d+$", ""))
