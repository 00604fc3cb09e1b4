"""CLI: ``python -m snowflake_cdc_spark <command>``.

Commands:
    list-queries                      list declared queries (± oracle)
    run-query NAME [--sf-dir DIR] [-n N]   run one declared query, print N rows
    explain NAME [--sf-dir DIR]       formatted physical plan
    bench                             delegate to bench.py semantics
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="snowflake_cdc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-queries")
    for name in ("run-query", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run-query":
            sp.add_argument("-n", type=int, default=20)
    args = p.parse_args(argv)

    from snowflake_cdc_spark.queries import REGISTRY, _load_extended

    _load_extended()

    if args.cmd == "list-queries":
        for name, spec in sorted(REGISTRY.items()):
            tag = "oracle" if spec.oracle else "rows-only"
            print(f"{name:28s} [{tag}] {spec.description}")
        return 0

    if args.query not in REGISTRY:
        close = [n for n in sorted(REGISTRY) if args.query in n]
        print(
            f"unknown query {args.query!r}"
            + (f"; did you mean: {', '.join(close)}?" if close else ""),
            file=sys.stderr,
        )
        return 2

    from snowflake_cdc_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    df = REGISTRY[args.query].spark_fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
