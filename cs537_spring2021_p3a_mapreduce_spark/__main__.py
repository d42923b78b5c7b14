"""Command-line entry — the reference's client surface, Spark-side.

The reference is DRIVEN from the shell: ``./mapreduce file1 file2
...`` tokenizes the argv files and prints token counts (main.c:50-74
runs the wordcount client over the file list; the sequential engine
prints in global key order, sequential_mapreduce.c:81). A user
switching engines keeps that muscle memory:

    python -m cs537_spring2021_p3a_mapreduce_spark wordcount f1.txt f2.txt
    python -m cs537_spring2021_p3a_mapreduce_spark list
    python -m cs537_spring2021_p3a_mapreduce_spark query q3_shipping_priority \
        --sf-dir /root/testdata/sf0.01 --limit 20

``wordcount`` reads the argv files through the engine's text source
(A1/A2) and prints ``token<TAB>count`` in global token order — the
sequential engine's observable contract. ``query`` runs any of the
registered analytics queries against a fixture directory and prints
TSV. Everything routes through the same plans the driver gate
verifies; the CLI adds no second code path.
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from .session import get_spark

    spark = get_spark("cs537-p3a-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _print_tsv(df, limit: int | None) -> None:
    if limit is not None:
        df = df.limit(limit)
    cols = df.columns
    print("\t".join(cols))
    for row in df.toLocalIterator():
        print("\t".join("" if v is None else str(v) for v in row))


def cmd_wordcount(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from .functions.text import tokens
    from .sources import text_lines

    spark = _spark()
    counts = (
        text_lines(spark, list(args.files))
        .select(F.explode(tokens("line")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy("token")
    )
    for row in counts.toLocalIterator():
        print(f"{row.token}\t{row.cnt}")
    return 0


def cmd_list(_args: argparse.Namespace) -> int:
    import __spark_entry__ as entry

    q = entry.queries()
    oracles = set(entry.oracle_sql())
    for name in sorted(q):
        kind = "oracle" if name in oracles else "rows-only"
        print(f"{name}\t{kind}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    import __spark_entry__ as entry

    q = entry.queries()
    if args.name not in q:
        print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
        return 2
    spark = _spark()
    _print_tsv(q[args.name](spark, args.sf_dir), args.limit)
    return 0


def main(argv: list[str] | None = None) -> int:
    # __spark_entry__ sits at the repo root, one level above the pkg
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)

    p = argparse.ArgumentParser(prog="cs537_spring2021_p3a_mapreduce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("wordcount", help="reference client: count tokens in files")
    w.add_argument("files", nargs="+")
    w.set_defaults(fn=cmd_wordcount)

    sub.add_parser("list", help="list registered queries").set_defaults(
        fn=cmd_list
    )

    qp = sub.add_parser("query", help="run a registered query, print TSV")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=None)
    qp.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
