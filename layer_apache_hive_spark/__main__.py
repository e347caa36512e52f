"""CLI for the engine: list, run, explain, and oracle-check queries.

A user of the reference stack (HiveQL via beeline/HiveServer2) gets
the same day-to-day loop here without writing Python:

    python -m layer_apache_hive_spark list [substring]
    python -m layer_apache_hive_spark run <query_id> [--sf-dir DIR] [-n 20]
    python -m layer_apache_hive_spark sql "SELECT ... FROM lineitem ..."
    python -m layer_apache_hive_spark explain <query_id>
    python -m layer_apache_hive_spark oracle <query_id>   # DuckDB twin

``sql`` registers every fixture table as a temp view first, so ad-hoc
HiveQL-style statements run directly against the corpus — the
"switch from Hive" path in one command.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="layer_apache_hive_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered query ids")
    p_list.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain", "oracle"):
        p = sub.add_parser(name)
        p.add_argument("query_id")
        p.add_argument(
            "--sf-dir", default=os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
            )
        )
        if name == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")

    p_sql = sub.add_parser("sql", help="ad-hoc SQL over the fixture tables")
    p_sql.add_argument("statement")
    p_sql.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    )
    p_sql.add_argument("-n", type=int, default=20)

    args = ap.parse_args(argv)

    from layer_apache_hive_spark.registry import all_oracles, all_queries

    if args.cmd == "list":
        qs = all_queries()
        oracles = all_oracles()
        for qid in sorted(qs):
            if args.substring in qid:
                mark = "oracle" if qid in oracles else "rows-only"
                doc = (qs[qid].__doc__ or "").strip().splitlines()
                print(f"{qid:36s} [{mark}] {doc[0] if doc else ''}")
        return 0

    if args.cmd == "oracle":
        osql = all_oracles().get(args.query_id)
        if osql is None:
            print(f"{args.query_id}: rows-only (no oracle SQL)")
            return 1
        import duckdb

        from layer_apache_hive_spark.catalog import TABLES, table_path

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{table_path(args.sf_dir, t)}')"
            )
        print(con.execute(osql).df().to_string())
        return 0

    from layer_apache_hive_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    if args.cmd == "sql":
        from layer_apache_hive_spark.catalog import load_tables

        load_tables(spark, args.sf_dir)
        spark.sql(args.statement).show(args.n, truncate=False)
        return 0

    qs = all_queries()
    if args.query_id not in qs:
        sys.exit(f"unknown query id {args.query_id!r}; try `list`")
    df = qs[args.query_id](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
