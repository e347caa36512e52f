"""CLI for the engine: list, run, explain, and oracle-check queries.

A user of the reference stack (HiveQL via beeline/HiveServer2) gets
the same day-to-day loop here without writing Python:

    python -m layer_apache_hive_spark list [substring]
    python -m layer_apache_hive_spark run <query_id> [--sf-dir DIR] [-n 20]
    python -m layer_apache_hive_spark sql "SELECT ... FROM lineitem ..."
    python -m layer_apache_hive_spark explain <query_id>
    python -m layer_apache_hive_spark oracle <query_id>   # DuckDB twin
    python -m layer_apache_hive_spark provision [--sf-dir DIR]
    python -m layer_apache_hive_spark serve [--port 10000]

``sql`` registers every fixture table as a temp view first, so ad-hoc
HiveQL-style statements run directly against the corpus — the
"switch from Hive" path in one command.

``provision`` + ``serve`` are the charm's deploy experience
[upstream reactive/hive.py start handler; SURVEY.md §0]: register
the corpus in the DURABLE Derby-backed metastore, then stand up a
HiveServer2-compatible Thrift endpoint any JDBC/beeline client can
connect to:

    python -m layer_apache_hive_spark serve --port 10000 &
    <pyspark>/bin/beeline -u jdbc:hive2://localhost:10000 \
        -e 'SHOW TABLES IN corpus_sf0_01'
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

    p_prov = sub.add_parser(
        "provision", help="register the corpus in the durable metastore"
    )
    p_prov.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    )

    p_serve = sub.add_parser(
        "serve", help="provision + serve SQL over HiveServer2 Thrift/JDBC"
    )
    p_serve.add_argument("--port", type=int, default=10000)
    p_serve.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    )
    p_serve.add_argument(
        "--auth",
        action="store_true",
        help="require SASL PLAIN credentials (CUSTOM provider; pairs "
        "read from $SPARK_GRAFT_HS2_CREDENTIALS as user:pass,...)",
    )
    p_serve.add_argument(
        "--acl",
        action="store_true",
        help="enforce the per-user catalog-table ACL from "
        "$SPARK_GRAFT_HS2_ACL (user=tbl1,tbl2;other=*); implies the "
        "wire identity from --auth is what the rule sees",
    )

    for name, helptext in (
        ("grant", "GRANT SELECT ON <table> TO <user> (file-backed ACL)"),
        ("revoke", "REVOKE SELECT ON <table> FROM <user> ('*' = all)"),
    ):
        p = sub.add_parser(name, help=helptext)
        p.add_argument("user")
        p.add_argument("table")
        p.add_argument(
            "--acl-file",
            default=os.environ.get("SPARK_GRAFT_HS2_ACL_FILE"),
            help="policy store path (default: $SPARK_GRAFT_HS2_ACL_FILE)",
        )

    args = ap.parse_args(argv)

    if args.cmd in ("grant", "revoke"):
        from layer_apache_hive_spark import authz

        if not args.acl_file:
            print("grant/revoke need --acl-file or $SPARK_GRAFT_HS2_ACL_FILE")
            return 2
        fn = authz.grant if args.cmd == "grant" else authz.revoke
        print(fn(args.acl_file, args.user, args.table) or "(no grants)")
        return 0

    if args.cmd == "provision":
        from layer_apache_hive_spark.metastore import (
            hive_session,
            provision_corpus,
        )

        spark = hive_session(app_name="cli-provision")
        db = provision_corpus(spark, args.sf_dir)
        n = len(spark.catalog.listTables(db))
        print(f"provisioned {db}: {n} tables in the durable metastore")
        return 0

    if args.cmd == "serve":
        from layer_apache_hive_spark.metastore import (
            hive_session,
            provision_corpus,
        )
        from layer_apache_hive_spark.server import (
            start_thrift_server,
            wait_for_port,
        )

        conf = {"spark.hadoop.hive.server2.thrift.port": str(args.port)}
        if args.auth:
            from layer_apache_hive_spark.auth import (
                CREDENTIALS_ENV,
                auth_session_conf,
            )

            if not os.environ.get(CREDENTIALS_ENV):
                print(f"--auth requires {CREDENTIALS_ENV}=user:pass[,...]")
                return 2
            conf.update(auth_session_conf())
        if args.acl:
            from layer_apache_hive_spark.authz import (
                ACL_ENV,
                ACL_FILE_ENV,
                authz_session_conf,
            )

            if not (
                os.environ.get(ACL_ENV) or os.environ.get(ACL_FILE_ENV)
            ):
                print(
                    f"--acl requires {ACL_ENV}=user=tbl[,tbl];other=* "
                    f"or {ACL_FILE_ENV}=<path> (live GRANT/REVOKE store)"
                )
                return 2
            if not args.auth:
                # an ACL without authenticated identities is theater:
                # every connection would arrive as an unverified name
                print("--acl requires --auth (the ACL keys on the "
                      "SASL-verified wire identity)")
                return 2
            conf = authz_session_conf(conf)
        spark = hive_session(app_name="cli-serve", extra_conf=conf)
        db = provision_corpus(spark, args.sf_dir)
        start_thrift_server(spark, args.port)
        wait_for_port(args.port)
        if args.auth:
            # Never announce "CUSTOM auth" without proving it's live:
            # probe the port with garbage credentials and require the
            # negotiation to refuse (hive_session already fails loudly
            # on session reuse, but the wire check is the ground truth).
            from layer_apache_hive_spark.server import beeline_query

            try:
                _, rows = beeline_query(
                    "SELECT 1 AS x", args.port,
                    user="__probe__", password="__invalid__",
                )
                refused = not rows
            except RuntimeError:
                refused = True
            if not refused:
                print(
                    "FATAL: endpoint accepted invalid credentials — "
                    "CUSTOM auth is NOT live; refusing to serve"
                )
                return 3
        print(
            f"HiveServer2-compatible endpoint on jdbc:hive2://localhost:"
            f"{args.port} (corpus db: {db}"
            f"{', CUSTOM auth' if args.auth else ''}"
            f"{', table ACL' if args.acl else ''}); Ctrl-C to stop"
        )
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            return 0

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
