"""Served SQL — HiveServer2-compatible Thrift/JDBC endpoint.

The reference charm's second deliverable (after the metastore) is a
network SQL service: HiveServer2 on port 10000, spoken to by
beeline/JDBC clients [upstream lib/charms/layer/bigtop_hive.py
open_ports — public-knowledge reconstruction, SURVEY.md §0].

Spark ships the exact server: ``HiveThriftServer2`` (the
spark-hive-thriftserver module) exposes a running SparkSession's
catalog + SQL engine over the HiveServer2 Thrift protocol, wire-
compatible with every Hive JDBC/ODBC client ever written. Started
in-process here via ``startWithContext`` — the same thing
``sbin/start-thriftserver.sh`` does, minus the daemonization.

The client half uses the ``beeline`` CLI that ships inside the
PySpark distribution (hive-jdbc + hive-beeline jars): a REAL
over-the-wire JDBC round trip, not a loopback shortcut.
tests/test_metastore_server.py proves parity: the same query run
through the registered DataFrame API and through beeline over Thrift
returns identical rows.

Scale: the Thrift server is a thin RPC front on the driver; query
execution is the same distributed Spark plan either way. On a
cluster this is one long-running driver app (or Spark Connect for
multi-tenant), with the metastore shared per metastore.py.
"""

from __future__ import annotations

import csv
import io
import os
import re
import socket
import subprocess
import time

import pyspark
from pyspark.sql import SparkSession

_BEELINE = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")


def free_port() -> int:
    """An OS-assigned free TCP port (tests; prod pins 10000)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def start_thrift_server(spark: SparkSession, port: int = 10000):
    """Start HiveThriftServer2 inside this JVM, serving ``spark``'s
    catalog and SQL engine on ``port``.

    The port must have been pinned at session build time via
    ``spark.hadoop.hive.server2.thrift.port`` (hive-site conf is
    frozen when the HiveConf is first materialized). Returns the
    Java server handle; ``.stop()`` it or let the JVM exit.
    """
    got = spark.conf.get("spark.hadoop.hive.server2.thrift.port", None)
    if got != str(port):
        raise ValueError(
            f"session was built with hive.server2.thrift.port={got!r}; "
            f"pass extra_conf={{'spark.hadoop.hive.server2.thrift.port': '{port}'}} "
            "to metastore.hive_session"
        )
    jvm = spark._jvm
    server = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    return server


def wait_for_port(port: int, timeout: float = 60.0) -> None:
    """Block until the Thrift listener accepts TCP connections."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"thrift server not listening on :{port} after {timeout}s")


def beeline_query(
    sql: str,
    port: int = 10000,
    timeout: float = 180.0,
    user: str = "spark",
    password: str | None = None,
) -> tuple[list[str], list[list[str]]]:
    """Run one SQL statement over JDBC via beeline; return
    (column_names, rows) with every cell as its csv2 string.

    This is the genuine client path: beeline → hive-jdbc → Thrift →
    HiveThriftServer2 → Spark SQL. NULL arrives as the empty string
    (csv2); callers compare against stringified expected cells.
    ``user``/``password`` feed SASL PLAIN — required when the server
    runs hive.server2.authentication=CUSTOM (auth.py); a wrong pair
    is refused at negotiation and raises before any SQL executes.
    """
    cred_args = ["-n", user]
    if password is not None:
        cred_args += ["-p", password]
    proc = subprocess.run(
        [
            _BEELINE,
            "-u",
            f"jdbc:hive2://localhost:{port}",
            *cred_args,
            "--silent=true",
            "--outputformat=csv2",
            "-e",
            sql,
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        # keep the HEAD of each stream too: the root-cause message of
        # a server-side exception (e.g. an authorization refusal)
        # precedes its multi-KB stack trace, and a tail-only excerpt
        # loses it
        def excerpt(s: str) -> str:
            return s if len(s) <= 3000 else f"{s[:1500]}\n...\n{s[-1500:]}"

        raise RuntimeError(
            f"beeline rc={proc.returncode}\nstdout:{excerpt(proc.stdout)}"
            f"\nstderr:{excerpt(proc.stderr)}"
        )
    return parse_beeline_csv2(proc.stdout)


def parse_beeline_csv2(stdout: str) -> tuple[list[str], list[list[str]]]:
    """Parse beeline --silent --outputformat=csv2 stdout into
    (header, rows). Silent-mode beeline glues the connection prompt
    onto the first output line ("0: jdbc:hive2://…> col_a,col_b");
    strip any prompt prefixes, then csv-parse the remainder."""
    prompt = re.compile(r"^\d+: jdbc:hive2://[^>]*>\s*")
    lines = [prompt.sub("", ln) for ln in stdout.splitlines()]
    # Drop only the leading chrome BEFORE the header line; keep every
    # later line (including empty ones) so a NULL/empty single-column
    # cell is not silently dropped and an empty line inside a quoted
    # multi-line cell does not corrupt the reconstructed CSV.
    while lines and not lines[0]:
        lines.pop(0)
    if not lines:
        return [], []
    header = next(csv.reader(io.StringIO(lines[0])), [])
    body = lines[1:]
    if len(header) == 1 and not any('"' in ln for ln in body):
        # csv.reader drops blank physical lines, but in a one-column
        # unquoted result a blank line IS a NULL/empty cell row —
        # take the lines verbatim. Strip at most ONE trailing blank
        # (beeline's closing-newline artifact); any further trailing
        # blanks are genuine NULL rows and stay.
        if body and not body[-1]:
            body = body[:-1]
        return header, [[ln] for ln in body]
    # Multi-column (or quoted): a blank physical line can never be a
    # whole row, so trailing blanks are chrome — csv.reader drops
    # interior ones anyway.
    while body and not body[-1]:
        body.pop()
    reader = csv.reader(io.StringIO("\n".join(body)))
    return header, [row for row in reader]


def beeline_script(
    sql_script: str,
    port: int = 10000,
    timeout: float = 300.0,
    user: str = "spark",
    password: str | None = None,
) -> str:
    """Run a multi-statement SQL script (';'-separated) on ONE JDBC
    connection and return beeline's raw csv2 stdout. This is the
    transaction-surface client path: BEGIN/DML/COMMIT share a
    connection, hence a server-side session, hence one transaction —
    separate :func:`beeline_query` calls are separate connections and
    would each be their own (implicitly rolled back) session.
    Raises on nonzero exit with both streams excerpted."""
    cred_args = ["-n", user]
    if password is not None:
        cred_args += ["-p", password]
    proc = subprocess.run(
        [
            _BEELINE,
            "-u",
            f"jdbc:hive2://localhost:{port}",
            *cred_args,
            "--silent=true",
            "--outputformat=csv2",
            "-e",
            sql_script,
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        def excerpt(s: str) -> str:
            return s if len(s) <= 3000 else f"{s[:1500]}\n...\n{s[-1500:]}"

        raise RuntimeError(
            f"beeline rc={proc.returncode}\nstdout:{excerpt(proc.stdout)}"
            f"\nstderr:{excerpt(proc.stderr)}"
        )
    return proc.stdout
