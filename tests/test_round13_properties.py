"""Round-13 pins, part 1: the five r12-advisor findings.

1. **Aborted/in-flight base never elects** (high): an INSERT
   OVERWRITE base whose writeid is invalid (ABORTed, crashed-then-
   recovered, or still OPEN) previously still won the base election,
   suppressed every committed delta ≤ W, and had its own events
   invalid-filtered at decode — the table read EMPTY. Hive's
   AcidUtils only elects a valid base (isValidBase).
2. **Cleaner consults the aborted set for bases** (high): with
   delta_1 committed and base_2 aborted, the old Cleaner deleted the
   committed delta (superseded by a base that never committed —
   unrecoverable data loss) and KEPT the aborted base. Now the
   aborted base is the debris and the delta survives.
3. **MERGE parser refuses what it cannot parse** (medium): the
   WHEN-clause regex silently dropped unmatched text ('WHEN NOT
   MATCHED BY SOURCE THEN DELETE' committed a partial MERGE). Now the
   matched spans must tile the whole clauses text.
4. **ABORT TRANSACTIONS is all-or-nothing** (low): every token
   validates before any abort applies — no partial effect behind a
   pure-failure message.
5. **Ledger appends are durable-first** (low): the fsync'd JSONL
   record lands BEFORE the in-memory transition, so a failed disk
   write never leaves this manager serving a state a successor will
   not replay.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from layer_apache_hive_spark.sources.hive_acid import (
    HiveWriteIdLedger,
    ValidWriteIdList,
    append_delta,
    clean_hive_acid,
    hive_acid_overwrite,
    read_hive_acid,
    _elect_dirs,
)
from tests.test_round10_properties import SCHEMA, _fields

MM_DDL = "k long, status string, price double"


# --- 1. aborted/open base never elects ---------------------------------------


def _seed_delta_then_aborted_base(spark, tmp_path):
    """delta_1 committed, base_2 via IOW whose writeid ABORTS."""
    led = HiveWriteIdLedger(str(tmp_path / "l.jsonl"))
    root = str(tmp_path / "t")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "A", 1.0), (2, "B", 2.0)], MM_DDL)
    w1 = led.allocate(root)
    append_delta(spark, root, df, SCHEMA, _fields(), w1)
    led.commit(root, w1)
    w2 = led.allocate(root)
    hive_acid_overwrite(
        spark,
        root,
        df.withColumn("k", F.col("k") + 100),
        SCHEMA,
        _fields(),
        w2,
    )
    led.abort(root, w2)  # the IOW never committed
    return led, root, w1, w2


def test_aborted_base_not_elected_committed_deltas_survive(spark, tmp_path):
    led, root, w1, w2 = _seed_delta_then_aborted_base(spark, tmp_path)
    vw = led.valid_writeids(root)
    data, dels, originals, bounds = _elect_dirs(
        root, invalid=vw.invalid_ids
    )
    names = [os.path.basename(d) for d in data]
    assert f"base_{w2:07d}" not in names, names
    assert f"delta_{w1:07d}_{w1:07d}" in names, names
    got = {
        r.k
        for r in read_hive_acid(
            spark, root, SCHEMA, valid_writeids=vw
        ).collect()
    }
    assert got == {1, 2}  # previously: EMPTY


def test_open_base_not_elected_until_commit(spark, tmp_path):
    """Mid-IOW election (writeid OPEN) must keep serving the old
    snapshot; the instant the commit record lands the base elects."""
    led = HiveWriteIdLedger()
    root = str(tmp_path / "t")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "A", 1.0)], MM_DDL)
    w1 = led.allocate(root)
    append_delta(spark, root, df, SCHEMA, _fields(), w1)
    led.commit(root, w1)
    w2 = led.allocate(root)
    hive_acid_overwrite(
        spark, root, df.withColumn("k", F.lit(9).cast("long")),
        SCHEMA, _fields(), w2,
    )
    mid = {
        r.k
        for r in read_hive_acid(
            spark, root, SCHEMA, valid_writeids=led.valid_writeids(root)
        ).collect()
    }
    assert mid == {1}
    led.commit(root, w2)
    after = {
        r.k
        for r in read_hive_acid(
            spark, root, SCHEMA, valid_writeids=led.valid_writeids(root)
        ).collect()
    }
    assert after == {9}


def test_aborted_base_falls_back_to_next_valid_base(spark, tmp_path):
    """base_1 committed + base_2 aborted: election falls back to the
    next-highest VALID base instead of electing the aborted one."""
    led = HiveWriteIdLedger()
    root = str(tmp_path / "t")
    os.makedirs(root)
    df = spark.createDataFrame([(5, "A", 5.0)], MM_DDL)
    w1 = led.allocate(root)
    hive_acid_overwrite(spark, root, df, SCHEMA, _fields(), w1)
    led.commit(root, w1)
    w2 = led.allocate(root)
    hive_acid_overwrite(
        spark, root, df.withColumn("k", F.lit(6).cast("long")),
        SCHEMA, _fields(), w2,
    )
    led.abort(root, w2)
    got = {
        r.k
        for r in read_hive_acid(
            spark, root, SCHEMA, valid_writeids=led.valid_writeids(root)
        ).collect()
    }
    assert got == {5}


# --- 2. the ledger-aware Cleaner and bases -----------------------------------


def test_cleaner_keeps_committed_delta_removes_aborted_base(
    spark, tmp_path
):
    led, root, w1, w2 = _seed_delta_then_aborted_base(spark, tmp_path)
    removed = clean_hive_acid(root, aborted=led.aborted_ids(root))
    assert f"base_{w2:07d}" in removed, removed
    entries = sorted(os.listdir(root))
    assert f"delta_{w1:07d}_{w1:07d}" in entries, entries
    assert f"base_{w2:07d}" not in entries
    # and the data still reads after the clean
    got = {
        r.k
        for r in read_hive_acid(
            spark, root, SCHEMA, valid_writeids=led.valid_writeids(root)
        ).collect()
    }
    assert got == {1, 2}


def test_cleaner_never_reclaims_around_open_base(tmp_path):
    """An in-flight IOW base (writeid OPEN) supersedes nothing and is
    itself never removed — its outcome is unknown."""
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "delta_0000001_0000001"))
    os.makedirs(os.path.join(root, "base_0000002"))
    removed = clean_hive_acid(root, open_ids=frozenset({2}))
    assert removed == []
    assert sorted(os.listdir(root)) == [
        "base_0000002", "delta_0000001_0000001"
    ]


# --- 3-4. wire-surface fixes --------------------------------------------------


@pytest.fixture()
def mgr13(spark, tmp_path):
    from layer_apache_hive_spark.acid import TransactionCatalog
    from layer_apache_hive_spark.txn import TxnSessionManager

    cat = TransactionCatalog(str(tmp_path / "cat"))
    led = HiveWriteIdLedger(str(tmp_path / "ledger.jsonl"))
    mgr = TxnSessionManager(spark, cat, publish=False, ledger=led)
    root = str(tmp_path / "acid13")
    os.makedirs(root)
    seed = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0), (3, "B", 3.0)], MM_DDL
    )
    w = led.allocate(root)
    append_delta(spark, root, seed, SCHEMA, _fields(), w, n_buckets=2)
    led.commit(root, w)
    mgr.enroll_hive_acid("acid13", root, SCHEMA, _fields(), n_buckets=2)
    return mgr, root


def _view13(spark):
    return {
        (r.k, r.price)
        for r in spark.table("global_temp.acid13").collect()
    }


def test_merge_unsupported_clause_refused_not_dropped(spark, mgr13):
    mgr, root = mgr13
    spark.createDataFrame([(2, "S", 20.0)], MM_DDL).createOrReplaceTempView(
        "r13_merge_src"
    )
    out = mgr.handle(
        "m1",
        "MERGE INTO acid13 t USING r13_merge_src s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET price = s.price",
    )
    assert out.startswith("ERR_"), out
    assert "unsupported MERGE clause" in out, out
    # nothing committed: no partial MERGE (previously the UPDATE ran)
    assert _view13(spark) == {(1, 1.0), (2, 2.0), (3, 3.0)}
    assert sorted(os.listdir(root)) == ["delta_0000001_0000001"]


def test_merge_embedded_case_when_refused(spark, mgr13):
    mgr, root = mgr13
    spark.createDataFrame([(2, "S", 20.0)], MM_DDL).createOrReplaceTempView(
        "r13_case_src"
    )
    out = mgr.handle(
        "m1",
        "MERGE INTO acid13 t USING r13_case_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET price = "
        "CASE WHEN s.price > 0 THEN s.price ELSE t.price END",
    )
    assert out.startswith("ERR_"), out
    assert _view13(spark) == {(1, 1.0), (2, 2.0), (3, 3.0)}


def test_abort_transactions_all_or_nothing(spark, mgr13):
    mgr, root = mgr13
    assert mgr.handle("s1", "BEGIN").startswith("ACTIVE:")
    assert mgr.handle(
        "s1", "INSERT INTO acid13 SELECT 7 AS k, 'C' AS s, 7.0 AS p"
    ).startswith("ACTIVE:Buffered")
    out = mgr.handle("admin", "ABORT TRANSACTIONS s1 nonsense-token")
    assert out.startswith("ERR_ENDED:") and "nothing aborted" in out, out
    # s1's buffer must be INTACT (previously it was already dropped)
    out = mgr.handle("s1", "COMMIT")
    assert out.startswith("DONE:Committed 1 statements"), out
    assert (7, 7.0) in _view13(spark)


def test_abort_transactions_rejects_non_open_writeid(spark, mgr13):
    mgr, root = mgr13
    # writeid 1 is COMMITTED: aborting it must refuse upfront
    out = mgr.handle("admin", "ABORT TRANSACTIONS acid13:writeid-1")
    assert out.startswith("ERR_ENDED:") and "not open" in out, out
    assert _view13(spark) == {(1, 1.0), (2, 2.0), (3, 3.0)}


# --- 5. ledger durability ordering -------------------------------------------


def test_ledger_append_is_durable_first(tmp_path):
    led = HiveWriteIdLedger(str(tmp_path / "l.jsonl"))
    root = str(tmp_path / "t")
    os.makedirs(root)
    w = led.allocate(root)
    # simulate a dead disk: the JSONL path becomes unwritable
    led.path = str(tmp_path / "gone" / "l.jsonl")
    with pytest.raises(OSError):
        led.commit(root, w)
    # in-memory state must NOT have applied the commit: the record
    # never became durable, so a successor would still see it OPEN
    assert led.entries(root)[w] == "open"
    led.path = str(tmp_path / "l.jsonl")
    led.commit(root, w)  # and the retry works
    assert led.entries(root)[w] == "committed"
