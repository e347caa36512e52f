"""REPL DUMP/LOAD (r9): event-stream invariants the registered round
trip can't exercise — gap refusal, tamper refusal, delta-chain
closure, and cross-catalog value identity."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from layer_apache_hive_spark.acid import TransactionCatalog
from layer_apache_hive_spark.repl import (
    ReplicationError,
    repl_dump,
    repl_load,
)


@pytest.fixture()
def source(spark, tmp_path):
    cat = TransactionCatalog(str(tmp_path / "src"))
    cat.commit(
        spark,
        {
            "t": spark.createDataFrame(
                [(i, f"v{i}") for i in range(10)], "k int, v string"
            )
        },
    )
    cat.commit(
        spark, {"t": lambda df: df.filter("k % 3 != 0")}
    )
    return cat


def test_dump_load_round_trip_and_idempotence(spark, source, tmp_path):
    dump = str(tmp_path / "dump")
    out = repl_dump(source, dump)
    assert out == {"events": [1, 2], "last": 2}
    replica_root = str(tmp_path / "replica")
    r1 = repl_load(dump, replica_root)
    assert r1["applied"] == [1, 2] and r1["head"] == 2
    r2 = repl_load(dump, replica_root)
    assert r2["applied"] == [] and r2["skipped"] == [1, 2]
    replica = TransactionCatalog(replica_root)
    for v in (1, 2):
        assert sorted(
            map(tuple, replica.read(spark, "t", v).collect())
        ) == sorted(map(tuple, source.read(spark, "t", v).collect()))


def test_incremental_dump_resumes_from_watermark(spark, source, tmp_path):
    dump = str(tmp_path / "dump")
    assert repl_dump(source, dump)["events"] == [1, 2]
    source.commit(spark, {"t": lambda df: df.filter("k < 8")})
    assert repl_dump(source, dump)["events"] == [3]
    assert repl_dump(source, dump)["events"] == []  # nothing new


def test_load_refuses_event_gap(spark, source, tmp_path):
    dump = str(tmp_path / "dump")
    repl_dump(source, dump)
    os.remove(os.path.join(dump, "_events", "000001.json"))
    with pytest.raises(ReplicationError, match="event gap"):
        repl_load(dump, str(tmp_path / "replica"))


def test_load_refuses_missing_staged_dir(spark, source, tmp_path):
    dump = str(tmp_path / "dump")
    repl_dump(source, dump)
    shutil.rmtree(os.path.join(dump, "data", "t"))
    with pytest.raises(ReplicationError, match="missing staged dir"):
        repl_load(dump, str(tmp_path / "replica"))


def test_dump_ships_delta_parent_chain(spark, tmp_path):
    """A catalog pin referencing a DELTA manifest (direct
    delete_where on the enrolled table, then a catalog commit that
    pins it) is only readable with its parent chain — the dump must
    ship the closure, and the replica must read through it."""
    cat = TransactionCatalog(str(tmp_path / "src"))
    cat.commit(
        spark,
        {
            "t": spark.createDataFrame(
                [(i, i * 10) for i in range(10)], "k int, x int"
            )
        },
    )
    vt = cat.table("t")
    v_delta = vt.delete_where(spark, "k >= 7", "k")
    m = vt.manifest(v_delta)
    assert "delete_delta" in m  # the pin really is a delta manifest
    # hand-pin the delta version in a new catalog event (the shape a
    # coordinated-commit violation or external tool produces)
    cm = {"tables": {"t": v_delta}, "base_version": 1,
          "committed_at": 0.0, "writer": "test"}
    with open(
        os.path.join(cat.commits_dir, "000002.json"), "x"
    ) as fh:
        json.dump(cm, fh)
    dump = str(tmp_path / "dump")
    repl_dump(cat, dump)
    replica_root = str(tmp_path / "replica")
    repl_load(dump, replica_root)
    replica = TransactionCatalog(replica_root)
    assert sorted(
        r.k for r in replica.read(spark, "t").collect()
    ) == list(range(7))
