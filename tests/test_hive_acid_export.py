"""Hive full-ACID write-back (r9 verdict task 1): the exporter must
emit AcidUtils-compliant base/delta/delete_delta layouts — correct
directory election names, the OrcRecordUpdater struct, split-update
delete+insert pairs, sorted runs — and the round trip through the
generalized reader must replay the change algebra exactly."""

from __future__ import annotations

import os

import pytest

from layer_apache_hive_spark.sources.hive_acid import (
    clean_hive_acid,
    compact_hive_acid,
    export_hive_acid,
    read_hive_acid,
)

PAYLOAD = ["k", "status", "price"]
SCHEMA = [("k", "long"), ("status", "string"), ("price", "double")]


def _fields():
    import pyarrow as pa

    return [("k", pa.int64()), ("status", pa.string()), ("price", pa.float64())]


@pytest.fixture()
def layout(spark, tmp_path):
    """Three versions over a tiny keyed table:
    v1 base: keys 1..8; v2: +keys 9..10; v3: delete 2 and 9 (one base
    row, one delta row), update price of 3 (split-update)."""
    v1 = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(1, 9)],
        "k long, status string, price double",
    )
    v2 = v1.unionByName(
        spark.createDataFrame(
            [(9, "B", 9.0), (10, "B", 10.0)],
            "k long, status string, price double",
        )
    )
    v3 = v2.filter("k NOT IN (2, 9)").withColumn(
        "price",
        __import__("pyspark.sql.functions", fromlist=["F"]).expr(
            "CASE WHEN k = 3 THEN price + 100.0 ELSE price END"
        ),
    )
    snaps = {1: v1, 2: v2, 3: v3}
    root = str(tmp_path / "acid")
    export_hive_acid(
        spark,
        lambda v: snaps[v],
        versions=[1, 2, 3],
        out_root=root,
        pk="k",
        payload_cols=PAYLOAD,
        payload_fields=_fields(),
        n_buckets=2,
    )
    return root


def test_layout_directory_names(layout):
    entries = sorted(os.listdir(layout))
    assert entries == [
        "base_0000001",
        "delete_delta_0000003_0000003",
        "delta_0000002_0000002",
        "delta_0000003_0000003",
    ], entries
    for d in entries:
        files = sorted(os.listdir(os.path.join(layout, d)))
        assert files and all(f.startswith("bucket_") for f in files), (
            d,
            files,
        )


def test_acid_struct_and_sorted_runs(layout):
    """Every data file carries the 6-field OrcRecordUpdater struct
    with op=0 and rowIds ascending; the delete delta carries the
    5-field identity shape with op=2 sorted by (otid, rowId)."""
    from pyarrow import orc as pa_orc

    for d in sorted(os.listdir(layout)):
        for f in sorted(os.listdir(os.path.join(layout, d))):
            t = pa_orc.ORCFile(os.path.join(layout, d, f)).read()
            names = t.schema.names
            is_delete = d.startswith("delete_delta_")
            expect = [
                "operation",
                "originalTransaction",
                "bucket",
                "rowId",
                "currentTransaction",
            ] + ([] if is_delete else ["row"])
            assert names == expect, (d, f, names)
            ops = set(t["operation"].to_pylist())
            assert ops <= ({2} if is_delete else {0}), (d, f, ops)
            if is_delete:
                run = list(
                    zip(
                        t["originalTransaction"].to_pylist(),
                        t["rowId"].to_pylist(),
                    )
                )
            else:
                run = t["rowId"].to_pylist()
            assert run == sorted(run), (d, f, run)


def test_delete_delta_spans_base_and_delta_identities(layout):
    """v3 deletes key 2 (written by txn 1) and key 9 (txn 2), and
    split-updates key 3 (txn 1) — so the delete delta must reference
    originalTransaction values {1, 2} with currentTransaction 3."""
    from pyarrow import orc as pa_orc

    d = os.path.join(layout, "delete_delta_0000003_0000003")
    otids, ctids, n = set(), set(), 0
    for f in os.listdir(d):
        t = pa_orc.ORCFile(os.path.join(d, f)).read()
        otids |= set(t["originalTransaction"].to_pylist())
        ctids |= set(t["currentTransaction"].to_pylist())
        n += t.num_rows
    assert otids == {1, 2}, otids
    assert ctids == {3}, ctids
    assert n == 3  # keys 2, 9 deleted + key 3's old image


def test_split_update_reinserts_under_new_writeid(layout):
    """The updated row's new image lands in delta_0000003 under
    otid=3 with the new price."""
    from pyarrow import orc as pa_orc

    d = os.path.join(layout, "delta_0000003_0000003")
    rows = []
    for f in os.listdir(d):
        t = pa_orc.ORCFile(os.path.join(d, f)).read().flatten()
        rows += list(
            zip(
                t["originalTransaction"].to_pylist(),
                t["row.k"].to_pylist(),
                t["row.price"].to_pylist(),
            )
        )
    assert rows == [(3, 3, 103.0)], rows


def test_round_trip_matches_change_algebra(spark, layout):
    got = {
        (r.k, r.status, r.price)
        for r in read_hive_acid(spark, layout, SCHEMA).collect()
    }
    expect = {(1, "A", 1.0), (3, "A", 103.0), (10, "B", 10.0)} | {
        (i, "A", float(i)) for i in (4, 5, 6, 7, 8)
    }
    assert got == expect, got


def _snapshot(spark, root):
    return {
        (r.k, r.status, r.price)
        for r in read_hive_acid(spark, root, SCHEMA).collect()
    }


def test_compact_full_chain_is_lossless(spark, layout):
    """Major compaction over the whole chain: one base_0000003 holds
    the merged survivors, the Cleaner drops everything else, and the
    read is unchanged."""
    before = _snapshot(spark, layout)
    w = compact_hive_acid(spark, layout, SCHEMA, _fields())
    assert w == 3
    removed = clean_hive_acid(layout)
    assert sorted(os.listdir(layout)) == ["base_0000003"]
    assert set(removed) == {
        "base_0000001",
        "delta_0000002_0000002",
        "delta_0000003_0000003",
        "delete_delta_0000003_0000003",
    }
    assert _snapshot(spark, layout) == before


def test_compact_preserves_row_identities(spark, layout):
    """Hive's compaction invariant: rows in the compacted base keep
    their ORIGINAL (otid, bucket, rowId) triple and
    currentTransaction == originalTransaction — a renumbering
    compactor would orphan post-watermark delete events."""
    from pyarrow import orc as pa_orc

    ids_before = {}
    for d in sorted(os.listdir(layout)):
        if d.startswith("delete_delta_"):
            continue
        for f in os.listdir(os.path.join(layout, d)):
            t = pa_orc.ORCFile(os.path.join(layout, d, f)).read().flatten()
            for otid, b, rid, k in zip(
                t["originalTransaction"].to_pylist(),
                t["bucket"].to_pylist(),
                t["rowId"].to_pylist(),
                t["row.k"].to_pylist(),
            ):
                ids_before[k] = (otid, b, rid)
    compact_hive_acid(spark, layout, SCHEMA, _fields())
    d = os.path.join(layout, "base_0000003")
    seen = {}
    for f in os.listdir(d):
        t = pa_orc.ORCFile(os.path.join(d, f)).read().flatten()
        for otid, b, rid, ctid, k in zip(
            t["originalTransaction"].to_pylist(),
            t["bucket"].to_pylist(),
            t["rowId"].to_pylist(),
            t["currentTransaction"].to_pylist(),
            t["row.k"].to_pylist(),
        ):
            assert ctid == otid, (k, otid, ctid)
            seen[k] = (otid, b, rid)
    # survivors keep the identity they were WRITTEN with (key 3's
    # surviving image is the txn-3 re-insert, so its triple is the
    # delta_3 one — still present in ids_before via the later file)
    for k, triple in seen.items():
        assert ids_before[k] == triple, (k, ids_before[k], triple)


def test_compact_at_watermark_leaves_later_txns_live(spark, layout):
    """Compact writeids ≤ 2 only: base_0000002 folds base_1 + delta_2,
    the Cleaner keeps txn 3's delta/delete_delta, and the election
    read still applies them — which requires the preserved identities
    (delete events reference otid 1/2 rows inside the new base)."""
    before = _snapshot(spark, layout)
    w = compact_hive_acid(spark, layout, SCHEMA, _fields(), max_writeid=2)
    assert w == 2
    removed = clean_hive_acid(layout)
    assert set(removed) == {"base_0000001", "delta_0000002_0000002"}
    assert sorted(os.listdir(layout)) == [
        "base_0000002",
        "delete_delta_0000003_0000003",
        "delta_0000003_0000003",
    ]
    # the compacted base is the v2 snapshot (all 10 keys, old prices)
    from pyarrow import orc as pa_orc

    base_rows = 0
    for f in os.listdir(os.path.join(layout, "base_0000002")):
        base_rows += pa_orc.ORCFile(
            os.path.join(layout, "base_0000002", f)
        ).read().num_rows
    assert base_rows == 10
    assert _snapshot(spark, layout) == before


def test_unchanged_version_emits_no_delta(spark, tmp_path):
    """A version identical to its parent must not leave empty delta
    directories behind (Hive never emits them)."""
    v = spark.createDataFrame(
        [(1, "A", 1.0)], "k long, status string, price double"
    )
    root = str(tmp_path / "noop")
    export_hive_acid(
        spark,
        lambda _v: v,
        versions=[1, 2],
        out_root=root,
        pk="k",
        payload_cols=PAYLOAD,
        payload_fields=_fields(),
        n_buckets=2,
    )
    assert sorted(os.listdir(root)) == ["base_0000001"]
    got = read_hive_acid(spark, root, SCHEMA).collect()
    assert [(r.k, r.status, r.price) for r in got] == [(1, "A", 1.0)]


# --- original files (upgrade-in-place: flat table converted to ACID) --------


def _write_flat_orc(path, rows):
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    ks, ss, ps = zip(*rows)
    pa_orc.write_table(
        pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "status": pa.array(ss, pa.string()),
                "price": pa.array(ps, pa.float64()),
            }
        ),
        path,
    )


@pytest.fixture()
def original_layout(spark, tmp_path):
    """Converted-table layout: two root-level flat bucket files
    (originals, keys 1-4 / 5-8), one post-conversion insert delta
    (keys 9-10, writeid 1), one delete_delta (writeid 2) whose events
    target BOTH identity regimes — synthetic (otid 0: key 2 = file 0
    ordinal 1, key 5 = file 1 ordinal 0) and assigned (otid 1: key 9
    = delta bucket 0 ordinal 0)."""
    from pyspark.sql import functions as F

    from layer_apache_hive_spark.sources.hive_acid import (
        _OP_DELETE,
        _OP_INSERT,
        _write_version_dirs,
    )

    root = str(tmp_path / "converted")
    os.makedirs(root)
    _write_flat_orc(
        os.path.join(root, "000000_0"),
        [(i, "A", float(i)) for i in (1, 2, 3, 4)],
    )
    _write_flat_orc(
        os.path.join(root, "000001_0"),
        [(i, "A", float(i)) for i in (5, 6, 7, 8)],
    )
    ins = spark.createDataFrame(
        [(9, "B", 9.0, 0, 0), (10, "B", 10.0, 1, 0)],
        "k long, status string, price double, __bucket int, __rid long",
    ).select(
        "k", "status", "price", "__bucket",
        F.col("__rid").cast("long").alias("__rid"),
        F.lit(1).cast("long").alias("__otid"),
        F.lit(1).cast("long").alias("__ctid"),
        F.lit(_OP_INSERT).alias("__op"),
    )
    _write_version_dirs(
        ins, None, os.path.join(root, "delta_0000001_0000001"), None,
        _fields(),
    )
    dels = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 0), (1, 0, 0)],
        "__otid long, __bucket int, __rid long",
    ).select(
        "__otid", "__bucket", "__rid",
        F.lit(_OP_DELETE).alias("__op"),
        F.lit(2).cast("long").alias("__ctid"),
    )
    _write_version_dirs(
        ins.limit(0), dels,
        os.path.join(root, "delta_0000002_0000002"),
        os.path.join(root, "delete_delta_0000002_0000002"),
        _fields(),
    )
    return root


_ORIG_EXPECT = {(1, "A", 1.0), (3, "A", 3.0), (4, "A", 4.0),
                (6, "A", 6.0), (7, "A", 7.0), (8, "A", 8.0),
                (10, "B", 10.0)}  # deleted: 2 (orig), 5 (orig), 9 (delta)


def test_original_files_read_with_synthetic_identities(spark, original_layout):
    assert _snapshot(spark, original_layout) == _ORIG_EXPECT


def test_original_files_survive_compaction_with_identities(
    spark, original_layout
):
    """Compact at watermark 1: originals + the insert delta fold into
    base_0000001 with identities preserved, so writeid 2's delete
    events (both regimes) still find their rows; the Cleaner then
    drops the originals and the folded delta."""
    w = compact_hive_acid(
        spark, original_layout, SCHEMA, _fields(), max_writeid=1
    )
    assert w == 1
    removed = clean_hive_acid(original_layout)
    assert set(removed) == {"000000_0", "000001_0", "delta_0000001_0000001"}
    assert sorted(os.listdir(original_layout)) == [
        "base_0000001",
        "delete_delta_0000002_0000002",
    ]
    assert _snapshot(spark, original_layout) == _ORIG_EXPECT


def test_multiple_original_files_per_bucket_continue_rowids(
    spark, original_layout
):
    """_copy_N (r10): rowIds CONTINUE across a bucket's flat files in
    filename order (OriginalReaderPair) — bucket 0's copy_1 rows get
    rids starting at 4 (after 000000_0's 4 rows), so the existing
    delete events (rids 0/1) still hit the FIRST file's rows only."""
    _write_flat_orc(
        os.path.join(original_layout, "000000_0_copy_1"),
        [(99, "C", 99.0), (100, "C", 100.0)],
    )
    got = _snapshot(spark, original_layout)
    assert got == _ORIG_EXPECT | {(99, "C", 99.0), (100, "C", 100.0)}


def test_delete_targeting_second_copy_file_lands_on_right_rows(
    spark, original_layout
):
    """A post-conversion delete_delta aimed at the SECOND file of a
    bucket (continued rid 5 = copy_1's second row) must delete
    exactly that row: a reader that restarted rids per file would
    instead shadow the first file's rid-5 (nonexistent here) and
    leave key 100 alive, or mis-delete an early row."""
    from pyspark.sql import functions as F

    from layer_apache_hive_spark.sources.hive_acid import (
        _OP_DELETE,
        _write_version_dirs,
    )

    _write_flat_orc(
        os.path.join(original_layout, "000000_0_copy_1"),
        [(99, "C", 99.0), (100, "C", 100.0)],
    )
    dels = spark.createDataFrame(
        [(0, 0, 5)], "__otid long, __bucket int, __rid long"
    ).select(
        "__otid", "__bucket", "__rid",
        F.lit(_OP_DELETE).alias("__op"),
        F.lit(3).cast("long").alias("__ctid"),
    )
    empty = spark.createDataFrame(
        [],
        "__op int, __otid long, __bucket int, __rid long, __ctid long,"
        " k long, status string, price double",
    )
    _write_version_dirs(
        empty, dels,
        os.path.join(original_layout, "delta_0000003_0000003"),
        os.path.join(original_layout, "delete_delta_0000003_0000003"),
        _fields(),
    )
    got = _snapshot(spark, original_layout)
    assert got == _ORIG_EXPECT | {(99, "C", 99.0)}  # 100 gone, 1 alive


def test_multi_copy_originals_survive_compaction(spark, original_layout):
    """Compaction folds ALL of a bucket's flat files into the base
    with their continued synthetic identities preserved, so the
    writeid-2 deletes (first file's rids) still find their rows and
    the copy rows survive with their continued rids intact."""
    _write_flat_orc(
        os.path.join(original_layout, "000000_0_copy_1"),
        [(99, "C", 99.0), (100, "C", 100.0)],
    )
    expect = _ORIG_EXPECT | {(99, "C", 99.0), (100, "C", 100.0)}
    w = compact_hive_acid(
        spark, original_layout, SCHEMA, _fields(), max_writeid=1
    )
    assert w == 1
    removed = clean_hive_acid(original_layout)
    assert set(removed) == {
        "000000_0", "000000_0_copy_1", "000001_0", "delta_0000001_0000001",
    }
    assert _snapshot(spark, original_layout) == expect


def test_compact_is_idempotent(spark, layout):
    """Running the compactor twice (Hive's Initiator can race a
    manual ALTER TABLE COMPACT) rewrites the same base in place —
    same watermark, same survivors, nothing lost or doubled."""
    before = _snapshot(spark, layout)
    assert compact_hive_acid(spark, layout, SCHEMA, _fields()) == 3
    assert compact_hive_acid(spark, layout, SCHEMA, _fields()) == 3
    clean_hive_acid(layout)
    assert sorted(os.listdir(layout)) == ["base_0000003"]
    assert _snapshot(spark, layout) == before


# --- minor compaction (merge deltas, keep deletes unapplied) -----------------


def test_minor_compact_merges_ranges_events_verbatim(spark, layout):
    """Minor compaction merges delta_2 + delta_3 into
    delta_0000002_0000003 and the delete delta into
    delete_delta_0000002_0000003, copying events VERBATIM — mixed
    otids sorted per the run contract, delete events keeping their
    currentTransaction — and the base is untouched."""
    from pyarrow import orc as pa_orc

    from layer_apache_hive_spark.sources.hive_acid import (
        minor_compact_hive_acid,
    )

    before = _snapshot(spark, layout)
    assert minor_compact_hive_acid(spark, layout, SCHEMA, _fields()) == (
        2,
        3,
    )
    entries = sorted(os.listdir(layout))
    assert "delta_0000002_0000003" in entries
    assert "delete_delta_0000002_0000003" in entries
    assert "base_0000001" in entries
    # election must prefer the merged ranges (no double counting)
    assert _snapshot(spark, layout) == before
    # merged insert run: mixed otids {2, 3}, sorted (otid, rid)
    otids = set()
    for f in os.listdir(os.path.join(layout, "delta_0000002_0000003")):
        t = pa_orc.ORCFile(
            os.path.join(layout, "delta_0000002_0000003", f)
        ).read()
        run = list(
            zip(
                t["originalTransaction"].to_pylist(),
                t["rowId"].to_pylist(),
            )
        )
        assert run == sorted(run), (f, run)
        otids |= {o for o, _ in run}
    assert otids == {2, 3}, otids
    # merged delete events keep ctid=3 (the deleting transaction)
    ctids = set()
    d = os.path.join(layout, "delete_delta_0000002_0000003")
    for f in os.listdir(d):
        t = pa_orc.ORCFile(os.path.join(d, f)).read()
        ctids |= set(t["currentTransaction"].to_pylist())
    assert ctids == {3}, ctids
    # Cleaner drops the subsumed inputs, read unchanged
    removed = clean_hive_acid(layout)
    assert set(removed) == {
        "delta_0000002_0000002",
        "delta_0000003_0000003",
        "delete_delta_0000003_0000003",
    }, removed
    assert _snapshot(spark, layout) == before


def test_minor_then_major_compaction_compose(spark, layout):
    """The lifecycle a streaming table actually runs: minor merges
    the delta chain, major later folds everything into one base."""
    from layer_apache_hive_spark.sources.hive_acid import (
        minor_compact_hive_acid,
    )

    before = _snapshot(spark, layout)
    minor_compact_hive_acid(spark, layout, SCHEMA, _fields())
    clean_hive_acid(layout)
    assert compact_hive_acid(spark, layout, SCHEMA, _fields()) == 3
    clean_hive_acid(layout)
    assert sorted(os.listdir(layout)) == ["base_0000003"]
    assert _snapshot(spark, layout) == before


def test_minor_compact_noop_when_already_merged(spark, layout):
    from layer_apache_hive_spark.sources.hive_acid import (
        minor_compact_hive_acid,
    )

    assert minor_compact_hive_acid(spark, layout, SCHEMA, _fields()) == (
        2,
        3,
    )
    clean_hive_acid(layout)
    assert (
        minor_compact_hive_acid(spark, layout, SCHEMA, _fields()) is None
    )
