"""Round-11 pins: Hive-3 ACID interop fidelity on layouts this
engine did not write itself, plus the wire DML/COMPACT surface.

1. _parse_acid_name accepts the full Hive-3 grammar — visibility
   suffixes (base_N_vNNNNNNN, delta_x_y_vNNNNNNN) and statement-id
   deltas (delta_x_y_ssss) — and rejects garbage (r10 verdict task 1).
2. ValidWriteIdList round-trips Hive's wire serialization and the
   election/decode excludes aborted + open writeids (task 2).
3. A delta straddling the max_writeid watermark is elected with
   per-event filtering instead of dropped (r10 advisor item 1 — the
   max_valid counterpart of min_valid).
4. The ≥10-copies _copy_N ordering is pinned by test: lexicographic
   filename order, matching Hive's Path sort (_copy_10 < _copy_2)
   (r10 verdict task 9).
5. Statement dirs of one transaction are elected together, never
   subsume each other, and a stmt-less same-range delta (the minor
   compactor's output) subsumes them.
6. append_delta/next_writeid — the wire-DML commit primitives.
7. TxnSessionManager's served-acid surface: bare INSERT auto-commits
   one delta, BEGIN/INSERT×2/COMMIT writes statement dirs, ROLLBACK
   leaves no dir, store mixing is refused, ALTER TABLE COMPACT
   enqueues on the initiator with the initiated→succeeded lifecycle.
8. Write-once fixture markers carry a content key: a recipe change
   rebuilds instead of serving the stale layout (r10 advisor item 4).
9. Trained PQ recall gate: the trained codebooks recover at least as
   much of the exact integer-L2 top-10 as the untrained init codebook
   on the clustered fixture (r10 verdict next-round task 6).
10. The BPE stopping rule is shared three ways — Spark loop, generated
    DuckDB CTE, Python reference — on a stop-triggering corpus (task 7).
11. Insert-only (MM) tables: lifecycle (aborted exclusion, statement
    dirs, watermark, compaction, Cleaner), initiator routing, wire DML
    and SHOW TRANSACTIONS.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from layer_apache_hive_spark.sources.hive_acid import (
    ValidWriteIdList,
    _fixture_done,
    _fixture_ready,
    _parse_acid_name,
    append_delta,
    clean_hive_acid,
    compact_hive_acid,
    minor_compact_hive_acid,
    next_writeid,
    read_hive_acid,
)
from tests.test_round10_properties import (
    _V3,
    SCHEMA,
    _export_chain,
    _fields,
    _snap,
    _write_acid_file,
)


# --- 1. the name grammar ----------------------------------------------------


@pytest.mark.parametrize(
    "entry,expect",
    [
        ("base_0000005", ("base", 5, 5, None)),
        ("base_0000005_v0000123", ("base", 5, 5, None)),
        ("delta_0000002_0000004", ("delta", 2, 4, None)),
        ("delta_0000002_0000002_0003", ("delta", 2, 2, 3)),
        ("delta_0000002_0000004_v0000123", ("delta", 2, 4, None)),
        ("delta_0000002_0000002_0003_v0000123", ("delta", 2, 2, 3)),
        ("delete_delta_0000002_0000004", ("delete_delta", 2, 4, None)),
        ("delete_delta_0000002_0000002_0001", ("delete_delta", 2, 2, 1)),
        ("delete_delta_0000003_0000003_v0000055", ("delete_delta", 3, 3, None)),
        (".minor_scratch", None),
        ("_SUCCESS", None),
        ("stray.tmp", None),
        ("base_", None),
        ("base_abc", None),
        ("base_1_2", None),  # a base has one writeid
        ("delta_0000002", None),  # a delta needs a range
        ("delta_a_b", None),
        ("delta_1_2_3_4", None),  # stmt + extra garbage
        ("000000_0", None),  # originals parse elsewhere
    ],
)
def test_parse_acid_name_grammar(entry, expect):
    assert _parse_acid_name(entry) == expect


def test_v_suffixed_and_stmt_layout_elects_and_reads(spark, tmp_path):
    """A layout a REAL Hive 3 warehouse writes: _v-suffixed base and
    delete_delta, two same-range statement deltas. The pre-r11 parser
    raised ValueError on the _v suffix and mis-read a stmt delta's
    range as (maxW, stmtId)."""
    root = str(tmp_path / "h3")
    base = os.path.join(root, "base_0000001_v0000042")
    os.makedirs(base)
    _write_acid_file(os.path.join(base, "bucket_00000"), [1, 2, 3], otid=1)
    s0 = os.path.join(root, "delta_0000002_0000002_0000")
    s1 = os.path.join(root, "delta_0000002_0000002_0001")
    os.makedirs(s0)
    os.makedirs(s1)
    _write_acid_file(os.path.join(s0, "bucket_00000"), [10, 11], otid=2)
    # stmt 1 uses a disjoint rowId space (BucketCodec statement
    # packing stand-in): rid 0.. would collide with stmt 0 otherwise
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    t = pa.table(
        {
            "operation": pa.array([0, 0], pa.int32()),
            "originalTransaction": pa.array([2, 2], pa.int64()),
            "bucket": pa.array([0, 0], pa.int32()),
            "rowId": pa.array([1 << 40, (1 << 40) + 1], pa.int64()),
            "currentTransaction": pa.array([2, 2], pa.int64()),
            "row": pa.StructArray.from_arrays(
                [
                    pa.array([20, 21], pa.int64()),
                    pa.array(["S", "S"], pa.string()),
                    pa.array([20.0, 21.0], pa.float64()),
                ],
                names=["k", "status", "price"],
            ),
        }
    )
    pa_orc.write_table(t, os.path.join(s1, "bucket_00000"))
    got = {r.k for r in read_hive_acid(spark, root, SCHEMA).collect()}
    assert got == {1, 2, 3, 10, 11, 20, 21}

    # a stmt-less same-range delta (the minor compactor's output)
    # subsumes BOTH statement dirs — but not vice versa
    from layer_apache_hive_spark.sources.hive_acid import _drop_subsumed

    merged = os.path.join(root, "delta_0000002_0000002")
    kept = _drop_subsumed([s0, s1, merged])
    assert kept == [merged]
    assert sorted(_drop_subsumed([s0, s1])) == sorted([s0, s1])


def test_minor_compaction_merges_statement_dirs(spark, tmp_path):
    """Two same-range statement dirs merge into the stmt-less
    delta_x_y (rewrite productive even though no range widens), the
    Cleaner drops the inputs, and the read is unchanged."""
    root = str(tmp_path / "stmts")
    os.makedirs(root)
    for stmt, ks in ((0, [1, 2]), (1, [3, 4])):
        d = os.path.join(root, f"delta_0000001_0000001_{stmt:04d}")
        os.makedirs(d)
        _write_acid_file(
            os.path.join(d, "bucket_00000"), ks, otid=1
        )
        if stmt == 1:  # disjoint rid space for the sibling statement
            import pyarrow as pa
            from pyarrow import orc as pa_orc

            f = pa_orc.ORCFile(os.path.join(d, "bucket_00000")).read()
            t = f.set_column(
                3, "rowId", pa.array([1 << 40, (1 << 40) + 1], pa.int64())
            )
            pa_orc.write_table(t, os.path.join(d, "bucket_00000"))
    assert minor_compact_hive_acid(spark, root, SCHEMA, _fields()) == (1, 1)
    clean_hive_acid(root)
    assert sorted(os.listdir(root)) == ["delta_0000001_0000001"]
    assert {r.k for r in read_hive_acid(spark, root, SCHEMA).collect()} == {
        1,
        2,
        3,
        4,
    }


# --- 2. ValidWriteIdList ------------------------------------------------------


def test_valid_writeids_serialization_roundtrip():
    v = ValidWriteIdList.from_string("db.tbl:7:4:4,5:6")
    assert v.table == "db.tbl"
    assert v.high_watermark == 7
    assert v.open_ids == {4, 5}
    assert v.aborted == {6}
    assert v.invalid_ids == {4, 5, 6}
    v2 = ValidWriteIdList.from_string(str(v))
    assert (v2.high_watermark, v2.open_ids, v2.aborted) == (
        7,
        {4, 5},
        {6},
    )
    # Long.MAX_VALUE watermark means "no bound" (Hive's idle value)
    unbounded = ValidWriteIdList.from_string(
        "t:9223372036854775807:::"
    )
    assert unbounded.high_watermark is None


def test_aborted_orphan_excluded_and_compaction_drops_it(spark, tmp_path):
    """An orphan delta from a crashed writer (aborted writeid) must
    not be read NOR folded: the election drops it wholesale, a major
    compaction under the same ValidWriteIdList builds a base without
    it, and — writeids being monotone — next_writeid still advances
    past the aborted id (no resurrection)."""
    root = str(tmp_path / "ab")
    _export_chain(spark, root)  # writeids 1..3
    orphan = os.path.join(root, "delta_0000004_0000004")
    os.makedirs(orphan)
    _write_acid_file(os.path.join(orphan, "bucket_00000"), [99], otid=4)

    vwil = ValidWriteIdList.from_string("t:4:::4")
    got = _snap_with(spark, root, vwil)
    assert got == _V3  # the orphan's key 99 never appears
    assert next_writeid(root) == 5

    w = compact_hive_acid(
        spark, root, SCHEMA, _fields(), valid_writeids=vwil
    )
    assert w == 3  # hwm 4 caps it; elected max is 3
    clean_hive_acid(root)
    assert _snap_with(spark, root, vwil) == _V3
    # the aborted orphan still sits on disk (no txn-metadata cleanup
    # here) but stays excluded under the list
    assert "delta_0000004_0000004" in os.listdir(root)


def _snap_with(spark, root, vwil):
    return {
        (r.k, r.status, r.price)
        for r in read_hive_acid(
            spark, root, SCHEMA, valid_writeids=vwil
        ).collect()
    }


def test_open_writeids_excluded_like_aborted(spark, tmp_path):
    """A still-OPEN writeid (concurrent writer mid-transaction) is
    invisible exactly like an aborted one — but becomes visible once
    the list says committed (same dirs, new list, no rewrite)."""
    root = str(tmp_path / "open")
    _export_chain(spark, root)
    d4 = os.path.join(root, "delta_0000004_0000004")
    os.makedirs(d4)
    _write_acid_file(os.path.join(d4, "bucket_00000"), [50], otid=4)

    reading = ValidWriteIdList.from_string("t:4:4:4:")
    assert _snap_with(spark, root, reading) == _V3
    committed = ValidWriteIdList.from_string("t:4:::")
    assert _snap_with(spark, root, committed) == _V3 | {(50, "S", 50.0)}


# --- 3. watermark-straddling deltas (max_valid) ------------------------------


def test_watermark_straddling_delta_filters_per_event(spark, tmp_path):
    """A merged delta_0000002_0000003 read at max_writeid=2 must
    contribute its writeid-2 events and HIDE writeid 3 — the pre-r11
    election dropped the dir wholesale and silently returned the v1
    state (r10 advisor item 1). The same bounded read drives a
    mid-range compaction: base_0000002 is the v2 state."""
    root = str(tmp_path / "straddle")
    _export_chain(spark, root)
    assert minor_compact_hive_acid(spark, root, SCHEMA, _fields()) == (2, 3)
    clean_hive_acid(root)
    assert sorted(os.listdir(root)) == [
        "base_0000001",
        "delete_delta_0000002_0000003",
        "delta_0000002_0000003",
    ]
    v2 = {(i, "A", float(i)) for i in range(1, 9)} | {
        (9, "B", 9.0),
        (10, "B", 10.0),
    }
    got = {
        (r.k, r.status, r.price)
        for r in read_hive_acid(
            spark, root, SCHEMA, max_writeid=2
        ).collect()
    }
    assert got == v2
    # fold at the mid-range watermark: the straddling dirs stay (max
    # 3 > base 2) and the unbounded read still lands on v3
    assert compact_hive_acid(spark, root, SCHEMA, _fields(), max_writeid=2) == 2
    clean_hive_acid(root)
    entries = sorted(os.listdir(root))
    assert "base_0000002" in entries
    assert "delta_0000002_0000003" in entries
    assert _snap(spark, root) == _V3


def test_minor_compact_never_merges_watermark_straddlers(spark, tmp_path):
    """A minor compaction bounded at writeid 2 must leave a
    delta_0000002_0000003 alone: folding a PARTIAL dir into a
    full-range name would lose its writeid-3 events."""
    root = str(tmp_path / "nostraddle")
    _export_chain(spark, root)
    assert minor_compact_hive_acid(spark, root, SCHEMA, _fields()) == (2, 3)
    clean_hive_acid(root)
    before = sorted(os.listdir(root))
    assert (
        minor_compact_hive_acid(
            spark, root, SCHEMA, _fields(), max_writeid=2
        )
        is None
    )
    assert sorted(os.listdir(root)) == before


# --- 4. the ≥10-copies _copy_N ordering --------------------------------------


def test_copy_n_ordering_pinned_across_eleven_files(spark, tmp_path):
    """Eleven flat files in ONE bucket: rowIds continue across them in
    LEXICOGRAPHIC filename order — Hive's Path sort, under which
    _copy_10 and _copy_11 sort BEFORE _copy_2. A delete targeting a
    rowId computed under that order must land on the right row."""
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    root = str(tmp_path / "copies")
    os.makedirs(root)
    # file i carries key 100+i, one row each; creation order 0..11
    names = ["000000_0"] + [f"000000_0_copy_{i}" for i in range(1, 12)]
    for i, name in enumerate(names):
        t = pa.table(
            {
                "k": pa.array([100 + i], pa.int64()),
                "status": pa.array(["S"], pa.string()),
                "price": pa.array([float(i)], pa.float64()),
            }
        )
        pa_orc.write_table(t, os.path.join(root, name))
    lex = sorted(names)
    # sanity: lexicographic ≠ numeric (the convention under test)
    assert lex.index("000000_0_copy_10") < lex.index("000000_0_copy_2")
    # expected synthesized rid of each key: position of its file in
    # lexicographic order (one row per file)
    expect_rid = {100 + names.index(n): rid for rid, n in enumerate(lex)}
    got = {
        r.k: r.rid
        for r in read_hive_acid(
            spark, root, SCHEMA, keep_identity=True
        ).collect()
    }
    assert got == expect_rid
    # and a delete on the key stored in _copy_2 (lexicographically
    # LAST) must remove exactly that key
    from layer_apache_hive_spark.sources.hive_acid import (
        _OP_DELETE,
        _write_version_dirs,
    )

    target_rid = expect_rid[102]  # key in _copy_2
    dels = spark.createDataFrame(
        [(0, 0, target_rid)], "__otid long, __bucket int, __rid long"
    ).select(
        "__otid",
        "__bucket",
        "__rid",
        F.lit(_OP_DELETE).alias("__op"),
        F.lit(1).cast("long").alias("__ctid"),
    )
    empty = spark.createDataFrame(
        [],
        "__op int, __otid long, __bucket int, __rid long, __ctid long,"
        " k long, status string, price double",
    )
    _write_version_dirs(
        empty,
        dels,
        os.path.join(root, "delta_0000001_0000001"),
        os.path.join(root, "delete_delta_0000001_0000001"),
        _fields(),
    )
    ks = {r.k for r in read_hive_acid(spark, root, SCHEMA).collect()}
    assert ks == set(expect_rid) - {102}


# --- 6. wire-DML commit primitives -------------------------------------------


def test_append_delta_and_next_writeid(spark, tmp_path):
    root = str(tmp_path / "dml")
    assert next_writeid(root) == 1
    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0)], "k long, status string, price double"
    )
    p = append_delta(spark, root, df, SCHEMA, _fields(), 1, n_buckets=2)
    assert os.path.basename(p) == "delta_0000001_0000001"
    assert next_writeid(root) == 2
    # statement dirs: same writeid, disjoint rid spaces
    p0 = append_delta(
        spark, root, df.filter("k = 1"), SCHEMA, _fields(), 2, stmt=0
    )
    p1 = append_delta(
        spark, root, df.filter("k = 2"), SCHEMA, _fields(), 2, stmt=1
    )
    assert os.path.basename(p0) == "delta_0000002_0000002_0000"
    assert os.path.basename(p1) == "delta_0000002_0000002_0001"
    rows = read_hive_acid(spark, root, SCHEMA, keep_identity=True).collect()
    assert len(rows) == 4
    rids = {(r.otid, r.rid) for r in rows if r.otid == 2}
    assert rids == {(2, 0), (2, 1 << 40)}
    # empty statement: no dir, no error
    assert (
        append_delta(spark, root, df.limit(0), SCHEMA, _fields(), 3)
        is None
    )
    assert next_writeid(root) == 3  # nothing on disk consumed id 3
    # an aborted dir still advances the allocator (monotone writeids)
    os.makedirs(os.path.join(root, "delta_0000007_0000007"))
    assert next_writeid(root) == 8


# --- 7. the served-acid manager surface (no wire) -----------------------------


@pytest.fixture()
def acid_mgr(spark, tmp_path):
    from layer_apache_hive_spark.acid import TransactionCatalog
    from layer_apache_hive_spark.sources.hive_acid import (
        HiveAcidInitiator,
    )
    from layer_apache_hive_spark.txn import TxnSessionManager

    init = HiveAcidInitiator(
        spark,
        delta_num_threshold=100,
        delta_pct_threshold=100.0,
        serve_compactions_as="r11_compactions",
    )
    cat = TransactionCatalog(str(tmp_path / "cat"))
    cat.commit(spark, {"vt_t": spark.createDataFrame([(1,)], "a long")})
    mgr = TxnSessionManager(spark, cat, publish=False, initiator=init)
    root = str(tmp_path / "acid_orders")
    os.makedirs(root)
    seed = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0)], "k long, status string, price double"
    )
    append_delta(spark, root, seed, SCHEMA, _fields(), 1, n_buckets=2)
    mgr.enroll_hive_acid("acid_orders", root, SCHEMA, _fields(), n_buckets=2)
    return mgr, root


def _served(spark):
    return {
        r.k for r in spark.table("global_temp.acid_orders").collect()
    }


def test_acid_bare_insert_autocommits_one_delta(spark, acid_mgr):
    mgr, root = acid_mgr
    out = mgr.handle(
        "s1",
        "INSERT INTO acid_orders SELECT 3 AS k, 'B' AS s, 3.0 AS p",
    )
    assert out.startswith("DONE:Committed writeid 2"), out
    assert "delta_0000002_0000002" in os.listdir(root)
    assert _served(spark) == {1, 2, 3}
    assert {r.k for r in read_hive_acid(spark, root, SCHEMA).collect()} == {
        1,
        2,
        3,
    }


def test_acid_txn_commit_writes_statement_dirs(spark, acid_mgr):
    mgr, root = acid_mgr
    assert mgr.handle("s1", "BEGIN").startswith("ACTIVE:")
    assert mgr.handle(
        "s1", "INSERT INTO acid_orders SELECT 10 AS k, 'C' AS s, 1.0 AS p"
    ).startswith("ACTIVE:Buffered")
    assert mgr.handle(
        "s1", "INSERT INTO acid_orders SELECT 11 AS k, 'C' AS s, 1.0 AS p"
    ).startswith("ACTIVE:Buffered")
    # nothing on disk until COMMIT
    assert next_writeid(root) == 2
    out = mgr.handle("s1", "COMMIT")
    assert out.startswith("DONE:Committed 2 statements"), out
    entries = sorted(os.listdir(root))
    assert "delta_0000002_0000002_0000" in entries
    assert "delta_0000002_0000002_0001" in entries
    assert _served(spark) == {1, 2, 10, 11}


def test_acid_rollback_leaves_no_dir(spark, acid_mgr):
    mgr, root = acid_mgr
    before = sorted(os.listdir(root))
    mgr.handle("s1", "BEGIN")
    mgr.handle(
        "s1", "INSERT INTO acid_orders SELECT 99 AS k, 'X' AS s, 0.0 AS p"
    )
    out = mgr.handle("s1", "ROLLBACK")
    assert out.startswith("DONE:Transaction rolled back")
    assert sorted(os.listdir(root)) == before
    assert _served(spark) == {1, 2}


def test_acid_store_mixing_refused(spark, acid_mgr):
    mgr, root = acid_mgr
    mgr.handle("s1", "BEGIN")
    assert mgr.handle(
        "s1", "INSERT INTO acid_orders SELECT 5 AS k, 'B' AS s, 1.0 AS p"
    ).startswith("ACTIVE:Buffered")
    out = mgr.handle("s1", "INSERT INTO vt_t SELECT 2 AS a")
    assert out.startswith("ERR_ACTIVE:") and "span both stores" in out, out
    mgr.handle("s1", "ROLLBACK")


def test_acid_update_delete_and_overwrite_served(spark, acid_mgr):
    """r12: the verbs the r11 surface refused are now served — IOW
    writes a base_W (single-statement transaction), and UPDATE/DELETE
    buffer inside BEGIN blocks as split-update statements. IOW inside
    an open transaction stays refused (a base cannot be one statement
    dir of a multi-statement writeid)."""
    mgr, root = acid_mgr
    out = mgr.handle("s1", "INSERT OVERWRITE acid_orders SELECT 9, 'Z', 9.0")
    assert out.startswith("DONE:Committed writeid 2 (base_0000002"), out
    assert _served(spark) == {9}
    mgr.handle("s1", "BEGIN")
    out = mgr.handle("s1", "INSERT OVERWRITE acid_orders SELECT 1, 'A', 1.0")
    assert out.startswith("ERR_ACTIVE:") and "single-statement" in out
    out = mgr.handle("s1", "DELETE FROM acid_orders WHERE k = 9")
    assert out.startswith("ACTIVE:Buffered"), out
    assert mgr.handle("s1", "COMMIT").startswith("DONE:Committed 1")
    assert _served(spark) == set()


def test_acid_compact_statement_lifecycle(spark, acid_mgr):
    mgr, root = acid_mgr
    mgr.handle(
        "s1", "INSERT INTO acid_orders SELECT 3 AS k, 'B' AS s, 3.0 AS p"
    )
    out = mgr.handle("s1", "ALTER TABLE acid_orders COMPACT 'major'")
    assert out.startswith("DONE:Compaction request queued"), out
    view = spark.table("global_temp.r11_compactions")
    states = [(r.kind, r.state) for r in view.collect()]
    assert states == [("major", "initiated")]
    done = mgr.initiator.run_once()
    assert done and done[0][1] == "major"
    states = [
        (r.kind, r.state)
        for r in spark.table("global_temp.r11_compactions").collect()
    ]
    assert states == [("major", "succeeded")]
    # r13: manager-driven folds stamp the HIVE-20823 visibility
    # suffix from the ledger's dedicated sequence
    assert sorted(os.listdir(root)) == ["base_0000002_v0000001"]
    # unknown table / bad kind / inside-txn refusals
    assert mgr.handle(
        "s1", "ALTER TABLE nope COMPACT 'major'"
    ).startswith("ERR_ENDED:")
    mgr.handle("s1", "BEGIN")
    assert mgr.handle(
        "s1", "ALTER TABLE acid_orders COMPACT 'minor'"
    ).startswith("ERR_ACTIVE:")
    mgr.handle("s1", "ROLLBACK")


# --- 8. fixture content keys ---------------------------------------------------


def test_fixture_marker_rebuilds_on_key_change(tmp_path):
    shared = str(tmp_path / "fx")
    assert not _fixture_ready(shared, "k1")  # first build
    open(os.path.join(shared, "payload"), "w").write("x")
    _fixture_done(shared, "k1")
    assert _fixture_ready(shared, "k1")  # served as-is
    assert os.path.exists(os.path.join(shared, "payload"))
    # recipe change: stale layout wiped, caller rebuilds
    assert not _fixture_ready(shared, "k2")
    assert not os.path.exists(os.path.join(shared, "payload"))


# --- 9. trained product quantization (r10 verdict next-round task 6) ----------


def test_pq_training_beats_untrained_codebook_on_clustered(spark):
    """What training BUYS, measured: on the clustered fixture (where
    codebook placement matters) the trained codebooks must recover at
    least as much of the exact integer-L2 top-10 as the UNTRAINED
    init codebook (iters=0 — the same pipeline, no Lloyd step), at
    the same candidate budget; on the isotropic driver fixture the
    absolute floor is 0.55 (the ext_sim_ivfpq gate level)."""
    import numpy as np

    from layer_apache_hive_spark.catalog import read_table
    from layer_apache_hive_spark.extensions.fixtures import (
        build_clustered_embeddings,
    )
    from layer_apache_hive_spark.extensions.similarity import (
        _PQT_ITERS,
        _PQT_SCALE,
        _pq_trained_frame,
    )

    def exact_pairs(sf_dir):
        emb = (
            read_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .toPandas()
        )
        vid = emb["vec_id"].to_numpy()
        M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        S = np.floor(M * _PQT_SCALE).astype(np.int64)
        exact = set()
        for q in range(5):
            qw = np.where(vid == q)[0]
            if not len(qw):
                continue
            d2 = ((S - S[qw[0]]) ** 2).sum(1)
            order = sorted(
                range(len(vid)), key=lambda i: (d2[i], vid[i])
            )
            exact |= set(
                [(q, int(vid[i])) for i in order if vid[i] != q][:10]
            )
        return exact

    def recall(sf_dir, iters, exact):
        got = {
            (r.query_id, r.neighbor_id)
            for r in _pq_trained_frame(spark, sf_dir, iters).collect()
        }
        return len(got & exact) / len(exact)

    clustered = build_clustered_embeddings(
        "/root/testdata/sf0.001", "/root/repo/.tmp/r11_pq_clustered"
    )
    exact_c = exact_pairs(clustered)
    r_trained = recall(clustered, _PQT_ITERS, exact_c)
    r_untrained = recall(clustered, 0, exact_c)
    # measured 0.96 vs 0.92 at iters=3; deterministic up to driver
    # testdata regeneration
    assert r_trained >= r_untrained, (r_trained, r_untrained)
    assert r_trained >= 0.9, r_trained

    exact_i = exact_pairs("/root/testdata/sf0.001")
    r_iso = recall("/root/testdata/sf0.001", _PQT_ITERS, exact_i)
    assert r_iso >= 0.55, r_iso


# --- 10. the BPE stopping rule (r10 verdict next-round task 7) ----------------


def test_bpe_stop_rule_shared_by_spark_oracle_and_reference(
    spark, tmp_path
):
    """A corpus whose second iteration's argmax count falls below the
    floor: the stopping iteration is emitted once with stopped=1, its
    merge is NOT applied, later iterations emit nothing — and all
    three implementations (the Spark loop, the generated DuckDB CTE
    chain, a Python reference with the same stop) agree row for
    row."""
    import duckdb

    from layer_apache_hive_spark.extensions.text_analysis import (
        _BPE_TRAIN_TOP,
        _bpe_train_frame,
        _bpe_train_oracle,
    )

    words = {"aab": 1, "xy": 5}  # iter1: (x,y)=5 >= 2; iter2: max 1 < 2
    docs, i = [], 0
    for w, c in words.items():
        for _ in range(c):
            docs.append((i, w))
            i += 1
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    def ref(iters, top, min_count):
        state = {tuple(w): c for w, c in words.items() if len(w) >= 2}
        rows = []
        for it in range(1, iters + 1):
            pc = {}
            for syms, c in state.items():
                for x, y in zip(syms, syms[1:]):
                    pc[(x, y)] = pc.get((x, y), 0) + c
            ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if not ranked:
                break
            for rank, ((a, b), n) in enumerate(ranked[:top], 1):
                rows.append(
                    (it, rank, a, b, n,
                     1 if rank == 1 and n < min_count else 0)
                )
            (a, b), n = ranked[0]
            if n < min_count:
                break  # the stop: merge unapplied, loop ends
            nxt = {}
            for syms, c in state.items():
                out, j = [], 0
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and syms[j] == a
                        and syms[j + 1] == b
                    ):
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
            state = nxt
        return sorted(rows)

    expect = ref(4, _BPE_TRAIN_TOP, 2)
    assert any(r[5] == 1 for r in expect), "fixture must trigger the stop"
    assert max(r[0] for r in expect) == 2, "no rows after the stop"

    got_spark = sorted(
        (r.iteration, r.pair_rank, r.left_sym, r.right_sym,
         r.pair_count, r.stopped)
        for r in _bpe_train_frame(
            spark, str(tmp_path), 4, min_count=2
        ).collect()
    )
    assert got_spark == expect, (got_spark, expect)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    got_oracle = sorted(
        tuple(r) for r in con.execute(_bpe_train_oracle(4, 2)).fetchall()
    )
    assert got_oracle == expect, (got_oracle, expect)


# --- 11. insert-only (MM) transactional tables --------------------------------


def test_mm_table_lifecycle(spark, tmp_path):
    """The Hive-3 default managed layout for parquet: plain-file
    delta dirs under the ACID name grammar. Aborted dirs drop
    wholesale, statement dirs union, the watermark bounds reads,
    compaction folds committed dirs into a base and the Cleaner
    drops the inputs — all at native parquet scan speed."""
    from layer_apache_hive_spark.sources.hive_acid import (
        ValidWriteIdList,
        append_mm_delta,
        clean_hive_acid,
        compact_hive_mm,
        read_hive_mm,
    )

    root = str(tmp_path / "mm")

    def batch(ks):
        return spark.createDataFrame([(k,) for k in ks], "k long")

    append_mm_delta(spark, root, batch([1, 2]), 1)
    # statement dirs of one multi-statement txn
    append_mm_delta(spark, root, batch([3]), 2, stmt=0)
    append_mm_delta(spark, root, batch([4]), 2, stmt=1)
    append_mm_delta(spark, root, batch([99]), 3)  # aborted orphan
    append_mm_delta(spark, root, batch([5]), 4)

    def ks(**kw):
        return {
            r.k for r in read_hive_mm(spark, root, **kw).collect()
        }

    vwil = ValidWriteIdList.from_string("t:4:::3")
    assert ks(valid_writeids=vwil) == {1, 2, 3, 4, 5}
    assert ks() == {1, 2, 3, 4, 5, 99}  # no list: listing trusted
    assert ks(max_writeid=2) == {1, 2, 3, 4}

    w = compact_hive_mm(spark, root, valid_writeids=vwil)
    assert w == 4
    clean_hive_acid(root)
    entries = sorted(os.listdir(root))
    assert "base_0000004" in entries
    assert "delta_0000002_0000002_0000" not in entries
    # the aborted orphan (writeid 3 <= base 4) is cleaned too — safe:
    # its rows were excluded from the fold, so dropping the dir
    # removes them permanently (Hive's aborted-cleanup end state)
    assert "delta_0000003_0000003" not in entries
    assert ks(valid_writeids=vwil) == {1, 2, 3, 4, 5}


def test_show_transactions_rewrites_to_served_view(spark, acid_mgr):
    mgr, root = acid_mgr
    mgr.handle("s1", "BEGIN")
    mgr.handle(
        "s1", "INSERT INTO acid_orders SELECT 7 AS k, 'Z' AS s, 0.0 AS p"
    )
    out = mgr.handle("s2", "SHOW TRANSACTIONS")
    assert out.startswith("SQL:SELECT"), out
    rows = [
        (r.txn_session, r.state, r.n_buffered)
        for r in spark.table(
            "global_temp.sparkgraft_transactions"
        ).collect()
    ]
    assert rows == [("s1", "OPEN", 1)], rows
    mgr.handle("s1", "ROLLBACK")
    mgr.handle("s2", "SHOW TRANSACTIONS")
    assert (
        spark.table("global_temp.sparkgraft_transactions").count() == 0
    )


def test_mm_enrollment_wire_dml_and_initiator(spark, tmp_path):
    """The charm-era user story for Hive 3's DEFAULT managed layout:
    an insert-only enrollment takes wire INSERTs as plain-file delta
    dirs (no identity assignment), the served view re-elects, the
    initiator folds MM layouts with the plain-file compactors, and
    ALTER TABLE ... COMPACT routes the same way."""
    from layer_apache_hive_spark.acid import TransactionCatalog
    from layer_apache_hive_spark.sources.hive_acid import (
        HiveAcidInitiator,
        append_mm_delta,
    )
    from layer_apache_hive_spark.txn import TxnSessionManager

    init = HiveAcidInitiator(
        spark, delta_num_threshold=100, delta_pct_threshold=100.0
    )
    cat = TransactionCatalog(str(tmp_path / "cat"))
    mgr = TxnSessionManager(spark, cat, publish=False, initiator=init)
    root = str(tmp_path / "mm_orders")
    seed = spark.createDataFrame(
        [(1, "A", 1.0)], "k long, status string, price double"
    )
    append_mm_delta(spark, root, seed, 1)
    mgr.enroll_hive_acid(
        "mm_orders",
        root,
        [("k", "long"), ("status", "string"), ("price", "double")],
        insert_only=True,
    )
    served = lambda: {  # noqa: E731
        r.k for r in spark.table("global_temp.mm_orders").collect()
    }
    assert served() == {1}

    out = mgr.handle(
        "s1", "INSERT INTO mm_orders SELECT 2 AS k, 'B' AS s, 2.0 AS p"
    )
    assert out.startswith("DONE:Committed writeid 2"), out
    entries = sorted(os.listdir(root))
    assert "delta_0000002_0000002" in entries, entries
    # plain files inside — no bucket_N ACID files
    inner = os.listdir(os.path.join(root, "delta_0000002_0000002"))
    assert not any(f.startswith("bucket_") for f in inner), inner
    assert served() == {1, 2}

    # multi-statement txn -> per-statement plain-file dirs
    mgr.handle("s1", "BEGIN")
    mgr.handle("s1", "INSERT INTO mm_orders SELECT 3, 'C', 3.0")
    mgr.handle("s1", "INSERT INTO mm_orders SELECT 4, 'C', 4.0")
    out = mgr.handle("s1", "COMMIT")
    assert out.startswith("DONE:Committed 2 statements"), out
    entries = sorted(os.listdir(root))
    assert "delta_0000003_0000003_0000" in entries, entries
    assert "delta_0000003_0000003_0001" in entries, entries
    assert served() == {1, 2, 3, 4}

    # explicit COMPACT on the MM enrollment folds with the MM
    # compactor (plain file rewrite) and republishes
    out = mgr.handle("s1", "ALTER TABLE mm_orders COMPACT 'major'")
    assert out.startswith("DONE:Compaction request queued"), out
    done = init.run_once()
    assert done and done[0][1] == "major" and done[0][2] == 3, done
    assert sorted(os.listdir(root)) == ["base_0000003_v0000001"]
    assert served() == {1, 2, 3, 4}
