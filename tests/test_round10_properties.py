"""Round-10 pins: the four advisor items fixed in code this round.

1. AcidUtils election on the MAX writeid — a merged delta straddling
   the base watermark (min ≤ N < max) is elected with per-event
   validity filtering instead of silently dropped.
2. Watermark parsing tolerates non-ACID entries (compactor scratch
   dirs, stray files) — the crash-recovery situation the
   scratch-then-rename design exists for.
3. expr_cast's digit guard covers the full ≤0x20 trim class
   (pinned in test_properties.test_guarded_try_cast_equals_plain).
4. _lp_fdiv floor division exact ABOVE 2^53 (decimal, not double).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from layer_apache_hive_spark.sources.hive_acid import (
    clean_hive_acid,
    compact_hive_acid,
    export_hive_acid,
    minor_compact_hive_acid,
    read_hive_acid,
)

PAYLOAD = ["k", "status", "price"]
SCHEMA = [("k", "long"), ("status", "string"), ("price", "double")]


def _fields():
    import pyarrow as pa

    return [
        ("k", pa.int64()),
        ("status", pa.string()),
        ("price", pa.float64()),
    ]


def _export_chain(spark, root: str) -> None:
    """The test_hive_acid_export 3-version chain: v1 base keys 1..8,
    v2 +9..10, v3 delete {2, 9} and update price of 3."""
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
        "price", F.expr("CASE WHEN k = 3 THEN price + 100.0 ELSE price END")
    )
    snaps = {1: v1, 2: v2, 3: v3}
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


_V3 = {(1, "A", 1.0), (3, "A", 103.0), (10, "B", 10.0)} | {
    (i, "A", float(i)) for i in (4, 5, 6, 7, 8)
}


def _snap(spark, root):
    return {
        (r.k, r.status, r.price)
        for r in read_hive_acid(spark, root, SCHEMA).collect()
    }


def test_straddling_delta_elected_on_max_writeid(spark, tmp_path):
    """A merged delta_0000002_0000003 coexisting with base_0000002
    (min 2 ≤ base 2 < max 3) carries LIVE writeid-3 events; Hive's
    AcidUtils keeps it because its MAX exceeds the base. The reader
    must elect it AND drop its in-base (ctid ≤ 2) events — electing
    on min (the pre-r10 behavior) silently lost transaction 3;
    electing on max without the per-event filter double-counts
    writeid 2."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _export_chain(spark, a)
    shutil.copytree(a, b)

    # a: minor-merge txns 2..3 into straddled-range dirs, clean inputs
    assert minor_compact_hive_acid(spark, a, SCHEMA, _fields()) == (2, 3)
    clean_hive_acid(a)
    assert sorted(os.listdir(a)) == [
        "base_0000001",
        "delete_delta_0000002_0000003",
        "delta_0000002_0000003",
    ]
    # b: major-compact at watermark 2 → base_0000002; graft it into a
    assert compact_hive_acid(spark, b, SCHEMA, _fields(), max_writeid=2) == 2
    shutil.copytree(
        os.path.join(b, "base_0000002"), os.path.join(a, "base_0000002")
    )
    # base_2 (10 keys, v2 images) + straddling merged dirs: the read
    # must produce exactly the v3 final state
    assert _snap(spark, a) == _V3
    # and the Cleaner keeps the straddling dirs (max 3 > base 2)
    clean_hive_acid(a)
    assert sorted(os.listdir(a)) == [
        "base_0000002",
        "delete_delta_0000002_0000003",
        "delta_0000002_0000003",
    ]
    assert _snap(spark, a) == _V3


def test_stray_scratch_entries_tolerated_under_watermark(spark, tmp_path):
    """A leftover .minor_scratch dir (crashed minor compaction) or a
    stray marker file must not break the watermark parse — the
    pre-r10 _hi() called int() on every entry's suffix and raised
    ValueError on exactly the crash-recovery layout the
    scratch-then-rename design is meant to tolerate."""
    root = str(tmp_path / "acid")
    _export_chain(spark, root)
    os.makedirs(os.path.join(root, ".minor_scratch"))
    open(os.path.join(root, "_SUCCESS"), "w").close()
    open(os.path.join(root, "stray.tmp"), "w").close()

    got = {
        (r.k, r.status, r.price)
        for r in read_hive_acid(
            spark, root, SCHEMA, max_writeid=3
        ).collect()
    }
    assert got == _V3
    # the compactor's watermark path goes through the same election
    assert compact_hive_acid(spark, root, SCHEMA, _fields(), max_writeid=2) == 2


@pytest.mark.parametrize(
    "a,b",
    [
        (2**60 + 12345, 1000),
        (-(2**60) - 7, 1000),
        (2**62 - 1, 8000),
        (-(2**62) + 1, 7),
        (2**53 + 1, 3),  # first integer double cannot represent
        (-5, 3),  # floor(-5/3) = -2, not trunc's -1
        (17, 5),
    ],
)
def test_lp_fdiv_exact_above_2_53(spark, a, b):
    """_lp_fdiv must equal Python's arbitrary-precision floor division
    over the FULL documented 2^62 operand bound — the pre-r10 double
    division was exact only below 2^53 (round-10 advisor item)."""
    from layer_apache_hive_spark.extensions.training import _lp_fdiv

    df = spark.createDataFrame([(a, b)], "a long, b long")
    got = df.select(
        _lp_fdiv(F.col("a"), F.col("b")).alias("q")
    ).collect()[0].q
    assert got == a // b, (a, b, got, a // b)
