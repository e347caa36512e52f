"""Round-9 advisor/verdict pins: service-principal identity source,
COVERAGE freshness, and the determinism self-check."""

from __future__ import annotations

from layer_apache_hive_spark import auth


def test_service_principal_reads_jvm_user_name(spark):
    """With a live session, the in-process identity the authorization
    rule compares against is the JVM's ``user.name`` system property
    — NOT the Python-side OS user, which diverges under -Duser.name
    or a shifted HADOOP_USER_NAME (r9 advisor, low)."""
    jvm_name = spark._jvm.System.getProperty("user.name")
    assert auth._service_principal() == jvm_name
