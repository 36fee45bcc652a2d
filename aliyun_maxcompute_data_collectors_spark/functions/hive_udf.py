"""Hive UDF bridge (SURVEY U2): register jar-packaged Hive UDF/UDAF/UDTF
classes as SQL functions from PySpark.

The reference embeds a forked Catalyst expression bridge
(spark-connector/hive/src/main/scala/org/apache/spark/sql/hive/hiveUDFs.scala
- HiveSimpleUDF/HiveGenericUDF wrappers with CodegenFallback).  Spark
already ships that machinery; from PySpark the idiomatic equivalent is the
SQL-level function DDL, which routes to the same built-in wrappers:

    CREATE [TEMPORARY] FUNCTION name AS 'com.example.MyUDF' USING JAR 'path'

This module is the thin, typed surface over that DDL.  Registration needs
(a) the UDF class reachable by every executor and (b) a Hive-enabled
session (`spark.sql.catalogImplementation=hive`; the in-memory catalog
rejects Hive classes with NO_HANDLER_FOR_UDAF).  Both exist in-container:
hive-exec ships on Spark's classpath, so tests/test_hive_udf_live.py
registers and EVALUATES real GenericUDF / simple-UDF / GenericUDTF classes
end to end in a hive-catalog subprocess session (round 6); user jars ride
the same DDL via USING JAR.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["hive_function_ddl", "register_hive_udf", "drop_hive_udf"]


def _quote_literal(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def hive_function_ddl(
    name: str,
    class_name: str,
    jars: list[str] | None = None,
    temporary: bool = True,
    or_replace: bool = True,
) -> str:
    """Build the CREATE FUNCTION statement for a Hive UDF class.

    ``jars`` entries become ``USING JAR`` resources (local path, hdfs:// or
    any Hadoop-filesystem URL - Spark distributes them to executors).
    """
    if not name.replace("_", "").replace(".", "").isalnum():
        raise ValueError(f"suspicious function name {name!r}")
    if not class_name or " " in class_name:
        raise ValueError(f"invalid class name {class_name!r}")
    parts = ["CREATE"]
    if or_replace:
        parts.append("OR REPLACE")
    if temporary:
        parts.append("TEMPORARY")
    parts.append(f"FUNCTION {name} AS {_quote_literal(class_name)}")
    if jars:
        res = ", ".join(f"JAR {_quote_literal(j)}" for j in jars)
        parts.append(f"USING {res}")
    return " ".join(parts)


def register_hive_udf(
    spark: SparkSession,
    name: str,
    class_name: str,
    jars: list[str] | None = None,
    temporary: bool = True,
) -> None:
    """Register a jar-packaged Hive UDF/UDAF/UDTF as SQL function ``name``.

    After registration the function is callable from ``spark.sql`` and
    ``F.expr`` like any built-in; Spark's own HiveSimpleUDF/HiveGenericUDF
    wrappers (the upstream of the reference's forked hiveUDFs.scala) handle
    ObjectInspector conversion and evaluate with CodegenFallback - i.e. the
    UDF is JVM-side but NOT codegen-fused; treat it as the slow path and
    prefer built-ins where an equivalent exists.
    """
    spark.sql(hive_function_ddl(name, class_name, jars, temporary))


def drop_hive_udf(spark: SparkSession, name: str, temporary: bool = True) -> None:
    kind = "TEMPORARY FUNCTION" if temporary else "FUNCTION"
    spark.sql(f"DROP {kind} IF EXISTS {name}")
