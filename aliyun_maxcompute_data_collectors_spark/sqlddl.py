"""SQL DDL dispatcher for the Engine facade: the reference's catalog surface
(SURVEY 2.13 D1-D8) exposed as SQL statements on top of ``OdpsCatalog``.

Supported statements (case-insensitive, optional trailing ';'):

    CREATE SCHEMA [IF NOT EXISTS] s            DROP SCHEMA [IF EXISTS] s [CASCADE]
    CREATE [EXTERNAL] TABLE [IF NOT EXISTS] t (col TYPE, ...)
        [COMMENT '...'] [PARTITIONED BY (col TYPE, ...)]
        [[RANGE] CLUSTERED BY (c, ...) [SORTED BY (c [ASC|DESC], ...)] INTO n BUCKETS]
        [STORED AS PARQUET|ORC] [TBLPROPERTIES ('k'='v', ...)] [LOCATION '...']
    CREATE VIEW [IF NOT EXISTS] v AS SELECT ...
    CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv [PARTITIONED BY (col, ...)] AS SELECT ...
    REFRESH MATERIALIZED VIEW mv [WHERE pred]  DROP MATERIALIZED VIEW [IF EXISTS] mv
    DROP TABLE|VIEW [IF EXISTS] t              TRUNCATE TABLE t
    ALTER TABLE t RENAME TO t2                 ALTER TABLE t ADD COLUMNS (c TYPE, ...)
    ALTER TABLE t SET|UNSET TBLPROPERTIES ('k'='v', ...)
    SHOW TABLES | SHOW SCHEMAS | SHOW PARTITIONS t | SHOW COLUMNS IN t
    SHOW CREATE TABLE t | SHOW TBLPROPERTIES t | SHOW [MATERIALIZED] VIEWS
    DESCRIBE [EXTENDED] t | ANALYZE TABLE t [COMPUTE STATISTICS]

``try_execute_ddl(engine, sql)`` returns a result DataFrame, or None when the
statement is not DDL (the caller then treats it as INSERT/SELECT).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from aliyun_maxcompute_data_collectors_spark.catalog import BucketSpec


def _split_top_commas(s: str) -> list[str]:
    """Split on commas not nested in () or <> or quotes."""
    out, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch in "(<":
            depth += 1
            buf.append(ch)
        elif ch in ")>":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return out


def _take_parens(s: str, start: int) -> tuple[str, int]:
    """Return (inner, index-after-close) for the paren group opening at or
    after ``start`` (quote-aware)."""
    i = s.index("(", start)
    depth, quote = 0, None
    for j in range(i, len(s)):
        ch = s[j]
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[i + 1:j], j + 1
    raise ValueError(f"unbalanced parens in: {s[start:start+60]}...")


def _cols(spec: str) -> list[tuple[str, str]]:
    cols = []
    for item in _split_top_commas(spec):
        parts = item.split(None, 1)
        if len(parts) != 2:
            raise ValueError(f"bad column definition: {item!r}")
        cols.append((parts[0], parts[1].strip().upper()))
    return cols


def _one_row_per(spark, values: list[str], col: str):
    return spark.createDataFrame([(v,) for v in values],
                                 T.StructType([T.StructField(col, T.StringType())]))


_CREATE_TABLE = re.compile(
    r"^CREATE\s+(EXTERNAL\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(",
    re.IGNORECASE)
_CLUSTERED = re.compile(
    r"(RANGE\s+)?CLUSTERED\s+BY\s*\(", re.IGNORECASE)
_SORTED = re.compile(r"SORTED\s+BY\s*\(", re.IGNORECASE)
_BUCKETS = re.compile(r"INTO\s+(\d+)\s+BUCKETS", re.IGNORECASE)


def _parse_create_table(cat, s: str) -> None:
    m = _CREATE_TABLE.match(s)
    external, if_not_exists, name = bool(m.group(1)), bool(m.group(2)), m.group(3)
    col_spec, pos = _take_parens(s, m.end() - 1)
    rest = s[pos:]

    comment = None
    cm = re.search(r"COMMENT\s+'([^']*)'", rest, re.IGNORECASE)
    if cm:
        comment = cm.group(1)

    partition_columns = []
    pm = re.search(r"PARTITIONED\s+BY\s*\(", rest, re.IGNORECASE)
    if pm:
        inner, _ = _take_parens(rest, pm.end() - 1)
        partition_columns = _cols(inner)

    bucket = None
    bm = _CLUSTERED.search(rest)
    if bm:
        inner, after = _take_parens(rest, bm.end() - 1)
        bucket_cols = [c.strip() for c in _split_top_commas(inner)]
        sort_cols: list[tuple[str, str]] = []
        sm = _SORTED.search(rest, after)
        if sm:
            sinner, _ = _take_parens(rest, sm.end() - 1)
            for item in _split_top_commas(sinner):
                parts = item.split()
                sort_cols.append((parts[0], parts[1].upper() if len(parts) > 1 else "ASC"))
        nb = _BUCKETS.search(rest, after)
        if not nb:
            raise ValueError("CLUSTERED BY requires INTO n BUCKETS")
        bucket = BucketSpec("range" if bm.group(1) else "hash",
                            int(nb.group(1)), bucket_cols, sort_cols)

    properties = {}
    fm = re.search(r"STORED\s+AS\s+(\w+)", rest, re.IGNORECASE)
    if fm:
        properties["stored_as"] = fm.group(1).lower()
    tm = re.search(r"TBLPROPERTIES\s*\(", rest, re.IGNORECASE)
    if tm:
        inner, _ = _take_parens(rest, tm.end() - 1)
        for item in _split_top_commas(inner):
            kv = re.match(r"\s*'([^']*)'\s*=\s*'([^']*)'\s*$", item)
            if not kv:
                raise ValueError(f"bad TBLPROPERTIES item: {item!r}")
            properties[kv.group(1)] = kv.group(2)

    location = None
    lm = re.search(r"LOCATION\s+'([^']*)'", rest, re.IGNORECASE)
    if lm:
        location = lm.group(1)
    if external and not location:
        raise ValueError("EXTERNAL TABLE requires LOCATION '...'")

    cat.create_table(
        name, _cols(col_spec), partition_columns=partition_columns,
        bucket=bucket, external_location=location, properties=properties,
        comment=comment, if_not_exists=if_not_exists,
    )


def try_execute_ddl(eng, query: str):
    """Execute ``query`` against the engine catalog if it is a DDL/metadata
    statement; return a DataFrame result or None (not DDL)."""
    cat, spark = eng.catalog, eng.spark
    s = query.strip().rstrip(";").strip()

    m = re.match(r"^CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)$", s, re.IGNORECASE)
    if m:
        cat.create_schema(m.group(2), if_not_exists=bool(m.group(1)))
        return _one_row_per(spark, [], "result")
    m = re.match(r"^DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?([\w.]+)(\s+CASCADE|\s+RESTRICT)?$",
                 s, re.IGNORECASE)
    if m:
        cascade = bool(m.group(3) and m.group(3).strip().upper() == "CASCADE")
        try:
            cat.drop_schema(m.group(2), cascade=cascade)
        except Exception:
            if not m.group(1):
                raise
        return _one_row_per(spark, [], "result")

    if _CREATE_TABLE.match(s):
        _parse_create_table(cat, s)
        return _one_row_per(spark, [], "result")

    m = re.match(r"^CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)"
                 r"(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?"
                 r"\s+AS\s+(.+)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        if_not_exists, name = bool(m.group(1)), m.group(2)
        part_cols = [c.strip().strip("`") for c in (m.group(3) or "").split(",") if c.strip()]
        text = m.group(4).strip()
        if cat.table_exists(name):
            if if_not_exists:
                return _one_row_per(spark, [], "result")
            from aliyun_maxcompute_data_collectors_spark.catalog import TableAlreadyExistsError
            raise TableAlreadyExistsError(name)
        # materialize = CTAS keeping the defining text for REFRESH; reads hit
        # the stored table (no re-execution), unlike a VIRTUAL_VIEW.  With
        # PARTITIONED BY, the MV stores partitions so REFRESH ... WHERE can
        # rebuild only the affected partitions (dynamic overwrite).
        df = eng.sql(text)
        from aliyun_maxcompute_data_collectors_spark import types as _ot
        all_cols = [(f.name, _ot.to_odps_type(f.dataType)) for f in df.schema.fields]
        for pc in part_cols:
            if pc not in {c for c, _ in all_cols}:
                raise ValueError(f"MV partition column {pc!r} not in query output")
        data_cols = [(c, t) for c, t in all_cols if c not in part_cols]
        pcols = [(c, t) for c, t in all_cols if c in part_cols]
        cat.create_table(name, data_cols, partition_columns=pcols,
                         properties={"mv_text": text})
        cat.insert(name, df, overwrite=True)
        return _one_row_per(spark, [], "result")

    m = re.match(r"^REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)(?:\s+WHERE\s+(.+))?$",
                 s, re.IGNORECASE | re.DOTALL)
    if m:
        name, pred = m.group(1), (m.group(2) or "").strip()
        meta = cat.get_meta(name)
        text = (meta.properties or {}).get("mv_text")
        if not text:
            raise ValueError(f"{name} is not a materialized view")
        df = eng.sql(text)
        if pred:
            # partition-scoped incremental refresh: recompute only rows
            # matching the predicate; dynamic partitionOverwriteMode replaces
            # just the partitions present in the refreshed frame
            if not meta.partition_columns:
                raise ValueError("REFRESH ... WHERE requires a partitioned "
                                 "materialized view")
            df = df.where(pred)
        cat.insert(name, df, overwrite=True)
        return _one_row_per(spark, [], "result")

    m = re.match(r"^DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)$",
                 s, re.IGNORECASE)
    if m:
        cat.drop_table(m.group(2), if_exists=bool(m.group(1)))
        return _one_row_per(spark, [], "result")

    m = re.match(r"^CREATE\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+(.+)$",
                 s, re.IGNORECASE | re.DOTALL)
    if m:
        cat.create_view(m.group(2), m.group(3).strip(), if_not_exists=bool(m.group(1)))
        return _one_row_per(spark, [], "result")

    m = re.match(r"^DROP\s+(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([\w.]+)$", s, re.IGNORECASE)
    if m:
        cat.drop_table(m.group(3), if_exists=bool(m.group(2)))
        return _one_row_per(spark, [], "result")

    m = re.match(r"^TRUNCATE\s+TABLE\s+([\w.]+)$", s, re.IGNORECASE)
    if m:
        cat.truncate_table(m.group(1))
        return _one_row_per(spark, [], "result")

    m = re.match(r"^ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)$", s, re.IGNORECASE)
    if m:
        cat.rename_table(m.group(1), m.group(2))
        return _one_row_per(spark, [], "result")

    m = re.match(r"^ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMNS\s*\(", s, re.IGNORECASE)
    if m:
        inner, _ = _take_parens(s, m.end() - 1)
        cat.alter_table_add_columns(m.group(1), _cols(inner))
        return _one_row_per(spark, [], "result")

    m = re.match(r"^ALTER\s+TABLE\s+([\w.]+)\s+(UNSET|SET)\s+TBLPROPERTIES\s*\(",
                 s, re.IGNORECASE)
    if m:
        inner, _ = _take_parens(s, m.end() - 1)
        meta = cat.get_meta(m.group(1))
        if m.group(2).upper() == "SET":
            for item in _split_top_commas(inner):
                kv = re.match(r"\s*'([^']*)'\s*=\s*'([^']*)'\s*$", item)
                if not kv:
                    raise ValueError(f"bad TBLPROPERTIES item: {item!r}")
                meta.properties[kv.group(1)] = kv.group(2)
        else:
            for item in _split_top_commas(inner):
                key = item.strip().strip("'")
                meta.properties.pop(key, None)
        cat._write_meta(m.group(1), meta)
        return _one_row_per(spark, [], "result")

    m = re.match(r"^SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+([\w.]+))?$", s, re.IGNORECASE)
    if m:
        return _one_row_per(spark, cat.list_tables(m.group(1)), "table_name")
    if re.match(r"^SHOW\s+SCHEMAS$", s, re.IGNORECASE):
        return _one_row_per(spark, cat.list_schemas(), "schema_name")
    m = re.match(r"^SHOW\s+PARTITIONS\s+([\w.]+)$", s, re.IGNORECASE)
    if m:
        specs = ["/".join(f"{k}={v}" for k, v in p.items())
                 for p in cat.list_partitions(m.group(1))]
        return _one_row_per(spark, sorted(specs), "partition")
    m = re.match(r"^SHOW\s+COLUMNS\s+(?:IN|FROM)\s+([\w.]+)$", s, re.IGNORECASE)
    if m:
        return _one_row_per(spark, cat.show_columns(m.group(1)), "col_name")
    m = re.match(r"^SHOW\s+CREATE\s+TABLE\s+([\w.]+)$", s, re.IGNORECASE)
    if m:
        return _one_row_per(spark, [cat.show_create_table(m.group(1))], "createtab_stmt")
    m = re.match(r"^ANALYZE\s+TABLE\s+([\w.]+)(?:\s+COMPUTE\s+STATISTICS)?$",
                 s, re.IGNORECASE)
    if m:
        stats = cat.analyze_table(m.group(1))
        return spark.createDataFrame(
            [(int(stats["size_in_bytes"]), int(stats["num_files"]),
              int(stats["num_rows"]))],
            "size_in_bytes long, num_files long, num_rows long")
    m = re.match(r"^SHOW\s+TBLPROPERTIES\s+([\w.]+)$", s, re.IGNORECASE)
    if m:
        meta = cat.get_meta(m.group(1))
        rows = [(k, str(v)) for k, v in sorted((meta.properties or {}).items())]
        return spark.createDataFrame(rows or [("", "")],
                                     "key string, value string").where("key <> ''")
    m = re.match(r"^SHOW\s+(?:MATERIALIZED\s+)?VIEWS$", s, re.IGNORECASE)
    if m:
        want_mv = "MATERIALIZED" in s.upper()
        names = []
        for t in cat.list_tables():
            meta = cat.get_meta(t)
            is_mv = bool((meta.properties or {}).get("mv_text"))
            is_view = meta.table_type == "VIRTUAL_VIEW"
            if (want_mv and is_mv) or (not want_mv and is_view):
                names.append(t)
        return _one_row_per(spark, sorted(names), "view_name")
    m = re.match(r"^(?:DESCRIBE|DESC)\s+(EXTENDED\s+)?(?:TABLE\s+)?([\w.]+)$",
                 s, re.IGNORECASE)
    if m:
        extended, name = bool(m.group(1)), m.group(2)
        meta = cat.get_meta(name)
        rows = [(c, t, "") for c, t in meta.columns] + \
               [(c, t, "partition") for c, t in meta.partition_columns]
        if extended:
            rows += [("", "", ""),
                     ("# type", meta.table_type, ""),
                     ("# format", cat.storage_format(meta), ""),
                     ("# location", cat.data_dir(name), "")]
            if meta.bucket:
                b = meta.bucket
                rows.append(("# bucket",
                             f"{b.cluster_type} x{b.num_buckets} on "
                             + ",".join(b.bucket_columns), ""))
        return spark.createDataFrame(
            rows, "col_name string, data_type string, comment string")

    return None
