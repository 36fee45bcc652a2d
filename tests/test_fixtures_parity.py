"""Reference-fixture parity tests (FIXTURES.md sections 3, 4, 7) plus the
skew/relational operators."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return OdpsCatalog(spark, str(tmp_path / "wh"))


def test_unicode_special_column_names(cat, spark):
    """FIXTURES section 3: conjunctive equality filters over quoted
    unicode/numeric/special column names -> exactly 1 row."""
    cols = ["c0", "c1", "列2", "列3", "44", "5列", "列六", "'列七'"]
    cat.create_table("exotic", [(c, "BIGINT") for c in cols])
    df = spark.createDataFrame(
        [tuple(range(0, 8)), tuple(range(1, 9))],
        schema="`c0` long, `c1` long, `列2` long, `列3` long, `44` long, `5列` long, `列六` long, `'列七'` long",
    )
    cat.insert("exotic", df)
    out = cat.read_table("exotic")
    cond = None
    for i, c in enumerate(cols):
        e = F.col(f"`{c}`") == i
        cond = e if cond is None else (cond & e)
    rows = out.where(cond).collect()
    assert len(rows) == 1 and rows[0][0] == 0

    from aliyun_maxcompute_data_collectors_spark.functions.dialect import quote_identifier
    out.createOrReplaceTempView("exotic_v")
    sql_rows = spark.sql(
        "SELECT * FROM exotic_v WHERE "
        + " AND ".join(f"{quote_identifier(c)} = {i}" for i, c in enumerate(cols))
    ).collect()
    assert len(sql_rows) == 1


def test_decimal_38_26_filter_falls_back_correctly(cat, spark):
    """FIXTURES section 4: scale-26 decimal disables storage pushdown in the
    reference; here parquet+Catalyst evaluate it correctly either way - the
    filter must still return exactly the matching row, scale-padded."""
    from aliyun_maxcompute_data_collectors_spark.plans.checks import decimal_pushdown_guard
    cat.create_table("dec26", [("c0", "BIGINT"), ("c1", "BIGINT"), ("c2", "DECIMAL(38,26)")])
    df = spark.createDataFrame(
        [(0, 1, Decimal("2.00000000000000001111")), (1, 2, Decimal("3.0"))],
        "c0 long, c1 long, c2 decimal(38,26)",
    )
    cat.insert("dec26", df)
    out = cat.read_table("dec26").where(
        F.col("c2") == F.lit(Decimal("2.00000000000000001111")).cast("decimal(38,26)")
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["c0"] == 0
    assert rows[0]["c2"] == Decimal("2.00000000000000001111")
    # the guard itself reports pushdown must be disabled for bucket parity
    assert not decimal_pushdown_guard([t.dataType for t in out.schema.fields])

    # scale-18: pushdown allowed
    cat.create_table("dec18", [("c0", "BIGINT"), ("c2", "DECIMAL(38,18)")])
    cat.insert("dec18", spark.createDataFrame(
        [(0, Decimal("2.000000000000000001")), (1, Decimal("3.0"))],
        "c0 long, c2 decimal(38,18)"))
    out18 = cat.read_table("dec18").where(
        F.col("c2") == F.lit(Decimal("2.000000000000000001")).cast("decimal(38,18)"))
    assert out18.count() == 1
    assert decimal_pushdown_guard([f.dataType for f in out18.schema.fields])


def test_duplicate_map_keys_dedup(spark):
    """FIXTURES section 7 (enableUniqueMapKey): duplicate map keys dedup
    rather than fail."""
    from aliyun_maxcompute_data_collectors_spark.operators.relational import unique_map_keys
    df = spark.createDataFrame(
        [(1, [("k", "1"), ("k", "2"), ("x", "9")])],
        "id int, entries array<struct<key:string,value:string>>",
    )
    last = df.select(unique_map_keys(F.col("entries")).alias("m")).collect()[0]["m"]
    assert last == {"k": "2", "x": "9"}
    first = df.select(
        unique_map_keys(F.col("entries"), last_wins=False).alias("m")).collect()[0]["m"]
    assert first == {"k": "1", "x": "9"}


def test_salted_agg_equals_plain(spark, sf_dir):
    from aliyun_maxcompute_data_collectors_spark.operators.skew import key_histogram, salted_agg
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    plain = {
        r["o_orderstatus"]: (r["n"], r["mx"]) for r in
        o.groupBy("o_orderstatus").agg(
            F.count("o_orderkey").alias("n"), F.max("o_totalprice").alias("mx")).collect()
    }
    salted = {
        r["o_orderstatus"]: (r["n"], r["mx"]) for r in
        salted_agg(o, ["o_orderstatus"],
                   {"n": ("o_orderkey", "count"), "mx": ("o_totalprice", "max")},
                   n_salts=8).collect()
    }
    assert plain == salted
    hist = key_histogram(o, ["o_orderstatus"], top=2).collect()
    assert len(hist) == 2 and hist[0]["n_rows"] >= hist[1]["n_rows"]


def test_salted_join_equals_plain(spark, sf_dir):
    from aliyun_maxcompute_data_collectors_spark.operators.skew import salted_join
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    plain = (
        t["customer"].join(t["nation"].withColumnRenamed("n_nationkey", "c_nationkey"),
                           ["c_nationkey"]).count()
    )
    salted = salted_join(
        t["customer"],
        t["nation"].withColumnRenamed("n_nationkey", "c_nationkey"),
        ["c_nationkey"], n_salts=4,
    ).count()
    assert plain == salted


def test_sessionize_gap_semantics(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.relational import session_stats
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),  # session 1
        (1, "2024-01-01 11:00:00"),                               # gap 50m -> session 2
        (2, "2024-01-01 09:00:00"),                               # session 1 (user 2)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz"))
    out = session_stats(df, "user_id", "ts", gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append((r["session_seq"], r["n_events"]))
    assert sorted(by_user[1]) == [(1, 2), (2, 1)]
    assert sorted(by_user[2]) == [(1, 1)]


def test_engine_sql_facade(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    from aliyun_maxcompute_data_collectors_spark.plans.checks import FullScanDisallowed
    eng = Engine(str(tmp_path / "wh"), spark=spark)
    eng.catalog.create_table("sales", [("k", "BIGINT"), ("v", "DOUBLE")],
                             partition_columns=[("ds", "STRING")])
    df = spark.createDataFrame([(1, 2.0, "a"), (2, 3.0, "b")], "k long, v double, ds string")
    eng.catalog.insert("sales", df)
    rows = eng.sql("SELECT ds, SUM(v) AS total FROM sales GROUP BY ds ORDER BY ds").collect()
    assert [(r["ds"], r["total"]) for r in rows] == [("a", 2.0), ("b", 3.0)]

    rep = eng.plan_report(eng.sql("SELECT k FROM sales WHERE ds = 'a'"))
    assert any("ds" in f for f in rep["partition_filters"])

    eng.allow_full_scan = False
    import pytest as _pytest
    with _pytest.raises(FullScanDisallowed):
        eng.sql("SELECT * FROM sales")
    eng.sql("SELECT * FROM sales WHERE ds = 'a'")  # guarded but fine


def test_engine_sql_qualified_names(spark, tmp_path):
    """project.schema.table and schema.table resolution in Engine.sql;
    alias.column references must pass through unrewritten."""
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh"), spark=spark)
    eng.catalog.create_schema("mart")
    # 3-part = project.schema.table; 2-part = PROJECT.table (reference's
    # convention, catalog._ident)
    eng.catalog.create_table("default_project.mart.facts",
                             [("k", "BIGINT"), ("v", "DOUBLE")])
    eng.catalog.create_table("dims", [("k", "BIGINT"), ("name", "STRING")])
    eng.catalog.insert("default_project.mart.facts", spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 5.0)], "k long, v double"))
    eng.catalog.insert("dims", spark.createDataFrame(
        [(1, "one"), (2, "two")], "k long, name string"))

    # 3-part + 2-part project.table + table aliases with alias.column refs
    rows = eng.sql("""
        SELECT d.name, SUM(f.v) AS total
        FROM default_project.mart.facts f JOIN default_project.dims d ON f.k = d.k
        GROUP BY d.name ORDER BY d.name
    """).collect()
    assert [(r["name"], r["total"]) for r in rows] == [("one", 15.0), ("two", 20.0)]

    # fully-qualified column reference off a 3-part table name
    rows = eng.sql(
        "SELECT default_project.mart.facts.k FROM default_project.mart.facts "
        "ORDER BY default_project.mart.facts.k"
    ).collect()
    assert [r["k"] for r in rows] == [1, 1, 2]


def test_engine_sql_insert_statements(spark, tmp_path):
    """INSERT INTO/OVERWRITE ... [PARTITION(k=v)] through Engine.sql — the
    reference's W3 static-partition rewrite surface."""
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh"), spark=spark)
    eng.catalog.create_table("t", [("k", "BIGINT"), ("v", "DOUBLE")],
                             partition_columns=[("ds", "STRING")])

    eng.sql("INSERT INTO t PARTITION (ds='d1') VALUES (1, 1.5), (2, 2.5)")
    eng.sql("INSERT INTO t PARTITION (ds) VALUES (3, 3.5, 'd2')")  # dynamic
    got = {(r["k"], r["ds"]) for r in eng.sql("SELECT k, ds FROM t").collect()}
    assert got == {(1, "d1"), (2, "d1"), (3, "d2")}

    # overwrite replaces only the partitions present (dynamic overwrite)
    eng.sql("INSERT OVERWRITE t PARTITION (ds='d1') SELECT 9 AS a, 9.5 AS b")
    got = {(r["k"], r["ds"]) for r in eng.sql("SELECT k, ds FROM t").collect()}
    assert got == {(9, "d1"), (3, "d2")}


def test_dedupe_corpus_methods(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import dedupe_corpus
    base = "one two three four five six seven eight nine ten " * 3
    near = base.replace("ten", "eleven")
    rows = [(1, base), (2, base), (3, near), (4, "totally different text with other words entirely")]
    df = spark.createDataFrame(rows, "id int, text string")
    assert sorted(r["id"] for r in dedupe_corpus(df, "id", "text", "exact").collect()) == [1, 3, 4]
    kept_mh = sorted(r["id"] for r in
                     dedupe_corpus(df, "id", "text", "minhash", threshold=0.5).collect())
    assert 1 in kept_mh and 4 in kept_mh and 2 not in kept_mh
    # "ten"->"eleven" x3 in a 30-word doc gives jaccard 0.33 on distinct
    # 5-shingles: at 0.3 doc 3 is a near-dup of 1, at 0.5 it survives
    kept_ng = sorted(r["id"] for r in
                     dedupe_corpus(df, "id", "text", "ngram", threshold=0.3).collect())
    assert kept_ng == [1, 4]
    kept_ng_hi = sorted(r["id"] for r in
                        dedupe_corpus(df, "id", "text", "ngram", threshold=0.5).collect())
    assert kept_ng_hi == [1, 3, 4]


def test_ngram_jaccard_max_df_caps_hot_shingle(spark):
    """Adversarial boilerplate: one shingle shared by EVERY doc must not
    generate the all-pairs candidate blowup when max_df is set."""
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    boiler = "common header line shared by all "  # one hot 5-gram + context
    rows = [(i, boiler + f"unique body {i} alpha beta gamma delta epsilon")
            for i in range(60)]
    df = spark.createDataFrame(rows, "id int, text string")

    # uncapped: every doc pairs with every other through the hot shingles
    uncapped = ngram_jaccard_pairs(df, "id", "text", n=5, threshold=0.01)
    assert uncapped.count() == 60 * 59 // 2

    # capped: hot shingles (df=60 > 10) leave the universe before the
    # self-join -> candidate space collapses to docs sharing RARE shingles
    capped = ngram_jaccard_pairs(df, "id", "text", n=5, threshold=0.01,
                                 max_df=10)
    assert capped.count() == 0

    # exactness on the filtered universe: two real near-dups still pair
    rows2 = rows + [(100, "the quick brown fox jumps over the lazy dog now"),
                    (101, "the quick brown fox jumps over the lazy dog today")]
    df2 = spark.createDataFrame(rows2, "id int, text string")
    got = ngram_jaccard_pairs(df2, "id", "text", n=5, threshold=0.3,
                              max_df=10).collect()
    assert [(r.id1, r.id2) for r in got] == [(100, 101)]


def test_embedding_dup_pairs_guards_quadratic(spark):
    import pytest as _pt

    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        embedding_dup_pairs,
    )
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [1.0, 0.01], "a"), (3, [0.0, 1.0], "b")],
        "id int, v array<double>, blk string",
    )
    with _pt.raises(ValueError, match="O\\(n\\^2\\)"):
        embedding_dup_pairs(df, "id", "v", threshold=0.9)
    blocked = embedding_dup_pairs(df, "id", "v", threshold=0.9, block_col="blk")
    assert [(r.id1, r.id2) for r in blocked.collect()] == [(1, 2)]
    optin = embedding_dup_pairs(df, "id", "v", threshold=0.9,
                                allow_quadratic=True)
    assert [(r.id1, r.id2) for r in optin.collect()] == [(1, 2)]
    # max_block drops coarse blocks before the pair join (the within-block
    # quadratic measured at sf10): a 5-member block over cap=4 emits no
    # pairs, the 2-member block still does
    big = spark.createDataFrame(
        [(i, [1.0, 0.0], "hot") for i in range(10, 15)]
        + [(1, [1.0, 0.0], "cool"), (2, [1.0, 0.01], "cool")],
        "id int, v array<double>, blk string")
    capped = embedding_dup_pairs(big, "id", "v", threshold=0.9,
                                 block_col="blk", max_block=4)
    assert [(r.id1, r.id2) for r in capped.collect()] == [(1, 2)]


def test_packing_invariants(spark):
    from pyspark.sql import functions as F

    from aliyun_maxcompute_data_collectors_spark.operators.corpus import (
        greedy_pack, pack_sequences)
    d = spark.range(200).select(F.col("id"), (F.col("id") % 7 * 100 + 30).alias("n"))

    # approximate packing: bins bounded by 2x budget (documented slack)
    approx = pack_sequences(d, "id", "n", budget=512)
    sums = approx.groupBy("bin_id").agg(F.sum(F.least("n", F.lit(512))).alias("s"))
    assert sums.where(F.col("s") >= 2 * 512).count() == 0

    # greedy packing: STRICT - no bin over budget, offsets consistent
    exact = greedy_pack(d, "id", "n", budget=512, n_groups=8)
    esums = exact.groupBy("bin_id").agg(F.sum(F.least("n", F.lit(512))).alias("s"))
    assert esums.where(F.col("s") > 512).count() == 0
    assert exact.count() == 200
    row = exact.where(F.col("bin_offset") < 0).count()
    assert row == 0


def test_review_fixes_regressions(cat, spark):
    """Pin the code-review findings: schema ident, partition-filter raw
    matching, NULL-text dedup, big-int hash keys, template column names,
    salted outer-join rejection."""
    import pytest as _pt

    # schema: bare name = schema under default project
    cat.create_schema("analytics")
    assert "analytics" in cat.list_schemas()
    # table idents follow the reference: 2 parts = project.table, so a table
    # inside a named schema uses the full 3-part form
    cat.create_table("default_project.analytics.t1", [("x", "BIGINT")])
    assert cat.list_tables("analytics") == ["t1"]

    # partition filter matches non-canonical stored strings (pt=01)
    cat.create_table("padded", [("v", "BIGINT")], [("pt", "INT")])
    cat.insert("padded", spark.createDataFrame([(1,)], "v long"),
               static_partition={"pt": "01"})
    got = cat.list_partitions_by_filter("padded", "pt = 1")
    assert got == [{"pt": "01"}]

    # NULL text survives exact dedup as its own group
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import exact_dedup
    df = spark.createDataFrame([(1, "a"), (2, None), (3, None)], "id int, text string")
    kept = sorted(r["id"] for r in exact_dedup(df, "id", "text").collect())
    assert kept == [1, 2]

    # >2^53 integer keys hash exactly despite a NULL in the column
    from aliyun_maxcompute_data_collectors_spark.operators import hashing as H
    big = 2**60 + 1
    hdf = spark.createDataFrame([(big,), (None,)], "k long")
    rows = {r["k"]: r["h"] for r in
            hdf.withColumn("h", H.odps_hash(hdf, ["k"])).collect()}
    assert rows[big] == H.combine_hashes([H.hash_long(big)])
    assert rows[None] == H.combine_hashes([H.hash_long(None)])

    # template: column named like a date pattern routes by VALUE
    from aliyun_maxcompute_data_collectors_spark.functions.templating import route_to_tables
    rdf = spark.createDataFrame([(1, "x"), (2, "y")], "id long, ds string")
    written = route_to_tables(cat, rdf, "r_%{ds}", create_missing=True)
    assert set(written) == {"r_x", "r_y"}

    # salted outer join refused
    from aliyun_maxcompute_data_collectors_spark.operators.skew import salted_join
    with _pt.raises(ValueError):
        salted_join(rdf, rdf, ["id"], how="full")

    # simhash guarantee: large max_hamming uses enough chunks
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import simhash_dup_pairs
    with _pt.raises(ValueError):
        simhash_dup_pairs(df, "id", "text", max_hamming=64)


def test_engine_sql_ddl_statements(spark, tmp_path):
    """Full DDL lifecycle through Engine.sql (SURVEY 2.13 D1-D8 as SQL)."""
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh"), spark=spark)

    eng.sql("CREATE SCHEMA IF NOT EXISTS staging")
    assert "staging" in [r["schema_name"] for r in eng.sql("SHOW SCHEMAS").collect()]

    eng.sql("""
        CREATE TABLE sales (
            k BIGINT, amount DECIMAL(18,6), tags ARRAY<STRING>
        ) COMMENT 'fact table'
        PARTITIONED BY (ds STRING)
        CLUSTERED BY (k) SORTED BY (k ASC) INTO 4 BUCKETS
        TBLPROPERTIES ('write.max-records-per-file'='1000')
    """)
    meta = eng.catalog.get_meta("sales")
    assert meta.bucket.num_buckets == 4 and meta.comment == "fact table"
    assert meta.columns[2] == ("tags", "ARRAY<STRING>")
    assert [r["table_name"] for r in eng.sql("SHOW TABLES").collect()] == ["sales"]

    eng.sql("INSERT INTO sales PARTITION (ds='d1') "
            "VALUES (1, 10.5, array('a')), (2, 20.5, array('b'))")
    assert [r["partition"] for r in eng.sql("SHOW PARTITIONS sales").collect()] == ["ds=d1"]

    desc = {r["col_name"]: r["comment"] for r in eng.sql("DESCRIBE sales").collect()}
    assert desc["ds"] == "partition" and desc["k"] == ""

    ddl = eng.sql("SHOW CREATE TABLE sales").collect()[0]["createtab_stmt"]
    assert "CLUSTERED BY (k)" in ddl

    eng.sql("ALTER TABLE sales ADD COLUMNS (note STRING)")
    assert "note" in [r["col_name"] for r in eng.sql("SHOW COLUMNS IN sales").collect()]

    eng.sql("CREATE VIEW v_sales AS SELECT k, amount FROM sales")
    assert {r["k"] for r in eng.sql("SELECT k FROM v_sales").collect()} == {1, 2}

    eng.sql("ALTER TABLE sales RENAME TO sales2")
    eng.sql("TRUNCATE TABLE sales2")
    assert eng.sql("SELECT * FROM sales2").count() == 0
    eng.sql("DROP VIEW v_sales")
    eng.sql("DROP TABLE IF EXISTS sales2")
    assert eng.sql("SHOW TABLES").count() == 0


def test_merge_into_operator_semantics(spark):
    """ANSI MERGE semantics: clause order, conditions, delete, insert,
    cardinality validation."""
    import pytest
    from aliyun_maxcompute_data_collectors_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double")
    source = spark.createDataFrame(
        [(1, 11.0, "upd"), (2, -1.0, "del"), (5, 55.0, "new"), (6, -6.0, "neg")],
        "k long, nv double, tag string")

    out = merge_into(
        target, source, "t.k = s.k",
        matched=[("s.tag = 'del'", "delete"),
                 (None, {"v": "s.nv", "name": "concat(t.name, '!')"})],
        not_matched=("s.nv > 0", {"k": "s.k", "name": "s.tag", "v": "s.nv"}),
    )
    got = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {1: ("a!", 11.0),      # second clause updated
                   3: ("c", 30.0), 4: ("d", 40.0),   # untouched kept
                   5: ("new", 55.0)}     # conditional insert; k=2 deleted, k=6 filtered

    # clause ORDER matters: unconditional update first shadows the delete
    out2 = merge_into(
        target, source, "t.k = s.k",
        matched=[(None, {"v": "s.nv"}), ("s.tag = 'del'", "delete")],
    )
    assert {r["k"] for r in out2.collect()} == {1, 2, 3, 4}

    # INSERT * requires name-compatible source
    src_star = spark.createDataFrame([(7, "g", 70.0)], "k long, name string, v double")
    out3 = merge_into(target, src_star, "t.k = s.k", not_matched=(None, "*"))
    assert (7, "g", 70.0) in [(r["k"], r["name"], r["v"]) for r in out3.collect()]

    # cardinality violation raises
    dup_src = spark.createDataFrame([(1, 1.0, "x"), (1, 2.0, "y")],
                                    "k long, nv double, tag string")
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(target, dup_src, "t.k = s.k",
                   matched=[(None, {"v": "s.nv"})]).collect()


def test_engine_sql_merge_statement(spark, tmp_path):
    """MERGE INTO through Engine.sql — J2/ST4's one-statement form."""
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh"), spark=spark)
    eng.catalog.create_table("acct", [("k", "BIGINT"), ("bal", "DOUBLE")])
    eng.sql("INSERT INTO acct VALUES (1, 100.0), (2, 200.0), (3, 300.0)")
    eng.catalog.create_table("delta", [("k", "BIGINT"), ("amt", "DOUBLE"),
                                       ("op", "STRING")])
    eng.sql("INSERT INTO delta VALUES (1, 5.0, 'U'), (3, 0.0, 'D'), (9, 9.0, 'I')")

    eng.sql("""
        MERGE INTO acct t USING delta s ON t.k = s.k
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET bal = t.bal + s.amt
        WHEN NOT MATCHED THEN INSERT (k, bal) VALUES (s.k, s.amt)
    """)
    got = {r["k"]: r["bal"] for r in eng.sql("SELECT * FROM acct").collect()}
    assert got == {1: 105.0, 2: 200.0, 9: 9.0}

    # subquery source + INSERT *
    eng.sql("""
        MERGE INTO acct USING (SELECT 2 AS k, 999.0 AS bal) s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET bal = s.bal
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = {r["k"]: r["bal"] for r in eng.sql("SELECT * FROM acct").collect()}
    assert got[2] == 999.0 and len(got) == 3


def test_engine_sql_update_delete_statements(spark, tmp_path):
    """UPDATE / DELETE DML through Engine.sql (beyond the reference, which
    cannot mutate rows at all - OdpsTableCatalog.scala:164-166)."""
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh"), spark=spark)
    eng.catalog.create_table("inv", [("k", "BIGINT"), ("qty", "BIGINT"),
                                     ("note", "STRING")])
    eng.sql("INSERT INTO inv VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, NULL)")

    eng.sql("UPDATE inv SET qty = qty * 2, note = upper(note) WHERE k <= 2")
    got = {r["k"]: (r["qty"], r["note"]) for r in eng.sql("SELECT * FROM inv").collect()}
    assert got == {1: (20, "A"), 2: (40, "B"), 3: (30, None)}

    # NULL-valued WHERE leaves the row in place (three-valued logic)
    eng.sql("DELETE FROM inv WHERE note = 'A'")
    assert {r["k"] for r in eng.sql("SELECT k FROM inv").collect()} == {2, 3}

    eng.sql("DELETE FROM inv")
    assert eng.sql("SELECT * FROM inv").count() == 0


def test_materialized_view_lifecycle(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_mv"), spark)
    eng.sql("CREATE TABLE base (k BIGINT, v BIGINT)")
    eng.sql("INSERT INTO base VALUES (1, 10), (1, 20), (2, 5)")
    eng.sql("CREATE MATERIALIZED VIEW mv AS "
            "SELECT k, SUM(v) AS total FROM base GROUP BY k")
    got = {(r["k"], r["total"]) for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {(1, 30), (2, 5)}
    # MV reads the stored table: base changes do NOT show until refresh
    eng.sql("INSERT INTO base VALUES (2, 95)")
    got = {(r["k"], r["total"]) for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {(1, 30), (2, 5)}
    eng.sql("REFRESH MATERIALIZED VIEW mv")
    got = {(r["k"], r["total"]) for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {(1, 30), (2, 100)}
    # defining text is visible in DDL; IF NOT EXISTS is a no-op; drop works
    assert "mv_text" in eng.catalog.show_create_table("mv")
    eng.sql("CREATE MATERIALIZED VIEW IF NOT EXISTS mv AS SELECT k FROM base")
    assert {r["k"] for r in eng.sql("SELECT k FROM mv").collect()} == {1, 2}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a materialized view"):
        eng.sql("REFRESH MATERIALIZED VIEW base")
    eng.sql("DROP MATERIALIZED VIEW mv")
    assert not eng.catalog.table_exists("mv")


def test_merge_not_matched_by_source(spark, tmp_path):
    # full sync: upsert from source AND delete/flag target rows the source
    # no longer contains (ANSI 2023 WHEN NOT MATCHED BY SOURCE)
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_mbs"), spark)
    eng.sql("CREATE TABLE tgt (k BIGINT, v STRING, stale BOOLEAN)")
    eng.sql("INSERT INTO tgt VALUES (1, 'a', false), (2, 'b', false), (3, 'c', false)")
    eng.sql("CREATE TABLE src (k BIGINT, v STRING)")
    eng.sql("INSERT INTO src VALUES (2, 'B'), (4, 'd')")

    eng.sql("""
      MERGE INTO tgt t USING src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v, stale) VALUES (s.k, s.v, false)
      WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET stale = true
    """)
    got = {(r["k"], r["v"], r["stale"])
           for r in eng.sql("SELECT * FROM tgt").collect()}
    assert got == {(2, "B", False), (4, "d", False), (3, "c", True)}


def test_partitioned_mv_incremental_refresh(spark, tmp_path):
    # partition-scoped refresh recomputes ONLY the predicate's partitions;
    # Catalyst pushes the predicate through the MV's aggregate to the scan
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_pmv"), spark)
    eng.sql("CREATE TABLE sales (day STRING, amt BIGINT)")
    eng.sql("INSERT INTO sales VALUES ('d1', 1), ('d1', 2), ('d2', 10)")
    eng.sql("CREATE MATERIALIZED VIEW daily PARTITIONED BY (day) AS "
            "SELECT day, SUM(amt) AS total FROM sales GROUP BY day")
    assert eng.catalog.list_partitions("daily") == [{"day": "d1"}, {"day": "d2"}]
    got = {(r["day"], r["total"]) for r in eng.sql("SELECT * FROM daily").collect()}
    assert got == {("d1", 3), ("d2", 10)}

    # base changes in BOTH partitions; refresh only d2 -> d1 stays stale
    eng.sql("INSERT INTO sales VALUES ('d1', 100), ('d2', 100)")
    eng.sql("REFRESH MATERIALIZED VIEW daily WHERE day = 'd2'")
    got = {(r["day"], r["total"]) for r in eng.sql("SELECT * FROM daily").collect()}
    assert got == {("d1", 3), ("d2", 110)}
    # full refresh catches d1 up
    eng.sql("REFRESH MATERIALIZED VIEW daily")
    got = {(r["day"], r["total"]) for r in eng.sql("SELECT * FROM daily").collect()}
    assert got == {("d1", 103), ("d2", 110)}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not in query output"):
        eng.sql("CREATE MATERIALIZED VIEW bad PARTITIONED BY (nope) AS "
                "SELECT day FROM sales")
    with _pytest.raises(ValueError, match="requires a partitioned"):
        eng.sql("CREATE MATERIALIZED VIEW flat AS SELECT COUNT(*) AS n FROM sales")
        eng.sql("REFRESH MATERIALIZED VIEW flat WHERE n > 0")


def test_max_pt_sql_rewrite(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_mpt"), spark)
    eng.sql("CREATE TABLE logs (msg STRING) PARTITIONED BY (ds STRING)")
    eng.sql("INSERT INTO logs PARTITION (ds='20240101') VALUES ('old')")
    eng.sql("INSERT INTO logs PARTITION (ds='20240102') VALUES ('new')")
    rows = eng.sql("SELECT msg FROM logs WHERE ds = max_pt('logs')").collect()
    assert [r["msg"] for r in rows] == ["new"]
    # constant resolution -> partition pruning: only one partition scanned
    from aliyun_maxcompute_data_collectors_spark.plans import checks as C
    plan = C.formatted_plan(eng.sql("SELECT msg FROM logs WHERE ds = max_pt('logs')"))
    import re as _re
    m = _re.search(r"partitions read[:=]?\s*(\d+)", plan, _re.IGNORECASE)
    if m:
        assert m.group(1) == "1"
    import pytest as _pytest
    eng.sql("CREATE TABLE emptyp (x STRING) PARTITIONED BY (ds STRING)")
    with _pytest.raises(ValueError, match="no\\s+non-empty partitions"):
        eng.sql("SELECT * FROM emptyp WHERE ds = max_pt('emptyp')")


def test_show_tblproperties_views_describe_extended(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_show"), spark)
    eng.sql("CREATE TABLE t1 (k BIGINT) STORED AS ORC "
            "TBLPROPERTIES ('owner'='me')")
    props = {r["key"]: r["value"] for r in eng.sql("SHOW TBLPROPERTIES t1").collect()}
    assert props["owner"] == "me" and props["stored_as"] == "orc"
    eng.sql("CREATE VIEW v1 AS SELECT k FROM t1")
    eng.sql("CREATE MATERIALIZED VIEW mv1 AS SELECT COUNT(*) AS n FROM t1")
    assert [r["view_name"] for r in eng.sql("SHOW VIEWS").collect()] == ["v1"]
    assert [r["view_name"] for r in eng.sql("SHOW MATERIALIZED VIEWS").collect()] == ["mv1"]
    ext = {r["col_name"]: r["data_type"]
           for r in eng.sql("DESCRIBE EXTENDED t1").collect()}
    assert ext["# format"] == "orc" and ext["# type"] == "MANAGED_TABLE"
    # plain DESCRIBE unchanged
    cols = [r["col_name"] for r in eng.sql("DESCRIBE t1").collect()]
    assert cols == ["k"]


def test_analyze_table_sql(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_an"), spark)
    eng.sql("CREATE TABLE ta (k BIGINT)")
    eng.sql("INSERT INTO ta VALUES (1), (2), (3)")
    row = eng.sql("ANALYZE TABLE ta COMPUTE STATISTICS").collect()[0]
    assert row["num_rows"] == 3 and row["num_files"] >= 1
    props = {r["key"] for r in eng.sql("SHOW TBLPROPERTIES ta").collect()}
    assert "stats" in props  # persisted into meta


def test_alter_set_unset_tblproperties(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.engine import Engine
    eng = Engine(str(tmp_path / "wh_props"), spark)
    eng.sql("CREATE TABLE tp (k BIGINT)")
    eng.sql("ALTER TABLE tp SET TBLPROPERTIES ('owner'='me', 'write.max-records-per-file'='100')")
    props = {r["key"]: r["value"] for r in eng.sql("SHOW TBLPROPERTIES tp").collect()}
    assert props["owner"] == "me"
    # property takes effect on the write path
    eng.sql("INSERT INTO tp SELECT CAST(id AS BIGINT) FROM range(250)")
    assert eng.catalog.table_stats("tp")["num_files"] >= 3
    eng.sql("ALTER TABLE tp UNSET TBLPROPERTIES ('owner')")
    props = {r["key"] for r in eng.sql("SHOW TBLPROPERTIES tp").collect()}
    assert "owner" not in props
