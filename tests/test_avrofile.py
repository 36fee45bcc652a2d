"""Dependency-free Avro container source/sink (sources/avrofile.py):
binary-encoding primitives, schema mapping both ways, container round-trips
through Spark, codec handling, and corruption detection."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_maxcompute_data_collectors_spark.sources.avrofile import (
    _read_long,
    _write_long,
    avro_schema_of,
    build_container,
    parse_container,
    read_avro,
    spark_type_of,
    write_avro,
)


def test_zigzag_varint_roundtrip():
    for n in (0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -2**31, 2**62, -2**62):
        buf = _write_long(n)
        v, pos = _read_long(buf, 0)
        assert (v, pos) == (n, len(buf))
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert [_write_long(n) for n in (0, -1, 1, -2, 2)] == [
        b"\x00", b"\x01", b"\x02", b"\x03", b"\x04"]


def test_container_roundtrip_all_types():
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "b", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "kv", "type": {"type": "map", "values": "long"}},
            {"name": "col", "type": {"type": "enum", "name": "c",
                                     "symbols": ["red", "blue"]}},
        ]}
    recs = [
        {"i": 1, "l": -(2**40), "d": 2.5, "s": "x", "b": True,
         "raw": bytearray(b"\x00\xff"), "tags": ["a", "b"],
         "kv": {"k1": 7}, "col": "blue"},
        {"i": -2, "l": 0, "d": -0.5, "s": None, "b": False,
         "raw": bytearray(b""), "tags": [], "kv": {}, "col": "red"},
    ]
    for codec in ("null", "deflate"):
        schema_out, got = parse_container(
            build_container(schema, recs, codec=codec))
        assert schema_out == schema
        assert got == recs


def test_compiled_codec_matches_generic_walker():
    """r13 schema-compiled codec: for every supported field shape
    (primitives, nullable unions BOTH branch orders, and per-field
    fallback types: logical date/timestamp, array, map, enum, fixed,
    nested record) the compiled encoder must produce BYTE-identical
    output to the generic walker and the compiled decoder must produce
    value-identical records."""
    from aliyun_maxcompute_data_collectors_spark.sources.avrofile import (
        _compile_decoder, _compile_encoder, _decode, _encode)

    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "by", "type": "bytes"},
            {"name": "s", "type": "string"},
            {"name": "nl", "type": ["null", "long"]},
            {"name": "ln", "type": ["string", "null"]},  # reversed union
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "mp", "type": {"type": "map", "values": "int"}},
            {"name": "en", "type": {"type": "enum", "name": "e",
                                    "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "fx8",
                                    "size": 4}},
        ]}
    import datetime as _dt
    recs = [
        {"b": True, "i": -7, "l": 2**61, "f": 1.5, "d": -2.25,
         "by": bytearray(b"\x00\xff"), "s": "héllo", "nl": 12,
         "ln": "x", "dt": _dt.date(2020, 2, 29),
         "ts": _dt.datetime(2021, 3, 4, 5, 6, 7, 123456),
         "arr": [1, -2, 3], "mp": {"k": 9}, "en": "B",
         "fx": bytearray(b"abcd")},
        {"b": False, "i": 0, "l": -1, "f": 0.0, "d": 0.0,
         "by": bytearray(b""), "s": "", "nl": None, "ln": None,
         "dt": _dt.date(1970, 1, 1),
         "ts": _dt.datetime(1970, 1, 1, 0, 0, 0),
         "arr": [], "mp": {}, "en": "A", "fx": bytearray(b"0000")},
    ]
    ref = bytearray()
    for r in recs:
        _encode(schema, r, ref)
    fast = bytearray()
    enc = _compile_encoder(schema)
    assert enc is not None
    enc(recs, fast)
    assert bytes(fast) == bytes(ref)
    dec = _compile_decoder(schema)
    assert dec is not None
    got, endpos = dec(bytes(ref), len(recs), 0)
    want, bp = [], 0
    for _ in recs:
        rec, bp = _decode(schema, bytes(ref), bp)
        want.append(rec)
    assert endpos == bp and got == want
    # NaN in a nullable double encodes as null (the generic contract)
    nan_schema = {"type": "record", "name": "n", "fields": [
        {"name": "x", "type": ["null", "double"]}]}
    ref2, fast2 = bytearray(), bytearray()
    _encode(nan_schema, {"x": float("nan")}, ref2)
    _compile_encoder(nan_schema)([{"x": float("nan")}], fast2)
    assert bytes(fast2) == bytes(ref2) == b"\x00"


def test_container_detects_corruption():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "i", "type": "int"}]}
    payload = bytearray(build_container(schema, [{"i": 5}], codec="null"))
    with pytest.raises(ValueError, match="magic"):
        parse_container(b"NOPE" + bytes(payload[4:]))
    payload[-3] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        parse_container(bytes(payload))


def test_schema_mapping_both_ways():
    sdt = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("day", T.DateType(), True),
        T.StructField("vec", T.ArrayType(T.DoubleType(), False), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType(),
                                         True), True),
    ])
    avro = avro_schema_of(sdt)
    assert avro["fields"][0]["type"] == "long"
    assert avro["fields"][1]["type"] == ["null", "string"]
    assert avro["fields"][2]["type"][1]["logicalType"] == "timestamp-micros"
    back = spark_type_of(avro)
    assert [f.dataType for f in back.fields] == [f.dataType for f in sdt.fields]
    with pytest.raises(ValueError, match="union"):
        spark_type_of(["int", "string"])


def test_spark_roundtrip(spark, tmp_path):
    """write_avro -> read_avro preserves rows across partitions, types,
    nulls, timestamps and dates; and the files are real container files."""
    rows = [
        (1, "alpha", 1.5, True, datetime.datetime(2024, 5, 1, 12, 30, 0),
         datetime.date(2024, 5, 1), ["x", "y"]),
        (2, None, -2.25, False, None, None, []),
        (3, "gamma", 0.0, None, datetime.datetime(1999, 12, 31, 23, 59, 59),
         datetime.date(1970, 1, 2), ["z"]),
    ]
    sdt = ("id long, name string, score double, ok boolean, "
           "ts timestamp, day date, tags array<string>")
    df = spark.createDataFrame(rows, sdt).repartition(2)
    out = str(tmp_path / "avro")
    files = write_avro(df, out)
    assert files and all(f.endswith(".avro") for f in files)
    back = read_avro(spark, out)
    assert back.schema == spark.createDataFrame(rows, sdt).schema
    got = sorted(back.collect(), key=lambda r: r["id"])
    want = sorted(df.collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_spark_roundtrip_map_and_struct(spark, tmp_path):
    """map and nested-record columns survive both directions (pandas dicts
    / Row structs across the Arrow boundary)."""
    src = spark.createDataFrame(
        [(1, {"x": 1, "y": 2}, ("hi", 2.5)), (2, {}, ("yo", None))],
        "id long, kv map<string,long>, nested struct<a:string,b:double>")
    out = str(tmp_path / "avro")
    write_avro(src, out)
    rows = {r["id"]: r for r in read_avro(spark, out).collect()}
    assert dict(rows[1]["kv"]) == {"x": 1, "y": 2} and dict(rows[2]["kv"]) == {}
    assert rows[1]["nested"]["a"] == "hi" and rows[1]["nested"]["b"] == 2.5
    assert rows[2]["nested"]["b"] is None


def test_read_avro_explicit_schema_and_empty(spark, tmp_path):
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "string"}, {"name": "v", "type": "long"}]}
    p = tmp_path / "one.avro"
    p.write_bytes(build_container(schema, [{"k": "a", "v": 1},
                                           {"k": "b", "v": 2}]))
    df = read_avro(spark, str(tmp_path), avro_schema=schema)
    assert df.where(F.col("v") > 1).collect()[0]["k"] == "b"
    with pytest.raises(Exception, match="no files|PATH_NOT_FOUND"):
        read_avro(spark, str(tmp_path / "missing"))


# ---------------------------------------------------------------------------
# property tests: random values through the binary codec (pure Python, no
# Spark) - the varint/union/array/map encoders must round-trip ANY input
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SCHEMA = {
    "type": "record", "name": "p", "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "tags", "type": {"type": "array",
                                  "items": ["null", "string"]}},
        {"name": "kv", "type": {"type": "map", "values": "long"}},
    ]}

_ROW = st.fixed_dictionaries({
    "i": st.none() | st.integers(min_value=-2**63, max_value=2**63 - 1),
    "s": st.none() | st.text(max_size=40),
    "d": st.floats(allow_nan=False, width=64),
    "tags": st.lists(st.none() | st.text(max_size=10), max_size=5),
    "kv": st.dictionaries(st.text(min_size=1, max_size=8),
                          st.integers(min_value=-2**40, max_value=2**40),
                          max_size=5),
})


@settings(max_examples=150, deadline=None)
@given(st.lists(_ROW, max_size=8), st.sampled_from(["null", "deflate"]))
def test_property_container_roundtrip(rows, codec):
    schema, got = parse_container(build_container(_SCHEMA, rows, codec))
    assert schema == _SCHEMA
    assert got == rows


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-2**63, max_value=2**63 - 1))
def test_property_zigzag_is_bijective(n):
    buf = _write_long(n)
    v, pos = _read_long(buf, 0)
    assert v == n and pos == len(buf) <= 10


def test_sqoop_shape_export_import(spark, tmp_path):
    """The Sqoop cycle the reference runs: table -> avro files -> read back
    -> insert into a catalog table."""
    from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog
    from aliyun_maxcompute_data_collectors_spark.session import load_tables

    nation = load_tables(spark, "/root/testdata/sf0.001", ["nation"])["nation"]
    out = str(tmp_path / "nation_avro")
    write_avro(nation, out)
    back = read_avro(spark, out)
    cat = OdpsCatalog(spark, str(tmp_path / "wh"))
    from aliyun_maxcompute_data_collectors_spark.types import to_odps_type
    cat.create_table("nation_import",
                     [(f.name, to_odps_type(f.dataType))
                      for f in back.schema.fields])
    cat.insert("nation_import", back)
    assert cat.read_table("nation_import").count() == nation.count()


def test_write_avro_nullable_long_exact(spark, tmp_path):
    """ADVICE r6: a nullable long column (arrives in pandas as float64)
    must round-trip exactly for values inside the float-exact range, and
    the write must RAISE (not silently corrupt) when a value at/above
    2^53 has already lost exactness in the float conversion."""
    big_ok = (1 << 53) - 1          # largest exactly-representable odd value
    rows = [(1, big_ok), (2, None), (3, -big_ok), (4, 42)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = str(tmp_path / "nullable_long")
    write_avro(df.repartition(1), out)
    got = {r["id"]: r["v"] for r in read_avro(spark, out).collect()}
    assert got == {1: big_ok, 2: None, 3: -big_ok, 4: 42}

    bad = spark.createDataFrame(
        [(1, (1 << 53) + 1), (2, None)], "id long, v long")
    import pytest as _pytest
    with _pytest.raises(Exception, match="2\\^53"):
        write_avro(bad.repartition(1), str(tmp_path / "bad"))


def test_write_avro_driver_side_commit(spark, tmp_path):
    """ADVICE r6: only driver-promoted files are visible under the output
    dir - no staging dir or attempt stragglers survive the write, and the
    returned manifest matches the directory listing exactly."""
    import os as _os

    df = spark.range(0, 100, 1, 4).selectExpr("id", "id * 2 as v")
    out = str(tmp_path / "commit")
    files = write_avro(df, out)
    listed = sorted(_os.listdir(out))
    assert listed == files                      # nothing extra, nothing missing
    assert not any(f.startswith("_staging") for f in listed)
    assert read_avro(spark, out).count() == 100


def test_read_avro_sync_marker_splitting(spark, tmp_path):
    """VERDICT r6 #6: one multi-block container file must read across >=4
    tasks with rows identical to the single-task read - block ownership by
    sync-marker position, boundary blocks decoded to completion by the
    split that owns their start."""
    from aliyun_maxcompute_data_collectors_spark.sources.avrofile import (
        build_container)

    schema = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"},
        {"name": "txt", "type": "string"}]}
    rows = [{"id": i, "txt": f"payload-{i:06d}-" + "x" * (i % 37)}
            for i in range(20000)]
    payload = build_container(schema, rows, codec="null",
                              max_block_records=500)  # 40 blocks
    big = tmp_path / "big.avro"
    big.write_bytes(payload)

    whole = read_avro(spark, str(tmp_path)).orderBy("id").collect()
    split_bytes = max(1024, len(payload) // 8)  # ~8 ranges
    df = read_avro(spark, str(big), split_bytes=split_bytes)
    assert df.rdd.getNumPartitions() >= 4
    got = df.orderBy("id").collect()
    assert got == whole and len(got) == 20000
    # every split contributed (no range double-decodes or starves)
    sizes = df.rdd.glom().map(len).collect()
    assert sum(1 for s in sizes if s > 0) >= 4

    # deflate codec path too
    payload2 = build_container(schema, rows[:5000], codec="deflate",
                               max_block_records=250)
    f2 = tmp_path / "c.avro"
    f2.write_bytes(payload2)
    got2 = read_avro(spark, str(f2),
                     split_bytes=max(512, len(payload2) // 6)) \
        .orderBy("id").collect()
    assert [r["id"] for r in got2] == list(range(5000))


def test_container_writer_streams_blocks_bounded_memory(tmp_path):
    """ADVICE r8: the incremental ContainerWriter must hold at most one
    block in memory - writing a multi-hundred-thousand-record partition
    allocates O(block), not O(partition) - and its bytes must equal
    build_container's for the same sync marker and chunking."""
    import tracemalloc

    from aliyun_maxcompute_data_collectors_spark.sources.avrofile import (
        ContainerWriter,
        build_container,
        parse_container,
    )

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "txt", "type": "string"}]}
    sync = b"\x01" * 16
    n = 200_000
    payload = "x" * 64

    def recs():
        for i in range(n):
            yield {"id": i, "txt": payload}

    out = tmp_path / "big.avro"
    tracemalloc.start()
    with open(out, "wb") as fh:
        w = ContainerWriter(fh, schema, "null", sync=sync,
                            block_records=1000)
        w.write_many(recs())
        w.close()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    total_bytes = out.stat().st_size
    assert total_bytes > 10_000_000       # the file really is ~15 MB
    assert peak < total_bytes / 10        # memory stayed O(one block)
    assert w.rows == n

    # byte parity with the in-memory builder on a small prefix
    small = [{"id": i, "txt": payload} for i in range(2500)]
    with open(tmp_path / "s.avro", "wb") as fh:
        w2 = ContainerWriter(fh, schema, "deflate", sync=sync,
                             block_records=1000)
        w2.write_many(small)
        w2.close()
    built = build_container(schema, small, "deflate", sync=sync,
                            max_block_records=1000)
    assert (tmp_path / "s.avro").read_bytes() == built
    got_schema, got = parse_container(built)
    assert got == small
