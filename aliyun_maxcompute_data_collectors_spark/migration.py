"""Hive -> engine migration tooling (the odps-data-carrier surface, D9).

Parity: ``odps-data-carrier/meta-processor/.../HiveTypeTransformer.java:84-190``
(type mapping with compatibility risks) and ``MetaProcessor.java:132-210``
(DDL generation + risk report).  The data-push half (Hive UDTF tunnel upload,
W14/U3) collapses to a plain ``INSERT INTO target SELECT ...`` in Spark and
needs no tooling.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

RISK_NONE = "NONE"
RISK_WEAK = "WEAK_CHECK"       # compatible but semantics may differ
RISK_UNSUPPORTED = "UNSUPPORTED"

# hive type -> (engine type, risk, note); patterns matched case-insensitively
_HIVE_MAP: list[tuple[str, tuple[str, str, str]]] = [
    (r"tinyint", ("TINYINT", RISK_NONE, "")),
    (r"smallint", ("SMALLINT", RISK_NONE, "")),
    (r"int(eger)?", ("INT", RISK_NONE, "")),
    (r"bigint", ("BIGINT", RISK_NONE, "")),
    (r"float", ("FLOAT", RISK_NONE, "")),
    (r"double", ("DOUBLE", RISK_NONE, "")),
    (r"decimal\s*\((\d+)\s*,\s*(\d+)\)", ("DECIMAL(%s,%s)", RISK_NONE, "")),
    (r"decimal", ("DECIMAL(38,18)", RISK_WEAK,
                  "unparameterized hive decimal maps to DECIMAL(38,18)")),
    (r"string", ("STRING", RISK_WEAK,
                 "hive STRING may exceed the 8MB cell limit")),
    (r"varchar\s*\((\d+)\)", ("VARCHAR(%s)", RISK_NONE, "")),
    (r"char\s*\((\d+)\)", ("CHAR(%s)", RISK_NONE, "")),
    (r"boolean", ("BOOLEAN", RISK_NONE, "")),
    (r"binary", ("BINARY", RISK_WEAK, "binary cell size limits differ")),
    (r"date", ("DATE", RISK_NONE, "")),
    (r"timestamp", ("TIMESTAMP", RISK_WEAK,
                    "hive timestamps are nanosecond; engine truncates to micros")),
    (r"interval.*", ("", RISK_UNSUPPORTED, "interval types are not storable")),
    (r"union.*", ("", RISK_UNSUPPORTED, "uniontype has no engine equivalent")),
]


@dataclass
class TypeRisk:
    hive_type: str
    engine_type: str
    risk: str
    note: str


@dataclass
class MigrationReport:
    table: str
    risks: list[TypeRisk] = field(default_factory=list)
    ddl: str = ""

    @property
    def ok(self) -> bool:
        return not any(r.risk == RISK_UNSUPPORTED for r in self.risks)


def transform_type(hive_type: str) -> TypeRisk:
    t = hive_type.strip()
    low = t.lower()
    # nested types recurse per element
    if low.startswith("array<") and low.endswith(">"):
        inner = transform_type(t[6:-1])
        return TypeRisk(t, f"ARRAY<{inner.engine_type}>", inner.risk, inner.note)
    if low.startswith("map<") and low.endswith(">"):
        k, v = _split2(t[4:-1])
        rk, rv = transform_type(k), transform_type(v)
        risk = _worst(rk.risk, rv.risk)
        return TypeRisk(t, f"MAP<{rk.engine_type},{rv.engine_type}>", risk,
                        (rk.note or rv.note))
    if low.startswith("struct<") and low.endswith(">"):
        fields = []
        notes, risk = [], RISK_NONE
        for part in _split_many(t[7:-1]):
            name, ftype = part.split(":", 1)
            r = transform_type(ftype)
            fields.append(f"{name.strip()}:{r.engine_type}")
            risk = _worst(risk, r.risk)
            if r.note:
                notes.append(r.note)
        return TypeRisk(t, f"STRUCT<{','.join(fields)}>", risk, "; ".join(notes))
    for pat, (target, risk, note) in _HIVE_MAP:
        m = re.fullmatch(pat, low)
        if m:
            eng = target % m.groups() if "%s" in target else target
            return TypeRisk(t, eng, risk, note)
    return TypeRisk(t, "", RISK_UNSUPPORTED, f"no mapping for hive type {t!r}")


def _worst(a: str, b: str) -> str:
    order = [RISK_NONE, RISK_WEAK, RISK_UNSUPPORTED]
    return max(a, b, key=order.index)


def _split2(s: str):
    parts = _split_many(s)
    if len(parts) != 2:
        raise ValueError(f"expected k,v in {s!r}")
    return parts


def _split_many(s: str):
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in parts if p.strip()]


def migrate_table_ddl(
    table: str,
    hive_columns: list[tuple[str, str]],
    partition_columns: list[tuple[str, str]] | None = None,
    comment: str | None = None,
) -> MigrationReport:
    """Generate engine DDL + a per-column risk report (MetaProcessor shape:
    DDL text plus a risk list the operator reviews before running)."""
    report = MigrationReport(table=table)
    cols, pcols = [], []
    for name, htype in hive_columns:
        r = transform_type(htype)
        report.risks.append(r)
        cols.append(f"  {name} {r.engine_type or 'UNSUPPORTED'}")
    for name, htype in partition_columns or []:
        r = transform_type(htype)
        report.risks.append(r)
        pcols.append(f"  {name} {r.engine_type or 'UNSUPPORTED'}")
    ddl = f"CREATE TABLE {table} (\n" + ",\n".join(cols) + "\n)"
    if comment:
        ddl += f"\nCOMMENT '{comment}'"
    if pcols:
        ddl += "\nPARTITIONED BY (\n" + ",\n".join(pcols) + "\n)"
    ddl += "\nSTORED AS PARQUET;"
    report.ddl = ddl
    return report


def apply_migration(catalog, report: MigrationReport,
                    hive_columns: list[tuple[str, str]],
                    partition_columns: list[tuple[str, str]] | None = None) -> None:
    """Create the migrated table through the catalog (fails fast on
    unsupported types, like the reference's processor)."""
    if not report.ok:
        bad = [r for r in report.risks if r.risk == RISK_UNSUPPORTED]
        raise ValueError(f"migration blocked by unsupported types: "
                         f"{[(r.hive_type, r.note) for r in bad]}")
    cols = [(n, transform_type(t).engine_type) for n, t in hive_columns]
    pcols = [(n, transform_type(t).engine_type) for n, t in (partition_columns or [])]
    catalog.create_table(report.table, cols, pcols or None)
