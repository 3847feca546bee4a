"""Schema evolution — Arrow schema-merge with typed-null backfill,
rename mapping and widening casts.

Reference analogue: the Parquet writer's union-of-keys schema inference
with missing → null (/root/reference/src/load/parquet.rs:124-138,
195-197) and the Delta loader's ``schema_evolution`` flag
(src/load/delta.rs). The reference's Delta writer infers schema from
the FIRST ROW ONLY (delta.rs:284-306) — a footgun this module
deliberately does not copy: we unify the full schemas.

Rules (north rule: "added / renamed / widened columns"):
* added column   → older data backfilled with typed nulls;
* renamed column → caller-supplied rename map applied before unify;
* widened type   → numeric promotion int32→int64→float64; any type can
  widen to string; timestamps promote by unit.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

# str(pa.float32()) is "float" and str(pa.float64()) is "double" —
# listing "float32"/"float64" here made every numeric↔float widening
# unreachable (it fell through to the string fallback, turning an
# int64/float64 LSN column into TEXT whose lexicographic order breaks
# the LWW reduce: '9' > '10'). pa.type_for_alias accepts both spellings,
# so only the lookup names needed fixing.
_NUMERIC_ORDER = ["int8", "int16", "int32", "int64", "float", "double"]


def widen_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """The narrowest type both inputs can losslessly widen to."""
    if a.equals(b):
        return a
    sa, sb = str(a), str(b)
    if sa in _NUMERIC_ORDER and sb in _NUMERIC_ORDER:
        ia, ib = _NUMERIC_ORDER.index(sa), _NUMERIC_ORDER.index(sb)
        lo, hi = min(ia, ib), max(ia, ib)
        if lo <= 3 and hi >= 4:
            # int mixed with float: float64 is the only choice that
            # holds every int64 exactly (float32 would truncate)
            return pa.float64()
        return pa.type_for_alias(_NUMERIC_ORDER[hi])
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        units = ["s", "ms", "us", "ns"]
        unit = units[max(units.index(a.unit), units.index(b.unit))]
        tz = a.tz or b.tz
        return pa.timestamp(unit, tz=tz)
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    # last resort: both sides stringify losslessly
    return pa.large_string() if (pa.types.is_large_string(a) or pa.types.is_large_string(b)) \
        else pa.string()


def unify_schemas(schemas: Sequence[pa.Schema],
                  rename_map: Mapping[str, str] | None = None) -> pa.Schema:
    """Union of fields across schemas (first-seen column order), with
    renames applied first and conflicting types widened."""
    rename = dict(rename_map or {})
    fields: dict[str, pa.DataType] = {}
    order: list[str] = []
    for schema in schemas:
        for f in schema:
            name = rename.get(f.name, f.name)
            if name not in fields:
                fields[name] = f.type
                order.append(name)
            else:
                fields[name] = widen_types(fields[name], f.type)
    return pa.schema([pa.field(n, fields[n]) for n in order])


def conform_table(table: pa.Table, target: pa.Schema,
                  rename_map: Mapping[str, str] | None = None) -> pa.Table:
    """Rename → backfill missing columns with typed nulls → widening
    casts → column order of ``target``. Vectorized; used inside
    map_batches on every block of every epoch."""
    rename = dict(rename_map or {})
    if rename:
        table = table.rename_columns(
            [rename.get(c, c) for c in table.column_names])
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = pc.cast(col, f.type, safe=False)
        else:
            col = pa.nulls(table.num_rows, type=f.type)
        # ChunkedArrays pass through AS chunks: combine_chunks() on a
        # blob-scale string column (>2 GB in one unit) overflows the
        # int32 offsets — Table.from_arrays accepts chunked columns
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=target)


def conformer(target: pa.Schema, rename_map: Mapping[str, str] | None = None):
    """Return a map_batches-ready fn closing over the target schema.
    Blocks already matching the target pass through zero-copy."""
    def fn(t: pa.Table) -> pa.Table:
        if t.schema.equals(target):
            return t
        return conform_table(t, target, rename_map)
    return fn
