"""Delta-style table source — the read side of the CDC engine's
manifest table format.

Reference: /root/reference/src/extract/delta.rs:37-148 —
``DeltaExtractor`` with time travel (``with_version``), predicate and
column pushdown (the reference stores the predicate but never applies
it, delta.rs; here both genuinely push into the parquet read).
A "version" is a committed epoch id in the manifest.
"""

from __future__ import annotations

from typing import Any, Sequence

from etlray.cdc.engine import CDCEngine
from etlray.errors import ExtractError


class DeltaSource:
    def __init__(
        self,
        table_dir: str,
        version: Any | None = None,
        columns: Sequence[str] | None = None,
        predicate: Any | None = None,  # pyarrow.dataset expression
    ) -> None:
        self.table_dir = table_dir
        self.version = version
        self.columns = list(columns) if columns else None
        self.predicate = predicate

    def with_version(self, v) -> "DeltaSource":
        self.version = v
        return self

    def with_columns(self, cols: Sequence[str]) -> "DeltaSource":
        self.columns = list(cols)
        return self

    def with_predicate(self, expr) -> "DeltaSource":
        """Accepts a pyarrow.dataset expression OR the reference's
        SQL-string form ``with_predicate("age > 18")``
        (/root/reference/src/extract/delta.rs:58 — which the reference
        stores but never applies; here it genuinely pushes down)."""
        if isinstance(expr, str):
            expr = _parse_predicate(expr)
        self.predicate = expr
        return self

    def read(self):
        eng = CDCEngine(self.table_dir, num_buckets=None)
        ds = eng.read_snapshot(epoch_id=self.version, with_internal_cols=True,
                               columns=self.columns, predicate=self.predicate)
        if ds is None:
            raise ExtractError(
                f"no committed snapshot (version={self.version!r}) in {self.table_dir}")
        return ds

    def versions(self) -> list:
        return [e["id"] for e in CDCEngine(self.table_dir, num_buckets=None).manifest.load()["epochs"]]


_OPS = ["<=", ">=", "!=", "<>", "==", "=", "<", ">"]  # longest first


def _parse_predicate(s: str):
    """Tiny SQL-comparison parser for the reference's string predicates:
    ``col OP literal`` terms joined by AND. Literals: int, float,
    'quoted'/"quoted" strings, true/false, null (IS NULL / IS NOT NULL
    also accepted)."""
    import re

    import pyarrow.dataset as pads

    from etlray.errors import ExtractError

    def term(t: str):
        t = t.strip()
        m = re.match(r"(?i)^(\w+)\s+IS\s+NOT\s+NULL$", t)
        if m:
            return pads.field(m.group(1)).is_valid()
        m = re.match(r"(?i)^(\w+)\s+IS\s+NULL$", t)
        if m:
            return ~pads.field(m.group(1)).is_valid()
        for op in _OPS:
            if op in t:
                col, lit = t.split(op, 1)
                col, lit = col.strip(), lit.strip()
                if not re.match(r"^\w+$", col):
                    break
                if re.match(r"^'.*'$|^\".*\"$", lit):
                    val = lit[1:-1]
                elif re.match(r"(?i)^(true|false)$", lit):
                    val = lit.lower() == "true"
                elif re.match(r"^-?\d+$", lit):
                    val = int(lit)
                else:
                    try:
                        val = float(lit)
                    except ValueError:
                        break
                f = pads.field(col)
                return {"=": f == val, "==": f == val, "!=": f != val,
                        "<>": f != val, ">": f > val, ">=": f >= val,
                        "<": f < val, "<=": f <= val}[op]
        raise ExtractError(f"cannot parse predicate term: {t!r}")

    parts = re.split(r"(?i)\s+AND\s+", s.strip())
    expr = term(parts[0])
    for p in parts[1:]:
        expr = expr & term(p)
    return expr
