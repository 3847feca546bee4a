"""Joins — covering the reference's declared-but-unimplemented Joiner
surface (/root/reference/src/traits.rs:109-125: JoinType
{Inner, Left, Right, Full, Cross}; no concrete impl exists in the
crate).

Two physical strategies:

* **BroadcastJoinTransform** — small side materialized once on the
  driver, shipped to the object store with ``ray.put`` ONCE, and
  joined per batch with pyarrow's hash-join kernel inside an
  actor-pool ``map_batches`` (the actor fetches the table in
  ``__init__``, not per batch). No shuffle; the right choice for
  dimension tables / lookups.
* **HashJoinTransform** — both sides large: Ray Data's native
  hash-partitioned ``Dataset.join`` (Ray 2.49).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from etlray.errors import TransformError
from etlray.stages.common import Transform

_PA_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
}


class _BroadcastJoiner:
    """Actor-pool callable: fetch the broadcast table once per actor."""

    def __init__(self, table_ref, keys: list[str], right_keys: list[str],
                 join_type: str, suffix: str) -> None:
        import ray

        self.small = ray.get(table_ref)  # zero-copy read from object store
        self.keys = keys
        self.right_keys = right_keys
        self.join_type = join_type
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
            right_suffix=self.suffix,
        )


class BroadcastJoinTransform(Transform):
    """Join against a SMALL right side without a shuffle.

    ``right`` may be a pyarrow Table, pandas DataFrame, Dataset (will be
    materialized — must be small), or a source with ``read()``.
    """

    def __init__(
        self,
        right,
        on: str | Sequence[str],
        right_on: str | Sequence[str] | None = None,
        how: str = "inner",
        suffix: str = "_r",
        concurrency: int | tuple[int, int] = (1, 8),
    ) -> None:
        if how not in _PA_JOIN_TYPE:
            raise TransformError(f"unsupported join type: {how}")
        self.right = right
        self.keys = [on] if isinstance(on, str) else list(on)
        self.right_keys = (
            self.keys if right_on is None
            else ([right_on] if isinstance(right_on, str) else list(right_on))
        )
        self.how = how
        self.suffix = suffix
        self.concurrency = concurrency

    def _right_table(self) -> pa.Table:
        r = self.right
        if hasattr(r, "read"):
            r = r.read()
        if isinstance(r, pa.Table):
            return r
        try:
            import pandas as pd
            if isinstance(r, pd.DataFrame):
                return pa.Table.from_pandas(r, preserve_index=False)
        except ImportError:
            pass
        # assume Dataset — small side only (dimension table)
        return pa.Table.from_pandas(r.to_pandas(), preserve_index=False)

    def apply(self, ds):
        import ray

        table = self._right_table().combine_chunks()
        ref = ray.put(table)  # broadcast ONCE, not re-shipped per batch
        kw = self._mb_kwargs()
        return ds.map_batches(
            _BroadcastJoiner,
            fn_constructor_args=(ref, self.keys, self.right_keys,
                                 _PA_JOIN_TYPE[self.how], self.suffix),
            concurrency=self.concurrency,
            **kw,
        )


class HashJoinTransform(Transform):
    """Large×large: Ray Data native hash join (shuffles both sides)."""

    def __init__(
        self,
        right,
        on: str | Sequence[str],
        right_on: str | Sequence[str] | None = None,
        how: str = "inner",
        num_partitions: int | None = None,
    ) -> None:
        self.right = right
        self.on = (on,) if isinstance(on, str) else tuple(on)
        self.right_on = None if right_on is None else (
            (right_on,) if isinstance(right_on, str) else tuple(right_on))
        self.how = how
        self.num_partitions = num_partitions

    def apply(self, ds):
        right = self.right.read() if hasattr(self.right, "read") else self.right
        num_partitions = self.num_partitions
        if num_partitions is None:
            # ~2× CPUs keeps every core busy without tiny-partition overhead
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            num_partitions = max(2 * ncpu, 8)
        return ds.join(
            right,
            join_type=self.how,
            num_partitions=num_partitions,
            on=self.on,
            right_on=self.right_on,
        )
