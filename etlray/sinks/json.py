"""JSON / JSONL sinks.

Reference: /root/reference/src/load/json.rs —
``JsonLoader`` (37-187): one JSON array file, ``with_pretty``,
``with_append`` (read-modify-write merge, json.rs:137-161);
``JsonLinesLoader`` (210-336): JSONL with concat-append.

JSONL at scale → ``ds.write_json`` (directory of part files). The
single-file array / pretty / append modes are driver-side and only for
small results — the reference's own usage (config-sized outputs).
"""

from __future__ import annotations

import json
import os

from etlray.errors import LoadError


class JsonLinesSink:
    def __init__(self, path: str, append: bool = False) -> None:
        self.path = path
        self.append = append

    def health_check(self) -> None:
        parent = os.path.dirname(os.path.abspath(self.path))
        if not os.path.isdir(parent):
            raise LoadError(f"parent directory does not exist: {parent}")

    def write(self, ds) -> dict:
        if self.append and os.path.isfile(self.path):
            # reference append = concatenate lines (json.rs:312-320);
            # single-file driver-side path, small outputs only
            n = 0
            with open(self.path, "a", encoding="utf-8") as f:
                for batch in ds.iter_batches(batch_format="pandas"):
                    for rec in batch.to_dict(orient="records"):
                        f.write(json.dumps(rec, default=str) + "\n")
                        n += 1
            return {"rows_written": n, "paths": [self.path]}
        if os.path.isdir(self.path) or self.path.endswith("/"):
            ds.write_json(self.path)
            return {"rows_written": -1, "paths": [self.path]}
        n = 0
        with open(self.path, "w", encoding="utf-8") as f:
            for batch in ds.iter_batches(batch_format="pandas"):
                for rec in batch.to_dict(orient="records"):
                    f.write(json.dumps(rec, default=str) + "\n")
                    n += 1
        return {"rows_written": n, "paths": [self.path]}


class JsonSink:
    """Single JSON array file; pretty / append merge modes.
    Driver-side — small results only (reference JsonLoader semantics)."""

    def __init__(self, path: str, pretty: bool = False, append: bool = False) -> None:
        self.path = path
        self.pretty = pretty
        self.append = append

    def with_pretty(self, b: bool = True) -> "JsonSink":
        self.pretty = b
        return self

    def with_append(self, b: bool = True) -> "JsonSink":
        self.append = b
        return self

    def health_check(self) -> None:
        parent = os.path.dirname(os.path.abspath(self.path))
        if not os.path.isdir(parent):
            raise LoadError(f"parent directory does not exist: {parent}")

    def write(self, ds) -> dict:
        rows: list[dict] = []
        if self.append and os.path.isfile(self.path):
            with open(self.path, "r", encoding="utf-8") as f:
                existing = json.load(f)
            if isinstance(existing, list):
                rows.extend(existing)
        for batch in ds.iter_batches(batch_format="pandas"):
            # date_format='iso': pandas' default 'epoch' serialized
            # timestamps as bare millisecond ints, silently destroying
            # the type for round-trips (JsonLinesSink writes strings)
            rows.extend(json.loads(batch.to_json(orient="records",
                                                 date_format="iso")))
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2 if self.pretty else None, default=str)
        os.replace(tmp, self.path)  # atomic, like our manifest commits
        return {"rows_written": len(rows), "paths": [self.path]}
