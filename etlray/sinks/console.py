"""Console sink (reference /root/reference/src/load/console.rs:35-112 —
pretty or compact-JSON print). Caps output rows; for debugging only."""

from __future__ import annotations

import json


class ConsoleSink:
    def __init__(self, pretty: bool = False, limit: int = 20) -> None:
        self.pretty = pretty
        self.limit = limit

    def write(self, ds) -> dict:
        n = 0
        for row in ds.limit(self.limit).take_all():
            if self.pretty:
                print(json.dumps(row, indent=2, default=str))
            else:
                print(json.dumps(row, default=str))
            n += 1
        return {"rows_written": n, "paths": []}
