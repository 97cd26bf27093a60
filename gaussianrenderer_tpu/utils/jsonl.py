"""JSONL benchmark sink (reference ``radix_test.cpp:33-61`` analog).

The reference's only structured observability is the JSONL writer of its
sort benchmark (algo, GPU, SM count, N, seed, device/wall ms, Gitems/s,
correctness booleans). Same shape here, with TPU device info.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


def device_info() -> dict:
    try:
        import jax
        import jaxlib

        d = jax.devices()[0]
        return {
            "device": str(d.device_kind),
            "platform": d.platform,
            "num_devices": len(jax.devices()),
            # Backend provenance: the frame sort's price is RENTED from
            # XLA's lax.sort (docs/sort_plan.md "sort risk" note) — a
            # backend upgrade that moves the headline ±20% must be
            # attributable in one glance, so every benchmark row records
            # the jax/jaxlib pair it was measured under.
            "jax": jax.__version__,
            "jaxlib": jaxlib.__version__,
        }
    except Exception:
        return {"device": "unknown", "platform": "unknown", "num_devices": 0}


class JsonlWriter:
    def __init__(self, path: Optional[str], echo: bool = True):
        self.path = path
        self.echo = echo
        self._static = {**device_info(), "ts": time.time()}
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def write(self, **fields) -> None:
        rec = {**self._static, **fields}
        line = json.dumps(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, file=sys.stderr, flush=True)
