"""Per-scene calibration sidecar (VERDICT r3 #6: session cold start).

Tier calibration is scene-dependent (the area ladder comes from the
scene's splat-footprint histogram) and stable across sessions, but it
was recomputed every session: either a 37-73 s full-scene CPU projection
probe (bench harnesses, PERF_NOTES §compile) or a first-frame device
calibration that forces a SECOND compile of the re-laddered executable
(`make_renderer(auto_tier=True)`).

This module persists the calibrated ladder next to the scene file as a
small JSON sidecar (``scene.ply`` → ``scene.ply.grcal.json``), keyed by

* the scene file's content hash (first+last 1 MB + size — streaming a
  multi-GB PLY through sha256 would cost what the probe costs), and
* the calibration-relevant config bucket (resolution, tile grid, SH
  degree, EWA settings, center quantization).

Second-session flow: ``make_renderer(..., scene_path=...)`` seeds
``cfg.tiers`` from the sidecar, so the FIRST compile is already the
calibrated ladder (with the persistent compile cache that makes
start→first-frame a warm single compile), and stores any later
auto_tier recalibration back. The sidecar is advisory: a stale or
corrupt file only costs a recalibration, never a wrong image (overflow
still flags and auto_tier still recovers — truncation is never silent).

The reference has no analog (its buffers are sized per frame from a
device readback, ``render.cu:962-971``); this is the session-scale
companion of the static-shape tier design.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Tuple

_FORMAT = 1


def sidecar_path(scene_path: str) -> str:
    return scene_path + ".grcal.json"


def scene_fingerprint(scene_path: str) -> str:
    """Content fingerprint: size + sha256 of the first and last 1 MB.
    Full-file hashing of multi-GB scenes would cost a meaningful slice
    of the probe it replaces; head+tail+size catches every real
    mutation (PLY headers and trailing vertex data both move)."""
    h = hashlib.sha256()
    size = os.path.getsize(scene_path)
    h.update(str(size).encode())
    with open(scene_path, "rb") as f:
        h.update(f.read(1 << 20))
        if size > (2 << 20):
            f.seek(-(1 << 20), os.SEEK_END)
            h.update(f.read(1 << 20))
    return h.hexdigest()[:24]


def config_key(cfg) -> str:
    """The calibration-relevant static-config bucket.

    Every knob that changes splat footprints (and hence the area
    histogram the ladder was calibrated from) must appear here —
    ``k_sigma`` scales every footprint, so omitting it made a
    non-default-k_sigma session reuse a ladder calibrated for a
    different footprint scale (ADVICE r4; cost was overflow +
    recalibration, never a wrong image, but it defeated the sidecar's
    compile-skip purpose)."""
    return (
        f"{cfg.width}x{cfg.height}"
        f"/t{cfg.tile_w}x{cfg.tile_h}"
        f"/sh{cfg.sh_degree}"
        f"/q{int(cfg.quantize_centers)}"
        f"/d{cfg.ewa_dilation:g}"
        f"/c{int(cfg.ewa_compensate)}"
        f"/k{cfg.k_sigma:g}"
    )


def load_calibration(scene_path: str, cfg) -> Optional[dict]:
    """Returns the cached entry dict for (scene, cfg-bucket), or None.
    Entries hold at least ``tiers``; optionally ``strip_bounds``,
    ``a2a_caps`` and the probe histogram."""
    path = sidecar_path(scene_path)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            data = json.load(f)
        if data.get("format") != _FORMAT:
            return None
        if data.get("scene") != scene_fingerprint(scene_path):
            return None  # scene content changed: sidecar is stale
        entry = data.get("entries", {}).get(config_key(cfg))
        if entry is None:
            return None
        entry = dict(entry)
        if "tiers" in entry:
            entry["tiers"] = tuple(
                (int(m), int(k)) for m, k in entry["tiers"]
            )
        if entry.get("strip_bounds") is not None:
            entry["strip_bounds"] = tuple(
                int(b) for b in entry["strip_bounds"]
            )
        if entry.get("a2a_caps") is not None:
            entry["a2a_caps"] = tuple(int(c) for c in entry["a2a_caps"])
        return entry
    except (OSError, ValueError, KeyError, TypeError):
        return None  # advisory cache: unreadable == absent


def store_calibration(
    scene_path: str,
    cfg,
    tiers: Tuple[Tuple[int, int], ...],
    *,
    strip_bounds: Optional[Tuple[int, ...]] = None,
    a2a_caps: Optional[Tuple[int, int]] = None,
    extra: Optional[dict] = None,
) -> bool:
    """Upserts this (scene, cfg-bucket) entry; other buckets are kept.
    Returns False (and stays silent) when the sidecar location is not
    writable — the cache must never break rendering."""
    path = sidecar_path(scene_path)
    try:
        fp = scene_fingerprint(scene_path)
        data = {"format": _FORMAT, "scene": fp, "entries": {}}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    old = json.load(f)
                if (
                    old.get("format") == _FORMAT
                    and old.get("scene") == fp
                ):
                    data = old
            except (OSError, ValueError):
                pass
        entry = {"tiers": [list(t) for t in tiers]}
        if strip_bounds is not None:
            entry["strip_bounds"] = list(strip_bounds)
        if a2a_caps is not None:
            entry["a2a_caps"] = list(a2a_caps)
        if extra:
            entry.update(extra)
        data.setdefault("entries", {})[config_key(cfg)] = entry
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
        return True
    except OSError:
        return False
