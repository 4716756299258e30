"""Geometry kernels: Ramer–Douglas–Peucker simplification (F10) and
Google polyline encoding (F11) as vectorized pandas UDFs over
``array<struct<lat,lon>>`` columns.

Reference parity: RDP is the iterative stack-based variant with a 1.0 m
perpendicular-distance threshold (`/root/reference/pkg/geo/helper.go:16-69`,
threshold :11, distance via point-to-great-circle-segment
`pkg/geo/s2_geo.go:11-35`); polyline encode follows the public Google
algorithm (`geo/helper.go:71-80`), hand-rolled — no external packages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

RDP_THRESHOLD_M = 1.0  # geo/helper.go:11
_EARTH_M = 6371000.0

COORD_ARRAY = ArrayType(
    StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())])
)


def _perp_dist_m(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance (meters) of points to segment a-b using a
    local equirectangular projection (matches the reference's
    meter-scale use of F6/F7 at road geometry extents)."""
    lat0 = np.radians((a[0] + b[0]) / 2.0)
    ax, ay = np.radians(a[1]) * np.cos(lat0), np.radians(a[0])
    bx, by = np.radians(b[1]) * np.cos(lat0), np.radians(b[0])
    px = np.radians(pts[:, 1]) * np.cos(lat0)
    py = np.radians(pts[:, 0])
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    if den == 0:
        return _EARTH_M * np.hypot(px - ax, py - ay)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / den, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return _EARTH_M * np.hypot(px - cx, py - cy)


def rdp_simplify(points: list, threshold_m: float = RDP_THRESHOLD_M) -> list:
    """Iterative stack-based RDP (geo/helper.go:16-69)."""
    pts = np.array([(p["lat"], p["lon"]) for p in points], dtype=np.float64)
    n = len(pts)
    if n < 3:
        return points
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[i + 1 : j]
        d = _perp_dist_m(seg, pts[i], pts[j])
        k = int(np.argmax(d))
        if d[k] > threshold_m:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return [points[i] for i in range(n) if keep[i]]


def polyline_encode(points: list, precision: int = 5) -> str:
    """Google polyline encoding (geo/helper.go:71-80)."""
    factor = 10**precision
    out = []
    prev_lat = prev_lon = 0
    for p in points:
        lat = int(round(p["lat"] * factor))
        lon = int(round(p["lon"] * factor))
        for v in (lat - prev_lat, lon - prev_lon):
            v = ~(v << 1) if v < 0 else v << 1
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        prev_lat, prev_lon = lat, lon
    return "".join(out)


@F.pandas_udf(COORD_ARRAY)
def rdp_simplify_udf(geom: pd.Series) -> pd.Series:
    return geom.apply(lambda pts: rdp_simplify(list(pts)))


@F.pandas_udf(StringType())
def polyline_encode_udf(geom: pd.Series) -> pd.Series:
    return geom.apply(lambda pts: polyline_encode(list(pts)))
