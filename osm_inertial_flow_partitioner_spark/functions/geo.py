"""Geo scalar functions as native Catalyst column expressions.

Reference parity (all pure column math — codegen'd, pushdown-friendly):

- F1 haversine distance (km): `/root/reference/pkg/geo/distance.go:19-28`
  (duplicated at pkg/datastructure/distance.go:19-28);
- F2 equirectangular approximation: `geo/distance.go:30-34`;
- F3 destination point from bearing+distance: `geo/distance.go:46-70`;
- F4/F5 inertial projections: `pkg/partitioner/helper.go:60,92` —
  proj = slope*lon + (1-|slope|)*lat and proj = a*lon + b*lat;
- F9 6-decimal rounding: `pkg/util/util.go:63-78`.

Grid-cell indexing (the graft's H3/S2 stand-in — no geo libs in the
runtime, and the oracle needs closed-form SQL): resolution-r cell =
row-major index over a 2^r x 2^r lat/lon grid. Hierarchy is exact
(parent = bit-shift of child coordinates), neighbors are the 3x3 disk
with longitude wrap, both SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """F1 great-circle distance in km (distance.go:19-28)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def equirectangular_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """F2 fast planar approximation (distance.go:30-34)."""
    x = F.radians(lon2 - lon1) * F.cos(F.radians(lat1 + lat2) / 2)
    y = F.radians(lat2 - lat1)
    return F.sqrt(x * x + y * y) * F.lit(EARTH_RADIUS_KM)


def destination_point(
    lat: Column, lon: Column, bearing_deg: Column, dist_km: Column
) -> tuple[Column, Column]:
    """F3 spherical forward geodesic (distance.go:46-70)."""
    ang = dist_km / F.lit(EARTH_RADIUS_KM)
    brg = F.radians(bearing_deg)
    la1 = F.radians(lat)
    lo1 = F.radians(lon)
    la2 = F.asin(F.sin(la1) * F.cos(ang) + F.cos(la1) * F.sin(ang) * F.cos(brg))
    lo2 = lo1 + F.atan2(
        F.sin(brg) * F.sin(ang) * F.cos(la1),
        F.cos(ang) - F.sin(la1) * F.sin(la2),
    )
    return F.degrees(la2), (F.degrees(lo2) + 540.0) % 360.0 - 180.0


def inertial_projection(lat: Column, lon: Column, slope: float) -> Column:
    """F4: proj = slope*lon + (1-|slope|)*lat (helper.go:60,124)."""
    return F.lit(slope) * lon + F.lit(1.0 - abs(slope)) * lat


def line_projection(lat: Column, lon: Column, a: float, b: float) -> Column:
    """F5: proj = a*lon + b*lat for line [a, b] (helper.go:92,156)."""
    return F.lit(a) * lon + F.lit(b) * lat


def round6(col: Column) -> Column:
    """F9 coordinate rounding to 6 decimals (util.go:63-78)."""
    return F.round(col, 6)


# ---------------------------------------------------------------------------
# Grid-cell index (H3/S2 stand-in). res r: 2^r x 2^r global grid.
# ---------------------------------------------------------------------------


def lat_bin(lat: Column, res: int) -> Column:
    """Row index: floor((lat+90)/180 * 2^r), clamped to [0, 2^r - 1]."""
    n = 1 << res
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def lon_bin(lon: Column, res: int) -> Column:
    """Col index: floor((lon+180)/360 * 2^r), wrapped modulo 2^r."""
    n = 1 << res
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return ((raw % F.lit(n)) + F.lit(n)) % F.lit(n)


def grid_cell(lat: Column, lon: Column, res: int) -> Column:
    """Row-major cell id at resolution r: lat_bin * 2^r + lon_bin.

    SQL-oracle equivalent (DuckDB):
      least(greatest(floor((lat+90)/180*pow(2,r)),0),pow(2,r)-1)*pow(2,r)
        + ((floor((lon+180)/360*pow(2,r)) % pow(2,r)) + pow(2,r)) % pow(2,r)
    """
    n = 1 << res
    return (lat_bin(lat, res) * F.lit(n) + lon_bin(lon, res)).cast("long")


def cell_parent(cell: Column, res: int, parent_res: int) -> Column:
    """Exact hierarchy: shift both grid coordinates down by (res-parent_res)."""
    assert parent_res <= res
    n = 1 << res
    k = res - parent_res
    r = F.shiftright((cell / F.lit(n)).cast("long"), k)
    c = F.shiftright(cell % F.lit(n), k)
    return (r * F.lit(1 << parent_res) + c).cast("long")


def grid_disk(cell: Column, res: int, k: int = 1) -> Column:
    """Array of cell ids within Chebyshev distance k (the (2k+1)^2 disk),
    longitude-wrapped, latitude-clamped (out-of-range rows dropped).
    Used for kNN candidate generation (J6)."""
    n = 1 << res
    row = (cell / F.lit(n)).cast("long")
    col = cell % F.lit(n)
    cells = []
    for dr in range(-k, k + 1):
        for dc in range(-k, k + 1):
            nr = row + F.lit(dr)
            nc = ((col + F.lit(dc)) % F.lit(n) + F.lit(n)) % F.lit(n)
            cells.append(
                F.when(
                    (nr >= 0) & (nr < n), (nr * F.lit(n) + nc).cast("long")
                ).otherwise(F.lit(None).cast("long"))
            )
    return F.array_compact(F.array(*cells))
