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

# ---------------------------------------------------------------------------
# F6-F8: great-circle point-to-segment geometry
# (`/root/reference/pkg/geo/s2_geo.go:11-61`). Pure column math — the
# S2 library operations (PointFromLatLng, Project, LatLng.Distance) are
# re-derived as closed-form 3D unit-vector arithmetic so both Spark and
# the DuckDB oracle run the identical formula.
# ---------------------------------------------------------------------------


def coord6_nudge(col: Column) -> Column:
    """The reference's MakeSixDigitsAfterComa2 (s2_geo.go:63-78) for
    inputs with != 6 decimal places: round(x + 0.000001, 6). Applied as
    a query-level preprocessing step; the synthetic coords always have
    <= 2 decimals so the nudge branch is unconditional here."""
    return F.round(col + F.lit(0.000001), 6)


def _unit_xyz(lat: Column, lon: Column) -> tuple[Column, Column, Column]:
    """Unit sphere vector of a lat/lon in degrees (s2.PointFromLatLng)."""
    la, lo = F.radians(lat), F.radians(lon)
    return (F.cos(la) * F.cos(lo), F.cos(la) * F.sin(lo), F.sin(la))


def gc_project(
    plat: Column,
    plon: Column,
    alat: Column,
    alon: Column,
    blat: Column,
    blon: Column,
) -> tuple[Column, Column]:
    """F6 ProjectPointToLineCoord (s2_geo.go:11-25): closest point on
    the great-circle SEGMENT a-b to p, as (lat, lon) degrees.

    Mirrors s2.Project: drop p onto the plane of the great circle
    through a,b (q = p - (p.n/|n|^2) n with n = a x b); if q lies within
    the arc — Sign(n,a,q) and Sign(q,b,n) both positive, i.e. the
    det[n,a,q] / det[q,b,n] triple products — return q normalized, else
    the nearer endpoint by chordal distance."""
    ax, ay, az = _unit_xyz(alat, alon)
    bx, by, bz = _unit_xyz(blat, blon)
    px, py, pz = _unit_xyz(plat, plon)
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    n2 = nx * nx + ny * ny + nz * nz
    d = (px * nx + py * ny + pz * nz) / n2
    qx, qy, qz = px - d * nx, py - d * ny, pz - d * nz
    # det[n,a,q]: (n x a) . q  — q strictly past a going toward b
    det_naq = (
        (ny * az - nz * ay) * qx
        + (nz * ax - nx * az) * qy
        + (nx * ay - ny * ax) * qz
    )
    # det[q,b,n]: (q x b) . n  — q strictly before b
    det_qbn = (
        (qy * bz - qz * by) * nx
        + (qz * bx - qx * bz) * ny
        + (qx * by - qy * bx) * nz
    )
    on_arc = (det_naq > 0) & (det_qbn > 0)
    da2 = (px - ax) ** 2 + (py - ay) ** 2 + (pz - az) ** 2
    db2 = (px - bx) ** 2 + (py - by) ** 2 + (pz - bz) ** 2
    use_a = da2 <= db2
    qn = F.sqrt(qx * qx + qy * qy + qz * qz)
    rx = F.when(on_arc, qx / qn).otherwise(F.when(use_a, ax).otherwise(bx))
    ry = F.when(on_arc, qy / qn).otherwise(F.when(use_a, ay).otherwise(by))
    rz = F.when(on_arc, qz / qn).otherwise(F.when(use_a, az).otherwise(bz))
    return (F.degrees(F.asin(F.least(F.greatest(rz, F.lit(-1.0)), F.lit(1.0)))),
            F.degrees(F.atan2(ry, rx)))


def gc_project_staged(df, out_lat: str = "_jlat", out_lon: str = "_jlon"):
    """`gc_project` over the columns (plat, plon, alat, alon, blat,
    blon) of ``df``, computed through STAGED intermediate columns
    instead of one inlined expression tree.

    Why (round 6): the Column form duplicates its subtrees per consumer
    — jlat, jlon and the perpendicular distance each inline the full
    projection, and rx/ry/rz re-inline qx/qn/on_arc internally — so
    geo_segment_project's single Project rendered a 255 KB plan whose
    driver-side processing + codegen dominated a 150k-row query.
    Staging each subexpression as a column evaluates the IDENTICAL
    arithmetic (same ops, same order — CollapseProject keeps expensive
    multiply-referenced aliases materialized) with a ~3 KB plan.
    Intermediates are dropped; ``df`` gains ``out_lat``/``out_lon``."""
    C = F.col
    df = df.withColumns(
        {
            "_gla": F.radians(C("alat")),
            "_glo": F.radians(C("alon")),
            "_glb": F.radians(C("blat")),
            "_gob": F.radians(C("blon")),
            "_glp": F.radians(C("plat")),
            "_gop": F.radians(C("plon")),
        }
    ).withColumns(
        {
            "_ax": F.cos(C("_gla")) * F.cos(C("_glo")),
            "_ay": F.cos(C("_gla")) * F.sin(C("_glo")),
            "_az": F.sin(C("_gla")),
            "_bx": F.cos(C("_glb")) * F.cos(C("_gob")),
            "_by": F.cos(C("_glb")) * F.sin(C("_gob")),
            "_bz": F.sin(C("_glb")),
            "_px": F.cos(C("_glp")) * F.cos(C("_gop")),
            "_py": F.cos(C("_glp")) * F.sin(C("_gop")),
            "_pz": F.sin(C("_glp")),
        }
    )
    df = df.withColumns(
        {
            "_nx": C("_ay") * C("_bz") - C("_az") * C("_by"),
            "_ny": C("_az") * C("_bx") - C("_ax") * C("_bz"),
            "_nz": C("_ax") * C("_by") - C("_ay") * C("_bx"),
        }
    )
    df = df.withColumn(
        "_d",
        (C("_px") * C("_nx") + C("_py") * C("_ny") + C("_pz") * C("_nz"))
        / (C("_nx") * C("_nx") + C("_ny") * C("_ny") + C("_nz") * C("_nz")),
    ).withColumns(
        {
            "_qx": C("_px") - C("_d") * C("_nx"),
            "_qy": C("_py") - C("_d") * C("_ny"),
            "_qz": C("_pz") - C("_d") * C("_nz"),
        }
    )
    df = df.withColumns(
        {
            "_det_naq": (
                (C("_ny") * C("_az") - C("_nz") * C("_ay")) * C("_qx")
                + (C("_nz") * C("_ax") - C("_nx") * C("_az")) * C("_qy")
                + (C("_nx") * C("_ay") - C("_ny") * C("_ax")) * C("_qz")
            ),
            "_det_qbn": (
                (C("_qy") * C("_bz") - C("_qz") * C("_by")) * C("_nx")
                + (C("_qz") * C("_bx") - C("_qx") * C("_bz")) * C("_ny")
                + (C("_qx") * C("_by") - C("_qy") * C("_bx")) * C("_nz")
            ),
            "_da2": (C("_px") - C("_ax")) ** 2
            + (C("_py") - C("_ay")) ** 2
            + (C("_pz") - C("_az")) ** 2,
            "_db2": (C("_px") - C("_bx")) ** 2
            + (C("_py") - C("_by")) ** 2
            + (C("_pz") - C("_bz")) ** 2,
            "_qn": F.sqrt(
                C("_qx") * C("_qx") + C("_qy") * C("_qy") + C("_qz") * C("_qz")
            ),
        }
    )
    on_arc = (C("_det_naq") > 0) & (C("_det_qbn") > 0)
    use_a = C("_da2") <= C("_db2")
    df = df.withColumns(
        {
            "_rx": F.when(on_arc, C("_qx") / C("_qn")).otherwise(
                F.when(use_a, C("_ax")).otherwise(C("_bx"))
            ),
            "_ry": F.when(on_arc, C("_qy") / C("_qn")).otherwise(
                F.when(use_a, C("_ay")).otherwise(C("_by"))
            ),
            "_rz": F.when(on_arc, C("_qz") / C("_qn")).otherwise(
                F.when(use_a, C("_az")).otherwise(C("_bz"))
            ),
        }
    )
    df = df.withColumns(
        {
            out_lat: F.degrees(
                F.asin(F.least(F.greatest(C("_rz"), F.lit(-1.0)), F.lit(1.0)))
            ),
            out_lon: F.degrees(F.atan2(C("_ry"), C("_rx"))),
        }
    )
    return df.drop(
        "_gla", "_glo", "_glb", "_gob", "_glp", "_gop",
        "_ax", "_ay", "_az", "_bx", "_by", "_bz", "_px", "_py", "_pz",
        "_nx", "_ny", "_nz", "_d", "_qx", "_qy", "_qz",
        "_det_naq", "_det_qbn", "_da2", "_db2", "_qn", "_rx", "_ry", "_rz",
    )


def gc_perp_distance_m(
    plat: Column,
    plon: Column,
    alat: Column,
    alon: Column,
    blat: Column,
    blon: Column,
) -> Column:
    """F7 PointLinePerpendicularDistance (s2_geo.go:28-36): haversine
    from p to its segment projection, in METERS (ref: km * 1000)."""
    jlat, jlon = gc_project(plat, plon, alat, alon, blat, blon)
    return haversine_km(plat, plon, jlat, jlon) * F.lit(1000.0)


def central_angle_rad(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle central angle in RADIANS (s2 LatLng.Distance), used
    by F8's on-segment test: 2*asin(sqrt(haversine-term))."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0) * F.asin(F.sqrt(a))


#: F8 tolerance (s2_geo.go:39): |d(p,ci)+d(p,ci+1)-d(ci,ci+1)| < 1e-3 rad
POINT_IN_LINE_TOLERANCE = 1e-3
