"""Geometry module — the TPU-native rebuild of the reference's geom/
extension (geom/monetdb5/geom.c ~5.9k LoC + geomBulk.c bulk variants +
geod.c geodesic functions, SQL surface geom/sql/40_geom.sql).

Design (no libgeos): geometries live as WKT in ordinary dictionary-encoded
string columns; the executor parses each *distinct* value once on the host
(the engine's global string-function discipline) and lowers the math to
vectorized device kernels:

  * POINT columns become parallel (x, y) float64 device arrays — distance,
    DWithin, translate etc. are pure elementwise VPU work.
  * containment/intersection against a constant geometry runs a two-phase
    device pipeline: bounding-box prefilter (the R-tree analog,
    gdk/gdk_rtree.c) then an exact vectorized ray-casting / segment test
    over the polygon's padded edge list — O(n·V) fused device FLOPs
    instead of a per-row host loop.
  * geodesic distance (geod.c) is the great-circle distance on the WGS84
    mean-radius sphere, computed on device in float64.

Scalar metrics over general geometries (area, length, centroid) evaluate
once per distinct dictionary value on host and apply by gather.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..column import Column, StrDict
from ..dtypes import BOOL, F64, I32, varchar

__all__ = ["Geom", "parse_wkt", "format_wkt", "point_xy", "st_distance",
           "st_distance_geographic", "st_dwithin", "st_contains",
           "st_intersects", "st_within", "st_area", "st_length",
           "st_centroid", "st_envelope", "st_x", "st_y", "st_numpoints",
           "make_point_col", "geom_scalar", "GEOD_RADIUS"]

# WGS84 mean Earth radius (m); geod.c computes exact WGS84 geodesics via
# the ellipsoid — the spherical great-circle is the TPU-kernel-friendly
# approximation (<0.5% error), documented at the SQL surface.
GEOD_RADIUS = 6371008.8


@dataclass
class Geom:
    """Host-parsed geometry. rings: list of (V,2) float arrays — for
    points one 1x2 array, linestrings one Vx2, polygons outer ring first
    then holes, multipolygon = list of (polygon rings) flattened with
    part boundaries in `parts`."""
    kind: str                       # point linestring polygon multipolygon
    rings: List[np.ndarray] = field(default_factory=list)
    parts: Optional[List[int]] = None   # multipolygon: #rings per part
    srid: int = 0

    @property
    def bbox(self) -> Tuple[float, float, float, float]:
        allc = np.concatenate(self.rings)
        return (float(allc[:, 0].min()), float(allc[:, 1].min()),
                float(allc[:, 0].max()), float(allc[:, 1].max()))


_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"


def _coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype=np.float64)


def parse_wkt(s: str, srid: int = 0) -> Geom:
    """WKT → Geom (the reference parses via libgeos GEOSGeomFromWKT,
    geom.c wkbFROMSTR)."""
    s = s.strip()
    m = re.match(r"SRID=(\d+)\s*;\s*(.*)", s, re.I | re.S)
    if m:
        srid = int(m.group(1))
        s = m.group(2)
    head, _, rest = s.partition("(")
    head = head.strip().upper()
    body = rest.rsplit(")", 1)[0]
    if head == "POINT":
        return Geom("point", [_coords(body)], srid=srid)
    if head == "LINESTRING":
        return Geom("linestring", [_coords(body)], srid=srid)
    if head == "POLYGON":
        rings = [_coords(r.strip().lstrip("(").rstrip(")"))
                 for r in re.split(r"\)\s*,\s*\(", body)]
        return Geom("polygon", rings, srid=srid)
    if head == "MULTIPOLYGON":
        parts, rings = [], []
        for part in re.split(r"\)\s*\)\s*,\s*\(\s*\(", body):
            pr = [_coords(r.strip().lstrip("(").rstrip(")"))
                  for r in re.split(r"\)\s*,\s*\(", part)]
            rings += pr
            parts.append(len(pr))
        return Geom("multipolygon", rings, parts=parts, srid=srid)
    raise ValueError(f"unsupported WKT: {s[:40]}")


def _fmt_ring(r: np.ndarray) -> str:
    return ", ".join(f"{x:.10g} {y:.10g}" for x, y in r)


def format_wkt(g: Geom) -> str:
    if g.kind == "point":
        x, y = g.rings[0][0]
        return f"POINT ({x:.10g} {y:.10g})"
    if g.kind == "linestring":
        return f"LINESTRING ({_fmt_ring(g.rings[0])})"
    if g.kind == "polygon":
        return "POLYGON (" + ", ".join(
            f"({_fmt_ring(r)})" for r in g.rings) + ")"
    i = 0
    parts = []
    for n in g.parts or [len(g.rings)]:
        parts.append("(" + ", ".join(
            f"({_fmt_ring(r)})" for r in g.rings[i:i + n]) + ")")
        i += n
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"


# ---------------------------------------------------------------------------
# column decomposition: WKT string column → device coordinate arrays
# ---------------------------------------------------------------------------

def _dict_geoms(col: Column) -> List[Optional[Geom]]:
    """Parse each distinct dictionary value once (cached on the StrDict)."""
    sd = col.sdict
    cache = getattr(sd, "_geom_cache", None)
    if cache is None:
        cache = [parse_wkt(str(v)) for v in sd.values]
        sd._geom_cache = cache
    return cache


def point_xy(col: Column) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """POINT column → (x, y, valid) device arrays. Non-point / nil rows
    are invalid (NaN coordinates)."""
    geoms = _dict_geoms(col)
    n = len(geoms)
    xs = np.full(n + 1, np.nan)
    ys = np.full(n + 1, np.nan)
    for i, g in enumerate(geoms):
        if g is not None and g.kind == "point":
            xs[i], ys[i] = g.rings[0][0]
    codes = col.data
    idx = jnp.where(codes >= 0, codes, n)
    x = jnp.asarray(xs)[idx]
    y = jnp.asarray(ys)[idx]
    return x, y, ~(jnp.isnan(x) | jnp.isnan(y))


def make_point_col(x: Column, y: Column) -> Column:
    """ST_MakePoint/ST_Point over two numeric columns → WKT point column
    (geom.c geomMakePoint2)."""
    n = x.count
    xv = np.asarray(x.data[:n], dtype=np.float64)
    yv = np.asarray(y.data[:n], dtype=np.float64)
    vals = [f"POINT ({a:.10g} {b:.10g})" for a, b in zip(xv, yv)]
    from ..storage.columns import column_from_pyvalues
    return column_from_pyvalues(vals, varchar())


def _f64_col(data, count, nonil=False) -> Column:
    return Column(F64, data, count, nonil=nonil)


def _bool_col(data, count) -> Column:
    return Column(BOOL, data, count, nonil=True)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def st_x(col: Column) -> Column:
    x, _y, _v = point_xy(col)
    return _f64_col(x, col.count)


def st_y(col: Column) -> Column:
    _x, y, _v = point_xy(col)
    return _f64_col(y, col.count)


def st_distance(a: Column, b) -> Column:
    """Euclidean distance. point-column × point-column/constant runs as
    one fused elementwise kernel (geomBulk.c wkbDistance_bat); general
    geometries fall back to exact host math per distinct value."""
    ax, ay, _ = point_xy(a)
    if isinstance(b, Column):
        bx, by, _ = point_xy(b)
    else:
        g = b if isinstance(b, Geom) else parse_wkt(str(b))
        if g.kind != "point":
            return _host_distance_to(a, g)
        bx, by = g.rings[0][0]
    d = jnp.sqrt((ax - bx) ** 2 + (ay - by) ** 2)
    return _f64_col(d, a.count)


def _host_distance_to(a: Column, g: Geom) -> Column:
    """point column → min distance to a general geometry's segments."""
    segs = _all_segments(g)
    ax, ay, _ = point_xy(a)
    x1, y1, x2, y2 = (jnp.asarray(segs[:, i]) for i in range(4))
    dx, dy = x2 - x1, y2 - y1
    ln = dx * dx + dy * dy
    t = jnp.clip(((ax[:, None] - x1) * dx + (ay[:, None] - y1) * dy)
                 / jnp.where(ln == 0, 1.0, ln), 0.0, 1.0)
    px, py = x1 + t * dx, y1 + t * dy
    d = jnp.sqrt((ax[:, None] - px) ** 2 + (ay[:, None] - py) ** 2)
    dist = jnp.min(d, axis=1)
    if g.kind in ("polygon", "multipolygon"):
        inside = _raycast(ax, ay, g)
        dist = jnp.where(inside, 0.0, dist)
    return _f64_col(dist, a.count)


def st_distance_geographic(a: Column, b) -> Column:
    """Great-circle distance in meters on the mean-radius sphere
    (geod.c wkbDistanceGeographic; exact WGS84 geodesic replaced by the
    spherical formula — device-friendly, <0.5% of the ellipsoid)."""
    ax, ay, _ = point_xy(a)        # x=lon, y=lat (degrees)
    if isinstance(b, Column):
        bx, by, _ = point_xy(b)
    else:
        g = b if isinstance(b, Geom) else parse_wkt(str(b))
        bx, by = g.rings[0][0]
    rad = jnp.pi / 180.0
    la1, la2 = ay * rad, by * rad
    dlat = (by - ay) * rad / 2
    dlon = (bx - ax) * rad / 2
    h = jnp.sin(dlat) ** 2 + jnp.cos(la1) * jnp.cos(la2) * jnp.sin(dlon) ** 2
    d = 2 * GEOD_RADIUS * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))
    return _f64_col(d, a.count)


def st_dwithin(a: Column, b, dist: float,
               geographic: bool = False) -> Column:
    d = (st_distance_geographic if geographic else st_distance)(a, b)
    return _bool_col(d.data <= dist, a.count)


def _all_segments(g: Geom) -> np.ndarray:
    """All edges of all rings as an (E,4) array [x1 y1 x2 y2]."""
    segs = []
    for r in g.rings:
        if len(r) < 2:
            continue
        a = r
        b = np.roll(r, -1, axis=0)
        if g.kind == "linestring":
            a, b = r[:-1], r[1:]
        segs.append(np.concatenate([a, b], axis=1))
    return np.concatenate(segs) if segs else np.zeros((0, 4))


def _raycast(px: jnp.ndarray, py: jnp.ndarray, g: Geom) -> jnp.ndarray:
    """Vectorized even-odd point-in-polygon over the polygon's padded edge
    list: one fused O(n·V) device kernel replaces the per-row GEOSContains
    call (the exact phase after the bbox prefilter)."""
    segs = _all_segments(g)
    x1, y1 = jnp.asarray(segs[:, 0]), jnp.asarray(segs[:, 1])
    x2, y2 = jnp.asarray(segs[:, 2]), jnp.asarray(segs[:, 3])
    py_ = py[:, None]
    px_ = px[:, None]
    straddle = (y1 > py_) != (y2 > py_)
    dy = jnp.where(y2 == y1, 1.0, y2 - y1)
    xs = x1 + (py_ - y1) * (x2 - x1) / dy
    crossings = jnp.sum(straddle & (px_ < xs), axis=1)
    return (crossings % 2) == 1


def st_contains(container, pts: Column) -> Column:
    """ST_Contains(constant polygon, point column): bbox prefilter then
    exact ray cast — the rtree-then-exact two-phase of the reference
    (gdk_rtree.c prefilter + GEOSContains exact)."""
    g = container if isinstance(container, Geom) else \
        parse_wkt(str(container))
    px, py, valid = point_xy(pts)
    xmin, ymin, xmax, ymax = g.bbox
    inbox = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
    exact = _raycast(px, py, g)
    return _bool_col(valid & inbox & exact, pts.count)


def st_within(pts: Column, container) -> Column:
    return st_contains(container, pts)


def st_intersects(a: Column, b) -> Column:
    """point column × constant geometry: containment/boundary test.
    For polygons this equals st_contains ∪ on-boundary; the boundary set
    has measure zero, so the containment kernel is the practical test
    (the reference delegates to GEOSIntersects)."""
    g = b if isinstance(b, Geom) else parse_wkt(str(b))
    if g.kind in ("polygon", "multipolygon"):
        return st_contains(g, a)
    d = _host_distance_to(a, g)
    return _bool_col(d.data <= 1e-12, a.count)


# ---------------------------------------------------------------------------
# per-distinct-value host metrics (area/length/centroid/envelope)
# ---------------------------------------------------------------------------

def _ring_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def geom_area(g: Geom) -> float:
    """Shoelace; holes subtract (geom.c wkbArea → GEOSArea)."""
    if g.kind not in ("polygon", "multipolygon"):
        return 0.0
    areas = [abs(_ring_area(r)) for r in g.rings]
    if g.kind == "polygon":
        return areas[0] - sum(areas[1:])
    out, i = 0.0, 0
    for n in g.parts or [len(g.rings)]:
        out += areas[i] - sum(areas[i + 1:i + n])
        i += n
    return out


def geom_length(g: Geom) -> float:
    """Perimeter / line length (geom.c wkbLength)."""
    total = 0.0
    for r in g.rings:
        a = r
        b = np.roll(r, -1, axis=0)
        if g.kind == "linestring":
            a, b = r[:-1], r[1:]
        total += float(np.sum(np.hypot(b[:, 0] - a[:, 0],
                                       b[:, 1] - a[:, 1])))
    return total


def geom_centroid(g: Geom) -> Tuple[float, float]:
    if g.kind == "point":
        return tuple(g.rings[0][0])
    if g.kind == "linestring":
        r = g.rings[0]
        seg = np.hypot(np.diff(r[:, 0]), np.diff(r[:, 1]))
        mid = (r[:-1] + r[1:]) / 2
        w = seg.sum()
        if w == 0:
            return tuple(r[0])
        return (float((mid[:, 0] * seg).sum() / w),
                float((mid[:, 1] * seg).sum() / w))
    # polygon centroid (outer ring, holes subtract)
    cx = cy = aa = 0.0
    for j, r in enumerate(g.rings):
        x, y = r[:, 0], r[:, 1]
        cross = x * np.roll(y, -1) - np.roll(x, -1) * y
        a = 0.5 * cross.sum()
        if a == 0:
            continue
        sx = float(np.sum((x + np.roll(x, -1)) * cross) / (6 * a)) * a
        sy = float(np.sum((y + np.roll(y, -1)) * cross) / (6 * a)) * a
        sgn = 1.0 if (g.kind != "polygon" or j == 0) else -1.0
        cx += sgn * sx
        cy += sgn * sy
        aa += sgn * a
    return (cx / aa, cy / aa) if aa else tuple(g.rings[0][0])


def _map_geom_f64(col: Column, fn) -> Column:
    geoms = _dict_geoms(col)
    lut = np.array([fn(g) for g in geoms] + [np.nan])
    codes = col.data
    idx = jnp.where(codes >= 0, codes, len(geoms))
    return _f64_col(jnp.asarray(lut)[idx], col.count)


def st_area(col: Column) -> Column:
    return _map_geom_f64(col, geom_area)


def st_length(col: Column) -> Column:
    return _map_geom_f64(col, geom_length)


def st_numpoints(col: Column) -> Column:
    geoms = _dict_geoms(col)
    lut = np.array([sum(len(r) for r in g.rings) for g in geoms] + [-2**31],
                   dtype=np.int32)
    codes = col.data
    idx = jnp.where(codes >= 0, codes, len(geoms))
    return Column(I32, jnp.asarray(lut)[idx], col.count)


def _map_geom_str(col: Column, fn) -> Column:
    from .strfuncs import map_dict
    return map_dict(col, lambda v: fn(parse_wkt(str(v))))


def st_centroid(col: Column) -> Column:
    def f(g):
        x, y = geom_centroid(g)
        return f"POINT ({x:.10g} {y:.10g})"
    return _map_geom_str(col, f)


def st_astext(col: Column) -> Column:
    return _map_geom_str(col, format_wkt)


def st_envelope(col: Column) -> Column:
    def f(g):
        x0, y0, x1, y1 = g.bbox
        return (f"POLYGON (({x0:.10g} {y0:.10g}, {x1:.10g} {y0:.10g}, "
                f"{x1:.10g} {y1:.10g}, {x0:.10g} {y1:.10g}, "
                f"{x0:.10g} {y0:.10g}))")
    return _map_geom_str(col, f)


def geom_scalar(name: str, *args):
    """Scalar (constant-argument) geometry evaluation for SELECT items
    over literals; returns a python value."""
    if name == "st_makepoint" or name == "st_point":
        return f"POINT ({float(args[0]):.10g} {float(args[1]):.10g})"
    g = parse_wkt(str(args[0]))
    if name == "st_x":
        return float(g.rings[0][0][0])
    if name == "st_y":
        return float(g.rings[0][0][1])
    if name == "st_area":
        return geom_area(g)
    if name == "st_length":
        return geom_length(g)
    if name == "st_numpoints":
        return int(sum(len(r) for r in g.rings))
    if name == "st_astext":
        return format_wkt(g)
    if name == "st_centroid":
        x, y = geom_centroid(g)
        return f"POINT ({x:.10g} {y:.10g})"
    if name == "st_distance":
        h = parse_wkt(str(args[1]))
        a, b = g.rings[0][0], h.rings[0][0]
        return math.hypot(a[0] - b[0], a[1] - b[1])
    raise ValueError(f"unsupported scalar geometry function {name}")
