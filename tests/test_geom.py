"""Geometry module (geom/monetdb5/geom.c, geomBulk.c, geod.c,
geom/sql/40_geom.sql) — WKT columns with device-vectorized point kernels,
bbox-prefiltered ray-cast containment, and host per-distinct metrics.
Oracle: independent reference math computed inline."""

import math

import numpy as np
import pytest

from monetdb_tpu.ops.geom import (GEOD_RADIUS, format_wkt, geom_area,
                                  geom_centroid, geom_length, parse_wkt)
from monetdb_tpu.session import Session
from monetdb_tpu.storage.database import Database


def mk():
    s = Session(Database())
    s.sql("create table pts (id int, g varchar(80))")
    s.sql("""insert into pts values
        (1, 'POINT (1 1)'), (2, 'POINT (3 4)'), (3, 'POINT (10 0)'),
        (4, 'POINT (2.5 2.5)'), (5, NULL)""")
    return s


def test_wkt_roundtrip():
    for w in ["POINT (1.5 -2)", "LINESTRING (0 0, 1 1, 2 0)",
              "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
              "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
              "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
              "((5 5, 6 5, 6 6, 5 6, 5 5)))"]:
        assert format_wkt(parse_wkt(w)) == w


def test_st_xy_and_makepoint():
    s = mk()
    r = s.sql("select id, st_x(g), st_y(g) from pts where id <= 2 "
              "order by id")
    assert r.rows == [(1, 1.0, 1.0), (2, 3.0, 4.0)]
    r2 = s.sql("select st_astext(st_makepoint(7, 8)) from pts "
               "where id = 1")
    assert r2.rows == [("POINT (7 8)",)]
    # column form: build points from numeric columns
    s.sql("create table xy (x int, y int)")
    s.sql("insert into xy values (1,2),(3,4)")
    r3 = s.sql("select st_makepoint(x, y) from xy")
    assert r3.rows == [("POINT (1 2)",), ("POINT (3 4)",)]


def test_st_distance_point_point():
    s = mk()
    r = s.sql("select id, st_distance(g, 'POINT (0 0)') from pts "
              "where id <= 3 order by id")
    want = [(1, math.hypot(1, 1)), (2, 5.0), (3, 10.0)]
    for (gi, gd), (wi, wd) in zip(r.rows, want):
        assert gi == wi and abs(gd - wd) < 1e-12


def test_st_distance_point_polygon():
    s = mk()
    # unit square at origin: point (3,4) is hypot(2,3)... nearest corner
    # (1,1) → hypot(2,3); point (1,1) on corner → 0 ; inside → 0
    sq = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    r = s.sql(f"select id, st_distance(g, '{sq}') from pts "
              "where id in (1, 2) order by id")
    assert abs(r.rows[0][1] - 0.0) < 1e-12          # (1,1) on boundary
    assert abs(r.rows[1][1] - math.hypot(2, 3)) < 1e-12


def test_st_contains_and_within():
    s = mk()
    sq = "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"
    r = s.sql(f"select id from pts where st_contains('{sq}', g) "
              "order by id")
    assert r.rows == [(1,), (2,), (4,)]
    r2 = s.sql(f"select id from pts where st_within(g, '{sq}') "
               "order by id")
    assert r2.rows == [(1,), (2,), (4,)]
    # polygon with a hole: (2.5, 2.5) falls in the hole
    holed = ("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0), "
             "(2 2, 3 2, 3 3, 2 3, 2 2))")
    r3 = s.sql(f"select id from pts where st_contains('{holed}', g) "
               "order by id")
    assert r3.rows == [(1,), (2,)]


def test_st_intersects_multipolygon():
    s = mk()
    mp = ("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
          "((9 -1, 11 -1, 11 1, 9 1, 9 -1)))")
    r = s.sql(f"select id from pts where st_intersects(g, '{mp}') "
              "order by id")
    assert r.rows == [(1,), (3,)]


def test_st_dwithin():
    s = mk()
    r = s.sql("select id from pts where st_dwithin(g, 'POINT (0 0)', 5.0) "
              "order by id")
    assert r.rows == [(1,), (2,), (4,)]


def test_geodesic_distance():
    s = Session(Database())
    s.sql("create table cities (name varchar(20), g varchar(60))")
    # lon lat: Amsterdam and Paris
    s.sql("""insert into cities values
        ('ams', 'POINT (4.9041 52.3676)'), ('par', 'POINT (2.3522 48.8566)')""")
    r = s.sql("select st_distance_geographic(g, 'POINT (2.3522 48.8566)') "
              "from cities where name = 'ams'")
    d = r.rows[0][0]
    # haversine reference
    la1, la2 = math.radians(52.3676), math.radians(48.8566)
    dlat, dlon = la2 - la1, math.radians(2.3522 - 4.9041)
    h = (math.sin(dlat / 2) ** 2
         + math.cos(la1) * math.cos(la2) * math.sin(dlon / 2) ** 2)
    want = 2 * GEOD_RADIUS * math.asin(math.sqrt(h))
    assert abs(d - want) < 1e-6
    assert 425_000 < d < 435_000       # ~430 km


def test_area_length_centroid_envelope():
    s = Session(Database())
    s.sql("create table shapes (id int, g varchar(120))")
    s.sql("""insert into shapes values
        (1, 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
        (2, 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'),
        (3, 'LINESTRING (0 0, 3 4, 3 10)')""")
    r = s.sql("select id, st_area(g), st_length(g) from shapes order by id")
    assert r.rows[0][1] == 16.0 and r.rows[0][2] == 16.0
    assert r.rows[1][1] == 15.0 and r.rows[1][2] == 20.0
    assert r.rows[2][1] == 0.0 and abs(r.rows[2][2] - 11.0) < 1e-12
    r2 = s.sql("select st_astext(st_centroid(g)) from shapes where id = 1")
    assert r2.rows == [("POINT (2 2)",)]
    r3 = s.sql("select st_envelope(g) from shapes where id = 3")
    assert parse_wkt(r3.rows[0][0]).bbox == (0.0, 0.0, 3.0, 10.0)
    r4 = s.sql("select st_numpoints(g) from shapes where id = 1")
    assert r4.rows == [(5,)]


def test_host_metrics_match_reference_math():
    rng = np.random.default_rng(5)
    pts = rng.random((8, 2)) * 10
    hull = pts[np.argsort(np.arctan2(pts[:, 1] - 5, pts[:, 0] - 5))]
    ring = np.vstack([hull, hull[:1]])
    w = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"
    g = parse_wkt(w)
    x, y = ring[:-1, 0], ring[:-1, 1]
    want = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    assert abs(geom_area(g) - want) < 1e-9
    segs = np.hypot(np.diff(ring[:, 0]), np.diff(ring[:, 1])).sum()
    assert abs(geom_length(g) - segs) < 1e-9


def test_geomfromtext_validates():
    s = mk()
    r = s.sql("select st_astext(st_geomfromtext('POINT(2    3)')) "
              "from pts where id = 1")
    assert r.rows == [("POINT (2 3)",)]
    with pytest.raises(Exception):
        s.sql("select st_geomfromtext('NOTAGEOM(1)') from pts")
