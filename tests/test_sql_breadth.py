"""SQL breadth: CTEs, VALUES, FULL/RIGHT joins, conditional functions
(COALESCE/NULLIF/GREATEST/LEAST), ILIKE, POSITION, date/time functions,
interval arithmetic, TIME type, 2-ary aggregates (quantile/corr/covar/
group_concat), uncorrelated EXISTS, SELECT without FROM, TRUNCATE.

Oracle: exact expected values (reference behavior per sql_parser.y /
gdk_aggr.c / gdk_time.c / modules/mal/pcre.c)."""

import datetime
import math
from decimal import Decimal

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b varchar(10), d date, ts timestamp)")
    s.sql("insert into t values "
          "(1, 'abc', date '2024-01-05', timestamp '2024-01-05 10:30:00'), "
          "(2, 'xyz', date '2024-03-15', timestamp '2024-03-15 23:59:59'), "
          "(3, null, null, null)")
    return s


# ---------------------------------------------------------------------------
# statement shapes
# ---------------------------------------------------------------------------

def test_select_without_from():
    s = Session(Database())
    assert s.sql("select 1, 'x', 2 + 3").rows == [(1, "x", 5)]


def test_cte_basic():
    s = mk()
    r = s.sql("with c as (select a from t where a < 3) "
              "select sum(a) from c")
    assert r.rows == [(3,)]


def test_cte_column_aliases_and_chain():
    s = mk()
    r = s.sql("with c1(x) as (select a + 1 from t), "
              "c2 as (select x * 2 as y from c1) "
              "select max(y) from c2")
    assert r.rows == [(8,)]


def test_cte_multiple_uses():
    s = mk()
    r = s.sql("with c as (select a from t) "
              "select c1.a from c c1 join c c2 on c1.a = c2.a "
              "order by c1.a")
    assert [x[0] for x in r.rows] == [1, 2, 3]


def test_with_recursive_rejected():
    s = mk()
    with pytest.raises(Exception):
        s.sql("with recursive c(n) as (select 1) select * from c")


def test_values_source():
    s = Session(Database())
    r = s.sql("select x, y from (values (1, 'a'), (2, 'b'), (3, 'a')) "
              "as v(x, y) where y = 'a' order by x")
    assert r.rows == [(1, "a"), (3, "a")]


def test_values_aggregate():
    s = Session(Database())
    r = s.sql("select y, sum(x) from (values (1, 'a'), (2, 'b'), (3, 'a')) "
              "as v(x, y) group by y order by y")
    assert r.rows == [("a", 4), ("b", 2)]


def test_truncate():
    s = mk()
    assert s.sql("truncate table t") == 3
    assert s.sql("select count(*) from t").rows == [(0,)]


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def test_full_outer_join():
    s = Session(Database())
    s.sql("create table l (a int)")
    s.sql("create table r (b int)")
    s.sql("insert into l values (1), (2)")
    s.sql("insert into r values (2), (3)")
    r = s.sql("select a, b from l full outer join r on a = b")
    assert sorted(r.rows, key=lambda x: (x[0] is None, x[0] or 0)) == \
        [(1, None), (2, 2), (None, 3)]


def test_right_join():
    s = Session(Database())
    s.sql("create table l (a int)")
    s.sql("create table r (b int)")
    s.sql("insert into l values (1), (2)")
    s.sql("insert into r values (2), (3)")
    r = s.sql("select a, b from l right join r on a = b")
    assert sorted(r.rows, key=lambda x: x[1]) == [(2, 2), (None, 3)]


def test_outer_join_non_equi_on():
    s = Session(Database())
    s.sql("create table f (a int)")
    s.sql("insert into f values (1), (2)")
    r = s.sql("select f1.a, f2.a from f f1 "
              "full outer join f f2 on f1.a = f2.a + 1")
    assert sorted(r.rows, key=lambda x: (x[0] is None, x[0] or 0)) == \
        [(1, None), (2, 1), (None, 2)]


def test_duplicate_output_names():
    s = Session(Database())
    s.sql("create table f (a int)")
    s.sql("insert into f values (1), (2)")
    r = s.sql("select f1.a, f2.a from f f1 join f f2 on f1.a = f2.a "
              "order by f1.a")
    assert r.names == ["a", "a"]
    assert r.rows == [(1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# conditional scalar functions
# ---------------------------------------------------------------------------

def test_coalesce_numeric():
    s = mk()
    r = s.sql("select coalesce(d, date '2000-01-01') from t order by a")
    assert r.rows[2] == (datetime.date(2000, 1, 1),)


def test_coalesce_strings():
    s = mk()
    r = s.sql("select coalesce(b, 'none') from t order by a")
    assert [x[0] for x in r.rows] == ["abc", "xyz", "none"]


def test_nullif_greatest_least():
    s = mk()
    r = s.sql("select nullif(a, 2), greatest(a, 2), least(a, 2) from t "
              "order by a")
    assert r.rows == [(1, 2, 1), (None, 2, 2), (3, 3, 2)]


def test_greatest_strings():
    s = mk()
    r = s.sql("select greatest(b, 'mmm') from t where b is not null "
              "order by a")
    assert [x[0] for x in r.rows] == ["mmm", "xyz"]


def test_case_string_result():
    s = mk()
    r = s.sql("select case when a = 1 then 'one' when a = 2 then b "
              "else 'many' end from t order by a")
    assert [x[0] for x in r.rows] == ["one", "xyz", "many"]


# ---------------------------------------------------------------------------
# strings
# ---------------------------------------------------------------------------

def test_ilike():
    s = mk()
    r = s.sql("select a from t where b ilike 'A%'")
    assert r.rows == [(1,)]
    r = s.sql("select a from t where b not ilike 'A%'")
    assert r.rows == [(2,)]        # NOT ILIKE excludes the NULL row


def test_position():
    s = mk()
    r = s.sql("select position('b' in b) from t where a < 3 order by a")
    assert r.rows == [(2,), (0,)]


# ---------------------------------------------------------------------------
# date/time
# ---------------------------------------------------------------------------

def test_interval_arithmetic():
    s = mk()
    r = s.sql("select d + interval '1' month, d - interval '10' day, "
              "ts + interval '90' minute from t where a = 1")
    assert r.rows == [(datetime.date(2024, 2, 5), datetime.date(2023, 12, 26),
                       datetime.datetime(2024, 1, 5, 12, 0))]


def test_interval_month_clamp():
    s = Session(Database())
    r = s.sql("select date '2024-01-31' + interval '1' month")
    assert r.rows == [(datetime.date(2024, 2, 29),)]


def test_date_functions():
    s = mk()
    r = s.sql("select year(d), month(d), day(d), quarter(d), "
              "dayofweek(d), dayofyear(d), week(d) from t where a = 1")
    # 2024-01-05 is a Friday (ISO dow 5), day-of-year 5, ISO week 1
    assert r.rows == [(2024, 1, 5, 1, 5, 5, 1)]


def test_extract_time_parts():
    s = mk()
    r = s.sql("select extract(hour from ts), extract(minute from ts), "
              "extract(second from ts) from t where a = 2")
    assert r.rows == [(23, 59, 59)]


def test_epoch_and_trunc():
    s = mk()
    r = s.sql("select epoch(ts), date_trunc('month', ts) from t where a = 1")
    assert r.rows == [(1704450600, datetime.datetime(2024, 1, 1))]


def test_time_type():
    s = Session(Database())
    s.sql("create table tt (t time)")
    s.sql("insert into tt values (time '12:30:05'), (null)")
    r = s.sql("select t, extract(hour from t) from tt order by t")
    # nil sorts first ascending (sentinel = smallest, GDK nil ordering)
    assert r.rows[0] == (None, None)
    assert r.rows[1] == (datetime.time(12, 30, 5), 12)


def test_date_difference_days():
    s = mk()
    r = s.sql("select d - date '2024-01-01' from t where a = 2")
    assert r.rows == [(74,)]


# ---------------------------------------------------------------------------
# aggregates
# ---------------------------------------------------------------------------

def test_quantile():
    s = Session(Database())
    s.sql("create table q (v int)")
    s.sql("insert into q values (1), (2), (3), (4), (5)")
    assert s.sql("select quantile(v, 0.5) from q").rows == [(3.0,)]
    assert s.sql("select quantile(v, 0.25) from q").rows == [(2.0,)]


def test_corr_covar():
    s = Session(Database())
    s.sql("create table q (x int, y int)")
    s.sql("insert into q values (1, 2), (2, 4), (3, 6)")
    r = s.sql("select corr(x, y), covar_samp(x, y), covar_pop(x, y) from q")
    c, cs, cp = r.rows[0]
    assert math.isclose(c, 1.0)
    assert math.isclose(cs, 2.0)
    assert math.isclose(cp, 4.0 / 3.0)


def test_group_concat():
    s = mk()
    r = s.sql("select group_concat(b, ';') from t")
    assert r.rows == [("abc;xyz",)]


def test_quantile_grouped():
    s = Session(Database())
    s.sql("create table q (g int, v int)")
    s.sql("insert into q values (1,1),(1,3),(2,10),(2,20),(2,30)")
    r = s.sql("select g, quantile(v, 0.5) from q group by g order by g")
    assert r.rows == [(1, 2.0), (2, 20.0)]


# ---------------------------------------------------------------------------
# subqueries
# ---------------------------------------------------------------------------

def test_uncorrelated_exists():
    s = mk()
    assert len(s.sql("select a from t where exists "
                     "(select 1 from t where a > 2)").rows) == 3
    assert s.sql("select a from t where exists "
                 "(select 1 from t where a > 99)").rows == []
    assert len(s.sql("select a from t where not exists "
                     "(select 1 from t where a > 99)").rows) == 3
