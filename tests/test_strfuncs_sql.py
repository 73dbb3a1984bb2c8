"""Extended string functions (batstr.c / str.c / pcre.c parity set) and
SQL scalar functions (rel_psm.c, inlined at bind time)."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b varchar(10), c varchar(10))")
    s.sql("insert into t values (1,'abc','XY'), (2,'hello',null)")
    return s


def test_concat_column_column():
    s = mk()
    assert s.sql("select b || c from t order by a").rows == \
        [("abcXY",), (None,)]
    assert s.sql("select concat(b, c) from t where a = 1").rows == \
        [("abcXY",)]


def test_concat_scalar_prefix():
    s = mk()
    assert s.sql("select 'p-' || b from t order by a").rows == \
        [("p-abc",), ("p-hello",)]


def test_left_right_repeat_reverse():
    s = mk()
    assert s.sql("select left(b,2), right(b,2), repeat(b,2), reverse(b) "
                 "from t where a=1").rows == [("ab", "bc", "abcabc", "cba")]


def test_ascii_splitpart_insert():
    s = mk()
    assert s.sql("select ascii(b) from t where a=1").rows == [(97,)]
    assert s.sql("select splitpart('a|b|c','|',2)").rows == [("b",)]
    assert s.sql("select splitpart('a|b|c','|',9)").rows == [("",)]
    assert s.sql("select insert('abcdef',2,2,'ZZ')").rows == [("abZZef",)]


def test_regexp():
    s = mk()
    assert s.sql("select regexp_replace(b,'[aeiou]','_') from t "
                 "where a=2").rows == [("h_ll_",)]


def test_predicates():
    s = mk()
    assert s.sql("select a from t where startswith(b,'he')").rows == [(2,)]
    assert s.sql("select a from t where endswith(b,'bc')").rows == [(1,)]
    assert s.sql("select a from t where contains(b,'ell')").rows == [(2,)]


def test_md5():
    s = mk()
    import hashlib
    exp = hashlib.md5(b"abc").hexdigest()
    assert s.sql("select md5(b) from t where a=1").rows == [(exp,)]


def test_sql_scalar_function():
    s = mk()
    s.sql("create function double_it(x int) returns int "
          "begin return x * 2; end")
    assert s.sql("select double_it(a) from t order by a").rows == \
        [(2,), (4,)]
    s.sql("create function taxed(p int, rate int) returns int "
          "return p + p * rate / 100")
    assert s.sql("select taxed(100, 10)").rows == [(110,)]
    # composition: SQL function calling another
    s.sql("create function quad(x int) returns int return double_it("
          "double_it(x))")
    assert s.sql("select quad(3)").rows == [(12,)]
    s.sql("drop function double_it")
    with pytest.raises(Exception):
        s.sql("select double_it(1)")


def test_sql_function_durable(tmp_path):
    p = str(tmp_path / "db")
    s = Session(Database(p))
    s.sql("create function tri(x int) returns int return x * 3")
    s.db.checkpoint()
    s.db.close()
    s2 = Session(Database(p))
    assert s2.sql("select tri(5)").rows == [(15,)]
    s2.db.close()


def test_like_vectorized_matches_regex_oracle():
    """The vectorized %-pattern path (strimps role, gdk_strimps.c:13-64)
    must agree with the regex oracle on every pattern shape it claims."""
    import re

    import numpy as np

    from monetdb_tpu.ops.strfuncs import _like_mask_vectorized, like_regex

    rng = np.random.default_rng(0)
    vals = np.array(
        ["".join(rng.choice(list("abcxyz "), size=rng.integers(0, 12)))
         for _ in range(2000)])
    pats = ["%a%", "a%", "%a", "abc", "", "%", "%%", "a%b", "%a%b%",
            "a%b%c", "%ab%ba%", "ab%", "%ba", "abc%a%", "%%a%%b%%", "a",
            "aa%aa", "% %", "x%y%z"]
    for p in pats:
        rx = re.compile(like_regex(p, None).pattern, re.DOTALL)
        want = np.array([rx.match(v) is not None for v in vals.tolist()])
        got = _like_mask_vectorized(vals, p, None, False)
        assert got is not None and np.array_equal(got, want), p
    # '_' and escape patterns must defer to the regex fallback
    assert _like_mask_vectorized(vals, "a_c", None, False) is None
    assert _like_mask_vectorized(vals, "a%b", "#", False) is None
    # ILIKE lowers both sides
    got = _like_mask_vectorized(np.array(["ABC", "abq"]), "%b%", None, True)
    assert got.tolist() == [True, True]
