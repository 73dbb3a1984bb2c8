"""Parser coverage: all 22 TPC-H queries must parse."""

import pytest

from monetdb_tpu.bench.tpch_queries import QUERIES
from monetdb_tpu.sql.parser import parse, parse_expr
from monetdb_tpu.sql.ast import SelectStmt, CreateTable, CopyFrom
from monetdb_tpu.plan.exprs import (Between, BinOp, BoolOp, Case, Cmp, Const,
                                    InList, Like, Subquery)


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_tpch_parses(qid):
    stmt = parse(QUERIES[qid])
    assert isinstance(stmt, SelectStmt)
    assert stmt.items


def test_expr_precedence():
    e = parse_expr("1 + 2 * 3")
    assert isinstance(e, BinOp) and e.op == "+"
    assert isinstance(e.right, BinOp) and e.right.op == "*"


def test_and_or():
    e = parse_expr("a = 1 and b = 2 or c = 3")
    assert isinstance(e, BoolOp) and e.op == "or"
    assert isinstance(e.args[0], BoolOp) and e.args[0].op == "and"


def test_between_not_like():
    e = parse_expr("x not between 1 and 2")
    assert isinstance(e, Between) and e.negated
    e = parse_expr("y not like 'abc%'")
    assert isinstance(e, Like) and e.negated


def test_in_subquery():
    e = parse_expr("x in (select a from t)")
    assert isinstance(e, Subquery) and e.kind == "in"


def test_case():
    e = parse_expr("case when a = 1 then 'x' else 'y' end")
    assert isinstance(e, Case) and len(e.whens) == 1


def test_decimal_literal():
    e = parse_expr("0.06")
    assert isinstance(e, Const)
    assert e.ctype.scale == 2


def test_create_table():
    stmt = parse("""create table t (a int not null, b decimal(15,2),
                    c varchar(25), primary key (a))""")
    assert isinstance(stmt, CreateTable)
    assert [c[0] for c in stmt.columns] == ["a", "b", "c"]
    assert stmt.columns[0][2]["notnull"] is True
    assert stmt.columns[0][2]["pk"] is True      # table-level PRIMARY KEY


def test_copy():
    stmt = parse("copy 100 records into t from 'f.csv' delimiters '|'")
    assert isinstance(stmt, CopyFrom)
    assert stmt.records == 100 and stmt.delimiter == "|"


def test_setop():
    stmt = parse("select a from t union all select b from u order by 1")
    assert stmt.setops and stmt.setops[0][0] == "union_all"
