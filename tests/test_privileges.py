"""Users, roles, GRANT/REVOKE enforcement (sql_user.c, sql_privileges.c,
mal_authorize.c): SELECT checked at bind, DML at session, views run with
definer rights, roles via SET ROLE and memberships."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    db = Database()
    admin = Session(db)
    admin.sql("create table t (a int)")
    admin.sql("insert into t values (1), (2)")
    admin.sql("create user alice with password 'pw'")
    admin.sql("create user bob with password 'pw2'")
    return db, admin


def test_select_denied_then_granted():
    db, admin = mk()
    alice = Session(db, user="alice")
    with pytest.raises(Exception, match="access denied"):
        alice.sql("select * from t")
    admin.sql("grant select on t to alice")
    assert alice.sql("select count(*) from t").rows == [(2,)]
    admin.sql("revoke select on t from alice")
    with pytest.raises(Exception, match="access denied"):
        alice.sql("select * from t")


def test_dml_privileges():
    db, admin = mk()
    alice = Session(db, user="alice")
    admin.sql("grant select on t to alice")
    with pytest.raises(PermissionError):
        alice.sql("insert into t values (3)")
    admin.sql("grant insert, delete on t to alice")
    alice.sql("insert into t values (3)")
    alice.sql("delete from t where a = 3")
    with pytest.raises(PermissionError):
        alice.sql("update t set a = 9")
    admin.sql("grant update on t to alice")
    assert alice.sql("update t set a = a + 1") == 2


def test_owner_has_all_rights():
    db, admin = mk()
    alice = Session(db, user="alice")
    alice.sql("create table mine (x int)")
    alice.sql("insert into mine values (1)")
    assert alice.sql("select x from mine").rows == [(1,)]
    alice.sql("grant select on mine to bob")      # owner can grant
    bob = Session(db, user="bob")
    assert bob.sql("select x from mine").rows == [(1,)]


def test_roles():
    db, admin = mk()
    admin.sql("create role readers")
    admin.sql("grant select on t to readers")
    alice = Session(db, user="alice")
    with pytest.raises(Exception, match="access denied"):
        alice.sql("select * from t")
    admin.sql("grant readers to alice")
    assert alice.sql("select count(*) from t").rows == [(2,)]
    alice.sql("set role readers")                 # explicit role switch ok
    admin.sql("revoke readers from alice")
    with pytest.raises(Exception):
        Session(db, user="alice").sql("select * from t")


def test_public_grants():
    db, admin = mk()
    admin.sql("grant select on t to public")
    assert Session(db, user="bob").sql("select count(*) from t").rows == \
        [(2,)]


def test_view_definer_rights():
    db, admin = mk()
    admin.sql("create view v as select a from t where a > 1")
    admin.sql("grant select on v to alice")
    alice = Session(db, user="alice")
    # alice has no right on t, but the view runs with definer rights
    assert alice.sql("select a from v").rows == [(2,)]
    with pytest.raises(Exception, match="access denied"):
        alice.sql("select a from t")


def test_non_admin_cannot_manage_users():
    db, admin = mk()
    alice = Session(db, user="alice")
    with pytest.raises(PermissionError):
        alice.sql("create user eve with password 'x'")
    with pytest.raises(PermissionError):
        alice.sql("create role r1")
    with pytest.raises(PermissionError):
        alice.sql("grant select on t to bob")


def test_grants_durable(tmp_path):
    p = str(tmp_path / "db")
    db = Database(p)
    admin = Session(db)
    admin.sql("create table t (a int)")
    admin.sql("insert into t values (1)")
    admin.sql("create user alice with password 'pw'")
    admin.sql("grant select on t to alice")
    db.checkpoint()
    db.close()
    db2 = Database(p)
    assert Session(db2, user="alice").sql("select a from t").rows == [(1,)]
    assert "alice" in db2.users
    db2.close()
