"""sysmon: query timeout and stop (reference: mal_runtime.c QRYqueue,
modules/mal/sysmon.c, sql/scripts/26_sysmon.sql)."""

import threading
import time

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.sql.syscat import QUEUE, QueryKilled
from monetdb_tpu.storage import Database
from monetdb_tpu.udf import UDF


def _slow_session():
    s = Session(Database())
    s.sql("create table t (a int)")
    s.sql("insert into t values (1), (2), (3)")
    from monetdb_tpu.dtypes import I64

    def slow(x):
        time.sleep(0.15)
        return x
    s.db.create_function(UDF("slow", slow, I64, ["x"], [I64], None))
    return s


def test_query_timeout():
    s = _slow_session()
    s.sql("call sys.setquerytimeout(0.05)")
    with pytest.raises(QueryKilled):
        # two plan operators with a slow UDF between checks
        s.sql("select slow(a) from t where slow(a) > 0 order by a")
    s.sql("call sys.setquerytimeout(0)")
    assert s.sql("select count(*) from t").rows == [(3,)]


def test_query_stop():
    s = _slow_session()
    errors = []

    def run():
        try:
            s.sql("select slow(a) from t where slow(a) > 0 "
                  "union select slow(a) from t where slow(a) < 99")
        except QueryKilled:
            errors.append("killed")

    th = threading.Thread(target=run)
    th.start()
    # find the running tag and stop it
    deadline = time.time() + 5
    tag = None
    while time.time() < deadline and tag is None:
        tags = [t for t, (q, _t0) in QUEUE.running.items() if "slow" in q]
        tag = tags[0] if tags else None
        time.sleep(0.01)
    assert tag is not None
    QUEUE.stop(tag)
    th.join(timeout=10)
    assert errors == ["killed"]


def test_queue_status_reflects_abort():
    s = _slow_session()
    s.sql("call sys.setquerytimeout(0.01)")
    with pytest.raises(QueryKilled):
        s.sql("select slow(a) from t where slow(a) > 0 order by a")
    s.sql("call sys.setquerytimeout(0)")
    r = s.sql("select status from sys.queue where status = 'aborted'")
    assert len(r.rows) >= 1
