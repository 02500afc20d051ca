"""Debezium / Canal wire-format adapter tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.formats import from_canal, from_debezium

PKS = {"orders": ["o_orderkey"], "lineitem": ["l_orderkey", "l_linenumber"]}


def _df(spark, messages):
    return spark.createDataFrame([(json.dumps(m),) for m in messages], "value string")


class TestDebezium:
    def _msg(self, op, before, after, pos=100, table="orders"):
        return {
            "op": op,
            "ts_ms": 1704067200000,
            "before": before,
            "after": after,
            "source": {"db": "testdb", "table": table, "file": "binlog.000001", "pos": pos, "gtid": None},
        }

    def test_create_update_delete(self, spark):
        msgs = [
            self._msg("c", None, {"o_orderkey": 1, "o_totalprice": 10.5}, pos=1),
            self._msg("u", {"o_orderkey": 1, "o_totalprice": 10.5}, {"o_orderkey": 1, "o_totalprice": 99.0}, pos=2),
            self._msg("d", {"o_orderkey": 1, "o_totalprice": 99.0}, None, pos=3),
            self._msg("r", None, {"o_orderkey": 2, "o_totalprice": 7.0}, pos=4),  # snapshot read
        ]
        env = from_debezium(_df(spark, msgs), PKS)
        rows = {r.pos_offset: r for r in env.collect()}
        assert [rows[i].op for i in (1, 2, 3, 4)] == ["I", "U", "D", "I"]
        assert rows[1].key == '{"o_orderkey":1}'
        assert rows[3].key == '{"o_orderkey":1}'  # delete keys from before image
        assert json.loads(rows[2].after)["o_totalprice"] == 99.0
        assert rows[1].db == "testdb" and rows[1].pos_file == "binlog.000001"
        assert str(rows[1].ts) == "2024-01-01 00:00:00"

    def test_composite_key(self, spark):
        m = self._msg("c", None, {"l_orderkey": 5, "l_linenumber": 2, "l_quantity": 3.0}, pos=9, table="lineitem")
        env = from_debezium(_df(spark, [m]), PKS)
        assert env.first().key == '{"l_orderkey":5,"l_linenumber":2}'

    def test_unknown_table_null_key(self, spark):
        m = self._msg("c", None, {"x": 1}, pos=9, table="mystery")
        assert from_debezium(_df(spark, [m]), PKS).first().key is None


class TestCanal:
    def _msg(self, typ, data, old=None, table="orders"):
        return {
            "type": typ,
            "database": "testdb",
            "table": table,
            "es": 1704067200123,
            "ts": 1704067200456,
            "data": data,
            "old": old,
            "pkNames": ["o_orderkey"],
        }

    def test_multi_row_insert_explodes(self, spark):
        m = self._msg("INSERT", [{"o_orderkey": 1, "v": "a"}, {"o_orderkey": 2, "v": "b"}, {"o_orderkey": 3, "v": "c"}])
        env = from_canal(_df(spark, [m]), PKS)
        rows = env.orderBy("key").collect()
        assert len(rows) == 3  # ALL rows explode (reference bug fixed)
        assert [r.op for r in rows] == ["I", "I", "I"]
        assert rows[0].key == '{"o_orderkey":1}'

    def test_update_carries_old_and_new(self, spark):
        m = self._msg(
            "UPDATE",
            [{"o_orderkey": 1, "v": "new"}],
            old=[{"o_orderkey": 1, "v": "old"}],
        )
        r = from_canal(_df(spark, [m]), PKS).first()
        assert r.op == "U"
        assert json.loads(r.after)["v"] == "new"
        assert json.loads(r.before)["v"] == "old"

    def test_delete_image_in_data(self, spark):
        m = self._msg("DELETE", [{"o_orderkey": 9, "v": "gone"}])
        r = from_canal(_df(spark, [m]), PKS).first()
        assert r.op == "D"
        assert r.after is None
        assert json.loads(r.before)["v"] == "gone"
        assert r.key == '{"o_orderkey":9}'

    def test_es_is_position(self, spark):
        m = self._msg("INSERT", [{"o_orderkey": 1}])
        r = from_canal(_df(spark, [m]), PKS).first()
        assert r.pos_offset == 1704067200123
