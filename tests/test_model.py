"""Unit tests for the data model: positions, states, type mapping, table ids."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from xxt_cdc_spark.model import (
    BinlogPosition,
    CDCState,
    FilePosition,
    GTIDPosition,
    OffsetState,
    TableId,
    mysql_to_spark_type,
    spark_to_mysql_type,
)
from xxt_cdc_spark.model.states import InvalidTransition
from xxt_cdc_spark.model.types import spark_to_starrocks_type


class TestPositions:
    def test_file_position_total_order(self):
        a = FilePosition("binlog.000001", 100)
        b = FilePosition("binlog.000001", 200)
        c = FilePosition("binlog.000002", 50)
        assert a < b < c
        assert not (c < a)

    def test_round_trip(self):
        for p in (FilePosition("binlog.000007", 12345), GTIDPosition("uuid:1-100")):
            assert BinlogPosition.parse(p.as_string()) == p

    def test_parse_filename_with_colons(self):
        p = FilePosition("host:binlog.01", 7)
        assert BinlogPosition.parse(p.as_string()) == p

    def test_gtid_lexicographic(self):
        assert GTIDPosition("a:1-5") < GTIDPosition("a:1-9")

    def test_parse_garbage(self):
        with pytest.raises(ValueError):
            BinlogPosition.parse("nope")


class TestStates:
    def test_snapshot_path(self):
        s = CDCState.INIT
        for nxt in (CDCState.SNAPSHOT, CDCState.CATCHUP, CDCState.STREAMING, CDCState.STOPPED):
            s = s.transition(nxt)
        assert s is CDCState.STOPPED

    def test_direct_streaming(self):
        assert CDCState.INIT.transition(CDCState.STREAMING) is CDCState.STREAMING

    def test_illegal(self):
        with pytest.raises(InvalidTransition):
            CDCState.INIT.transition(CDCState.CATCHUP)
        with pytest.raises(InvalidTransition):
            CDCState.STREAMING.transition(CDCState.SNAPSHOT)

    def test_offset_machine(self):
        s = OffsetState.RECEIVED.transition(OffsetState.APPLIED)
        assert s.transition(OffsetState.COMMITTED) is OffsetState.COMMITTED
        with pytest.raises(InvalidTransition):
            OffsetState.RECEIVED.transition(OffsetState.COMMITTED)


class TestTypeMapping:
    # full MySQLDataType variant table (reference model/MySQLDataType.scala:6-25)
    CASES = [
        ("TINYINT", T.ByteType()),
        ("tinyint(1)", T.BooleanType()),
        ("SMALLINT", T.ShortType()),
        ("MEDIUMINT", T.IntegerType()),
        ("INT", T.IntegerType()),
        ("int unsigned", T.LongType()),
        ("BIGINT", T.LongType()),
        ("bigint unsigned", T.DecimalType(20, 0)),
        ("DECIMAL(10,2)", T.DecimalType(10, 2)),
        ("FLOAT", T.FloatType()),
        ("DOUBLE", T.DoubleType()),
        ("VARCHAR(255)", T.StringType()),
        ("CHAR(8)", T.StringType()),
        ("TEXT", T.StringType()),
        ("LONGTEXT", T.StringType()),
        ("DATETIME", T.TimestampType()),
        ("TIMESTAMP", T.TimestampType()),
        ("DATE", T.DateType()),
        ("TIME", T.StringType()),
        ("JSON", T.StringType()),
        ("BLOB", T.BinaryType()),
        ("varbinary(16)", T.BinaryType()),
        ("ENUM('a','b')", T.StringType()),
        ("totally_unknown_type", T.StringType()),
    ]

    @pytest.mark.parametrize("native,expected", CASES)
    def test_mysql_to_spark(self, native, expected):
        assert mysql_to_spark_type(native) == expected

    def test_sink_direction(self):
        assert spark_to_mysql_type(T.DecimalType(10, 2)) == "DECIMAL(10,2)"
        assert spark_to_mysql_type(T.BooleanType()) == "TINYINT(1)"
        assert spark_to_mysql_type(T.TimestampType()) == "DATETIME(6)"

    def test_starrocks_decimal_buckets(self):
        assert spark_to_starrocks_type(T.DecimalType(9, 2)) == "DECIMAL32(9,2)"
        assert spark_to_starrocks_type(T.DecimalType(18, 2)) == "DECIMAL64(18,2)"
        assert spark_to_starrocks_type(T.DecimalType(20, 0)) == "DECIMAL128(20,0)"
        assert spark_to_starrocks_type(T.BinaryType()) == "STRING"
        assert spark_to_starrocks_type(T.ArrayType(T.IntegerType())) == "JSON"


class TestTableId:
    def test_parse(self):
        assert TableId.parse("db.tbl") == TableId("db", "tbl")
        with pytest.raises(ValueError):
            TableId.parse("no_dot")
