"""Unit tests: table-filter wildcard/regex truth table and DDL classifier."""

from __future__ import annotations

from xxt_cdc_spark.model.table_id import TableId
from xxt_cdc_spark.operators.ddl import DDLStrategy, classify_ddl
from xxt_cdc_spark.operators.table_filter import TableFilter


class TestTableFilter:
    """Mirror of the reference truth table (filter/TableFilter.scala:51-88):
    exclude wins; empty include = include-all; '*' / '?' wildcards."""

    def test_empty_filter_includes_all(self):
        tf = TableFilter()
        assert tf.should_include(TableId("any", "thing"))

    def test_include_only(self):
        tf = TableFilter(include_tables=["orders", "lineitem*"])
        assert tf.should_include(TableId("d", "orders"))
        assert tf.should_include(TableId("d", "lineitem_2024"))
        assert not tf.should_include(TableId("d", "orders2"))
        assert not tf.should_include(TableId("d", "customer"))

    def test_exclude_wins_over_include(self):
        tf = TableFilter(include_tables=["orders*"], exclude_tables=["orders_backup"])
        assert tf.should_include(TableId("d", "orders"))
        assert not tf.should_include(TableId("d", "orders_backup"))

    def test_question_mark_wildcard(self):
        tf = TableFilter(include_tables=["t?bl"])
        assert tf.should_include(TableId("d", "tabl"))
        assert not tf.should_include(TableId("d", "taabl"))

    def test_db_filters(self):
        tf = TableFilter(include_databases=["prod*"], exclude_databases=["prod_tmp"])
        assert tf.should_include(TableId("prod_main", "t"))
        assert not tf.should_include(TableId("prod_tmp", "t"))
        assert not tf.should_include(TableId("staging", "t"))

    def test_regex_metachars_are_literal(self):
        tf = TableFilter(include_tables=["a.b"])  # '.' must be literal
        assert tf.should_include(TableId("d", "a.b"))
        assert not tf.should_include(TableId("d", "axb"))

    def test_filter_tables_and_stats(self):
        tf = TableFilter(include_tables=["orders"])
        out = tf.filter_tables([TableId("d", "orders"), TableId("d", "x")])
        assert out == [TableId("d", "orders")]
        assert tf.stats == {"evaluated": 2, "included": 1, "excluded": 1}

    def test_validate(self):
        tf = TableFilter(include_tables=["x", " "], exclude_tables=["x"])
        problems = tf.validate()
        assert any("empty pattern" in p for p in problems)
        assert any("both include and exclude" in p for p in problems)


class TestDDLClassifier:
    def test_create_with_db(self):
        e = classify_ddl("CREATE TABLE testdb.orders (id INT)")
        assert (e.ddl_type, e.database, e.table, e.severity) == ("CREATE_TABLE", "testdb", "orders", "INFO")

    def test_backticks(self):
        e = classify_ddl("ALTER TABLE `testdb`.`lineitem` DROP COLUMN y")
        assert (e.ddl_type, e.database, e.table) == ("ALTER_TABLE", "testdb", "lineitem")

    def test_drop_truncate_critical(self):
        assert classify_ddl("DROP TABLE IF EXISTS t").severity == "CRITICAL"
        assert classify_ddl("TRUNCATE sessions").severity == "CRITICAL"
        assert classify_ddl("truncate table audit").table == "audit"

    def test_indexes(self):
        assert classify_ddl("CREATE UNIQUE INDEX i ON users (e)").ddl_type == "CREATE_INDEX"
        assert classify_ddl("DROP INDEX i ON customer").table == "customer"

    def test_non_ddl_ignored(self):
        assert classify_ddl("INSERT INTO t VALUES (1)") is None
        assert classify_ddl("BEGIN") is None
        assert classify_ddl("") is None

    def test_default_db(self):
        e = classify_ddl("DROP TABLE t", default_db="mydb")
        assert e.database == "mydb"

    def test_strategies_exist(self):
        assert {s.value for s in DDLStrategy} == {"IGNORE", "LOG", "ALERT", "FAIL", "APPLY"}


class TestAdditiveDdlApply:
    """The beyond-reference DDLStrategy.APPLY: additive ALTERs evolve
    the sink; EVERYTHING else — destructive or ambiguous — still only
    alerts, exactly the reference's detect-only posture."""

    def _handle(self, sql, strategy, applied, alerted):
        from xxt_cdc_spark.operators.ddl import classify_ddl, handle_ddl

        return handle_ddl(
            classify_ddl(sql),
            strategy,
            apply_fn=lambda e, cols: applied.append((e.table, cols)),
            alert_fn=lambda e: alerted.append(e.sql),
        )

    def test_additive_alter_applies(self):
        from xxt_cdc_spark.operators.ddl import DDLStrategy

        applied, alerted = [], []
        action = self._handle(
            "ALTER TABLE orders ADD COLUMN x BIGINT, ADD y DECIMAL(10,2)",
            DDLStrategy.APPLY, applied, alerted,
        )
        assert action == "applied"
        assert applied == [("orders", [("x", "BIGINT"), ("y", "DECIMAL(10,2)")])]
        assert alerted == []

    def test_destructive_ddl_still_only_alerts_under_apply(self):
        from xxt_cdc_spark.operators.ddl import DDLStrategy

        for sql in (
            "DROP TABLE orders",
            "TRUNCATE TABLE orders",
            "ALTER TABLE orders DROP COLUMN x",
            "ALTER TABLE orders ADD COLUMN a INT, DROP COLUMN b",  # mixed: all-or-nothing
            "RENAME TABLE orders TO orders2",
        ):
            applied, alerted = [], []
            assert self._handle(sql, DDLStrategy.APPLY, applied, alerted) == "alerted"
            assert applied == [] and alerted == [sql]

    def test_ignore_log_fail_parity_preserved(self):
        import pytest

        from xxt_cdc_spark.operators.ddl import DDLStrategy, classify_ddl, handle_ddl

        ev = classify_ddl("ALTER TABLE orders ADD COLUMN x INT")
        assert handle_ddl(ev, DDLStrategy.IGNORE) == "ignored"
        logged = []
        assert handle_ddl(ev, DDLStrategy.LOG, log_fn=logged.append) == "logged"
        assert logged == [ev]
        with pytest.raises(RuntimeError, match="strategy=FAIL"):
            handle_ddl(ev, DDLStrategy.FAIL)

    def test_apply_is_idempotent_on_replay(self, tmp_path):
        """Re-delivering the same additive DDL (micro-batch replay)
        must be a no-op, not a duplicate-column error."""
        import sqlite3

        from xxt_cdc_spark.sinks.schema_evolution import apply_additive_ddl

        db = str(tmp_path / "evo.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY)")
        con.commit()
        con.close()
        cols = [("x", "BIGINT"), ("y", "TEXT")]
        assert apply_additive_ddl(lambda: sqlite3.connect(db), "t", cols) == ["x", "y"]
        assert apply_additive_ddl(lambda: sqlite3.connect(db), "t", cols) == []
        con = sqlite3.connect(db)
        names = [r[1] for r in con.execute("PRAGMA table_info(t)").fetchall()]
        con.close()
        assert names == ["id", "x", "y"]

    def test_apply_quotes_reserved_word_columns(self, tmp_path):
        """MySQL binlog DDL backtick-quotes identifiers; the re-emitted
        sink ALTER must quote them too or a reserved-word column (`order`)
        turns a valid additive ALTER into a stream-killing syntax error."""
        import sqlite3

        from xxt_cdc_spark.operators.ddl import DDLStrategy, classify_ddl, handle_ddl, parse_add_columns
        from xxt_cdc_spark.sinks.schema_evolution import apply_additive_ddl

        assert parse_add_columns("ALTER TABLE t ADD COLUMN `order` INT") == [("order", "INT")]
        db = str(tmp_path / "q.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY)")
        con.commit()
        con.close()
        ev = classify_ddl("ALTER TABLE t ADD COLUMN `order` INT, ADD `group` TEXT")
        action = handle_ddl(
            ev, DDLStrategy.APPLY,
            apply_fn=lambda e, cols: apply_additive_ddl(lambda: sqlite3.connect(db), e.table, cols),
        )
        assert action == "applied"
        con = sqlite3.connect(db)
        names = [r[1] for r in con.execute("PRAGMA table_info(t)").fetchall()]
        con.close()
        assert names == ["id", "order", "group"]
