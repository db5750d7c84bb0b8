"""LakeSQL: the reference's %sql DML surface replayed as SQL strings —
the delta_lake_primer statement sequence verbatim-shaped
(02.delta_lake_primer.py:148,213,252,312-320,404-421,442)."""

from __future__ import annotations

import pytest

from lakehouses_spark.tables import LakeCatalog, LakeSQL, LakeSQLError


@pytest.fixture
def lake(spark, tmp_path):
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    df = spark.createDataFrame(
        [(1, "ana", 30000.0), (2, "luis", 40000.0), (3, "eva", 50000.0)],
        "id int, name string, salario double",
    )
    cat.create_table("bronze.emp", df)
    return LakeSQL(cat)


def test_sql_dml_sequence(spark, lake):
    lake.sql("INSERT INTO bronze.emp VALUES (4, 'joan', 60000.0)")
    lake.sql("DELETE FROM bronze.emp WHERE id = 2")
    lake.sql("UPDATE bronze.emp SET salario = salario * 1.10 WHERE id = 1")
    spark.createDataFrame(
        [(1, "ana maria", 99000.0), (5, "noa", 70000.0)],
        "id int, name string, salario double",
    ).createOrReplaceTempView("updates")
    lake.sql(
        """MERGE INTO bronze.emp t USING updates s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *"""
    )
    got = {
        r.id: (r.name, round(r.salario, 2))
        for r in lake.sql("SELECT * FROM bronze.emp").collect()
    }
    assert got == {
        1: ("ana maria", 99000.0),
        3: ("eva", 50000.0),
        4: ("joan", 60000.0),
        5: ("noa", 70000.0),
    }


def test_sql_merge_source_aliased_t(spark, lake):
    """ADVICE r2: a source alias that is literally 't' must not be clobbered
    by the target-alias rewrite (m.id -> t.id -> s.id would degenerate the ON
    condition into s.id = s.id and merge the wrong rows)."""
    spark.createDataFrame(
        [(3, "eva maria", 51000.0), (6, "iris", 45000.0)],
        "id int, name string, salario double",
    ).createOrReplaceTempView("updates_t")
    lake.sql(
        """MERGE INTO bronze.emp AS m USING updates_t AS t ON m.id = t.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *"""
    )
    got = {
        r.id: (r.name, round(r.salario, 2))
        for r in lake.sql("SELECT * FROM bronze.emp").collect()
    }
    assert got == {
        1: ("ana", 30000.0),
        2: ("luis", 40000.0),
        3: ("eva maria", 51000.0),
        6: ("iris", 45000.0),
    }
    with pytest.raises(LakeSQLError, match="share alias"):
        lake.sql("MERGE INTO bronze.emp AS x USING updates_t AS x ON x.id = x.id")


def test_sql_time_travel_and_describe(spark, lake):
    lake.sql("DELETE FROM bronze.emp WHERE id = 1")
    n_now = lake.sql("SELECT count(*) AS n FROM bronze.emp").collect()[0].n
    n_v0 = lake.sql(
        "SELECT count(*) AS n FROM bronze.emp VERSION AS OF 0"
    ).collect()[0].n
    assert (n_now, n_v0) == (2, 3)
    ops = [r.operation for r in lake.sql("DESCRIBE HISTORY bronze.emp").collect()]
    assert ops[0] == "CREATE TABLE AS SELECT" and "DELETE" in ops
    detail = lake.sql("DESCRIBE DETAIL bronze.emp").collect()[0]
    assert int(detail.num_records) == 2


def test_sql_aggregate_joins_passthrough(spark, lake):
    """Arbitrary SELECT (group/order/subquery) passes through to Catalyst."""
    out = lake.sql(
        """SELECT upper(name) AS who, round(salario / 1000, 1) AS k
           FROM bronze.emp WHERE salario >= (SELECT avg(salario) FROM bronze.emp)
           ORDER BY k DESC"""
    ).collect()
    assert [r.who for r in out] == ["EVA", "LUIS"]


def test_sql_vacuum_optimize(spark, lake):
    lake.sql("DELETE FROM bronze.emp WHERE id = 1")
    removed = lake.sql("VACUUM bronze.emp").collect()[0].files_removed
    assert removed >= 1
    res = lake.sql("OPTIMIZE bronze.emp").collect()[0]
    assert res.compacted_files >= 0
    files = lake.catalog.table("bronze.emp").files()
    assert files.count() >= 1 and "stats" in files.columns


def test_sql_ddl(spark, lake):
    """D10: the full DDL statement set through SQL (00.cleanup.py:3,
    03.iceberg_primer.py:68-105)."""
    lake.sql("CREATE DATABASE IF NOT EXISTS gold")
    assert [r.database for r in lake.sql("SHOW DATABASES").collect()] \
        == sorted(["bronze", "gold"])
    lake.sql("CREATE TABLE gold.rich AS SELECT * FROM bronze.emp WHERE salario > 35000")
    assert [r.table for r in lake.sql("SHOW TABLES IN gold").collect()] == ["rich"]
    assert lake.sql("SELECT count(*) AS n FROM gold.rich").collect()[0].n == 2
    lake.sql("DROP TABLE gold.rich")
    assert lake.sql("SHOW TABLES IN gold").count() == 0
    lake.sql("DROP DATABASE gold CASCADE")
    assert [r.database for r in lake.sql("SHOW DATABASES").collect()] == ["bronze"]


def test_sql_literals_containing_keywords(spark, lake):
    """VERDICT r2 directive #8: the classic regex-router traps — keywords
    and semicolons inside string literals, comments, wild case — must parse
    correctly or reject loudly, never silently do the wrong thing."""
    lake.sql("ALTER TABLE bronze.emp ADD COLUMN note string")
    # keyword WHERE inside a SET literal: must update ALL rows (no WHERE),
    # not split the statement at the quoted keyword
    lake.sql("UPDATE bronze.emp SET note = 'a WHERE b'")
    assert {r.note for r in lake.sql("SELECT note FROM bronze.emp").collect()} \
        == {"a WHERE b"}
    # DML keyword inside a literal + real WHERE after it
    lake.sql("UPDATE bronze.emp SET note = 'DELETE FROM x; DROP TABLE y' WHERE id = 1")
    got = {r.id: r.note for r in lake.sql("SELECT id, note FROM bronze.emp").collect()}
    assert got[1] == "DELETE FROM x; DROP TABLE y" and got[2] == "a WHERE b"
    assert lake.sql("SELECT count(*) AS n FROM bronze.emp").collect()[0].n == 3
    # semicolon inside a literal must not split the statement
    lake.sql("INSERT INTO bronze.emp VALUES (7, 'semi;colon', 1.0, 'x;y')")
    assert lake.sql(
        "SELECT note FROM bronze.emp WHERE id = 7"
    ).collect()[0].note == "x;y"


def test_sql_comments_and_case(spark, lake):
    out = lake.sql(
        """-- leading comment with a fake terminator ; DROP TABLE bronze.emp
        SeLeCt CoUnT(*) As n FrOm bronze.emp  /* block ; comment */
        """
    )
    assert out.collect()[0].n == 3
    # a quoted '--' is data, not a comment
    lake.sql("ALTER TABLE bronze.emp ADD COLUMN tag string")
    lake.sql("UPDATE bronze.emp SET tag = '--not a comment' WHERE id = 1")
    assert lake.sql(
        "SELECT tag FROM bronze.emp WHERE id = 1"
    ).collect()[0].tag == "--not a comment"
    with pytest.raises(LakeSQLError, match="unterminated"):
        lake.sql("SELECT 1 /* never closed")
    # mixed-case DML keywords route correctly
    lake.sql("dElEtE fRoM bronze.emp WhErE id = 2")
    assert lake.sql("SELECT count(*) AS n FROM bronze.emp").collect()[0].n == 2


def test_sql_merge_on_condition_with_quoted_when(spark, lake):
    spark.createDataFrame(
        [(1, "WHEN", 11.0), (8, "nina", 8.0)],
        "id int, name string, salario double",
    ).createOrReplaceTempView("updates_w")
    lake.sql(
        """MERGE INTO bronze.emp t USING updates_w s
           ON t.id = s.id AND s.name != 'WHEN MATCHED'
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *"""
    )
    got = {r.id: r.name for r in lake.sql("SELECT id, name FROM bronze.emp").collect()}
    assert got == {1: "WHEN", 2: "luis", 3: "eva", 8: "nina"}


def test_sql_errors(spark, lake):
    with pytest.raises(LakeSQLError, match="unsupported"):
        lake.sql("CREATE INDEX idx ON bronze.emp (id)")
    with pytest.raises(LakeSQLError, match="MERGE shape"):
        lake.sql("MERGE INTO bronze.emp USING x ON bad = syntax")
    with pytest.raises(FileNotFoundError):
        lake.sql("DELETE FROM bronze.ghost WHERE id = 1")


def test_delta_lake_primer_replay(spark, tmp_path):
    """End-to-end replay of the 02.delta_lake_primer.py %sql script shapes:
    CTAS USING delta LOCATION, DESCRIBE DETAIL/EXTENDED, SET TBLPROPERTIES,
    UPDATE, DELETE, MERGE with d/m aliases + INSERT with schema check,
    DESCRIBE HISTORY, VERSION AS OF, @v0, VACUUM."""
    cat = LakeCatalog(spark, tmp_path / "wh")
    lake = LakeSQL(cat)
    spark.createDataFrame(
        [("AZ", 10), ("CA", 25), ("TX", 12), ("WA", 7)], "addr_state string, count int"
    ).createOrReplaceTempView("loan_by_state")

    lake.sql("DROP TABLE IF EXISTS loan_by_state_delta")
    lake.sql(
        f"""CREATE TABLE loan_by_state_delta
         USING delta
         LOCATION '{tmp_path}/loan_by_state_delta'
         AS SELECT * FROM loan_by_state
        """
    )  # :93-99
    assert (tmp_path / "loan_by_state_delta" / "_tx_log").is_dir()  # external
    assert lake.sql("SELECT * FROM loan_by_state_delta").count() == 4
    assert lake.sql("DESCRIBE DETAIL loan_by_state_delta").collect()[0].num_files
    lake.sql("DESCRIBE EXTENDED loan_by_state_delta")
    # :238-242 column mapping property + ADD/DROP COLUMN
    lake.sql(
        "ALTER TABLE loan_by_state_delta SET TBLPROPERTIES ("
        "'delta.columnMapping.mode' = 'name')"
    )
    det = lake.sql("DESCRIBE EXTENDED loan_by_state_delta").collect()[0]
    assert "columnMapping" in det.properties
    lake.sql("ALTER TABLE loan_by_state_delta ADD COLUMN test string")
    assert "test" in lake.sql("SELECT * FROM loan_by_state_delta").columns
    lake.sql("ALTER TABLE loan_by_state_delta DROP COLUMN test")
    assert "test" not in lake.sql("SELECT * FROM loan_by_state_delta").columns
    # :252-261 UPDATE / :213-224 DELETE
    lake.sql("UPDATE loan_by_state_delta SET count = count + 100 WHERE addr_state = 'WA'")
    lake.sql("DELETE FROM loan_by_state_delta WHERE addr_state = 'TX'")
    # :312-320 MERGE with the reference's d/m aliases
    spark.createDataFrame(
        [("CA", 999), ("NY", 1)], "addr_state string, count int"
    ).createOrReplaceTempView("merge_table")
    lake.sql(
        """MERGE INTO loan_by_state_delta as d
           USING merge_table as m
           on d.addr_state = m.addr_state
           WHEN MATCHED THEN
             UPDATE SET *
           WHEN NOT MATCHED
             THEN INSERT *"""
    )
    got = {r.addr_state: r["count"]
           for r in lake.sql("SELECT * FROM loan_by_state_delta").collect()}
    assert got == {"AZ": 10, "CA": 999, "WA": 107, "NY": 1}
    # :404-421 history + time travel (both syntaxes), :442 VACUUM
    hist_ops = [r.operation for r in
                lake.sql("DESCRIBE HISTORY loan_by_state_delta").collect()]
    assert {"CREATE TABLE AS SELECT", "UPDATE", "DELETE", "MERGE"} <= set(hist_ops)
    v0 = lake.sql("SELECT * FROM loan_by_state_delta VERSION AS OF 0")
    assert {r.addr_state for r in v0.collect()} == {"AZ", "CA", "TX", "WA"}
    assert lake.sql("SELECT * from loan_by_state_delta@v0;").count() == 4
    lake.sql("VACUUM loan_by_state_delta;")
    assert lake.sql("SELECT * FROM loan_by_state_delta").count() == 4


def test_iceberg_primer_replay(spark, tmp_path):
    """End-to-end replay of the 03.iceberg_primer.py %sql script shapes:
    multi-statement cells, catalog-qualified names, USE, explicit-schema
    CREATE with a YEAR() partition transform, INSERT VALUES with TO_DATE,
    UPDATE;DELETE cell, MERGE with subquery source, ALTER ADD COLUMN +
    evolved INSERT, RESTORE-style time travel."""
    cat = LakeCatalog(spark, tmp_path / "wh")
    lake = LakeSQL(cat)
    # :67-70 one cell, three statements, catalog-qualified
    lake.sql(
        """DROP TABLE IF EXISTS iceberg_catalog.default.empleados;
           DROP DATABASE IF EXISTS iceberg_catalog.default;
           CREATE SCHEMA IF NOT EXISTS iceberg_catalog.default;"""
    )
    assert lake.sql("SHOW CATALOGS").count() >= 1  # :79
    lake.sql("USE iceberg_catalog")  # :90
    lake.sql("SHOW DATABASES")  # :99
    assert lake.sql("DESCRIBE SCHEMA default").collect()[0].database == "default"
    # :114-124 explicit schema + partition transform
    lake.sql(
        """CREATE TABLE default.empleados (
          id INT,
          nombre STRING,
          departamento STRING,
          salario DOUBLE,
          fecha_ingreso DATE
        )
        USING iceberg
        PARTITIONED BY (YEAR(fecha_ingreso));"""
    )
    # :150-153 INSERT VALUES with TO_DATE expressions
    lake.sql(
        """INSERT INTO default.empleados VALUES
           (1, 'Ana', 'IT', 50000,    TO_DATE('2025-06-01','yyyy-MM-dd')),
           (2, 'Luis', 'RRHH', 40000, TO_DATE('2025-06-12','yyyy-MM-dd')),
           (3, 'Marta', 'IT', 52000,  TO_DATE('2024-06-10','yyyy-MM-dd'));"""
    )
    # partition transform is live: .partitions groups by year(fecha_ingreso)
    parts = {r.year_fecha_ingreso: r.num_records
             for r in cat.table("default.empleados").partitions().collect()}
    assert parts == {2024: 1, 2025: 2}
    # :183-188 UPDATE + DELETE in one cell
    lake.sql(
        """UPDATE default.empleados SET salario = salario * 1.10
           WHERE departamento = 'IT';
           DELETE FROM default.empleados WHERE nombre = 'Luis';"""
    )
    # :205-215 MERGE with inline subquery source
    lake.sql(
        """MERGE INTO default.empleados t
           USING (
             SELECT 2 as id, 'Luis' as nombre, 'Ventas' as departamento,
                    43000.0 as salario, TO_DATE('2025-06-20','yyyy-MM-dd') as fecha_ingreso
           ) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *;"""
    )
    got = {r.id: r.departamento for r in
           lake.sql("SELECT * FROM default.empleados").collect()}
    assert got == {1: "IT", 2: "Ventas", 3: "IT"}
    # :232-234 schema evolution: ADD COLUMN then evolved INSERT (one cell)
    lake.sql(
        """ALTER TABLE default.empleados ADD COLUMN edad INT;
           INSERT INTO default.empleados VALUES
           (4, 'Carlos', 'Marketing', 48000, TO_DATE('2023-01-01','yyyy-MM-dd'), 35);"""
    )
    rows = {r.id: r.edad for r in lake.sql("SELECT * FROM default.empleados").collect()}
    assert rows == {1: None, 2: None, 3: None, 4: 35}
    # ordinal sort passthrough (:303) + aggregate over the table
    top = lake.sql(
        "SELECT departamento, count(*) AS n FROM default.empleados "
        "GROUP BY departamento ORDER BY 1"
    ).collect()
    assert [r.departamento for r in top] == ["IT", "Marketing", "Ventas"]


def test_sql_restore_and_metadata_tables(spark, lake):
    """RESTORE TABLE statement + metadata-table SELECT surface."""
    lake.sql("DELETE FROM bronze.emp WHERE id = 1")
    assert lake.sql("SELECT count(*) AS n FROM bronze.emp").collect()[0].n == 2
    res = lake.sql("RESTORE TABLE bronze.emp TO VERSION AS OF 0").collect()[0]
    assert res.restored_to == 0
    assert lake.sql("SELECT count(*) AS n FROM bronze.emp").collect()[0].n == 3
    snaps = lake.sql(
        "SELECT version, operation FROM bronze.emp.snapshots ORDER BY version"
    ).collect()
    assert [r.operation for r in snaps][-1] == "RESTORE"


def test_sql_literal_roundtrip_adversarial(spark, tmp_path):
    """Property-style hardening: adversarial string literals — keywords,
    statement separators, comment markers, doubled quotes — must survive an
    INSERT → SELECT round trip through the statement router unchanged.
    Catches any regression where the skeleton matcher starts looking inside
    literals (the classic regex-router trap the r2 verdict flagged)."""
    from lakehouses_spark.tables.catalog import LakeCatalog

    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    df = spark.createDataFrame([(0, "seed")], "id int, note string")
    cat.create_table("bronze.notes", df)
    lsql = LakeSQL(cat)

    adversarial = [
        "DELETE FROM notes WHERE 1=1",
        "x; DROP TABLE notes; --",
        "a WHERE b = 'c'",
        "it''s a merge... WHEN MATCHED THEN",
        "-- not a comment",
        "/* also not a comment */ VALUES (1)",
        "UPDATE t SET a = 1",
        "semi;colon and 'nested ''quotes'''",
    ]
    for i, s in enumerate(adversarial, start=1):
        lit = s.replace("'", "''")
        lsql.sql(f"INSERT INTO bronze.notes VALUES ({i}, '{lit}')")
    got = {
        r.id: r.note
        for r in lsql.sql("SELECT id, note FROM bronze.notes WHERE id > 0").collect()
    }
    # Spark parses the VALUES clause, so '' unescapes back to ' — the stored
    # value must equal the original string exactly
    assert got == {i: s for i, s in enumerate(adversarial, start=1)}
    # and the seed row survived every statement (nothing was misrouted into
    # a DELETE/DROP despite the literals claiming otherwise)
    assert lsql.sql("SELECT count(*) AS n FROM bronze.notes").collect()[0].n == 9


# --------- round-11: format-native DDL/DML over explicit paths ----------- #
def test_sql_ctas_using_delta_location_partitioned(spark, lake, tmp_path):
    """CREATE TABLE delta.`/p` PARTITIONED BY (...) AS SELECT (Spark's
    path-table CTAS) routes to write_delta_table: a real hive-partitioned
    _delta_log lands at the path, SELECT/DML reach it via the same
    delta.`path` spelling — the reference's format-native DDL without a
    jar."""
    from lakehouses_spark.tables.delta_log import DeltaLogReader

    p = tmp_path / "ext_d"
    lake.sql(
        f"""CREATE TABLE delta.`{p}` PARTITIONED BY (name)
            AS SELECT * FROM bronze.emp"""
    )
    r = DeltaLogReader(spark, p)
    assert r.snapshot().partition_columns == ["name"]
    got = lake.sql(f"SELECT count(*) AS n FROM delta.`{p}`").collect()
    assert got[0].n == 3
    # DML over the path target: external COW through DeltaLogReader
    lake.sql(f"UPDATE delta.`{p}` SET salario = salario + 1 WHERE id = 1")
    lake.sql(f"DELETE FROM delta.`{p}` WHERE id = 3")
    rows = {x.id: x.salario
            for x in lake.sql(f"SELECT * FROM delta.`{p}`").collect()}
    assert rows == {1: 30001.0, 2: 40000.0}
    # path table joins with catalog tables in one statement
    n = lake.sql(
        f"""SELECT count(*) AS n FROM delta.`{p}` d
            JOIN bronze.emp e ON d.id = e.id"""
    ).collect()[0].n
    assert n == 2


def test_sql_ctas_using_iceberg_location_partitioned(spark, lake, tmp_path):
    """The Iceberg twin: CREATE TABLE iceberg.`/p` PARTITIONED BY ... —
    identity spec declared, typed manifest tuples, readable and mutable
    through the iceberg.`path` spelling (03.iceberg_primer.py:114-124)."""
    from lakehouses_spark.tables.iceberg_meta import IcebergMetadataReader

    p = tmp_path / "ext_i"
    lake.sql(
        f"""CREATE TABLE iceberg.`{p}` PARTITIONED BY (name)
            AS SELECT * FROM bronze.emp"""
    )
    r = IcebergMetadataReader(spark, p)
    spec = r.meta["partition-specs"][0]
    assert [f["transform"] for f in spec["fields"]] == ["identity"]
    got = lake.sql(f"SELECT count(*) AS n FROM iceberg.`{p}`").collect()
    assert got[0].n == 3
    lake.sql(f"DELETE FROM iceberg.`{p}` WHERE id = 2")
    ids = sorted(x.id for x in
                 lake.sql(f"SELECT id FROM iceberg.`{p}`").collect())
    assert ids == [1, 3]
    # the DELETE committed a native snapshot
    r2 = IcebergMetadataReader(spark, p)
    assert r2.meta["snapshots"][-1]["summary"]["operation"] == "delete"


def test_sql_path_ctas_refuses_existing_table(lake, tmp_path):
    p = tmp_path / "dup"
    lake.sql(f"CREATE TABLE delta.`{p}` AS SELECT * FROM bronze.emp")
    from lakehouses_spark.tables.delta_log import DeltaProtocolError
    with pytest.raises(DeltaProtocolError, match="already exists"):
        lake.sql(f"CREATE TABLE delta.`{p}` AS SELECT * FROM bronze.emp")


def test_sql_path_maintenance_and_insert(spark, lake, tmp_path):
    """The full SQL lifecycle over a path target, no catalog entry at
    all: CTAS -> INSERT -> OPTIMIZE (ZORDER) -> DESCRIBE HISTORY ->
    VACUUM on delta.`/p`; OPTIMIZE + DESCRIBE HISTORY on iceberg.`/p`."""
    p = tmp_path / "pd"
    lake.sql(f"CREATE TABLE delta.`{p}` PARTITIONED BY (name) "
             "AS SELECT * FROM bronze.emp")
    lake.sql(f"INSERT INTO delta.`{p}` VALUES (9, 'zoe', 1000.0)")
    got = lake.sql(f"SELECT * FROM delta.`{p}`")
    assert got.count() == 4
    assert [x.name for x in got.where("id = 9").collect()] == ["zoe"]
    res = lake.sql(f"OPTIMIZE delta.`{p}` ZORDER BY (id)").collect()[0]
    assert res.output_files >= 1
    hist = lake.sql(f"DESCRIBE HISTORY delta.`{p}`").collect()
    assert [h.operation for h in hist[:2]] == ["OPTIMIZE", "WRITE"]
    # RETAIN 0 HOURS reclaims the pre-OPTIMIZE files immediately
    res = lake.sql(f"VACUUM delta.`{p}` RETAIN 0 HOURS").collect()[0]
    assert res.files_removed >= 1
    assert lake.sql(f"SELECT count(*) AS n FROM delta.`{p}`") \
        .collect()[0].n == 4

    pi = tmp_path / "pi"
    lake.sql(f"CREATE TABLE iceberg.`{pi}` AS SELECT * FROM bronze.emp")
    lake.sql(f"INSERT INTO iceberg.`{pi}` VALUES (9, 'zoe', 1000.0)")
    assert lake.sql(f"SELECT count(*) AS n FROM iceberg.`{pi}`") \
        .collect()[0].n == 4
    res = lake.sql(f"OPTIMIZE iceberg.`{pi}`").collect()[0]
    assert res.output_files >= 1
    hist = lake.sql(f"DESCRIBE HISTORY iceberg.`{pi}`")
    assert hist.count() >= 3  # ctas + insert + replace


def test_sql_path_pattern_inside_string_literal_is_data(lake):
    """r11 review: a 'delta.`...`' inside a quoted literal is DATA — the
    path resolver must not try to open it (plain Spark runs this fine)."""
    got = lake.sql("SELECT 'see delta.`/does/not/exist`' AS note").collect()
    assert got[0].note == "see delta.`/does/not/exist`"


def test_sql_delete_without_where_deletes_all(spark, lake, tmp_path):
    """ADVICE r12: WHERE is optional in Delta SQL — `DELETE FROM t` and
    ``DELETE FROM delta.`/p` `` mean delete-everything; the
    mandatory-WHERE regex made the path-target spelling fall through as
    an unrecognized statement."""
    p = tmp_path / "da"
    lake.sql(f"CREATE TABLE delta.`{p}` AS SELECT * FROM bronze.emp")
    lake.sql(f"DELETE FROM delta.`{p}`")
    assert lake.sql(
        f"SELECT count(*) AS n FROM delta.`{p}`").collect()[0].n == 0
    # the catalog-table spelling too
    lake.sql("DELETE FROM bronze.emp")
    assert lake.sql(
        "SELECT count(*) AS n FROM bronze.emp").collect()[0].n == 0


def test_sql_iceberg_path_ctas_with_year_transform(spark, lake, tmp_path):
    """The reference's `PARTITIONED BY (YEAR(fecha_ingreso))` spelling
    (03.iceberg_primer.py:124) through the LakeSQL path CTAS: the
    declared spec carries the year transform and DML stays available."""
    from lakehouses_spark.tables.iceberg_meta import IcebergMetadataReader

    spark.sql(
        "SELECT id, DATE'2020-03-04' + make_interval(id) AS fecha_ingreso,"
        " CAST(id AS DOUBLE) AS v FROM range(1, 9) "
    ).withColumnRenamed("id", "k").createOrReplaceTempView("emp_fechas")
    p = tmp_path / "ei"
    lake.sql(
        f"""CREATE TABLE iceberg.`{p}` PARTITIONED BY (YEAR(fecha_ingreso))
            AS SELECT * FROM emp_fechas"""
    )
    r = IcebergMetadataReader(spark, p)
    spec = r.meta["partition-specs"][0]
    assert [(f["name"], f["transform"]) for f in spec["fields"]] == [
        ("fecha_ingreso_year", "year")]
    got = {e["data_file"]["partition"]["fecha_ingreso_year"]
           for e in r._live_data_entries()}
    assert got == {50 + i for i in range(1, 9)}  # 2021.. minus 1970
    lake.sql(f"DELETE FROM iceberg.`{p}` WHERE k <= 2")
    assert lake.sql(
        f"SELECT count(*) AS n FROM iceberg.`{p}`").collect()[0].n == 6
