"""S3 (SQLite) / S5 (Excel) / K3 (Excel sink) runtime-gap closure
(VERDICT r4 item 5): this container has no sqlite JDBC jar and no
openpyxl, so the stdlib fallbacks — ``sqlite3`` driver-side reads and
the zip+XML xlsx codec in ``sources/xlsx.py`` — are what make these
SURVEY §2.1 items actually testable here. Reference behavior:
devices_info.py:7 (read_excel of a small dimension sheet),
measurements.py:304 (catalog export), huge_dataframe's SQLite scan.
"""

import sqlite3

import pytest

from etl_market_survey_spark.sources.xlsx import (
    _col_index,
    _col_letter,
    read_xlsx_rows,
    write_xlsx,
)


def test_col_ref_roundtrip():
    for i in [0, 1, 25, 26, 27, 51, 52, 701, 702, 16383]:
        assert _col_index(_col_letter(i)) == i
    assert _col_index("BC12") == 54  # trailing digits ignored


def test_xlsx_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "dim.xlsx")
    header = ["device", "n_pads", "gain", "active", "note"]
    rows = [
        ["MS1", 2, 1.5, True, "first <batch> & co"],
        ["MS2", 4, 0.25, False, None],
        ["MS3", None, -3.0, True, "трава"],  # unicode + blank cell
    ]
    write_xlsx(path, header, rows)
    got_header, got_rows = read_xlsx_rows(path)
    assert got_header == header
    assert got_rows == rows


def test_xlsx_sheet_selection_and_missing(tmp_path):
    path = str(tmp_path / "one.xlsx")
    write_xlsx(path, ["a"], [[1]], sheet_name="Devices")
    assert read_xlsx_rows(path, "Devices") == (["a"], [[1]])
    assert read_xlsx_rows(path, 0) == (["a"], [[1]])
    with pytest.raises(KeyError):
        read_xlsx_rows(path, "NoSuch")


def test_read_excel_dim_fallback(spark, tmp_path):
    # no openpyxl in this runtime -> read_excel_dim must take the
    # stdlib path and still produce a proper Spark frame
    from etl_market_survey_spark.sources.readers import read_excel_dim

    path = str(tmp_path / "devices.xlsx")
    write_xlsx(
        path,
        ["device_name", "pads", "thickness_um"],
        [["MS07", 2, 45.5], ["MS08", 4, 20.0]],
    )
    df = read_excel_dim(spark, path)
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("MS07", 2, 45.5), ("MS08", 4, 20.0)]


def test_write_excel_sink_fallback(spark, tmp_path):
    from etl_market_survey_spark.sources.writers import write_excel

    path = str(tmp_path / "catalog.xlsx")
    df = spark.createDataFrame(
        [("beta scan 1", 11, 0.5), ("tct scan", 7, 1.25)],
        "measurement string, n int, frac double",
    )
    write_excel(df, path)
    header, rows = read_xlsx_rows(path)
    assert header == ["measurement", "n", "frac"]
    assert sorted(rows) == [["beta scan 1", 11, 0.5], ["tct scan", 7, 1.25]]


@pytest.fixture()
def sqlite_db(tmp_path):
    path = str(tmp_path / "meas.sqlite")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE waveforms (n_trigger INTEGER, device TEXT,"
        " amplitude REAL, payload BLOB)"
    )
    con.executemany(
        "INSERT INTO waveforms VALUES (?, ?, ?, ?)",
        [
            (1, "MS07", -0.125, b"\x00\x01"),
            (2, "MS08", 0.5, None),
            (3, None, None, b"\xff"),
        ],
    )
    con.commit()
    con.close()
    return path


def test_read_sqlite_local(spark, sqlite_db):
    from etl_market_survey_spark.sources.readers import read_sqlite

    df = read_sqlite(spark, sqlite_db, "waveforms", mode="local")
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double", "binary",
    ]
    rows = sorted(df.collect(), key=lambda r: r["n_trigger"])
    assert rows[0]["device"] == "MS07" and rows[0]["amplitude"] == -0.125
    assert bytes(rows[0]["payload"]) == b"\x00\x01"
    assert rows[2]["device"] is None


def test_read_sqlite_auto_falls_back_without_jar(spark, sqlite_db):
    # this runtime has no sqlite JDBC driver, so auto must land on the
    # stdlib path transparently
    from etl_market_survey_spark.sources.readers import read_sqlite

    df = read_sqlite(spark, sqlite_db, "waveforms")
    assert df.count() == 3


def test_read_sqlite_rejects_unknown_table(spark, sqlite_db):
    from etl_market_survey_spark.sources.readers import read_sqlite

    with pytest.raises(KeyError):
        read_sqlite(spark, sqlite_db, "nope; DROP TABLE waveforms", mode="local")


def test_cascading_resolver_reaches_sqlite(spark, tmp_path):
    from etl_market_survey_spark.sources.readers import read_table

    path = str(tmp_path / "runs.sqlite")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE runs (run_id INTEGER, name TEXT)")
    con.execute("INSERT INTO runs VALUES (7, 'beta')")
    con.commit()
    con.close()
    df = read_table(spark, str(tmp_path), "runs")
    assert [tuple(r) for r in df.collect()] == [(7, "beta")]
