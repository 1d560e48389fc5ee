"""Report sinks (S10/S11) and the notification subsystem (J7/F9 +
versioned templates) — driver-side surfaces over small DataFrames."""

import datetime
import os

import pytest

from apde_etl_spark import notify
from apde_etl_spark.reports import export_excel, export_plots


@pytest.fixture(scope="module")
def msgs(spark):
    return spark.createDataFrame(
        [
            (1, "qa_done", "QA done {table}", "Run on {table} finished", None,
             datetime.datetime(2024, 1, 1)),
            (2, "qa_done", "QA complete: {table}", "Run on {table} finished OK", 1,
             datetime.datetime(2024, 2, 1)),
            (3, "qa_fail", "QA FAILED {table}", "See log", None,
             datetime.datetime(2024, 1, 5)),
        ],
        notify.MSGS_SCHEMA,
    )


@pytest.fixture(scope="module")
def addresses(spark):
    return spark.createDataFrame(
        [(1, "a@x.org"), (2, "b@x.org"), (3, "c@x.org")], notify.ADDRESSES_SCHEMA
    )


@pytest.fixture(scope="module")
def nlist(spark):
    return spark.createDataFrame(
        [("qa_team", 1), ("qa_team", 2), ("qa_team", 2), ("ops", 3)],
        notify.LIST_SCHEMA,
    )


def test_resolve_recipients_dedups(nlist, addresses):
    got = sorted(
        r["address"]
        for r in notify.resolve_recipients(nlist, addresses, "qa_team").collect()
    )
    assert got == ["a@x.org", "b@x.org"]


def test_current_message_is_unreferenced_head(msgs):
    head = notify.current_message(msgs, "qa_done").collect()
    assert len(head) == 1 and head[0]["msg_id"] == 2


def test_new_version_points_at_head(msgs):
    updated = notify.new_version(msgs, "qa_done", "s3", "b3")
    head = notify.current_message(updated, "qa_done").collect()
    assert len(head) == 1
    assert head[0]["msg_parent"] == 2 and head[0]["msg_subject"] == "s3"


def test_render_template_substitutes_and_raises():
    assert notify.render_template("hi {who}", who="qa") == "hi qa"
    with pytest.raises(KeyError):
        notify.render_template("hi {nope}")


def test_prepare_message_end_to_end(spark, msgs, nlist, addresses):
    m = notify.prepare_message(
        spark, msgs, nlist, addresses, "qa_done", "qa_team", table="orders"
    )
    assert m.subject == "QA complete: orders"
    assert m.recipients == ["a@x.org", "b@x.org"]


def test_export_excel_falls_back_to_csv(spark, tmp_path):
    miss = spark.createDataFrame(
        [(2023, "a", 1, 0.1), (2024, "a", 2, 0.2)],
        "time_period int, varname string, nrow long, proportion double",
    )
    paths = export_excel(
        {"missingness": miss}, str(tmp_path), "unittest",
        when=datetime.date(2024, 6, 1),
    )
    assert all(os.path.exists(p) for p in paths)
    assert any("unittest_qa_results_2024-06-01" in p for p in paths)
    # without openpyxl in this container the fallback is per-sheet CSV
    content = open(paths[0]).read()
    assert "proportion" in content and "0.1" in content


def test_export_plots_needs_matplotlib(spark, tmp_path):
    miss = spark.createDataFrame(
        [(2023, "a", 1, 0.1)],
        "time_period int, varname string, nrow long, proportion double",
    )
    try:
        import matplotlib  # noqa: F401

        paths = export_plots(miss, miss, str(tmp_path), "unittest")
        assert all(os.path.exists(p) for p in paths)
    except ImportError:
        with pytest.raises(ImportError):
            export_plots(miss, miss, str(tmp_path), "unittest")
