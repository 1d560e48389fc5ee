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


def test_send_message_through_recorded_transport(spark, msgs, nlist, addresses):
    sent = []
    out = notify.send_message(
        spark, msgs, nlist, addresses, "qa_done", "qa_team",
        transport=sent.append, table="orders",
    )
    assert len(sent) == 1 and sent[0] is out
    assert sent[0].subject == "QA complete: orders"
    assert sent[0].recipients == ["a@x.org", "b@x.org"]


def test_send_message_refuses_zero_recipients(spark, msgs, nlist, addresses):
    sent = []
    with pytest.raises(ValueError, match="zero recipients"):
        notify.send_message(
            spark, msgs, nlist, addresses, "qa_done", "no_such_list",
            transport=sent.append, table="orders",
        )
    assert sent == []  # transport must not fire on the failure path


def test_smtp_transport_builds_wellformed_email(monkeypatch):
    """smtp_transport renders a correct RFC-2822 message and hands it to
    smtplib; the SMTP session itself is faked (no network in tests)."""
    import smtplib

    captured = {}

    class FakeSMTP:
        def __init__(self, host, port):
            captured["conn"] = (host, port)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def starttls(self):
            captured["tls"] = True

        def send_message(self, em):
            captured["email"] = em

    monkeypatch.setattr(smtplib, "SMTP", FakeSMTP)
    t = notify.smtp_transport(host="mail.example", port=2525,
                              sender="qa@example", starttls=True)
    t(notify.RenderedMessage(subject="s", body="b", recipients=["a@x", "b@x"]))
    assert captured["conn"] == ("mail.example", 2525)
    assert captured["tls"] is True
    em = captured["email"]
    assert em["Subject"] == "s" and em["From"] == "qa@example"
    assert em["To"] == "a@x, b@x"
    assert em.get_content().strip() == "b"


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


def _deck_inputs(spark):
    """Missingness + values frames covering every vartype branch, plus
    one variable that is 100% missing at every period (must be excluded
    from the values deck, mirroring the reference's mi100vars)."""
    miss = spark.createDataFrame(
        [(y, v, 10, p) for y in (2023, 2024)
         for v, p in [("cat_a", 0.1), ("num_b", 0.2), ("date_c", 0.0),
                      ("gone_d", 1.0), ("num_e", 0.3), ("cat_f", 0.4)]],
        "time_period int, varname string, nrow long, proportion double",
    )
    rows = []
    for y in (2023, 2024):
        for v in ("cat_a", "cat_f"):
            rows.append((y, v, "x", 5, 0.5, None, "Categorical",
                         None, None, None, None, None, None, None))
            rows.append((y, v, None, 5, 0.5, None, "Categorical",
                         None, None, None, None, None, None, None))
        for v in ("num_b", "num_e"):
            rows.append((y, v, None, None, None, None, "Continuous",
                         3.0, 2.5, 1.0, 9.0, None, None, None))
        rows.append((y, "date_c", None, None, None, None, "Date",
                     None, None, None, None, datetime.date(y, 1, 1),
                     datetime.date(y, 12, 31), datetime.date(y, 6, 15)))
        rows.append((y, "gone_d", None, 0, 0.0, None, "Categorical",
                     None, None, None, None, None, None, None))
    vals = spark.createDataFrame(
        rows,
        "time_period int, varname string, value string, count long, "
        "proportion double, abs_proportion_change string, vartype string, "
        "mean double, median double, min double, max double, "
        "min_date date, max_date date, median_date date",
    )
    return miss, vals


def test_export_plots_writes_both_decks_with_right_page_counts(spark, tmp_path):
    """Mirror of the reference's export test (tests/manual/
    test-etl_qa_run_pipeline.R:143-155): both PDFs exist — plus the page
    arithmetic: missing deck paginates vars_per_page facets/page, values
    deck is one page per variable minus the 100%-missing exclusions."""
    from apde_etl_spark.pdfcanvas import page_count

    miss, vals = _deck_inputs(spark)
    paths = export_plots(miss, vals, str(tmp_path), "unittest",
                         vars_per_page=4, when=datetime.date(2024, 6, 1))
    assert len(paths) == 2
    missing_pdf, values_pdf = paths
    assert "unittest_qa_missing_2024-06-01" in missing_pdf
    assert "unittest_qa_values_2024-06-01" in values_pdf
    for p in paths:
        assert os.path.exists(p)
        with open(p, "rb") as fh:
            assert fh.read(5) == b"%PDF-"
    assert page_count(missing_pdf) == 2   # 6 vars at 4 per page
    # 6 profiled vars - gone_d (100% missing every period) = 5 pages
    assert page_count(values_pdf) == 5


def test_values_deck_page_per_var_at_default_pagination(spark, tmp_path):
    miss, vals = _deck_inputs(spark)
    from apde_etl_spark.pdfcanvas import page_count

    paths = export_plots(miss, vals, str(tmp_path), "unittest2")
    assert page_count(paths[0]) == 1      # 6 vars fit one 16-facet page
    assert page_count(paths[1]) == 5


def test_missing_deck_grid_stays_on_page_above_16_facets(spark, tmp_path):
    """Regression: sizing the grid from a capped constant while drawing
    vars_per_page facets pushed rows 5+ below the page bottom for
    vars_per_page > 16. All painted content must sit at y >= 0
    (uncompressed streams, so the ops are directly greppable)."""
    import re

    miss, vals = _deck_inputs(spark)
    paths = export_plots(miss, vals, str(tmp_path), "grid20",
                         vars_per_page=20, when=datetime.date(2024, 6, 1))
    raw = open(paths[0], "rb").read().decode("latin-1")
    ys = [float(m.group(2))
          for m in re.finditer(r"([-\d.]+) ([-\d.]+) ([-\d.]+) ([-\d.]+) re ", raw)]
    assert ys, "no rect ops found — stream format changed?"
    assert min(ys) >= 0, f"chart content below the page: min y = {min(ys)}"
