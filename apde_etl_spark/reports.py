"""Report sinks (SURVEY.md §2.1 S10/S11): the reference exports QA
results as one xlsx workbook (3 sheets: missingness, values,
chi_standards; etl_qa_run_pipeline.R:1772-1786) and two PDF plot decks
(missingness facets + per-variable value plots, :1734-1769,1830-2008),
filenames stamped ``{datasource}_qa_{kind}_{date}`` (:1737,1772).

These are driver-side, lowest-value surfaces (SURVEY §7.1 step 6): the
DataFrames are collected with ``toPandas()`` and rendered locally.
Excel degrades gracefully without openpyxl (one CSV per sheet, same
stem, ``.sheetname.csv`` suffix); the PDF decks render through the
dependency-free :mod:`apde_etl_spark.pdfcanvas`, so they work in any
runtime. The engine itself never depends on this module.
"""

from __future__ import annotations

import datetime as _dt
import os
from collections.abc import Mapping

from pyspark.sql import DataFrame


def _stamp(datasource: str, kind: str, when: _dt.date | None = None) -> str:
    d = (when or _dt.date.today()).isoformat()
    return f"{datasource}_qa_{kind}_{d}"


def export_excel(
    sheets: Mapping[str, DataFrame],
    out_dir: str,
    datasource: str = "datasource",
    when: _dt.date | None = None,
) -> list[str]:
    """S10 — write the result tables as one workbook (sheet per table) or,
    without an Excel writer installed, one CSV per sheet. Returns the
    written paths. ``sheets`` preserves the reference's sheet order
    (missingness, values, chi_standards)."""
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.join(out_dir, _stamp(datasource, "results", when))
    pdfs = {name: df.toPandas() for name, df in sheets.items()}
    try:
        import openpyxl  # noqa: F401

        path = stem + ".xlsx"
        import pandas as pd

        with pd.ExcelWriter(path, engine="openpyxl") as xw:
            for name, pdf in pdfs.items():
                pdf.to_excel(xw, sheet_name=name[:31], index=False)
        return [path]
    except ImportError:
        paths = []
        for name, pdf in pdfs.items():
            p = f"{stem}.{name}.csv"
            pdf.to_csv(p, index=False)
            paths.append(p)
        return paths


#: Series colors for the continuous/date plots — the reference's palette
#: (etl_qa_run_pipeline.R plotCONTINUOUS/plotDATE scale_color_manual).
_STAT_COLORS = {
    "Minimum": (0.65, 0.81, 0.89),   # #a6cee3
    "Mean": (0.12, 0.47, 0.71),      # #1f78b4
    "Median": (0.70, 0.87, 0.54),    # #b2df8a
    "Maximum": (0.20, 0.63, 0.17),   # #33a02c
}

#: Categorical value palette (cycled) — distinct hues, NA drawn dashed
#: black like the reference's linetype = 'dotted' for NA.
_CAT_COLORS = [
    (0.89, 0.10, 0.11), (0.22, 0.49, 0.72), (0.30, 0.69, 0.29),
    (0.60, 0.31, 0.64), (1.00, 0.50, 0.00), (0.65, 0.34, 0.16),
    (0.97, 0.51, 0.75), (0.40, 0.40, 0.40), (0.99, 0.75, 0.44),
    (0.70, 0.87, 0.54),
]


def _spread(lo: float, hi: float) -> tuple[float, float]:
    if lo == hi:  # flat series: pad so the line sits mid-box
        pad = abs(lo) * 0.1 or 1.0
        return lo - pad, hi + pad
    return lo, hi


def _draw_chart(page, x0, y0, w, h, series, xlim, ylim, title,
                y_fmt=lambda v: f"{v:g}", title_size=7.0):
    """One framed line chart: ``series`` = [(label, rgb, dashed, pts)],
    pts in data coordinates; min/max tick labels on both axes."""
    xlo, xhi = _spread(*xlim)
    ylo, yhi = _spread(*ylim)

    def sx(v):
        return x0 + (v - xlo) / (xhi - xlo) * w

    def sy(v):
        return y0 + (v - ylo) / (yhi - ylo) * h

    page.rect(x0, y0, w, h, stroke=(0.3, 0.3, 0.3), width=0.6)
    page.text(0, y0 + h + 3, title, size=title_size, center_x=x0 + w / 2)
    page.text(x0 - 2, y0 - 8, f"{xlo:g}", size=5.5)
    page.text(x0 + w - 14, y0 - 8, f"{xhi:g}", size=5.5)
    page.text(x0 - 26, y0, y_fmt(ylo), size=5.5)
    page.text(x0 - 26, y0 + h - 5, y_fmt(yhi), size=5.5)
    for _label, rgb, dashed, pts in series:
        scaled = [(sx(px), sy(py)) for px, py in sorted(pts)]
        page.polyline(scaled, width=1.1, rgb=rgb, dashed=dashed)
        for p in scaled:
            page.dot(p[0], p[1], 1.4, rgb)


def export_plots(
    missingness: DataFrame,
    values: DataFrame,
    out_dir: str,
    datasource: str = "datasource",
    vars_per_page: int = 16,
    when: _dt.date | None = None,
) -> list[str]:
    """S11 — BOTH PDF decks, mirroring the reference's
    ``etl_qa_export_results`` (R/etl_qa_run_pipeline.R:1734-1769):

    - ``*_qa_missing_*.pdf`` — faceted proportion-missing over time,
      ``vars_per_page`` facets per page (4-wide grid; the reference's
      16-per-page vargroup split, :1988-2008).
    - ``*_qa_values_*.pdf`` — ONE page per profiled variable (:1753-1764),
      dispatched on vartype: Categorical -> one proportion line per
      top-k/NA/Other value (NA dashed, :1830-1860); Continuous ->
      min/mean/median/max lines in the reference's palette (:1872-1917);
      Date -> min/median/max date lines (:1930-1975). Variables that are
      100% missing at every time point are excluded, as in the
      reference's mi100vars warning (:1726-1733).

    Rendered with the dependency-free :mod:`apde_etl_spark.pdfcanvas`
    (no matplotlib in many Spark runtimes); both decks are driver-side
    sinks over already-aggregated (tiny) tables. Returns
    ``[missing_pdf_path, values_pdf_path]``.
    """
    from apde_etl_spark.pdfcanvas import PAGE_H, PAGE_W, PdfDeck

    os.makedirs(out_dir, exist_ok=True)
    miss = missingness.toPandas()
    vals = values.toPandas()
    title_date = (when or _dt.date.today()).strftime("%B %d, %Y")

    # ---- deck 1: missingness facets, vars_per_page per page ----
    deck = PdfDeck()
    varnames = sorted(miss["varname"].dropna().unique())
    tlo, thi = float(miss["time_period"].min()), float(miss["time_period"].max())
    ncols = 4
    for start in range(0, len(varnames), vars_per_page):
        page_vars = varnames[start:start + vars_per_page]
        page = deck.new_page()
        page.text(0, PAGE_H - 24, f"Data QA missing: {datasource} {title_date}",
                  size=12, center_x=PAGE_W / 2)
        # grid rows from the REQUESTED page size — sizing from a capped
        # constant while still drawing vars_per_page facets pushed rows
        # past the page bottom for vars_per_page > 16 (a partially
        # filled last page keeps the same grid, like the reference)
        nrows = (vars_per_page + ncols - 1) // ncols
        cw, ch = (PAGE_W - 90) / ncols, (PAGE_H - 80) / nrows
        for i, v in enumerate(page_vars):
            cx = 60 + (i % ncols) * cw
            cy = PAGE_H - 60 - (i // ncols + 1) * ch
            sub = miss[miss["varname"] == v]
            pts = list(zip(sub["time_period"].astype(float),
                           sub["proportion"].astype(float)))
            _draw_chart(page, cx, cy + 14, cw - 40, ch - 28,
                        [(v, (0.12, 0.47, 0.71), False, pts)],
                        (tlo, thi), (0.0, 1.0), v,
                        y_fmt=lambda y: f"{y:.0%}")
    miss_path = os.path.join(out_dir, _stamp(datasource, "missing", when) + ".pdf")
    deck.save(miss_path)

    # ---- deck 2: values, one page per variable ----
    all_missing = {
        v for v, g in miss.groupby("varname")
        if float(g["proportion"].min()) >= 1.0
    }
    deck = PdfDeck()
    vtitle = f"Data QA values: {datasource} {title_date}"
    x0, y0, w, h = 90, 70, PAGE_W - 330, PAGE_H - 160
    for v in sorted(vals["varname"].dropna().unique()):
        if v in all_missing:
            continue
        sub = vals[vals["varname"] == v]
        vartype = sub["vartype"].iloc[0]
        page = deck.new_page()
        page.text(0, PAGE_H - 26, vtitle, size=12, center_x=PAGE_W / 2)
        page.text(0, PAGE_H - 44, f"{v}  ({vartype})", size=10,
                  center_x=PAGE_W / 2)
        txlim = (float(sub["time_period"].min()), float(sub["time_period"].max()))

        if vartype == "Categorical":
            series = []
            groups = sub.groupby("value", dropna=False, sort=True)
            for i, (val, g) in enumerate(groups):
                is_na = val is None or (isinstance(val, float) and val != val)
                label = "NA" if is_na else str(val)
                rgb = (0, 0, 0) if is_na else _CAT_COLORS[i % len(_CAT_COLORS)]
                pts = list(zip(g["time_period"].astype(float),
                               g["proportion"].astype(float)))
                series.append((label, rgb, is_na, pts))
            _draw_chart(page, x0, y0, w, h, series, txlim, (0.0, 1.0),
                        "Proportion by value", y_fmt=lambda y: f"{y:g}")
            for i, (label, rgb, dashed, _pts) in enumerate(series[:24]):
                ly = PAGE_H - 90 - i * 16
                page.line(x0 + w + 24, ly + 3, x0 + w + 44, ly + 3,
                          width=1.6, rgb=rgb, dashed=dashed)
                page.text(x0 + w + 50, ly, label[:28], size=7)
        elif vartype == "Continuous":
            stats = [("Minimum", "min"), ("Mean", "mean"),
                     ("Median", "median"), ("Maximum", "max")]
            g = sub.dropna(subset=["mean"])
            if g.empty:
                page.text(0, PAGE_H / 2, "no data in range", size=9,
                          center_x=PAGE_W / 2)
                continue
            ylo = float(g["min"].min())
            yhi = float(g["max"].max())
            series = [
                (name, _STAT_COLORS[name], False,
                 list(zip(g["time_period"].astype(float),
                          g[col].astype(float))))
                for name, col in stats
            ]
            _draw_chart(page, x0, y0, w, h, series, txlim, (ylo, yhi), v)
            for i, (name, _c, _d, _p) in enumerate(series):
                ly = PAGE_H - 90 - i * 16
                page.line(x0 + w + 24, ly + 3, x0 + w + 44, ly + 3,
                          width=1.6, rgb=_STAT_COLORS[name])
                page.text(x0 + w + 50, ly, name, size=7)
        else:  # Date
            stats = [("Minimum", "min_date"), ("Median", "median_date"),
                     ("Maximum", "max_date")]
            g = sub.dropna(subset=["min_date", "median_date", "max_date"])
            if g.empty:
                page.text(0, PAGE_H / 2, "no data in range", size=9,
                          center_x=PAGE_W / 2)
                continue
            as_ord = {c: g[c].map(lambda d: float(d.toordinal()))
                      for _n, c in stats}
            ylo = float(min(s.min() for s in as_ord.values()))
            yhi = float(max(s.max() for s in as_ord.values()))
            series = [
                (name, _STAT_COLORS[name], False,
                 list(zip(g["time_period"].astype(float), as_ord[col])))
                for name, col in stats
            ]
            _draw_chart(
                page, x0, y0, w, h, series, txlim, (ylo, yhi), v,
                y_fmt=lambda o: _dt.date.fromordinal(int(o)).isoformat()
                if 1 < o < 3652059 else f"{o:g}",
            )
            for i, (name, _c, _d, _p) in enumerate(series):
                ly = PAGE_H - 90 - i * 16
                page.line(x0 + w + 24, ly + 3, x0 + w + 44, ly + 3,
                          width=1.6, rgb=_STAT_COLORS[name])
                page.text(x0 + w + 50, ly, name, size=7)
    vals_path = os.path.join(out_dir, _stamp(datasource, "values", when) + ".pdf")
    deck.save(vals_path)
    return [miss_path, vals_path]
