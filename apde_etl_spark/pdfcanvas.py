"""Minimal dependency-free PDF writer for the QA plot decks.

The reference exports its QA plots with grDevices/ggplot2
(R/etl_qa_run_pipeline.R:1734-1769); the analogous Python stack
(matplotlib) is an optional heavyweight dependency that many Spark
runtimes don't ship. The decks only need lines, rectangles, dots and
labels, so this module writes PDF 1.4 directly — uncompressed content
streams, Helvetica base font, letter-landscape pages — with zero
dependencies and byte-deterministic output.

Coordinate system: PDF-native, origin bottom-left, points (1/72 inch).
"""

from __future__ import annotations

PAGE_W = 792.0   # 11in  (letter landscape, matching the reference's
PAGE_H = 612.0   # 8.5in  pdf(width = 11, height = 8.5))


def _esc(s: str) -> str:
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    # non-latin-1 chars can't ride in a plain string with the base font
    return out.encode("latin-1", "replace").decode("latin-1")


def _fmt(x: float) -> str:
    return f"{x:.2f}".rstrip("0").rstrip(".")


class Page:
    """One page's content stream, built op by op."""

    def __init__(self) -> None:
        self._ops: list[str] = []

    def _rgb(self, rgb: tuple[float, float, float], stroke: bool) -> None:
        r, g, b = rgb
        op = "RG" if stroke else "rg"
        self._ops.append(f"{_fmt(r)} {_fmt(g)} {_fmt(b)} {op}")

    def line(self, x1: float, y1: float, x2: float, y2: float,
             width: float = 1.0,
             rgb: tuple[float, float, float] = (0, 0, 0),
             dashed: bool = False) -> None:
        self._rgb(rgb, stroke=True)
        self._ops.append(f"{_fmt(width)} w")
        self._ops.append("[3 2] 0 d" if dashed else "[] 0 d")
        self._ops.append(
            f"{_fmt(x1)} {_fmt(y1)} m {_fmt(x2)} {_fmt(y2)} l S"
        )

    def polyline(self, pts: list[tuple[float, float]], width: float = 1.0,
                 rgb: tuple[float, float, float] = (0, 0, 0),
                 dashed: bool = False) -> None:
        if len(pts) < 2:
            return
        self._rgb(rgb, stroke=True)
        self._ops.append(f"{_fmt(width)} w")
        self._ops.append("[3 2] 0 d" if dashed else "[] 0 d")
        path = f"{_fmt(pts[0][0])} {_fmt(pts[0][1])} m " + " ".join(
            f"{_fmt(x)} {_fmt(y)} l" for x, y in pts[1:]
        )
        self._ops.append(path + " S")

    def rect(self, x: float, y: float, w: float, h: float,
             fill: tuple[float, float, float] | None = None,
             stroke: tuple[float, float, float] | None = None,
             width: float = 0.8) -> None:
        if fill is not None:
            self._rgb(fill, stroke=False)
        if stroke is not None:
            self._rgb(stroke, stroke=True)
            self._ops.append(f"{_fmt(width)} w")
            self._ops.append("[] 0 d")
        if fill is None and stroke is None:
            return  # nothing to paint — explicit no-op, not a KeyError
        op = {(True, True): "B", (True, False): "f", (False, True): "S"}[
            (fill is not None, stroke is not None)
        ]
        self._ops.append(f"{_fmt(x)} {_fmt(y)} {_fmt(w)} {_fmt(h)} re {op}")

    def dot(self, x: float, y: float, r: float = 1.6,
            rgb: tuple[float, float, float] = (0, 0, 0)) -> None:
        # a filled square dot — visually adequate at plot-marker size and
        # keeps the stream free of bezier arcs
        self.rect(x - r, y - r, 2 * r, 2 * r, fill=rgb)

    def text(self, x: float, y: float, s: str, size: float = 8.0,
             rgb: tuple[float, float, float] = (0, 0, 0),
             center_x: float | None = None) -> None:
        """Draw ``s`` at (x, y); if ``center_x`` is given, x is ignored
        and the string is centered on it (Helvetica ~0.5em avg width)."""
        if center_x is not None:
            x = center_x - 0.25 * size * len(s)
        self._rgb(rgb, stroke=False)
        self._ops.append(
            f"BT /F1 {_fmt(size)} Tf {_fmt(x)} {_fmt(y)} Td ({_esc(s)}) Tj ET"
        )

    def stream(self) -> bytes:
        return "\n".join(self._ops).encode("latin-1")


class PdfDeck:
    """A multi-page PDF document; ``new_page()`` then draw, ``save()``."""

    def __init__(self) -> None:
        self.pages: list[Page] = []

    def new_page(self) -> Page:
        p = Page()
        self.pages.append(p)
        return p

    def save(self, path: str) -> str:
        if not self.pages:
            self.new_page()  # a valid PDF needs at least one page
        objs: list[bytes] = []
        npages = len(self.pages)
        # object layout: 1 catalog, 2 pages tree, 3 font,
        # then per page: 4+2i page dict, 5+2i content stream
        kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(npages))
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode()
        )
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        for i, page in enumerate(self.pages):
            content = page.stream()
            objs.append(
                (f"<< /Type /Page /Parent 2 0 R "
                 f"/MediaBox [0 0 {_fmt(PAGE_W)} {_fmt(PAGE_H)}] "
                 f"/Resources << /Font << /F1 3 0 R >> >> "
                 f"/Contents {5 + 2 * i} 0 R >>").encode()
            )
            objs.append(
                f"<< /Length {len(content)} >>\nstream\n".encode()
                + content + b"\nendstream"
            )

        buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for n, body in enumerate(objs, start=1):
            offsets.append(len(buf))
            buf += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(buf)
        buf += f"xref\n0 {len(objs) + 1}\n".encode()
        buf += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            buf += f"{off:010d} 00000 n \n".encode()
        buf += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        with open(path, "wb") as fh:
            fh.write(bytes(buf))
        return path


def page_count(path: str) -> int:
    """Page count of a PDF written by this module (or any PDF that spells
    its page objects as ``/Type /Page``) — the deck tests' assertion
    mirror of the reference's file-existence checks."""
    with open(path, "rb") as fh:
        data = fh.read()
    return data.count(b"/Type /Page ") + data.count(b"/Type /Page\n")
