"""segment — layout-block segmentation via reading-order sweep heuristics.

North-star component: orders the positioned text runs produced by
``pdfmini.parse_content`` into deterministic page text.  The reference
never does layout analysis (it ships pixels to a model,
``clients/claude.py:40-108``); this module supplies the
"layout-block segmentation via reading-order sweep-line heuristics" the
rebuild mandates.

Algorithm (deterministic, stable tie-breaks everywhere):

1. **Column split** — sweep the x-axis for a vertical gutter: if the runs
   separate into groups with a gap ≥ ``COLUMN_GAP`` between the max-x of
   one group and the min-x of the next, treat the groups as columns and
   order them left → right, reading each column fully before the next.
2. **Line clustering** — within a column, group runs whose baselines are
   within ``LINE_TOL`` into one line (PDF y grows upward, so reading order
   sorts by -y); runs within a line sort by x (ties: input order, which the
   tokenizer emits deterministically).
3. **Emit** — runs in a line joined by a single space; lines joined by
   newline.
"""

from __future__ import annotations

from .pdfmini import Run

LINE_TOL = 3.0      # pts: baselines closer than this are one line
COLUMN_GAP = 40.0   # pts: minimum empty gutter that splits columns


def _split_columns(runs: list[Run]) -> list[list[Run]]:
    if len(runs) < 4:
        return [runs]
    # x-interval per run: [x, x + crude_width]
    spans = sorted(((r.x, r.x + max(6.0, 0.5 * 12 * len(r.text) / 10 * 10)), i)
                   for i, r in enumerate(runs))
    # merge intervals, find gutters
    merged: list[list[float]] = []
    for (lo, hi), _ in spans:
        if merged and lo <= merged[-1][1] + COLUMN_GAP:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if len(merged) < 2:
        return [runs]
    bounds = [m[0] for m in merged[1:]]
    cols: list[list[Run]] = [[] for _ in range(len(merged))]
    for r in runs:
        idx = sum(1 for b in bounds if r.x >= b)
        cols[idx].append(r)
    return [c for c in cols if c]


def _lines(col: list[Run]) -> list[list[Run]]:
    # stable sort by -y; then cluster
    order = sorted(range(len(col)), key=lambda i: (-col[i].y, col[i].x, i))
    lines: list[list[Run]] = []
    last_y: float | None = None
    for i in order:
        r = col[i]
        if last_y is None or abs(r.y - last_y) > LINE_TOL:
            lines.append([r])
            last_y = r.y
        else:
            lines[-1].append(r)
    for line in lines:
        line.sort(key=lambda r: r.x)
    return lines


def reading_order_text(runs: list[Run]) -> str:
    """Assemble page text in reading order: columns L→R, lines top→bottom."""
    if not runs:
        return ""
    parts: list[str] = []
    for col in _split_columns(runs):
        for line in _lines(col):
            parts.append(" ".join(r.text.strip() for r in line if r.text.strip()))
    return "\n".join(p for p in parts if p)
