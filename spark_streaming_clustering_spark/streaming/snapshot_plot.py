"""Deterministic SVG export of a G-Stream model snapshot.

The reference commits visual regression artifacts of each snapshot —
prototype graph plotted over the data window (conf/test/results/
DS1-100-3-{kk}_MapData.jpg, produced by its plotting hook at snapshot
milestones).  This is the Spark-side counterpart: a vector-graphics
render of the same content (nodes at their prototype coordinates,
edges from the adjacency matrix, node radius scaled by weight),
written at the same B10 snapshot milestones when plotting is enabled.

SVG instead of JPEG on purpose: the container has no raster imaging
libs (house rule: no pip installs), and a byte-deterministic text
artifact is diffable/goldenable the way the reference's JPEGs never
were.  Determinism contract: fixed viewBox derived from data bounds,
fixed 4-decimal coordinate formatting, elements emitted in sorted
(node_id / (src, dst)) order — two exports of the same model are
byte-identical (pinned in tests/test_snapshot_plot.py).

Driver-side and bounded by model size (<= ~300 nodes), exactly like
the reference's plot hook — the data being plotted IS the driver-held
model, so there is nothing to distribute.
"""

from __future__ import annotations

import os

from .gstream_model import GStreamModel

_W = 640  # canvas size in px (fixed: part of the byte-determinism contract)
_PAD = 24


def _fmt(v: float) -> str:
    """Fixed 4-decimal formatting; normalizes -0.0 so byte equality
    cannot depend on the sign of a rounded-to-zero coordinate."""
    s = f"{v:.4f}"
    return "0.0000" if s == "-0.0000" else s


def snapshot_svg(model: GStreamModel, dims: tuple[int, int] = (0, 1)) -> str:
    """Render the model graph to an SVG string.

    ``dims`` picks the two vector components to plot — the reference's
    DS1 data is 2-d so its plots are exactly dims (0, 1); for higher-d
    models (64-d embeddings) this is the standard coordinate-pair
    projection.
    """
    dx, dy = dims
    order = sorted(range(model.n_nodes), key=lambda i: int(model.node_ids[i]))
    xs = [float(model.nodes[i][dx]) for i in order]
    ys = [float(model.nodes[i][dy]) for i in order]
    ids = [int(model.node_ids[i]) for i in order]
    ws = [float(model.weights[i]) for i in order]
    # row index (adjacency matrix position) -> canvas position, for edges
    pos_by_row = {}

    lo_x, hi_x = (min(xs), max(xs)) if xs else (0.0, 1.0)
    lo_y, hi_y = (min(ys), max(ys)) if ys else (0.0, 1.0)
    span_x = (hi_x - lo_x) or 1.0
    span_y = (hi_y - lo_y) or 1.0

    def sx(v: float) -> float:
        return _PAD + (v - lo_x) / span_x * (_W - 2 * _PAD)

    def sy(v: float) -> float:
        # SVG y grows downward; flip so the plot reads like the
        # reference's cartesian MapData renders
        return _W - _PAD - (v - lo_y) / span_y * (_W - 2 * _PAD)

    for i in order:
        pos_by_row[i] = (sx(float(model.nodes[i][dx])), sy(float(model.nodes[i][dy])))

    max_w = max(ws) if ws else 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {_W} {_W}" '
        f'width="{_W}" height="{_W}">',
        f'<rect width="{_W}" height="{_W}" fill="white"/>',
    ]
    for s, d in sorted(model.edge_list()):
        if s >= d:  # adjacency matrix is symmetric; draw each edge once
            continue
        x1, y1 = pos_by_row[s]
        x2, y2 = pos_by_row[d]
        parts.append(
            f'<line x1="{_fmt(x1)}" y1="{_fmt(y1)}" x2="{_fmt(x2)}" '
            f'y2="{_fmt(y2)}" stroke="#888888" stroke-width="1"/>'
        )
    for i, (node_id, w) in enumerate(zip(ids, ws)):
        x, y = sx(xs[i]), sy(ys[i])
        r = 3.0 + 7.0 * (w / max_w if max_w > 0 else 0.0)
        parts.append(
            f'<circle cx="{_fmt(x)}" cy="{_fmt(y)}" r="{_fmt(r)}" '
            f'fill="#1f6fb2" fill-opacity="0.8">'
            f"<title>node {node_id} w={_fmt(w)}</title></circle>"
        )
    parts.append("</svg>")
    return "\n".join(parts) + "\n"


def write_snapshot_svg(
    model: GStreamModel, out_dir: str, kk: int, dims: tuple[int, int] = (0, 1)
) -> str:
    """Write ``{out_dir}/MapData-{kk}.svg`` (the reference's
    ``...-{kk}_MapData.jpg`` naming, SVG-typed); returns the path."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"MapData-{kk}.svg")
    with open(path, "w") as f:
        f.write(snapshot_svg(model, dims=dims))
    return path
