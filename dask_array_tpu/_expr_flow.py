"""expr_flow: an SVG dataflow diagram of an expression tree.

Parity: ``/root/reference/dask_array/_expr_flow.py`` — fresh, minimal
implementation: layered top-down layout (leaves at the bottom), one box per
node with op name / shape / chunksize, straight edges.
"""

from __future__ import annotations

import html

from dask_array_tpu._expr import ArrayExpr

_BOX_W = 190
_BOX_H = 46
_XGAP = 26
_YGAP = 42


class ExprFlow:
    """Holds the SVG; renders inline in notebooks via _repr_html_."""

    def __init__(self, svg: str):
        self.svg = svg

    def _repr_html_(self):
        return self.svg

    def __repr__(self):
        return f"<ExprFlow: {self.svg.count('<rect')} nodes>"

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.svg)


def _levels(root: ArrayExpr):
    """node name -> depth (longest path from root)."""
    depth = {root._name: 0}
    order = [root]
    seen = {root._name}
    queue = [root]
    while queue:
        node = queue.pop(0)
        for dep in node.dependencies():
            d = depth[node._name] + 1
            if dep._name not in depth or depth[dep._name] < d:
                depth[dep._name] = d
            if dep._name not in seen:
                seen.add(dep._name)
                order.append(dep)
                queue.append(dep)
    return depth, order


def expr_flow(x, optimize: bool = False):
    """Render the expression tree of ``x`` as an SVG dataflow diagram."""
    from dask_array_tpu._collection import Array

    expr = x.expr if isinstance(x, Array) else x
    if optimize:
        expr = expr.optimize()

    depth, order = _levels(expr)
    by_level: dict[int, list] = {}
    for node in order:
        by_level.setdefault(depth[node._name], []).append(node)

    n_levels = max(by_level) + 1
    widest = max(len(v) for v in by_level.values())
    width = widest * (_BOX_W + _XGAP) + _XGAP
    height = n_levels * (_BOX_H + _YGAP) + _YGAP

    pos = {}
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        'font-family="monospace" font-size="11">'
    ]
    for lvl, nodes in sorted(by_level.items()):
        row_w = len(nodes) * (_BOX_W + _XGAP)
        x0 = (width - row_w) / 2 + _XGAP / 2
        y = _YGAP / 2 + lvl * (_BOX_H + _YGAP)
        for i, node in enumerate(nodes):
            bx = x0 + i * (_BOX_W + _XGAP)
            pos[node._name] = (bx + _BOX_W / 2, y, y + _BOX_H)
            label = html.escape(type(node).__name__)
            try:
                sub = html.escape(f"{node.shape} @ {node.chunksize}")
            except Exception:
                sub = ""
            is_leaf = not node.dependencies()
            fill = "#D5EBD5" if is_leaf else "#DDEBF7"
            parts.append(
                f'<rect x="{bx:.0f}" y="{y:.0f}" width="{_BOX_W}" height="{_BOX_H}" '
                f'rx="6" fill="{fill}" stroke="#555"/>'
                f'<text x="{bx + _BOX_W / 2:.0f}" y="{y + 18:.0f}" text-anchor="middle" '
                f'font-weight="bold">{label}</text>'
                f'<text x="{bx + _BOX_W / 2:.0f}" y="{y + 34:.0f}" text-anchor="middle" '
                f'fill="#333">{sub}</text>'
            )
    # edges: parent bottom -> child top
    for node in order:
        px, _, p_bot = pos[node._name]
        for dep in node.dependencies():
            cx, c_top, _ = pos[dep._name]
            parts.append(
                f'<line x1="{px:.0f}" y1="{p_bot:.0f}" x2="{cx:.0f}" y2="{c_top:.0f}" '
                'stroke="#888" stroke-width="1.2"/>'
            )
    parts.append("</svg>")
    return ExprFlow("".join(parts))
