"""Headless charter: render a StatPhase ``--stats`` JSON tree as SVG.

Counterpart of the reference's browser-side Charter (``www/charter/``);
this module is the layout engine shared by the interactive page
(``www/charter/index.html`` reimplements the same math in JS) and a CLI
for CI/batch use:

    tdc FILE -a ... --stats run.json   (or any StatPhase to_json dump)
    python etc/charter.py run.json -o run.svg

Layout: an icicle-style phase timeline (row = nesting depth, x = time in
ms; a child starts after the summed durations of its earlier siblings)
over a per-phase peak-memory bar list and the key/value stat table.
"""

from __future__ import annotations

import argparse
import html
import json

# categorical slots (validated order; see the data-viz reference
# palette) — identity of top-level phase branches, "Other"/root in gray
PALETTE = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
NEUTRAL = "#8a8984"
SEQ_HUE = "#2a78d6"  # memory bars: magnitude -> one hue
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
SURFACE = "#fcfcfb"
GRID = "#e4e3df"


def _spans(node, depth, start, branch, out):
    """Flatten the phase tree to (depth, start_ms, dur_ms, branch, node)."""
    out.append((depth, start, float(node["timeDelta"]), branch, node))
    t = start
    for i, child in enumerate(node.get("sub", [])):
        b = i if depth == 0 else branch
        _spans(child, depth + 1, t, b, out)
        t += float(child["timeDelta"])
    return out


def _fmt_ms(v: float) -> str:
    return f"{v / 1000:.2f}s" if v >= 1000 else f"{v:.1f}ms"


def _fmt_mem(v: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if v < 1024:
            return f"{v:.0f}{unit}"
        v /= 1024
    return f"{v:.1f}TiB"


def render_svg(tree: dict, width: int = 860) -> str:
    spans = _spans(tree, 0, 0.0, -1, [])
    total = max(float(tree["timeDelta"]), 1e-9)
    depth = max(s[0] for s in spans) + 1
    row_h, gap = 26, 2
    pad_l, pad_r, pad_t = 10, 10, 28
    plot_w = width - pad_l - pad_r
    mem_rows = [s for s in spans if s[4].get("memPeak", 0) > 0]
    mem_top = pad_t + depth * (row_h + gap) + 34
    mem_h = len(mem_rows) * (row_h - 8 + gap)
    max_mem = max(
        (float(s[4]["memPeak"]) for s in mem_rows), default=1.0
    )
    height = mem_top + mem_h + 16
    el = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="system-ui,sans-serif" '
        f'font-size="12">',
        f'<rect width="{width}" height="{height}" fill="{SURFACE}"/>',
        f'<text x="{pad_l}" y="16" fill="{TEXT}" font-weight="600">'
        f'Phase timeline — {_fmt_ms(total)} total</text>',
    ]
    # time grid: 4 ticks
    for k in range(5):
        x = pad_l + plot_w * k / 4
        y1 = pad_t
        y2 = pad_t + depth * (row_h + gap) - gap
        el.append(
            f'<line x1="{x:.1f}" y1="{y1}" x2="{x:.1f}" y2="{y2}" '
            f'stroke="{GRID}" stroke-width="1"/>'
        )
        el.append(
            f'<text x="{x:.1f}" y="{y2 + 14}" fill="{TEXT2}" '
            f'text-anchor="middle">{_fmt_ms(total * k / 4)}</text>'
        )
    for d, start, dur, branch, node in spans:
        x = pad_l + plot_w * start / total
        w = max(plot_w * dur / total - 1, 1.5)
        y = pad_t + d * (row_h + gap)
        color = NEUTRAL if branch < 0 else PALETTE[branch % 8]
        title = html.escape(str(node["title"]))
        tip = (
            f"{title}: {_fmt_ms(dur)}"
            f" · peak {_fmt_mem(float(node.get('memPeak', 0)))}"
        )
        el.append(
            f'<g><rect x="{x:.1f}" y="{y}" width="{w:.1f}" '
            f'height="{row_h}" rx="3" fill="{color}" '
            f'fill-opacity="0.92"><title>{html.escape(tip)}</title>'
            f'</rect>'
        )
        if w > 60:  # selective direct labels only where they fit
            el.append(
                f'<text x="{x + 5:.1f}" y="{y + row_h / 2 + 4}" '
                f'fill="#ffffff">{title[:int(w // 7)]}</text>'
            )
        el.append("</g>")
    # memory bars (sequential: magnitude in one hue)
    el.append(
        f'<text x="{pad_l}" y="{mem_top - 8}" fill="{TEXT}" '
        f'font-weight="600">Peak memory per phase</text>'
    )
    y = mem_top
    for d, _s, _dur, _b, node in mem_rows:
        mv = float(node["memPeak"])
        w = max(plot_w * 0.6 * mv / max_mem, 1.5)
        label = html.escape(str(node["title"]))
        el.append(
            f'<rect x="{pad_l + 170}" y="{y}" width="{w:.1f}" '
            f'height="{row_h - 10}" rx="3" fill="{SEQ_HUE}">'
            f'<title>{label}: {_fmt_mem(mv)}</title></rect>'
        )
        el.append(
            f'<text x="{pad_l + 164}" y="{y + row_h / 2 - 1}" '
            f'fill="{TEXT2}" text-anchor="end">'
            f'{"&#160;" * d}{label[:24]}</text>'
        )
        el.append(
            f'<text x="{pad_l + 176 + w:.1f}" y="{y + row_h / 2 - 1}" '
            f'fill="{TEXT}">{_fmt_mem(mv)}</text>'
        )
        y += row_h - 8 + gap
    el.append("</svg>")
    return "\n".join(el)


def stats_table(tree: dict) -> list[tuple[str, str, str, str]]:
    """(phase, time, memPeak, extra-stats) rows, depth-first."""
    rows = []
    for d, _s, dur, _b, node in _spans(tree, 0, 0.0, -1, []):
        extra = "; ".join(
            f"{s['key']}={s['value']}" for s in node.get("stats", [])
        )
        rows.append(
            (
                "  " * d + str(node["title"]),
                _fmt_ms(dur),
                _fmt_mem(float(node.get("memPeak", 0))),
                extra,
            )
        )
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("json_file")
    ap.add_argument("-o", "--out", default=None, help="SVG output path")
    ap.add_argument("--table", action="store_true",
                    help="print the phase table to stdout")
    args = ap.parse_args(argv)
    tree = json.load(open(args.json_file))
    svg = render_svg(tree)
    out = args.out or args.json_file + ".svg"
    with open(out, "w") as f:
        f.write(svg)
    print(f"wrote {out}")
    if args.table:
        for row in stats_table(tree):
            print(f"{row[0]:<40} {row[1]:>9} {row[2]:>9}  {row[3]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
