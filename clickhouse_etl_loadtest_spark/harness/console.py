"""Dependency-free console rendering: status log lines and boxed panels.

Parity with the reference's rich-based output surfaces
(/root/reference/src/utils/logger.py:7-53 — ✔/✗/△ status rows with colored
component tags; /root/reference/results.py:37-84 — per-variant bordered
panels around JSON bodies) without the ``rich`` dependency: plain ANSI codes
+ box-drawing characters, auto-disabled when stdout is not a TTY or NO_COLOR
is set (https://no-color.org/)."""

from __future__ import annotations

import os
import sys

_COLORS = {
    "red": "31",
    "green": "32",
    "yellow": "33",
    "blue": "34",
    "magenta": "35",
    "cyan": "36",
    "white": "37",
}


def supports_color(stream=None) -> bool:
    if os.environ.get("NO_COLOR"):  # no-color.org: present AND non-empty
        return False
    if os.environ.get("FORCE_COLOR"):
        return True
    stream = stream or sys.stdout
    return hasattr(stream, "isatty") and stream.isatty()


def style(text: str, color: str | None = None, bold: bool = False, enable: bool | None = None) -> str:
    if enable is None:
        enable = supports_color()
    if not enable or (color is None and not bold):
        return text
    codes = ([ "1"] if bold else []) + ([_COLORS[color]] if color else [])
    return f"\x1b[{';'.join(codes)}m{text}\x1b[0m"


# component -> tag color, mirroring logger.py's Kafka/Clickhouse/default scheme
_COMPONENT_COLORS = {"Kafka": "cyan", "Clickhouse": "yellow", "ClickHouse": "yellow"}


def log(
    message: str,
    status: str = "Success",
    is_success: bool = False,
    is_failure: bool = False,
    is_warning: bool = False,
    component: str = "Spark",
    stream=None,
) -> None:
    """One status row: icon, [component], message, status — the reference's
    log() contract including its exactly-one-flag validation."""
    flags = [is_success, is_failure, is_warning]
    if sum(flags) != 1:
        raise ValueError("exactly one of is_success, is_failure, is_warning must be True")
    stream = stream or sys.stdout
    enable = supports_color(stream)
    icon, color = (
        ("✔", "green") if is_success else ("✗", "red") if is_failure else ("△", "yellow")
    )
    tag_color = _COMPONENT_COLORS.get(component, "magenta")
    # pad the PLAIN text, then style: ANSI escapes inflate len() and would
    # defeat the format-width alignment in color mode
    tag = f"[{component}]".ljust(13)
    print(
        f"{style(icon, color, enable=enable)} "
        f"{style(tag, tag_color, bold=True, enable=enable)} "
        f"{message:<60} {style(status, color, enable=enable)}",
        file=stream,
    )


def panel(body: str, title: str = "", border_color: str = "blue", width: int = 80, stream=None) -> None:
    """Bordered panel around pre-formatted text (the rich.Panel shape)."""
    stream = stream or sys.stdout
    enable = supports_color(stream)
    lines = body.splitlines() or [""]
    inner = max(width - 4, max((len(ln) for ln in lines), default=0), len(title) + 4)

    def edge(left: str, right: str, mid: str = "") -> str:
        if mid:
            pad = inner + 2 - len(mid)
            bar = "─" * (pad // 2) + mid + "─" * (pad - pad // 2)
        else:
            bar = "─" * (inner + 2)
        return style(f"{left}{bar}{right}", border_color, enable=enable)

    print(edge("╭", "╮", f" {title} " if title else ""), file=stream)
    v = style("│", border_color, enable=enable)
    for ln in lines:
        print(f"{v} {ln:<{inner}} {v}", file=stream)
    print(edge("╰", "╯"), file=stream)
