"""Console-rendering parity (C8): status rows and bordered panels without the
rich dependency; color auto-off for non-TTY / NO_COLOR."""

import io

import pytest

from clickhouse_etl_loadtest_spark.harness.console import log, panel, style, supports_color


def test_log_requires_exactly_one_flag():
    buf = io.StringIO()
    with pytest.raises(ValueError):
        log("m", stream=buf)  # none set
    with pytest.raises(ValueError):
        log("m", is_success=True, is_failure=True, stream=buf)  # two set
    log("all good", is_success=True, component="Kafka", stream=buf)
    out = buf.getvalue()
    assert "✔" in out and "[Kafka]" in out and "all good" in out and "Success" in out
    assert "\x1b[" not in out  # StringIO is not a TTY -> no ANSI codes


def test_log_failure_and_warning_icons():
    buf = io.StringIO()
    log("broke", status="Failed", is_failure=True, component="Clickhouse", stream=buf)
    log("careful", status="Check", is_warning=True, stream=buf)
    out = buf.getvalue()
    assert "✗" in out and "Failed" in out
    assert "△" in out and "Check" in out


def test_panel_draws_box_with_title():
    buf = io.StringIO()
    panel("line one\nline two", title="My Panel", width=30, stream=buf)
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("╭") and lines[0].endswith("╮") and " My Panel " in lines[0]
    assert lines[-1].startswith("╰") and lines[-1].endswith("╯")
    assert lines[1].startswith("│") and "line one" in lines[1]
    # all rows equally wide (straight right border)
    assert len({len(ln) for ln in lines}) == 1


def test_no_color_env_wins(monkeypatch):
    monkeypatch.setenv("NO_COLOR", "1")
    monkeypatch.setenv("FORCE_COLOR", "1")
    assert not supports_color()
    assert style("x", "red", enable=None) == "x"


def test_style_emits_ansi_when_forced(monkeypatch):
    monkeypatch.delenv("NO_COLOR", raising=False)
    monkeypatch.setenv("FORCE_COLOR", "1")
    assert style("x", "red", bold=True) == "\x1b[1;31mx\x1b[0m"

