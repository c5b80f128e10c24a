"""Styled-console substitute (utils/console.py) — the reference renders
epoch lines + progress via rich (models/bagon/main.py:83-96,
Trainer.py:157-172); here the same semantics are stdlib ANSI, auto-disabled
off-TTY so logs and these tests see deterministic plain text."""

import io

from kindergarten_vq_vae_tpu.utils import console


class _TTY(io.StringIO):
    def isatty(self):
        return True


def test_style_disabled_is_identity(monkeypatch):
    monkeypatch.delenv("FORCE_COLOR", raising=False)
    assert console.style("abc", "#BD1376", bold=True, enable=False) == "abc"


def test_style_enabled_emits_truecolor_sgr():
    out = console.style("abc", "#BD1376", bold=True, enable=True)
    assert out.startswith("\x1b[1;38;2;189;19;118m") and out.endswith("\x1b[0m")
    assert "abc" in out


def test_color_enabled_respects_no_color(monkeypatch):
    monkeypatch.setenv("NO_COLOR", "1")
    assert not console.color_enabled(_TTY())
    monkeypatch.delenv("NO_COLOR")
    monkeypatch.setenv("FORCE_COLOR", "1")
    assert console.color_enabled(io.StringIO())


def test_epoch_line_plain_without_tty(monkeypatch):
    monkeypatch.delenv("FORCE_COLOR", raising=False)
    monkeypatch.setenv("NO_COLOR", "1")
    line = console.epoch_line(3, "train", ["loss: 1.0", "acc: 99%"], [True, False])
    assert line == "003 | train | loss: 1.0 | acc: 99%"


def test_epoch_line_styled_marks_best(monkeypatch):
    monkeypatch.delenv("NO_COLOR", raising=False)
    monkeypatch.setenv("FORCE_COLOR", "1")
    line = console.epoch_line(3, "val", ["loss: 1.0", "acc: 99%"], [True, False])
    assert "\x1b[" in line
    # exactly one best marker (an emoji from the val stage table)
    assert sum(line.count(e) for e in console.STATS_EMOJI["val"]) == 1


def test_progress_silent_off_tty(monkeypatch):
    monkeypatch.delenv("FORCE_COLOR", raising=False)
    buf = io.StringIO()
    p = console.ProgressLine("epochs", 4, stream=buf)
    p.advance()
    p.clear()
    p.close()
    assert buf.getvalue() == ""


def test_progress_renders_in_place_on_tty(monkeypatch):
    monkeypatch.delenv("NO_COLOR", raising=False)
    buf = _TTY()
    p = console.ProgressLine("epochs", 4, stream=buf)
    p.advance()
    out = buf.getvalue()
    assert out.startswith("\r") and "1/4" in out and "25.00%" in out
    p.clear()
    assert buf.getvalue().endswith("\r\x1b[2K")
