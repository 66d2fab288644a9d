"""Parent-side bench orchestration: init-stall watchdog and part parsing.

The round-4 driver record lost five secondary benches to children that hung
for their WHOLE wall cap without printing anything — post-mortem'd to
transient TPU-client init stalls over the axon tunnel (the same part lands
in <20 s warm on the next spawn). bench.py now streams child stdout and
kills a child that never prints its `jax_ready` telemetry marker within
INIT_WINDOW_SEC, raising `_InitStall` so the orchestrator retries once
instead of burning the full cap. These tests exercise that state machine
with fake children (no jax, no TPU).
"""
import json
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _fake_child(body: str):
    """Monkeypatchable _PART_CMD producing a python child running `body`."""
    def cmd(name):
        return [sys.executable, "-u", "-c", body]
    return cmd


def test_silent_child_killed_as_init_stall(monkeypatch):
    # Child prints nothing (stuck in TPU client init): killed at the init
    # window, NOT at the much larger part cap, and classified _InitStall.
    monkeypatch.setattr(bench, "INIT_WINDOW_SEC", 3.0)
    monkeypatch.setattr(bench, "_PART_CMD",
                        _fake_child("import time; time.sleep(60)"))
    with pytest.raises(bench._InitStall):
        bench._run_part_subprocess("fake", timeout=50.0)


def test_marked_child_gets_full_cap_then_timeout(monkeypatch):
    # Child that HAS printed a marker (i.e. is compiling/running) is given
    # the full cap; on overrun the TimeoutExpired carries partial stdout so
    # the parent records tel_at_kill.
    # Init window chosen >> child interpreter startup (which can exceed 1 s
    # under parallel-suite load) but << the part timeout, so the marker is
    # always seen before the window closes.
    monkeypatch.setattr(bench, "INIT_WINDOW_SEC", 6.0)
    body = ("import json\n"
            "print(json.dumps({'_tel': {'stage': 'jax_ready'}}), flush=True)\n"
            "import time; time.sleep(60)\n")
    monkeypatch.setattr(bench, "_PART_CMD", _fake_child(body))
    with pytest.raises(subprocess.TimeoutExpired) as ei:
        bench._run_part_subprocess("fake", timeout=8.0)
    tel = bench._partial_tel(ei.value.stdout)
    assert tel is not None and tel["stage"] == "jax_ready"


def test_healthy_child_result_parsed(monkeypatch):
    # Marker lines are skipped; the result dict (whose keys may END in
    # `_tel` without containing the `"_tel"` marker key) is returned.
    monkeypatch.setattr(bench, "INIT_WINDOW_SEC", 30.0)
    body = ("import json\n"
            "print(json.dumps({'_tel': {'stage': 'jax_ready'}}), flush=True)\n"
            "print(json.dumps({'x': 1.5, 'fake_tel': {'compile_sec': 2}}),"
            " flush=True)\n")
    monkeypatch.setattr(bench, "_PART_CMD", _fake_child(body))
    out = bench._run_part_subprocess("fake", timeout=30.0)
    assert out == {"x": 1.5, "fake_tel": {"compile_sec": 2}}


def test_failed_child_raises_with_stderr(monkeypatch):
    monkeypatch.setattr(bench, "INIT_WINDOW_SEC", 30.0)
    body = "import sys; sys.stderr.write('boom\\n'); sys.exit(3)"
    monkeypatch.setattr(bench, "_PART_CMD", _fake_child(body))
    with pytest.raises(ValueError, match="boom"):
        bench._run_part_subprocess("fake", timeout=30.0)


def test_partial_tel_parses_last_marker():
    out = (json.dumps({"_tel": {"stage": "jax_ready"}}) + "\n"
           + json.dumps({"_tel": {"stage": "compiled", "compile_sec": 9.0}})
           + "\n")
    assert bench._partial_tel(out)["stage"] == "compiled"
    assert bench._partial_tel("") is None
    assert bench._partial_tel(None) is None
