"""bench.py wedge guard: the driver-contract JSON line must survive a
silent relay wedge (CLAUDE.md failure mode, observed live in round 2:
child futex-blocked with zero CPU mid device call).  The guard runs the
measurement in a child process, watches its stderr stream, and retries
once in a fresh process on stall."""
import json
import sys
import textwrap

import pytest

import bench


JSON_LINE = ('{"metric": "train3d_gan_step_iters_per_sec_scale5", '
             '"value": 1.0, "unit": "iter/s", "vs_baseline": 100.0, '
             '"mode": "fast"}')


def _fake_inner(tmp_path, body):
    script = tmp_path / "fake_inner.py"
    script.write_text(textwrap.dedent(body))
    return [sys.executable, str(script)]


def test_guard_forwards_json_line(tmp_path, monkeypatch, capsys):
    cmd = _fake_inner(tmp_path, f"""
        import sys
        print('noise on stderr', file=sys.stderr)
        print('{JSON_LINE}')
    """)
    monkeypatch.setattr(bench, "_inner_cmd", lambda: cmd)
    bench.run_with_wedge_guard()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # the one-JSON-line contract
    assert json.loads(out[0])["unit"] == "iter/s"


def test_guard_kills_wedged_child_and_retries(tmp_path, monkeypatch,
                                              capsys):
    marker = tmp_path / "first_attempt_ran"
    cmd = _fake_inner(tmp_path, f"""
        import os, sys, time
        marker = {str(marker)!r}
        if not os.path.exists(marker):
            open(marker, 'w').close()
            time.sleep(600)  # silent wedge: no output, never returns
        print('{JSON_LINE}')
    """)
    monkeypatch.setattr(bench, "_inner_cmd", lambda: cmd)
    monkeypatch.setenv("BENCH_STALL_S", "1")
    monkeypatch.setenv("BENCH_ATTEMPTS", "2")
    bench.run_with_wedge_guard()
    captured = capsys.readouterr()
    assert marker.exists()  # first attempt really started and was killed
    assert json.loads(captured.out.strip())["value"] == 1.0


def test_guard_propagates_deterministic_failure(tmp_path, monkeypatch):
    """A clean nonzero child exit is a reproducible bug, not a wedge:
    propagate the child's own returncode (no retry), keeping exit 75
    reserved for transient relay wedges (ADVICE r2)."""
    marker = tmp_path / "attempts"
    cmd = _fake_inner(tmp_path, f"""
        import sys
        with open({str(marker)!r}, 'a') as f:
            f.write('x')
        sys.exit(3)
    """)
    monkeypatch.setattr(bench, "_inner_cmd", lambda: cmd)
    monkeypatch.setenv("BENCH_ATTEMPTS", "2")
    with pytest.raises(SystemExit) as ei:
        bench.run_with_wedge_guard()
    assert ei.value.code == 3
    assert marker.read_text() == "x"  # exactly one attempt — no retry


def test_guard_gives_up_with_exit_75_on_repeated_wedge(tmp_path,
                                                       monkeypatch):
    cmd = _fake_inner(tmp_path, """
        import time
        time.sleep(600)  # always wedges
    """)
    monkeypatch.setattr(bench, "_inner_cmd", lambda: cmd)
    monkeypatch.setenv("BENCH_STALL_S", "1")
    monkeypatch.setenv("BENCH_ATTEMPTS", "2")
    with pytest.raises(SystemExit) as ei:
        bench.run_with_wedge_guard()
    assert ei.value.code == 75


def test_guard_survives_stdout_flood(tmp_path, monkeypatch, capsys):
    """A child that writes >64KB to stdout before the JSON line must not
    deadlock on a full pipe (which would read as log silence and a bogus
    wedge kill, ADVICE r2)."""
    cmd = _fake_inner(tmp_path, f"""
        import sys
        for _ in range(4000):
            print('x' * 80)  # ~320KB of stray stdout
        print('{JSON_LINE}')
    """)
    monkeypatch.setattr(bench, "_inner_cmd", lambda: cmd)
    monkeypatch.setenv("BENCH_STALL_S", "30")
    bench.run_with_wedge_guard()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 1.0


def test_truncated_baseline_cache_is_remeasured(tmp_path, monkeypatch):
    """A SIGKILL mid-write can truncate BASELINE_MEASURED.json; get_baseline
    must fall back to re-measuring instead of raising JSONDecodeError."""
    cache = tmp_path / "BASELINE_MEASURED.json"
    cache.write_text('{"fingerprint": {"trunc')  # torn write
    monkeypatch.setattr(bench, "CACHE", str(cache))
    monkeypatch.setattr(bench, "bench_reference", lambda: 0.123)
    assert bench.get_baseline() == 0.123
    assert json.loads(cache.read_text())["iters_per_sec"] == 0.123


def test_inner_env_routes_to_measurement(monkeypatch):
    """_BENCH_INNER=1 must route main() to the actual measurement (no
    recursive guard)."""
    called = []
    monkeypatch.setattr(bench, "measure_and_print",
                        lambda: called.append(True))
    monkeypatch.setenv("_BENCH_INNER", "1")
    bench.main()
    assert called == [True]
