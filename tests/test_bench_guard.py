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


def test_guard_gives_up_with_exit_75(tmp_path, monkeypatch):
    cmd = _fake_inner(tmp_path, """
        import sys
        sys.exit(3)
    """)
    monkeypatch.setattr(bench, "_inner_cmd", lambda: cmd)
    monkeypatch.setenv("BENCH_ATTEMPTS", "2")
    with pytest.raises(SystemExit) as ei:
        bench.run_with_wedge_guard()
    assert ei.value.code == 75


def test_inner_env_routes_to_measurement(monkeypatch):
    """_BENCH_INNER=1 must route main() to the actual measurement (no
    recursive guard)."""
    called = []
    monkeypatch.setattr(bench, "measure_and_print",
                        lambda: called.append(True))
    monkeypatch.setenv("_BENCH_INNER", "1")
    bench.main()
    assert called == [True]
