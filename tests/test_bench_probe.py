"""bench.py's TPU-availability probe (the axon-tunnel-outage guard)."""

import subprocess

import bench


class _FakeClock:
    def __init__(self):
        self.t = 0.0

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.t += s


def _patch_time(monkeypatch, clock):
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)


def test_probe_succeeds_after_transient_outage(monkeypatch):
    clock = _FakeClock()
    _patch_time(monkeypatch, clock)
    calls = []

    def fake_run(cmd, timeout, **kw):
        calls.append(cmd)
        if len(calls) < 3:  # two hangs, then the tunnel comes back
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr("subprocess.run", fake_run)
    assert bench._wait_for_tpu(max_wait_s=3600, interval_s=60) is True
    assert len(calls) == 3


def test_probe_gives_up_at_deadline(monkeypatch):
    clock = _FakeClock()
    _patch_time(monkeypatch, clock)

    def always_hang(cmd, timeout, **kw):
        clock.t += timeout  # a hung probe consumes wall-clock too
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr("subprocess.run", always_hang)
    assert bench._wait_for_tpu(max_wait_s=300, probe_timeout_s=150,
                               interval_s=60) is False
    assert clock.t >= 300  # actually waited the window out


def test_probe_nonzero_exit_retries(monkeypatch):
    """A probe that exits non-zero (e.g. UNAVAILABLE raise) retries too."""
    clock = _FakeClock()
    _patch_time(monkeypatch, clock)
    rcs = iter([1, 1, 0])

    def fake_run(cmd, timeout, **kw):
        return subprocess.CompletedProcess(cmd, next(rcs))

    monkeypatch.setattr("subprocess.run", fake_run)
    assert bench._wait_for_tpu(max_wait_s=3600, interval_s=60) is True
