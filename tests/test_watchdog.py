"""HangWatchdog (train/watchdog.py): failure detection for wedged device
calls — heartbeat semantics, grace periods, suspension, and the stack dump.

All tests run in-process with sub-second timeouts and a callback (never the
"abort" os._exit path, which would kill the test runner)."""

import threading
import time

from flowdec_tpu.train.watchdog import HANG_EXIT_CODE, HangWatchdog


def _make(timeout=0.15, **kw):
    kw.setdefault("first_beat_grace", timeout)
    kw.setdefault("poll_interval", 0.02)
    fired = []
    wd = HangWatchdog(timeout=timeout, on_hang=fired.append, **kw)
    return wd, fired


def test_fires_on_silence_and_dumps_stacks(capfd):
    wd, fired = _make()
    with wd:
        time.sleep(0.5)
    assert fired and fired[0] >= 0.15
    assert wd.fired
    # faulthandler wrote every thread's stack to stderr, including this one
    err = capfd.readouterr().err
    assert "Current thread" in err or "Thread" in err
    assert "test_watchdog" in err


def test_beats_prevent_firing():
    wd, fired = _make()
    with wd:
        for _ in range(10):
            time.sleep(0.05)
            wd.beat()
    assert not fired and not wd.fired


def test_first_beat_grace_covers_compile():
    # steady-state timeout would fire, but the first interval gets the grace
    wd, fired = _make(timeout=0.1, first_beat_grace=10.0)
    with wd:
        time.sleep(0.4)   # "compiling" — no beats yet
        wd.beat()
        time.sleep(0.05)
    assert not fired


def test_suspended_exempts_long_phase_then_rearms():
    wd, fired = _make()
    with wd:
        wd.beat()
        with wd.suspended():
            time.sleep(0.5)  # "validation" — far past timeout
        assert not fired
        time.sleep(0.5)      # back in the loop, silent → must fire now
    assert fired


def test_suspension_is_bounded_by_max_suspend():
    """A hang INSIDE a suspended phase must still fire (observed live: an
    async Orbax checkpoint save wedged on a dead tunnel while maybe_save sat
    in suspended() — the unbounded watchdog never fired and the stage burned
    its whole wall budget)."""
    wd, fired = _make(max_suspend=0.3)
    with wd:
        wd.beat()
        with wd.suspended():
            time.sleep(0.6)  # "checkpoint write" that never returns
            assert fired    # fired while still suspended
    assert fired


def test_rearms_in_log_mode_instead_of_spamming():
    wd, fired = _make(timeout=0.1)
    with wd:
        time.sleep(0.45)
    # re-arm after each fire: ~0.45/0.1 windows but only a handful of fires,
    # and each fire is a full timeout apart, not one per 0.02 poll
    assert 1 <= len(fired) <= 5


def test_exit_code_is_distinct():
    assert HANG_EXIT_CODE not in (0, 1, 2, 137, 139, 143)


def test_trainer_accepts_hang_timeout():
    import inspect

    from flowdec_tpu.train.trainer import Trainer

    assert "hang_timeout" in inspect.signature(Trainer.__init__).parameters


def test_watchdog_thread_is_daemon_and_stops_cleanly():
    wd, _ = _make(timeout=5.0)
    wd.start()
    th = wd._thread
    assert isinstance(th, threading.Thread) and th.daemon
    wd.stop()
    assert not th.is_alive()


def test_abort_path_exits_113_in_subprocess():
    """The real on_hang='abort' path: a subprocess arms the watchdog, blocks
    in a C-level sleep (no beats), and must die with HANG_EXIT_CODE and an
    all-thread stack dump on stderr."""
    import subprocess
    import sys

    code = (
        "import time\n"
        "from flowdec_tpu.train.watchdog import HangWatchdog\n"
        "wd = HangWatchdog(timeout=0.3, first_beat_grace=0.3,\n"
        "                  poll_interval=0.05).start()\n"
        "time.sleep(30)\n"
        "print('not reached')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=120)
    assert proc.returncode == HANG_EXIT_CODE, (proc.returncode, proc.stderr[-500:])
    assert "HangWatchdog" in proc.stderr
    assert "Thread" in proc.stderr  # faulthandler dump present
    assert "not reached" not in proc.stdout
