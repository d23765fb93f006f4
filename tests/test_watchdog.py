"""SURVEY §5.3: the device-sync watchdog must abort loudly on a wedge
and be invisible otherwise."""

import subprocess
import sys


def test_watchdog_noop_when_fast():
    from real_tpu.utils.watchdog import watchdog
    with watchdog(30, "fast path"):
        x = 1 + 1
    assert x == 2


def test_watchdog_disabled_by_zero():
    from real_tpu.utils.watchdog import watchdog
    with watchdog(0, "disabled"):
        pass


def test_watchdog_aborts_wedged_process():
    code = (
        "import time, sys; sys.path.insert(0, '.')\n"
        "from real_tpu.utils.watchdog import watchdog\n"
        "with watchdog(0.3, 'wedged fetch'):\n"
        "    time.sleep(30)\n")
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=20)
    assert p.returncode == 3
    assert b"WATCHDOG" in p.stderr
    assert b"wedged fetch" in p.stderr
