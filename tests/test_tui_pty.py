"""End-to-end TUI run in a real pseudo-terminal: dashboard renders, keys
dispatch (including the help popup), 'x' exits cleanly, IQ is written."""

import os
import pty
import select
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not hasattr(pty, "openpty"), reason="needs a pty")
def test_tui_end_to_end(fixtures_dir, tmp_path):
    out = str(tmp_path / "tui.bin")
    env = dict(os.environ, JAX_PLATFORMS="cpu", TERM="xterm-256color")
    cmd = [
        sys.executable, "-m", "gpssim_tpu",
        "-e", f"{fixtures_dir}/brdc_test.22n",
        "-i", "-r", "iqfile", "--backend", "numpy", "--disable-almanac",
        "--out-file", out, "-d", "20",
    ]

    m, s = pty.openpty()
    os.set_blocking(m, False)
    p = subprocess.Popen(
        cmd, stdin=s, stdout=s, stderr=subprocess.PIPE, env=env, cwd=REPO,
    )
    os.close(s)
    buf = b""

    def drain(t):
        nonlocal buf
        end = time.time() + t
        while time.time() < end:
            r, _, _ = select.select([m], [], [], 0.2)
            if r:
                try:
                    buf += os.read(m, 65536)
                except OSError:
                    return

    def drain_until(markers, deadline_s):
        """Drain until every marker has been seen (loaded CI machines can
        take far longer than the happy-path ~2 s to first render)."""
        deadline = time.time() + deadline_s
        while time.time() < deadline and not all(
            mk in buf for mk in markers
        ):
            drain(0.5)

    drain_until((b"heading", b"PRN"), 90)  # dashboard up + blocks flowing
    os.write(m, b"\t")  # TAB → sky/ephemeris view
    drain_until((b"eph  sim",), 10)
    os.write(m, b"\t")  # back to the dashboard
    drain(0.4)
    for key in (b"d", b"w", b"e", b"h", b"q"):
        os.write(m, key)
        drain(0.4)
    drain_until((b"interactive controls",), 10)  # help popup rendered
    drain(1)
    os.write(m, b"x")
    drain(2)
    try:
        rc = p.wait(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()
    os.close(m)

    assert rc == 0, p.stderr.read().decode()[-2000:]
    text = buf.decode(errors="replace")
    for marker in ("gpssim-tpu", "heading", "PRN", "interactive controls"):
        assert marker in text, f"TUI never rendered {marker!r}"
    data = np.fromfile(out, dtype=np.int8)
    assert data.size % 600_000 == 0 and data.size > 0
    assert np.any(data)
