"""Genuinely multi-PROCESS distributed execution (2 procs x 4 devices).

Wraps scripts/dryrun_multiprocess.py: cross-process sharded training,
the exact same-draw equivalence oracle across the process boundary,
sharded + fused serve with process-local readback, and multiprocess
orbax save/restore.  The single-process 8-device farm used by the rest
of the suite cannot see this class of bug (global-array assembly,
process-local feeding, checkpoint coordination).
"""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
SCRIPT = REPO / "scripts" / "dryrun_multiprocess.py"


def test_two_process_dryrun():
    proc = subprocess.run(
        [sys.executable, str(SCRIPT)], cwd=REPO, timeout=900,
        capture_output=True, text=True)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    report = json.loads(
        (REPO / "results" / "multiprocess_dryrun.json").read_text())
    assert report["ok"] is True
    assert report["procs"] == 2 and report["devices"] == 8
    for bias_case in report["oracle"]:
        assert bias_case["sharded"] == bias_case["emulated"] or abs(
            bias_case["sharded"] - bias_case["emulated"]
        ) <= 1e-4 * abs(bias_case["emulated"])
    assert report["orbax_roundtrip"] == "bit-equal"
