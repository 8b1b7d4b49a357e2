"""Metric logging: reference-compatible text files + coloured console.

The reference's observability is plain-text statistics files with
documented column layouts (test_ransac.cpp:91-102, 221-233, 265-273;
train_ransac.cpp:126-127, 403-407) plus ANSI-coloured stdout narration
(core/util.h:36-39).  Both are reproduced here; richer structured logs
(JSONL) ride alongside.
"""

from __future__ import annotations

import json
from pathlib import Path


def blue(s: str) -> str:
    return f"\033[34m{s}\033[0m"


def green(s: str) -> str:
    return f"\033[32m{s}\033[0m"


def red(s: str) -> str:
    return f"\033[31m{s}\033[0m"


def yellow(s: str) -> str:
    return f"\033[33m{s}\033[0m"


class TrainingLog:
    """Per-round training loss file: `<round> <loss>` per line
    (train_ransac.cpp:403-407 layout)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def append(self, round_idx: int, loss: float, extra: dict | None = None):
        cols = [str(round_idx), f"{loss:.6f}"]
        if extra:
            cols += [f"{v:.6f}" for v in extra.values()]
        self._f.write(" ".join(cols) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TestLog:
    """Per-frame eval file + summary, mirroring test_ransac.cpp.

    Per-frame line — the reference's exact 11 columns
    (test_ransac.cpp:221-233):

        0  expected loss over the hypothesis pool
        1  entropy of the score distribution
        2  loss of the selected hypothesis
        3  translational error (mm)
        4  rotational error (deg)
        5-7  selected pose, Rodrigues rotation vector
             (7-Scenes camera-to-world convention)
        8-10 selected pose, translation in metres (translation.txt
             offset re-added)

    Summary line: accuracy, mean/std expected loss, mean/std entropy,
    median rot (deg), median trans (cm) (test_ransac.cpp:265-273).
    """

    def __init__(self, out_dir: str | Path, tag: str):
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        # the reference embeds script/model/draw settings in filenames
        # (test_ransac.cpp:92)
        self.err_path = out / f"ransac_pose_errors_{tag}.txt"
        self.summary_path = out / f"ransac_summary_{tag}.txt"
        self._f = open(self.err_path, "w")

    def frame(self, expected_loss: float, entropy: float, loss: float,
              trans_err_mm: float, rot_err_deg: float,
              pose_vec6=None):
        cols = [expected_loss, entropy, loss, trans_err_mm, rot_err_deg]
        if pose_vec6 is not None:
            cols += [float(v) for v in pose_vec6]
        self._f.write(" ".join(f"{c:.6f}" for c in cols) + "\n")
        self._f.flush()

    def summary(self, stats: dict):
        with open(self.summary_path, "w") as f:
            f.write(f"{stats['accuracy_5cm5deg']:.6f} "
                    f"{stats.get('mean_expected_loss', 0.0):.6f} "
                    f"{stats.get('std_expected_loss', 0.0):.6f} "
                    f"{stats.get('mean_entropy_bits', 0.0):.6f} "
                    f"{stats.get('std_entropy_bits', 0.0):.6f} "
                    f"{stats['median_rot_err_deg']:.6f} "
                    f"{stats['median_trans_err_cm']:.6f}\n")

    def close(self):
        self._f.close()


class JsonlLog:
    """Structured sidecar log (no reference counterpart)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def write(self, record: dict):
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
