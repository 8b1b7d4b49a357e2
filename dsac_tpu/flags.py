"""Config-file + command-line flag parsing, reference-compatible.

Replaces GlobalProperties::parseConfig/readArguments
(core/properties.cpp:97-306): a `default.config` file of `key value`
lines is parsed first, then CLI flags override.  The abbreviated,
case-sensitive flag names are the reference's own (-rI, -rRI, -rB, -rSS,
-rT2D, -rT3D, -rdraw, -fl, -xs, -ys, -sfl, -rxs, -rys, -rd, -iw, -ih,
-oscript/-sscript/-omodel/-smodel, -c), so existing per-scene 7-Scenes
config files work unchanged.  The result is an immutable DSACConfig.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from dsac_tpu.config import DataConfig, DSACConfig, NetConfig, PoseConfig

# flag -> (section, field, type); sections: pose / data / str
_FLAG_TABLE = {
    "rI": ("pose", "num_hypotheses", int),
    "rRI": ("pose", "refinement_steps", int),
    "rB": ("pose", "inlier_count_cap", int),
    "rSS": ("pose", "gradient_subsample", float),
    "rT2D": ("pose", "inlier_threshold_2d", float),
    "rT3D": ("pose", "inlier_threshold_3d", float),
    "rdraw": ("pose", "random_draw", lambda v: bool(int(v))),
    "fl": ("data", "focal_length", float),
    "xs": ("data", "x_shift", float),
    "ys": ("data", "y_shift", float),
    "sfl": ("data", "secondary_focal_length", float),
    "rxs": ("data", "raw_x_shift", float),
    "rys": ("data", "raw_y_shift", float),
    "rd": ("data", "raw_data", lambda v: bool(int(v))),
    "iw": ("data", "image_width", int),
    "ih": ("data", "image_height", int),
}

# model/script paths (the Lua script flags map to checkpoint names here)
_STR_FLAGS = {"oscript", "sscript", "omodel", "smodel", "c"}


def parse_config_file(path: str | Path, updates: dict | None = None) -> dict:
    """`key value` lines -> flag dict (parseConfig, properties.cpp:277-306).

    Lines starting with '#' are comments; unknown keys are kept as strings
    (forward compatibility).
    """
    updates = dict(updates or {})
    p = Path(path)
    if p.exists():
        for line in p.read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            toks = line.split()
            if len(toks) >= 2:
                updates.setdefault(toks[0], toks[1])
    return updates


def parse_argv(argv: list[str], updates: dict | None = None) -> dict:
    """`-flag value` pairs -> flag dict (readArguments,
    properties.cpp:97-268).  CLI wins over config-file values."""
    updates = dict(updates or {})
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("-") and i + 1 < len(argv):
            updates[tok[1:]] = argv[i + 1]
            i += 2
        else:
            i += 1
    return updates


def build_config(flag_values: dict) -> tuple[DSACConfig, dict]:
    """Flag dict -> (DSACConfig, leftover string settings)."""
    pose_kw, data_kw, strings = {}, {}, {}
    for k, v in flag_values.items():
        if k in _FLAG_TABLE:
            section, field, typ = _FLAG_TABLE[k]
            (pose_kw if section == "pose" else data_kw)[field] = typ(v)
        else:
            strings[k] = v
    cfg = DSACConfig(pose=PoseConfig(**pose_kw), data=DataConfig(**data_kw),
                     net=NetConfig())
    return cfg, strings


def load(argv: list[str] | None = None,
         config_name: str | None = None) -> tuple[DSACConfig, dict]:
    """Full load path, reference order: default.config, then the file named
    by -c/config_name, then CLI flags (properties.cpp:270-306)."""
    argv = list(argv or [])
    cli = parse_argv(argv)
    name = str(cli.get("c", config_name or "default"))
    # the reference takes a bare config NAME and appends ".config"
    # (properties.cpp:283); a full filename/path is accepted here too
    path = name if name.endswith(".config") else f"{name}.config"
    flags = {}
    flags = parse_config_file(path, flags)
    flags.update(cli)
    return build_config(flags)
