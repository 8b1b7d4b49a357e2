"""Flax CNNs: scene-coordinate regression and hypothesis scoring.

Replaces the Lua/Torch model zoo (core/lua/train_obj.lua, train_score.lua)
and the C++<->Lua marshalling bridge (core/lua_calls.h) — the nets live in
the same JAX program as the geometry, so the reference's three process
boundaries (SURVEY.md §3.1) disappear entirely.
"""

from dsac_tpu.models.coord_net import PatchCoordNet, DenseCoordNet, extract_patches
from dsac_tpu.models.score_net import ScoreNet
