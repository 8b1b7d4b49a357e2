"""Datasets: synthetic procedural scenes and the 7-Scenes folder layout.

The synthetic generator provides exact ground truth (pose, depth, scene
coordinates) for tests, training smoke runs and benchmarks; the 7-Scenes
loader replicates the reference's on-disk convention (core/dataset.h,
link_7scenes.py) for real data.
"""

from dsac_tpu.data.synthetic import ARCHETYPES, SyntheticScene, make_scene
