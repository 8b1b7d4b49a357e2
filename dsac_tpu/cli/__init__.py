"""Entry programs, mirroring the reference's six executables
(core/CMakeLists.txt:49-108) plus the dataset-prep tool:

  python -m dsac_tpu.cli.train_obj           (train_obj.cpp)
  python -m dsac_tpu.cli.train_score         (train_score.cpp)
  python -m dsac_tpu.cli.train_ransac        (train_ransac.cpp)
  python -m dsac_tpu.cli.train_ransac_softam (train_ransac_softam.cpp)
  python -m dsac_tpu.cli.test_ransac         (test_ransac.cpp)
  python -m dsac_tpu.cli.test_ransac_softam  (test_ransac_softam.cpp)
  python -m dsac_tpu.cli.link_7scenes        (link_7scenes.py)

All accept the reference's abbreviated flags (-rI, -rT2D, ... see
dsac_tpu/flags.py) plus `--synthetic N` to run on the procedural scene
when no 7-Scenes data is present.
"""
