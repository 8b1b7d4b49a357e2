"""Shared CLI plumbing: frame sources, model builders, checkpoint glue."""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import os
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import DSACConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.models import DenseCoordNet, PatchCoordNet, ScoreNet
from dsac_tpu.models.coord_net import extract_patches, gather_dense_coords
from dsac_tpu.utils import checkpoint as ckpt


@dataclasses.dataclass
class Frame:
    rgb: np.ndarray  # (H, W, 3) float32 0..255
    pose: Pose  # scene -> eye, mm
    obj: np.ndarray | None = None  # (H, W, 3) GT scene coords mm (0=invalid)
    depth: np.ndarray | None = None  # (H, W) mm


class SyntheticSource:
    """Procedural frames with exact GT (used when no dataset is given).

    Frames are rendered once (jitted) and cached host-side — the training
    loops revisit frames thousands of times.  A shared on-disk cache
    (DSAC_TPU_FRAME_CACHE, default runs/frame_cache; empty string
    disables) additionally persists rendered frames across processes: a
    training recipe is several CLI programs over the same viewpoint set,
    and re-staging 512 frames over a remote-TPU tunnel costs ~10 min per
    program.  Renders are deterministic in (seed, index), so the cache
    key is just that pair plus the scene's dataclass repr.
    """

    def __init__(self, n_frames: int, seed: int = 0, scene=None):
        self.scene = scene or SyntheticScene()
        self.n = n_frames
        self.seed = seed
        self._cache: dict[int, Frame] = {}
        cache_root = os.environ.get("DSAC_TPU_FRAME_CACHE",
                                    "runs/frame_cache")
        if cache_root:
            tag = hashlib.sha1(repr(self.scene).encode()).hexdigest()[:10]
            self._disk = Path(cache_root) / tag
        else:
            self._disk = None

    def __len__(self):
        return self.n

    def get(self, i: int) -> Frame:
        if i in self._cache:
            return self._cache[i]
        path = (self._disk / f"s{self.seed}_f{i}.npz" if self._disk
                else None)
        if path is not None and path.exists():
            try:
                z = np.load(path)
                f = Frame(z["rgb"], Pose(jnp.asarray(z["R"]),
                                         jnp.asarray(z["t"])),
                          z["obj"], z["depth"])
                self._cache[i] = f
                return f
            except Exception:
                pass  # corrupt/partial file: re-render
        key = jax.random.PRNGKey(self.seed * 100003 + i)
        pose, rgb, depth, coords = self.scene.frame(key)
        f = Frame(np.asarray(rgb, np.float32), pose,
                  np.asarray(coords, np.float32),
                  np.asarray(depth, np.float32))
        if path is not None:
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_name(f"{path.stem}.tmp{os.getpid()}.npz")
            np.savez(tmp, rgb=f.rgb, depth=f.depth, obj=f.obj,
                     R=np.asarray(pose.R), t=np.asarray(pose.t))
            tmp.rename(path)  # atomic: concurrent readers never see partials
        self._cache[i] = f
        return f

    def __iter__(self) -> Iterator[Frame]:
        for i in range(self.n):
            yield self.get(i)


class SevenScenesSource:
    """Frames from a 7-Scenes-layout directory (native decode)."""

    def __init__(self, root: str | Path, config=None, with_obj: bool = True):
        from dsac_tpu.data.seven_scenes import SevenScenesDataset
        self.ds = SevenScenesDataset(root, config=config or
                                     DSACConfig().data)
        self.with_obj = with_obj

    def __len__(self):
        return len(self.ds)

    def get(self, i: int) -> Frame:
        rgb, depth, (R, t) = self.ds[i]
        obj = self.ds.get_obj(i) if self.with_obj else None
        return Frame(rgb.astype(np.float32),
                     Pose(jnp.asarray(R, jnp.float32),
                          jnp.asarray(t, jnp.float32)),
                     obj, depth.astype(np.float32))

    def __iter__(self) -> Iterator[Frame]:
        for i in range(len(self)):
            yield self.get(i)


def make_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--data", type=str, default=None,
                   help="7-Scenes-layout directory (training or test split)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N procedural frames instead of --data")
    p.add_argument("--scene", type=str, default="room",
                   help="synthetic scene archetype (see data.synthetic."
                        "ARCHETYPES): room (default), repeat, bare, "
                        "noisy, clutter, hard")
    p.add_argument("--out", type=str, default="./out",
                   help="output directory (checkpoints, logs)")
    p.add_argument("--arch", choices=["dense", "dense_s2d", "dense_ctx", "patch"],
                   default="dense",
                   help="coordinate net: dense FCN (flagship), dense FCN "
                        "with space-to-depth stem (fastest on TPU), "
                        "dense FCN + dilated long-range-context stack "
                        "(~530 px RF for period-ambiguous scenes like "
                        "the repeat archetype; incompatible with --mesh), "
                        "or reference-parity patch net")
    p.add_argument("--width-mult", type=float, default=1.0,
                   help="model width multiplier (tests/smoke use <1)")
    p.add_argument("--rounds", type=int, default=None,
                   help="override training rounds / eval frame count")
    p.add_argument("--seed", type=int, default=1305)
    p.add_argument("--mesh", type=str, default=None,
                   help="run multi-chip: DxH device mesh ('2x4' = 2-way "
                        "frame data-parallel x 4-way hypothesis/spatial "
                        "sharding), or 'auto' (all devices on the hyp "
                        "axis); omit for the single-chip path")
    return p


def parse_mesh(spec: str | None):
    """--mesh value -> jax.sharding.Mesh (None passes through)."""
    from dsac_tpu.parallel import make_mesh
    if not spec:
        return None
    spec = spec.lower()
    if spec == "auto":
        return make_mesh(1, len(jax.devices()))
    try:
        d, h = spec.split("x")
        return make_mesh(int(d), int(h))
    except ValueError as e:
        raise SystemExit(f"--mesh must be DxH or 'auto', got {spec!r}: {e}")


def mesh_coord_apply(args, coord_net, coord_apply, n_hyp: int):
    """(coord_apply, coord_collective) for a hyp-sharded mesh program.

    Dense archs shard the FCN spatially over 'hyp' via ppermute halo
    exchange (each shard computes its row band, all_gathered); the patch
    arch keeps the plain (image, pix_slice) -> coords closure, which the
    sharded body calls on a 1/n pixel slice and all_gathers.
    """
    if args.arch == "patch":
        return coord_apply, False
    if args.arch == "dense_ctx":
        raise SystemExit(
            "--mesh with --arch dense_ctx is not supported: the banded "
            "FCN halo margin assumes the ~50 px receptive-field class; "
            "the context stack's ~530 px RF needs a margin wider than a "
            "shard band (drop --mesh or use --arch dense)")
    from dsac_tpu.parallel.sharded import banded_dense_coords

    def apply_banded(params, image, pix):
        apply_full = lambda img: coord_net.apply(params, img[None])[0]
        cmap = banded_dense_coords(apply_full, image, n_shards=n_hyp)
        return gather_dense_coords(cmap, pix, stride=8)

    return apply_banded, True


def parse_with_flags(parser: argparse.ArgumentParser, argv=None):
    """argparse for long options + reference short flags pass-through."""
    from dsac_tpu import flags as flagmod
    args, rest = parser.parse_known_args(argv)
    cfg, strings = flagmod.load(rest)
    return args, cfg, strings


def frame_source(args, cfg: DSACConfig, split_hint: str = "training"):
    if args.data:
        return SevenScenesSource(args.data, cfg.data)
    n = args.synthetic or 16
    from dsac_tpu.data.synthetic import make_scene
    scene = make_scene(getattr(args, "scene", "room") or "room")
    # seed keys the camera-pose set: different --seed values give DISJOINT
    # viewpoint sets of the same scene (training vs test splits)
    return SyntheticSource(n, seed=args.seed, scene=scene)


def soft_inlier_score_fn(cfg: DSACConfig):
    """Parameter-free scoring head: soft-inlier counts of the (H, G, G)
    diff-maps — the eval/serve fallback when no score CNN is trained
    (shared by serve/test_ransac/refine_ba)."""
    from dsac_tpu.ops.diffmap import soft_inlier_scores

    def fn(dm):
        return soft_inlier_scores(dm.reshape(dm.shape[0], -1),
                                  cfg.pose.inlier_threshold_2d,
                                  cfg.pose.score_beta)

    return fn


def stage_frame_pool(source, rng, cap: int = 512, as_numpy: bool = False):
    """Stage ≤cap frames (+GT poses) on device in ONE pass over source.

    The fused training loops keep the frame pool in HBM; staging an
    unbounded --data split (thousands of frames, re-decoded per field)
    would blow host memory, tunnel time, and HBM.  A random ≤cap subset
    preserves the reference's sample-a-random-frame schedule over a
    bounded pool.  Returns (images, gt_R, gt_t) device arrays.
    """
    n = len(source)
    idx = (np.arange(n) if n <= cap
           else np.sort(rng.choice(n, size=cap, replace=False)))
    rgbs, Rs, ts = [], [], []
    for i in idx:
        f = source.get(int(i))
        rgbs.append(f.rgb)
        Rs.append(np.asarray(f.pose.R))
        ts.append(np.asarray(f.pose.t))
    if n > cap:
        print(f"Staging {cap} of {n} frames on device "
              f"(bounded pool; raise --stage-frames to widen).")
    if as_numpy:  # host arrays (mesh callers shard_pool them instead)
        return np.stack(rgbs), np.stack(Rs), np.stack(ts)
    return (jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(Rs)),
            jnp.asarray(np.stack(ts)))


def build_models(args, cfg: DSACConfig):
    """(coord_net, score_net, coord_apply, score_apply) per --arch."""
    wm = args.width_mult
    score_net = ScoreNet(width_mult=wm)
    if args.arch == "patch":
        coord_net = PatchCoordNet(width_mult=wm, dense_mult=wm)

        def coord_apply(params, image, pix):
            patches = extract_patches(image, pix, cfg.net.rgb_patch_size)
            return coord_net.apply(params, patches)
    else:
        coord_net = DenseCoordNet(width=max(8, int(64 * wm)),
                                  s2d=(args.arch == "dense_s2d"),
                                  context=(args.arch == "dense_ctx"))

        def coord_apply(params, image, pix):
            cmap = coord_net.apply(params, image[None])[0]
            return gather_dense_coords(cmap, pix, stride=8)

    def score_apply(params, dm):
        return score_net.apply(params, dm)

    return coord_net, score_net, coord_apply, score_apply


def init_or_restore(out_dir, name, init_fn, template_fn=None):
    """Restore `name` if a snapshot exists, else initialise."""
    try:
        step = ckpt.latest_step(out_dir, name)
    except Exception:
        step = None
    if step is not None:
        template = template_fn() if template_fn else init_fn()
        return ckpt.restore(out_dir, name, template), step
    return init_fn(), 0


def apply_string_flags(strings: dict | None):
    """Honour the reference's model/script path flags (properties.cpp:69-70).

    -omodel/-smodel name the coordinate/score model files to load
    (test_ransac.cpp model selection); here they map to checkpoint names
    (a trailing .net is stripped) or .npz weight artifacts
    (utils/params_io).  Returns (omodel, smodel) overrides or Nones.
    -oscript/-sscript named the Lua TRAINING scripts — there is no Lua
    layer in this rebuild (its constants live in config.py:NetConfig), so
    they warn instead of silently no-opping.
    """
    from dsac_tpu.utils.logging import blue
    strings = strings or {}
    for k in ("oscript", "sscript"):
        if k in strings:
            print(blue(f"WARNING: -{k} {strings[k]!r} ignored — the "
                       "reference's Lua training scripts are replaced by "
                       "models/ + config.py:NetConfig (no script files)."))

    def norm(name):
        v = strings.get(name)
        if v is None:
            return None
        return v[:-4] if v.endswith(".net") else v

    return norm("omodel"), norm("smodel")


def _restore_named(out_dir, name, template_fn=None):
    """Checkpoint name or .npz artifact path -> params."""
    if str(name).endswith(".npz"):
        from dsac_tpu.utils.params_io import load_params_npz
        path = Path(name)
        if not path.exists():
            path = Path(out_dir) / name
        return load_params_npz(path, template_fn())
    return ckpt.restore(out_dir, name)["params"]


def load_eval_params(args, cfg: DSACConfig, coord_net, score_net, sample,
                     softam: bool = False, strings: dict | None = None):
    """Shared eval/serve model loading: endtoend > init > random for the
    coordinate net; (score_params, use_score_net) for the score net —
    use_score_net False means callers should score with the soft-inlier
    head.  Mirrors test_ransac.cpp's model-file selection; -omodel/-smodel
    flag values (reference properties.cpp:69-70) override the names."""
    import jax.numpy as jnp
    from dsac_tpu.utils.logging import blue

    omodel, smodel = apply_string_flags(strings)

    if args.arch != "patch":
        coord_init = lambda: coord_net.init(
            jax.random.PRNGKey(1), jnp.asarray(sample.rgb)[None])
    else:
        coord_init = lambda: coord_net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, cfg.net.rgb_patch_size,
                                              cfg.net.rgb_patch_size, 3)))
    obj_e2e = ckpt.OBJ_SOFTAM if softam else ckpt.OBJ_E2E
    score_e2e = ckpt.SCORE_SOFTAM if softam else ckpt.SCORE_E2E

    coord_params, coord_src = None, "random"
    names = ([omodel] if omodel
             else [obj_e2e, ckpt.OBJ_INIT] if args.model == "endtoend"
             else [obj_e2e + "_best", obj_e2e, ckpt.OBJ_INIT]
             if args.model == "best"
             else [ckpt.OBJ_INIT] if args.model == "init" else [])
    for name in names:
        try:
            coord_params = _restore_named(args.out, name, coord_init)
            print(blue(f"Loaded {name}."))
            coord_src = name
            break
        except Exception:
            continue
    if coord_params is None:
        if omodel:
            raise SystemExit(f"-omodel {omodel!r} could not be loaded "
                             f"from {args.out}")
        print(blue("Using freshly initialised coordinate net."))
        coord_params = coord_init()

    score_init = lambda: score_net.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, cfg.net.subsample_size, cfg.net.subsample_size)))
    score_params, use_score_net = None, args.model != "none" or bool(smodel)
    if use_score_net:
        try:
            if smodel:
                score_names = [smodel]
            elif args.model == "endtoend":
                score_names = [score_e2e]
            elif args.model == "best":
                score_names = [score_e2e + "_best", score_e2e,
                               ckpt.SCORE_INIT]
            else:
                score_names = [ckpt.SCORE_INIT]
            score_params = None
            for sn in score_names:
                try:
                    score_params = _restore_named(args.out, sn, score_init)
                    break
                except Exception:
                    continue
            if score_params is None:
                raise FileNotFoundError(score_names)
        except Exception:
            if smodel:
                raise SystemExit(f"-smodel {smodel!r} could not be loaded "
                                 f"from {args.out}")
            use_score_net = False
    return coord_params, coord_src, score_params, use_score_net
