"""Per-layer roofline accounting of DenseCoordNet at 640x480.

VERDICT r3 weak #2 / directive #3: BASELINE.md claimed the CNN stage is
"HBM-bound at the practical ceiling" without per-layer evidence.  This
script measures it: each layer's achieved bytes/s and FLOP/s against the
chip peaks, so "memory-bound" is a measured fact per layer, not a vibe.

Method: the conv stack is rebuilt functionally (same shapes, dtypes,
precision, padding as models/coord_net.py:DenseCoordNet), jitted as
growing PREFIXES, and each prefix is timed amortized (100 reps inside
one dispatch, fenced — see utils/timing.py).  Layer time = prefix
difference (XLA fuses normalisation/relu into the convs, so prefix
differences attribute fused costs to their conv).  Analytic per-layer
traffic assumes perfect fusion: read input activations + weights, write
output activations, bf16.

Usage: python scripts/roofline_cnn.py [--batch 8] [--s2d] [--width 64]
Writes results/cnn_roofline.json.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK_GBS = 819.0  # TPU v5e
BF16_PEAK_TFLOPS = 197.0


def build_layers(width: int, s2d: bool, H: int = 480, W: int = 640):
    """[(name, k, stride, Cin, Cout, Hin, Win, dtype_bytes_out)] mirroring
    DenseCoordNet (models/coord_net.py:85-120)."""
    c = width
    layers = []
    h, w = H, W
    if s2d:
        h, w = H // 2, W // 2
        layers += [("stem_s2d_conv3", 3, 1, 12, c, h, w)]
    else:
        layers += [("conv1_3x3", 3, 1, 3, c, h, w)]
        layers += [("conv2_3x3_s2", 3, 2, c, c, h, w)]
        h, w = h // 2, w // 2
    layers += [("conv3_3x3", 3, 1, c, 2 * c, h, w)]
    layers += [("conv4_3x3_s2", 3, 2, 2 * c, 2 * c, h, w)]
    h, w = h // 2, w // 2
    layers += [("conv5_3x3", 3, 1, 2 * c, 4 * c, h, w)]
    layers += [("conv6_3x3_s2", 3, 2, 4 * c, 4 * c, h, w)]
    h, w = h // 2, w // 2
    layers += [("conv7_3x3", 3, 1, 4 * c, 8 * c, h, w)]
    layers += [("conv8_1x1", 1, 1, 8 * c, 8 * c, h, w)]
    layers += [("conv9_1x1", 1, 1, 8 * c, 8 * c, h, w)]
    layers += [("head_1x1_f32", 1, 1, 8 * c, 3, h, w)]
    return layers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--s2d", action="store_true")
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    from dsac_tpu.utils.timing import time_jitted_amortized

    B = args.batch
    layers = build_layers(args.width, args.s2d)
    rng = np.random.default_rng(0)

    weights = []
    for (name, k, s, cin, cout, h, w) in layers:
        std = (1.0 / (k * k * cin)) ** 0.5
        dt = jnp.float32 if name.startswith("head") else jnp.bfloat16
        weights.append(jnp.asarray(
            rng.normal(0, std, size=(k, k, cin, cout)), dt))

    def prefix_fn(n_layers):
        def fn(x):
            y = (x - 127.0) / 1.0
            y = y.astype(jnp.bfloat16)
            if args.s2d:
                Bq, H, W, C = y.shape
                y = y.reshape(Bq, H // 2, 2, W // 2, 2, C)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                    Bq, H // 2, W // 2, 4 * C)
            for i in range(n_layers):
                name, k, s, cin, cout, h, w = layers[i]
                wgt = weights[i]
                if name.startswith("head"):
                    y = y.astype(jnp.float32)
                y = jax.lax.conv_general_dilated(
                    y, wgt, (s, s), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=jax.lax.Precision.DEFAULT)
                if not name.startswith("head"):
                    y = jax.nn.relu(y)
            # tiny reduction keeps the scan-carry dependency cheap
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(fn)

    x = jnp.asarray(rng.uniform(0, 255, size=(B, 480, 640, 3)), jnp.float32)

    times = []  # cumulative prefix seconds per call
    for n in range(len(layers) + 1):
        t = time_jitted_amortized(prefix_fn(n), x, reps=args.reps)
        times.append(t)
        print(f"prefix {n:2d}: {t * 1e3:8.3f} ms", flush=True)

    rows = []
    print(f"\nDenseCoordNet roofline  (batch {B}, width {args.width}, "
          f"s2d={args.s2d}, backend {jax.default_backend()})")
    print(f"{'layer':>16} {'out shape':>16} {'GFLOP':>7} {'MB moved':>9} "
          f"{'ms':>7} {'GB/s':>7} {'%HBM':>5} {'TFLOP/s':>8} {'%MXU':>5}")
    for i, (name, k, s, cin, cout, h, w) in enumerate(layers):
        ho, wo = h // s, w // s
        el_in = 4 if name.startswith("conv1") else 2
        el_out = 4 if name.startswith("head") else 2
        read = B * h * w * cin * el_in + k * k * cin * cout * el_in
        write = B * ho * wo * cout * el_out
        mb = (read + write) / 1e6
        gflop = 2.0 * k * k * cin * cout * ho * wo * B / 1e9
        dt = max(times[i + 1] - times[i], 1e-9)
        gbs = (read + write) / dt / 1e9
        tfs = gflop / dt / 1e3
        rows.append({
            "layer": name, "out": [B, ho, wo, cout],
            "gflop": round(gflop, 2), "mb_moved": round(mb, 1),
            "ms": round(dt * 1e3, 3), "gb_per_s": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / HBM_PEAK_GBS, 1),
            "tflop_per_s": round(tfs, 1),
            "pct_mxu_peak": round(100 * tfs / BF16_PEAK_TFLOPS, 1),
        })
        print(f"{name:>16} {str((ho, wo, cout)):>16} {gflop:7.2f} "
              f"{mb:9.1f} {dt * 1e3:7.3f} {gbs:7.1f} "
              f"{100 * gbs / HBM_PEAK_GBS:5.1f} {tfs:8.1f} "
              f"{100 * tfs / BF16_PEAK_TFLOPS:5.1f}")
    total_ms = times[-1] * 1e3
    tot_gflop = sum(r["gflop"] for r in rows)
    tot_mb = sum(r["mb_moved"] for r in rows)
    print(f"{'TOTAL':>16} {'':>16} {tot_gflop:7.2f} {tot_mb:9.1f} "
          f"{total_ms:7.3f}  ({total_ms / B:.3f} ms/frame)")

    out = {
        "metric": "cnn_roofline",
        "batch": B, "width": args.width, "s2d": args.s2d,
        "backend": jax.default_backend(),
        "total_ms_per_call": round(total_ms, 3),
        "total_ms_per_frame": round(total_ms / B, 4),
        "hbm_peak_gb_s": HBM_PEAK_GBS,
        "bf16_peak_tflop_s": BF16_PEAK_TFLOPS,
        "layers": rows,
    }
    if jax.default_backend() == "tpu":
        p = pathlib.Path(__file__).resolve().parents[1] / "results"
        p.mkdir(exist_ok=True)
        suffix = "_s2d" if args.s2d else ""
        (p / f"cnn_roofline{suffix}.json").write_text(
            json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "layers"}))


if __name__ == "__main__":
    main()
