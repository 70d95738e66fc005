"""Metrics CLI — PSNR/SSIM/LPIPS/tOF over refined renders.

Parity target: reference `metrics.py:81-162` (reads
`test_refined/img_%05d.png.png` vs `inference_images/%05d.png`).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="mobgs_tpu metrics")
    p.add_argument("-m", "--model_path", type=str, required=True)
    p.add_argument("-s", "--source_path", type=str, default="",
                   help="scene dir with inference_images/ (GT)")
    p.add_argument("--lpips_weights", type=str, default="",
                   help="LPIPS v0.1 alex.pth lin weights")
    p.add_argument("--alexnet_weights", type=str, default="",
                   help="torchvision alexnet state_dict (optional)")
    p.add_argument("--no_tof", action="store_true")
    args = p.parse_args(argv)

    from PIL import Image
    pred_dir = os.path.join(args.model_path, "test_refined")
    pred_paths = sorted(glob.glob(os.path.join(pred_dir, "img_*.png*")))
    # GT: the scene's inference_images/ when -s is given (reference
    # metrics.py:81-162), else the test_gt/ staging dir eval_cli writes
    # (hermetic synthetic protocol has no source dir)
    gt_dir = (os.path.join(args.source_path, "inference_images")
              if args.source_path
              else os.path.join(args.model_path, "test_gt"))
    preds, gts = [], []
    for i, pp in enumerate(pred_paths):
        pred = np.asarray(Image.open(pp))[..., :3] / 255.0
        gp = os.path.join(gt_dir, f"{i:05d}.png")
        if not os.path.exists(gp):
            continue
        gt = np.asarray(Image.open(gp))[..., :3] / 255.0
        if gt.shape != pred.shape:
            gt = np.asarray(Image.fromarray(
                (gt * 255).astype(np.uint8)).resize(
                    (pred.shape[1], pred.shape[0]))) / 255.0
        preds.append(pred.astype(np.float32))
        gts.append(gt.astype(np.float32))
    if not preds:
        raise SystemExit(f"no aligned (pred, gt) pairs under {pred_dir}")

    from mobgs_tpu.eval.lpips import (find_default_backbone,
                                      find_default_lpips_weights, load_lpips)
    from mobgs_tpu.eval.metrics import evaluate_sequence
    lin = args.lpips_weights or find_default_lpips_weights(args.model_path)
    backbone = args.alexnet_weights or find_default_backbone(args.model_path)
    if lin:
        print(f"# LPIPS lin weights: {lin}")
    if not backbone:
        print("# LPIPS backbone: fixed-seed random (no torchvision "
              "alexnet weights found; set MOBGS_ALEXNET_WEIGHTS for "
              "published-comparable LPIPS)")
    lp = load_lpips(lin, backbone)
    out = evaluate_sequence(np.stack(preds), np.stack(gts), lpips_params=lp,
                            compute_tof=not args.no_tof)
    print(f"PSNR: {out['psnr']:.4f}")
    print(f"SSIM: {out['ssim']:.4f}")
    for k in ("lpips", "lpips_randfeat"):
        if k in out:
            print(f"{k.upper()}: {out[k]:.4f}")
    if out.get("tof") is not None:
        print(f"tOF: {out['tof']:.4f}")
    # persist the report next to the checkpoint (the reference saves its
    # per-scene results to JSON too, metrics.py:150-162); the protocol
    # script checks this file to fail on a broken metrics step
    import json
    report = {k: (float(v) if isinstance(v, (int, float)) else v)
              for k, v in out.items()}
    report["n_frames"] = len(preds)
    with open(os.path.join(args.model_path, "results.json"), "w") as f:
        json.dump(report, f, indent=1)
    return out


if __name__ == "__main__":
    main()
