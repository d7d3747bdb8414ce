"""NID precondition diagnostics for a culled cloud + image pair.

Rebuild of `PointCloudProcessor/scripts/computeNidForCloudAndImage.py:6-87`,
which plots the LiDAR-intensity and image-intensity histograms so a user can
judge whether NID refinement has signal. This version additionally computes
the actual joint histogram, mutual information and NID value with the same
code the optimizer uses (:mod:`pointcloudprocessor_tpu.opt.nid`), prints a
JSON report, and (optionally) saves a histogram figure.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def analyze(cloud_path: str, image_path: str, bins: int = 16,
            intrinsic=None, width: int = 0, height: int = 0) -> dict:
    import jax.numpy as jnp

    from ..core import cloud as cl
    from ..core import se3
    from ..io import images as img_io
    from ..io import pcd
    from ..models import camera as cam
    from ..opt import nid as nid_mod

    cloud = pcd.read_cloud(cloud_path)
    cloud = cl.normalize_intensity(cloud)
    gray = img_io.load_gray_normalized(image_path)
    h_px, w_px = gray.shape

    inten = np.asarray(cloud.intensity)[np.asarray(cloud.valid)]
    hist_pts, _ = np.histogram(inten, bins=bins, range=(0.0, 1.0))
    hist_img, _ = np.histogram(gray.ravel(), bins=bins, range=(0.0, 1.0))

    report = {
        "num_points": int(inten.size),
        "image_size": [w_px, h_px],
        "bins": bins,
        "point_intensity_histogram": hist_pts.tolist(),
        "image_intensity_histogram": hist_img.tolist(),
        # Degenerate-histogram warnings: NID needs spread in BOTH signals.
        "point_intensity_spread": float(inten.std()) if inten.size else 0.0,
        "image_intensity_spread": float(gray.std()),
    }

    # Joint statistics under the identity pose via the optimizer's own path
    # (the cloud is expected in the keyframe camera frame, like the
    # filtered_pcd/<ts>_beforeNID.pcd dumps the reference script reads).
    if intrinsic is not None:
        camera = cam.create_camera("pinhole", intrinsic, (0, 0, 0, 0, 0),
                                   width or w_px, height or h_px)
        kf = nid_mod.NIDKeyframe(
            points=cloud.points,
            intensity=cloud.intensity,
            valid=cloud.valid,
            bin_image=nid_mod.quantize_image(jnp.asarray(gray), bins),
        )
        hj, hi, hp, num = nid_mod.nid_histograms(camera, se3.identity(), kf, bins)
        nid_value = nid_mod.nid_from_histograms(hj, hi, hp, num)
        report["num_projected"] = int(num)
        report["nid"] = float(nid_value)
    return report


def save_plot(report: dict, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    x = np.arange(report["bins"])
    axes[0].bar(x, report["point_intensity_histogram"], color="#555")
    axes[0].set_title("LiDAR intensity bins")
    axes[1].bar(x, report["image_intensity_histogram"], color="#555")
    axes[1].set_title("image intensity bins")
    for ax in axes:
        ax.set_xlabel("bin")
        ax.set_ylabel("count")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="NID histogram diagnostics")
    ap.add_argument("--cloud", required=True, help="culled PCD (camera frame)")
    ap.add_argument("--image", required=True)
    ap.add_argument("--bins", type=int, default=16)
    ap.add_argument("--intrinsic", type=float, nargs=4, default=None,
                    metavar=("FX", "FY", "CX", "CY"),
                    help="compute the actual NID under identity pose")
    ap.add_argument("--plot", default="", help="save histogram figure PNG")
    args = ap.parse_args(argv)

    report = analyze(args.cloud, args.image, args.bins, args.intrinsic)
    if args.plot:
        save_plot(report, args.plot)
        report["plot"] = args.plot
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
