"""Dense RGB-D visual odometry on a synthetic textured-plane sequence:
track camera motion with the coarse-to-fine photometric pipeline and plot
the trajectory against ground truth.

``--batch K`` switches to offline THROUGHPUT mode: after the first
(keyframe) frame, the remaining frames solve K at a time in one vmapped
dispatch (``pipe.track_batch``; measured 29.7 -> 91.9 fps VGA at K=16 on
the chip — bench/vo_batch.py)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyslam_tpu.eval import TrajectoryMetrics, TrajectoryVisualizer
from pyslam_tpu.pipelines import DenseRGBDPipeline
from pyslam_tpu.sensors import RGBDCamera

Z0 = 4.0
CAM = dict(cu=63.5, cv=47.5, fu=180.0, fv=180.0, w=128, h=96)


def tex(x, y):
    return 0.5 + 0.25 * np.sin(2.5 * x) * np.cos(1.8 * y) + 0.15 * np.sin(0.9 * x + 1.3 * y)


def render(t):
    u, v = np.meshgrid(np.arange(CAM["w"]), np.arange(CAM["h"]), indexing="xy")
    zc = Z0 - t[2]
    xw = (u - CAM["cu"]) / CAM["fu"] * zc + t[0]
    yw = (v - CAM["cv"]) / CAM["fv"] * zc + t[1]
    return tex(xw, yw), np.full((CAM["h"], CAM["w"]), zc)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size for offline throughput mode (0 = sequential)")
    args = ap.parse_args()

    # a batched run cannot create keyframes mid-batch: raise the threshold
    # so the whole sequence tracks against the first keyframe in both modes
    thresh = 0.5 if not args.batch else 10.0
    pipe = DenseRGBDPipeline(RGBDCamera(**CAM), pyrlevels=3,
                             keyframe_trans_thresh=thresh)
    frames, gt = [], []
    for k in range(12):
        t = np.array([0.05 * k, 0.02 * np.sin(k / 2), 0.0])
        frames.append(render(t))
        T = np.eye(4)
        T[:3, 3] = -t  # camera-from-world for a camera at +t
        gt.append(T)

    if args.batch:
        pipe.track(*frames[0])  # keyframe
        ims = [im for im, _ in frames[1:]]
        for s in range(0, len(ims), args.batch):
            pipe.track_batch(ims[s : s + args.batch])
    else:
        for im, depth in frames:
            pipe.track(im, depth)

    est = np.stack(pipe.T_c_w)
    tm = TrajectoryMetrics(np.linalg.inv(np.stack(gt)), np.linalg.inv(est))
    print(f"frames tracked: {len(est)}, keyframes: {len(pipe.keyframes)}")
    print(f"position RMSE: {float(tm.armse('trans')) * 1000:.2f} mm")
    TrajectoryVisualizer({"dense VO": tm}).plot_topdown(outfile="dense_vo_topdown.png")
    print("wrote dense_vo_topdown.png")


if __name__ == "__main__":
    main()
