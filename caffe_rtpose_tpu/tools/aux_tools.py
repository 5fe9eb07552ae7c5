"""Aux dataset tools — analogs of the reference tools/ binaries:

* convert_imageset  (tools/convert_imageset.cpp): image list -> one .h5 pack
  (replacing the LMDB/LevelDB target with the portable HDF5 container)
* compute_image_mean (tools/compute_image_mean.cpp): mean BGR over a pack
* extract_features  (tools/extract_features.cpp): dump named blobs to .npz
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np


def convert_imageset(listfile: str, root: str, out_h5: str,
                     resize_h: int = 0, resize_w: int = 0,
                     gray: bool = False, shuffle: bool = False, seed: int = 0) -> int:
    import os

    import cv2
    import h5py

    entries = []
    with open(listfile) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.rsplit(None, 1)
            if len(parts) == 2 and parts[1].lstrip("-").isdigit():
                entries.append((parts[0], int(parts[1])))
            else:
                entries.append((line, 0))
    if shuffle:
        np.random.RandomState(seed).shuffle(entries)
    imgs, labels = [], []
    for path, label in entries:
        img = cv2.imread(os.path.join(root, path),
                         cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR)
        if img is None:
            print(f"skipping unreadable {path}", file=sys.stderr)
            continue
        if resize_h and resize_w:
            img = cv2.resize(img, (resize_w, resize_h))
        if img.ndim == 2:
            img = img[..., None]
        imgs.append(img.transpose(2, 0, 1))  # CHW, BGR
        labels.append(label)
    data = np.stack(imgs).astype(np.uint8)
    with h5py.File(out_h5, "w") as f:
        f.create_dataset("data", data=data, compression="gzip")
        f.create_dataset("label", data=np.asarray(labels, np.int64))
    print(f"Processed {len(imgs)} files -> {out_h5}")
    return 0


def compute_image_mean(h5path: str, out: Optional[str] = None) -> np.ndarray:
    import h5py

    with h5py.File(h5path, "r") as f:
        data = f["data"]
        total = np.zeros(data.shape[1:], np.float64)
        n = data.shape[0]
        for i in range(n):
            total += data[i]
    mean = (total / n).astype(np.float32)
    if out:
        np.save(out, mean)
    print("Channel means:", [float(m) for m in mean.reshape(mean.shape[0], -1).mean(1)])
    return mean


def extract_features(model: str, weights: str, blobs: List[str],
                     data: str, out_npz: str, iterations: int = 10) -> int:
    from ..core.net import Net
    from .caffe_tool import make_data_iter

    net = Net(model, phase="TEST")
    if weights:
        net.load_weights(weights)
    it = make_data_iter(data, net)
    feats = {b: [] for b in blobs}
    for _ in range(iterations):
        out = net.forward(next(it), outputs=blobs)
        for b in blobs:
            feats[b].append(out[b])
    np.savez(out_npz, **{b: np.concatenate(v) for b, v in feats.items()})
    print(f"Extracted {blobs} over {iterations} batches -> {out_npz}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="caffe-aux", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("convert_imageset")
    c.add_argument("listfile")
    c.add_argument("root")
    c.add_argument("out_h5")
    c.add_argument("--resize_height", type=int, default=0)
    c.add_argument("--resize_width", type=int, default=0)
    c.add_argument("--gray", action="store_true")
    c.add_argument("--shuffle", action="store_true")
    c.set_defaults(fn=lambda a: convert_imageset(
        a.listfile, a.root, a.out_h5, a.resize_height, a.resize_width, a.gray, a.shuffle))

    m = sub.add_parser("compute_image_mean")
    m.add_argument("h5path")
    m.add_argument("--out", default="")
    m.set_defaults(fn=lambda a: (compute_image_mean(a.h5path, a.out or None), 0)[1])

    e = sub.add_parser("extract_features")
    e.add_argument("--model", required=True)
    e.add_argument("--weights", default="")
    e.add_argument("--blobs", required=True, help="comma-separated blob names")
    e.add_argument("--data", default="synthetic-pose")
    e.add_argument("--out", required=True)
    e.add_argument("--iterations", type=int, default=10)
    e.set_defaults(fn=lambda a: extract_features(
        a.model, a.weights, a.blobs.split(","), a.data, a.out, a.iterations))

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
