#!/usr/bin/env python
"""Convert the reference's ScanNet pickles to the npz format our loader reads.

The reference consumed PointNet++-style ``scannet_{train,test}.pickle`` files
(a list of per-scene xyz arrays + a list of per-point label arrays). Usage:

  python tools/convert_scannet.py /data/scannet_train.pickle /data/scannet_train.npz
"""

import pickle
import sys

import numpy as np


def main(src: str, dst: str) -> None:
    with open(src, "rb") as f:
        scenes = pickle.load(f, encoding="latin1")
        labels = pickle.load(f, encoding="latin1")
    scenes = np.asarray(
        [np.asarray(s, np.float32) for s in scenes], dtype=object
    )
    labels = np.asarray(
        [np.asarray(l, np.int32) for l in labels], dtype=object
    )
    np.savez_compressed(dst, scenes=scenes, labels=labels)
    print(f"wrote {dst}: {len(scenes)} scenes")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
