#!/usr/bin/env python
"""voc_builder — train a BoW vocabulary from dataset images
(reference sources/tools/voc_builder.cpp builds a DBoW2 vocab from TUM
sequences). Saves an .npz with binary centroids + idf weights.

Usage: python tools/voc_builder.py --source <url> [--num_words 256]
       [--max_frames 100] --out vocab.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(argv):
    from deepfactors_tpu.config import parse_args
    from deepfactors_tpu.features import detector as det
    from deepfactors_tpu.io import drivers
    from deepfactors_tpu.loop import vocabulary as vb

    flags = parse_args(argv)
    source = flags.get("source", "synthetic://128x96:40")
    num_words = int(flags.get("num_words", 256))
    max_frames = int(flags.get("max_frames", 100))
    out = flags.get("out", "vocab.npz")

    iface = drivers.get_interface_from_url(source)
    cfg = det.DetectorConfig(max_keypoints=int(flags.get("nfeatures", 200)))
    descs = []
    for i, fd in enumerate(iface.frames()):
        if i >= max_frames:
            break
        f = det.detect(jnp.asarray(fd.img), cfg)
        v = np.asarray(jax.device_get(f.valid))
        descs.append(np.asarray(jax.device_get(f.descriptor))[v])
    all_descs = np.concatenate(descs).astype(np.uint32)
    print(f"collected {len(all_descs)} descriptors from {len(descs)} frames")
    voc = vb.train_vocabulary(all_descs, num_words=num_words)
    np.savez(out, words=np.asarray(voc.words), idf=np.asarray(voc.idf))
    print(f"wrote {num_words}-word vocabulary -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
