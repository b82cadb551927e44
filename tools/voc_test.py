#!/usr/bin/env python
"""voc_test — evaluate a BoW vocabulary's discrimination on a sequence
(reference sources/tools/voc_test.cpp): score each frame against all others;
report self/nearby vs far similarity statistics.

Usage: python tools/voc_test.py --source <url> [--vocab vocab.npz]
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
    source = flags.get("source", "synthetic://128x96:20")
    iface = drivers.get_interface_from_url(source)
    if "vocab" in flags:
        d = np.load(flags["vocab"])
        voc = vb.Vocabulary(jnp.asarray(d["words"]), jnp.asarray(d["idf"]))
    else:
        voc = vb.random_vocabulary(int(flags.get("num_words", 256)))

    cfg = det.DetectorConfig(max_keypoints=int(flags.get("nfeatures", 200)))
    vecs = []
    for i, fd in enumerate(iface.frames()):
        if i >= int(flags.get("max_frames", 40)):
            break
        f = det.detect(jnp.asarray(fd.img), cfg)
        vecs.append(vb.bow_vector(voc, f.descriptor, f.valid))
    db = jnp.stack(vecs)
    n = len(vecs)
    S = np.zeros((n, n))
    for i in range(n):
        S[i] = np.asarray(vb.similarity(vecs[i], db, jnp.ones(n, bool)))
    near = np.mean([S[i, min(i + 1, n - 1)] for i in range(n)])
    far = np.mean([S[i, (i + n // 2) % n] for i in range(n)])
    print(f"frames: {n}  self: {np.mean(np.diag(S)):.3f}  "
          f"adjacent: {near:.3f}  far: {far:.3f}")
    print("discrimination (adjacent - far):", f"{near - far:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
