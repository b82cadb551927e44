#!/usr/bin/env python
"""decode_image — decode a single image with zero code vs predicted code +
timing (reference sources/tools/decode_image.cpp; --ntests like its flag).

Usage: python tools/decode_image.py <image-or-'synthetic'> [--ntests N]
       [--weights params.pkl] [--out dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(argv):
    from deepfactors_tpu.config import parse_args
    from deepfactors_tpu.models.decoder import (Decoder, NetworkConfig,
                                                load_params)
    from deepfactors_tpu.viz import apply_colormap
    from deepfactors_tpu.geometry import warping as wp

    flags = parse_args(argv)
    pos = flags.get("__positional__", [])
    src = pos[0] if pos else "synthetic"
    ntests = int(flags.get("ntests", 10))
    out = flags.get("out", "/tmp/decode_image")

    cfg = NetworkConfig(
        code_size=int(flags.get("code_size", 32)),
        pyramid_levels=int(flags.get("pyramid_levels", 3)),
        input_width=int(flags.get("input_width", 256)),
        input_height=int(flags.get("input_height", 192)),
    )
    params = None
    if "weights" in flags:
        params = load_params(flags["weights"])
    dec = Decoder(cfg, params=params)

    if src == "synthetic":
        ys, xs = np.mgrid[0:cfg.input_height, 0:cfg.input_width].astype(np.float32)
        img = (0.5 + 0.3 * np.sin(xs / 9) * np.cos(ys / 7)).astype(np.float32)
    else:
        import cv2

        img = cv2.imread(src, cv2.IMREAD_GRAYSCALE)
        img = cv2.resize(img, (cfg.input_width, cfg.input_height)) / 255.0
        img = img.astype(np.float32)
    img = jnp.asarray(img)

    # timing: zero-code decode (with jacobian, like ut_decoder DecodeZero)
    r = dec.decode(img, jnp.zeros(cfg.code_size))
    jax.block_until_ready(r.prx[0])
    t0 = time.perf_counter()
    for _ in range(ntests):
        r = dec.decode(img, jnp.zeros(cfg.code_size))
    jax.block_until_ready(r.prx[0])
    print(f"decode (zero code + jacobians): "
          f"{(time.perf_counter() - t0) / ntests * 1000:.2f} ms avg of {ntests}")

    rp = dec.predict_and_decode(img)
    jax.block_until_ready(rp.prx[0])
    t0 = time.perf_counter()
    for _ in range(ntests):
        rp = dec.predict_and_decode(img)
    jax.block_until_ready(rp.prx[0])
    print(f"predict_and_decode: "
          f"{(time.perf_counter() - t0) / ntests * 1000:.2f} ms avg of {ntests}")
    print(f"predicted code[:8]: {np.asarray(rp.code)[:8]}")

    os.makedirs(out, exist_ok=True)
    import cv2

    dpt0 = np.asarray(wp.prox_to_depth(jnp.clip(r.prx[0], 0.01, 0.99), cfg.avg_dpt))
    dptp = np.asarray(wp.prox_to_depth(jnp.clip(rp.prx[0], 0.01, 0.99), cfg.avg_dpt))
    cv2.imwrite(os.path.join(out, "input.png"),
                (np.asarray(img) * 255).astype(np.uint8))
    cv2.imwrite(os.path.join(out, "depth_zero_code.png"),
                apply_colormap(dpt0)[..., ::-1])
    cv2.imwrite(os.path.join(out, "depth_predicted_code.png"),
                apply_colormap(dptp)[..., ::-1])
    print(f"wrote {out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
