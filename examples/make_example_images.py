"""Generate synthetic example input + trimap PNGs for the example workflow
and the CLI (the reference bundles photographic test images; we generate
license-free synthetic ones instead)."""

import os

import numpy as np
from PIL import Image


def main(out_dir=None):
    out_dir = out_dir or os.path.dirname(os.path.abspath(__file__))
    rng = np.random.default_rng(7)
    h, w = 768, 1024
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    # soft-edged subject (feathered ellipse) over a textured background
    cy, cx = h * 0.52, w * 0.48
    d = np.sqrt(((yy - cy) / (h * 0.31)) ** 2 + ((xx - cx) / (w * 0.22)) ** 2)
    alpha = np.clip((1.15 - d) / 0.3, 0, 1)  # feathered boundary

    bg = np.stack([
        100 + 60 * np.sin(xx / 37.0) + rng.normal(0, 6, (h, w)),
        90 + 50 * np.cos(yy / 53.0) + rng.normal(0, 6, (h, w)),
        120 + 40 * np.sin((xx + yy) / 71.0) + rng.normal(0, 6, (h, w)),
    ], -1)
    fg = np.stack([
        210 + rng.normal(0, 4, (h, w)),
        150 + 30 * np.sin(yy / 19.0),
        90 + 20 * np.cos(xx / 23.0),
    ], -1)
    img = fg * alpha[..., None] + bg * (1 - alpha[..., None])
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
        os.path.join(out_dir, "example_input.png"))

    tri = np.where(alpha > 0.95, 255, np.where(alpha < 0.05, 0, 128))
    Image.fromarray(tri.astype(np.uint8)).save(
        os.path.join(out_dir, "example_trimap.png"))
    print("wrote example_input.png / example_trimap.png to", out_dir)


if __name__ == "__main__":
    main()
