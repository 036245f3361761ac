"""Random-init param-dict helpers shared by the model stacks.

One definition for the conv/linear/norm leaf layouts (HWIO conv kernels,
(cin, cout) linear kernels, scale/bias norms) so the three sub-models
(vae/unet/clip) cannot drift apart — real weights overwrite these via
checkpoint/loader.py, so std only matters for random-weight tests/benches.
Leaves are numpy (not jnp) on purpose: init must not dispatch per-leaf to
the device (see .claude/skills/verify — eager dispatch is pathologically
slow through the dev tunnel); the pipeline stages the tree in one transfer.
"""

import numpy as np


def conv_p(rng, cin, cout, k=3, std=0.02):
    return {"kernel": np.asarray(
                rng.standard_normal((k, k, cin, cout)).astype(np.float32)
                * std),
            "bias": np.zeros((cout,), np.float32)}


def lin_p(rng, cin, cout, std=0.02, bias=True):
    p = {"kernel": np.asarray(
            rng.standard_normal((cin, cout)).astype(np.float32) * std)}
    if bias:
        p["bias"] = np.zeros((cout,), np.float32)
    return p


def norm_p(c):
    return {"scale": np.ones((c,), np.float32),
            "bias": np.zeros((c,), np.float32)}
