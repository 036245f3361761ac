"""Generate the frozen checkpoint-key manifest (run once, check in the JSON).

    python tools/gen_key_manifest.py

Writes sdmatte_tpu/checkpoint/sdmatte_expected_keys.json: the exact
torch-convention key->shape set of SDMatte.safetensors, hand-derived from the
reference topology (see sdmatte_tpu/checkpoint/manifest.py for the per-module
derivations and reference file:line citations).  Tests assert the generator
and the frozen file agree, so a topology change can't silently drift.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.checkpoint import manifest  # noqa: E402


def main():
    cfg = SDMatteConfig()
    keys = manifest.expected_keys(cfg)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "sdmatte_tpu", "checkpoint",
                        "sdmatte_expected_keys.json")
    with open(os.path.normpath(path), "w") as f:
        json.dump({k: list(v) for k, v in sorted(keys.items())}, f, indent=0)
        f.write("\n")
    n_params = sum(int(__import__("numpy").prod(v)) for v in keys.values())
    by_prefix = {}
    for k in keys:
        by_prefix[k.split(".")[0]] = by_prefix.get(k.split(".")[0], 0) + 1
    print(f"wrote {len(keys)} keys ({n_params/1e6:.1f}M params): {by_prefix}")


if __name__ == "__main__":
    main()
