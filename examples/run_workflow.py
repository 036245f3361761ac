"""Standalone ComfyUI-workflow executor: runs a workflow JSON end-to-end
through the real ``SDMatteApply`` node, outside a ComfyUI install.

The reference ships a production workflow JSON but executing it requires a
full ComfyUI host (graph executor + builtin node packs).  This runner is the
minimal host: it parses the UI-format graph (nodes/links arrays), implements
the builtin nodes the example graphs use (LoadImage, LoadImageMask,
MaskToImage, PreviewImage, SaveImage, MaskPreview+, plus a no-op Bookmark
and a deterministic SegmentAnything stand-in), topologically executes, and
drives our node exactly the way ComfyUI's executor would — torch tensors
in, torch tensors out, widget values merged with link inputs in INPUT_TYPES
order.  It executes both the bundled example graph and the REFERENCE
repo's production workflow (example_workflow/超强抠图遮罩细化工作流.json:
4x SDMatteApply + SegmentAnything trimaps + 8 mask previews — see
tests/test_reference_workflow.py).

Usage:
  python examples/run_workflow.py examples/workflow_sdmatte_tpu.json \
      --out-dir /tmp/workflow_out --random-weights [--tiny]

--random-weights skips the 11 GB checkpoint download (zero-egress dev hosts);
--tiny additionally swaps in the CI-scale model config for a seconds-fast run.
Without flags it resolves/downloads real weights like the ComfyUI node does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------- builtin nodes ---

class LoadImage:
    """ComfyUI builtin: filename widget -> (IMAGE (B,H,W,3) [0,1], MASK).

    Workflow JSONs exported from a live ComfyUI reference files in that
    install's ``input/`` directory (hashed upload names) which are not
    shipped alongside the JSON.  When the named file is missing, fall back
    round-robin to the images that ARE shipped next to the workflow — this
    is what lets the reference repo's production workflow run against its
    own checked-in test photos."""

    WIDGETS = ("image", "upload")

    def __init__(self, asset_dir):
        self.asset_dir = asset_dir
        self._fallback_idx = 0

    def _resolve(self, name):
        path = os.path.join(self.asset_dir, name)
        if os.path.exists(path):
            return path
        pool = sorted(
            f for f in os.listdir(self.asset_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
        if not pool:
            raise FileNotFoundError(f"{path} (and no fallback images in "
                                    f"{self.asset_dir})")
        sub = pool[self._fallback_idx % len(pool)]
        self._fallback_idx += 1
        print(f"  [LoadImage] '{name}' not found; substituting shipped "
              f"asset '{sub}'")
        return os.path.join(self.asset_dir, sub)

    def run(self, widgets, inputs):
        import torch
        from PIL import Image
        path = self._resolve(widgets[0])
        arr = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
        img = torch.from_numpy(arr[None, ..., :3])
        mask = torch.from_numpy(1.0 - arr[None, ..., 3])
        return img, mask


class LoadImageMask:
    """ComfyUI builtin: image file + channel selector -> MASK (B,H,W)."""

    WIDGETS = ("image", "channel", "upload")

    def __init__(self, asset_dir):
        self.asset_dir = asset_dir

    def run(self, widgets, inputs):
        import torch
        from PIL import Image
        path = os.path.join(self.asset_dir, widgets[0])
        channel = widgets[1] if len(widgets) > 1 else "alpha"
        img = Image.open(path)
        if channel == "alpha" and img.mode in ("RGBA", "LA"):
            arr = np.asarray(img.convert("RGBA"), np.float32)[..., 3] / 255.0
        else:
            idx = {"red": 0, "green": 1, "blue": 2}.get(channel, 0)
            rgb = np.asarray(img.convert("RGB"), np.float32) / 255.0
            arr = rgb[..., idx]
        return (torch.from_numpy(arr[None]),)


class MaskToImage:
    WIDGETS = ()

    def run(self, widgets, inputs):
        import torch
        (mask,) = inputs
        return (torch.stack([mask] * 3, dim=-1),)


class _ImageWriter:
    WIDGETS = ("filename_prefix",)

    def __init__(self, out_dir, default_prefix):
        self.out_dir = out_dir
        self.default_prefix = default_prefix
        self.calls = 0          # distinct sink nodes share one writer

    def run(self, widgets, inputs):
        from PIL import Image
        prefix = widgets[0] if widgets else self.default_prefix
        self.calls += 1
        # linkless extras (e.g. SaveImage's optional filename_prefix input)
        # arrive as None placeholders — the image tensor is the first real one
        images = next(i for i in inputs if i is not None)
        arr = np.clip(np.asarray(images.detach().cpu().numpy()
                                 if hasattr(images, "detach") else images),
                      0, 1)
        if arr.ndim == 3:                      # MASK fed straight to a sink
            arr = arr[..., None].repeat(3, -1)
        os.makedirs(self.out_dir, exist_ok=True)
        paths = []
        for i, im in enumerate(arr):
            p = os.path.join(self.out_dir,
                             f"{prefix}_{self.calls:02d}_{i:03d}.png")
            Image.fromarray((im * 255 + 0.5).astype(np.uint8)).save(p)
            paths.append(p)
        print(f"  wrote {', '.join(paths)}")
        return ()


def PreviewImage(out_dir):
    return _ImageWriter(out_dir, "preview")


def SaveImage(out_dir):
    return _ImageWriter(out_dir, "output")


def MaskPreview(out_dir):
    """ComfyUI_essentials ``MaskPreview+``: a MASK sink — same writer
    (its run already lifts (B,H,W) masks to grayscale RGB)."""
    return _ImageWriter(out_dir, "mask_preview")


class Bookmark:
    """rgthree ``Bookmark``: pure UI affordance — no inputs, no outputs."""

    WIDGETS = ()

    def run(self, widgets, inputs):
        return ()


class SegmentAnythingStandin:
    """Deterministic stand-in for ``LayerMask: SegmentAnythingUltra V2``.

    The real node runs SAM + GroundingDINO (external multi-GB models from a
    third-party pack) to produce a subject matte the reference workflow
    feeds to SDMatteApply as its trimap.  For hosts without that pack, this
    produces a deterministic coarse subject mask instead: Otsu threshold on
    luminance, keep the side containing the image center (the 'subject'
    prompt), then soften the boundary with box blurs so a fg/unknown/bg
    band exists — the shape SDMatte's trimap-conditioning consumes.
    Outputs (image, mask) like the real node.
    """

    WIDGETS = ()

    @staticmethod
    def _otsu(lum):
        hist, edges = np.histogram(lum, bins=256, range=(0.0, 1.0))
        p = hist.astype(np.float64) / max(hist.sum(), 1)
        w = np.cumsum(p)
        mu = np.cumsum(p * np.arange(256))
        mu_t = mu[-1]
        denom = w * (1.0 - w)
        denom[denom == 0] = np.nan
        sigma_b = (mu_t * w - mu) ** 2 / denom
        if not np.isfinite(sigma_b).any():
            # uniform image: every pixel in one bin -> no valid split;
            # any threshold is equivalent, return the midpoint
            return 0.5
        k = int(np.nanargmax(sigma_b))
        return (k + 0.5) / 256.0

    @staticmethod
    def _box_blur(m, r):
        """(2r+1)-tap box filter per axis via prefix sums, edge-padded."""
        if r < 1:
            return m

        def one_axis(a):
            pad = np.pad(a, ((r, r), (0, 0)), mode="edge")
            c = np.vstack([np.zeros((1, pad.shape[1]), pad.dtype),
                           np.cumsum(pad, axis=0)])
            return (c[2 * r + 1:] - c[:-(2 * r + 1)]) / (2 * r + 1)

        return one_axis(one_axis(m).T).T

    def run(self, widgets, inputs):
        import torch
        img = inputs[0]  # (B,H,W,3) torch
        arr = img.detach().cpu().numpy()[0]
        lum = arr @ np.asarray([0.299, 0.587, 0.114], np.float32)
        fg = lum > self._otsu(lum)
        h, w = fg.shape
        if not fg[h // 2, w // 2]:          # subject = side containing center
            fg = ~fg
        m = fg.astype(np.float32)
        r = max(min(h, w) // 64, 1)
        for _ in range(2):
            m = self._box_blur(m, r)
        m = np.clip(m[:h, :w], 0.0, 1.0).astype(np.float32)
        return img, torch.from_numpy(m[None])


# ------------------------------------------------------------- executor ---

def _widget_names(node_cls) -> list:
    """Widget inputs, in INPUT_TYPES order (ComfyUI widget-value layout):
    everything whose type spec is a combo list or a primitive type string."""
    names = []
    schema = node_cls.INPUT_TYPES()
    for section in ("required", "optional"):
        for name, spec in schema.get(section, {}).items():
            t = spec[0]
            if isinstance(t, list) or t in ("INT", "FLOAT", "BOOLEAN", "STRING"):
                names.append(name)
    return names


def execute_workflow(graph: dict, registry: dict, *, verbose: bool = True):
    """Topologically run the UI-format graph; returns {node_id: outputs}."""
    nodes = {n["id"]: n for n in graph["nodes"]}
    # links: [id, src_node, src_slot, dst_node, dst_slot, type]
    links = {l[0]: (l[1], l[2]) for l in graph.get("links", [])}

    done: dict = {}

    def run_node(nid):
        if nid in done:
            return done[nid]
        node = nodes[nid]
        impl = registry[node["type"]]
        link_inputs = []
        for inp in node.get("inputs", []):
            if inp.get("link") is None:
                link_inputs.append(None)
                continue
            src_id, src_slot = links[inp["link"]]
            link_inputs.append(run_node(src_id)[src_slot])
        widgets = node.get("widgets_values", [])
        if verbose:
            print(f"[{nid}] {node['type']}")
        if hasattr(impl, "run"):                       # builtin host node
            out = impl.run(widgets, link_inputs)
        else:                                          # real plugin node
            fn = getattr(impl, impl.FUNCTION)
            kwargs = {}
            wi = 0
            widget_names = _widget_names(type(impl))
            # newer ComfyUI exports list widget-backed inputs in `inputs`
            # too (with "link": null) — only an ACTUAL link binds a value;
            # everything else falls through to positional widget binding
            input_names = [i["name"] for i in node.get("inputs", [])]
            linked = {i["name"] for i in node.get("inputs", [])
                      if i.get("link") is not None}
            schema = type(impl).INPUT_TYPES()
            for section in ("required", "optional"):
                for name in schema.get(section, {}):
                    if name in linked:
                        kwargs[name] = link_inputs[input_names.index(name)]
                        # a widget converted to a link input still serializes
                        # its (stale) widgets_values slot — consume it so the
                        # remaining positional bindings stay aligned
                        if name in widget_names:
                            wi += 1
                    elif name in widget_names and wi < len(widgets):
                        kwargs[name] = widgets[wi]
                        wi += 1
            out = fn(**kwargs)
        done[nid] = out
        return out

    for nid in nodes:          # memoized: each node executes exactly once
        run_node(nid)
    return done


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workflow")
    ap.add_argument("--out-dir", default="/tmp/sdmatte_workflow_out")
    ap.add_argument("--random-weights", action="store_true",
                    help="random-init model (no checkpoint download)")
    ap.add_argument("--tiny", action="store_true",
                    help="CI-scale model config (fast smoke run)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from sdmatte_tpu.api import node as node_mod

    if args.random_weights:
        from sdmatte_tpu.configs import SDMatteConfig
        from sdmatte_tpu.core.dtypes import BF16, FP32
        from sdmatte_tpu.models import sdmatte
        from sdmatte_tpu.pipeline import MattingPipeline
        if args.cpu:
            import jax
            jax.config.update("jax_platforms", "cpu")
        cfg = SDMatteConfig.tiny() if args.tiny else SDMatteConfig()
        pipe = MattingPipeline(
            sdmatte.init(cfg, seed=0), cfg,
            policy=FP32 if (args.tiny or args.cpu) else BF16,
            attn_impl="xla" if (args.tiny or args.cpu) else "auto")
        node_mod.get_pipeline = lambda *a, **k: pipe
        print(f"[workflow] random-weights pipeline "
              f"({'tiny' if args.tiny else 'full'} config)")

    graph = json.load(open(args.workflow))
    asset_dir = os.path.dirname(os.path.abspath(args.workflow))

    registry = {
        "LoadImage": LoadImage(asset_dir),
        "LoadImageMask": LoadImageMask(asset_dir),
        "MaskToImage": MaskToImage(),
        "PreviewImage": PreviewImage(args.out_dir),
        "SaveImage": SaveImage(args.out_dir),
        "MaskPreview+": MaskPreview(args.out_dir),
        "Bookmark (rgthree)": Bookmark(),
        "LayerMask: SegmentAnythingUltra V2": SegmentAnythingStandin(),
        "SDMatteApply": node_mod.SDMatteApply(),
    }
    execute_workflow(graph, registry)
    print(f"[workflow] done -> {args.out_dir}")


if __name__ == "__main__":
    main()
