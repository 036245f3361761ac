"""Training data pipeline: composite matting batches, host-side, prefetched.

The reference ships no training code (stripped upstream — SURVEY.md §0), so
there is nothing to port; this is the standard matting-training recipe built
TPU-first:

  * composition on the host (cheap numpy), model-side work on device only
  * foreground/alpha sources: procedural generators (eval/synthetic.py's
    exact-alpha mattes) by default, or user-supplied (fg, alpha) arrays
  * augmentation: random crop/scale, horizontal flip, background shuffle,
    fg color jitter, randomized trimap band width (the label-noise knob that
    matters for trimap-conditioned matting)
  * double-buffered prefetch: a background thread composites and
    ``jax.device_put``s the NEXT batch (sharded over the mesh when given)
    while the current step runs — the host/device overlap XLA can't create
    on its own.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from ..eval import synthetic


class CompositeSampler:
    """Yields (image, trimap, alpha_gt) training triples by compositing
    foreground/alpha pairs over backgrounds with augmentation."""

    def __init__(self, size: int = 64, *, seed: int = 0,
                 sources: Optional[Sequence[Tuple[np.ndarray, np.ndarray]]] = None,
                 trimap_band: Tuple[int, int] = (2, 12)):
        self.size = size
        self.rng = np.random.default_rng(seed)
        self.trimap_band = trimap_band
        if sources is None:
            s = max(size, 64)
            alphas = [
                synthetic._soft_disk(s, s, s * 0.5, s * 0.5, s * 0.28, s * 0.06),
                synthetic._hair_strokes(s, s),
                synthetic._gradient_band(s, s),
                synthetic._blob(s, s),
            ]
            sources = [(synthetic._foreground(s, s, seed=7 + i), a)
                       for i, a in enumerate(alphas)]
        self.sources = [(np.asarray(fg, np.float32), np.asarray(a, np.float32))
                        for fg, a in sources]

    # -- augmentation ------------------------------------------------------

    def _crop_resize(self, fg, alpha):
        h, w = alpha.shape
        s = self.size
        scale = self.rng.uniform(0.6, 1.0)
        ch, cw = max(int(h * scale), 8), max(int(w * scale), 8)
        y0 = self.rng.integers(0, h - ch + 1)
        x0 = self.rng.integers(0, w - cw + 1)
        fg_c = fg[y0:y0 + ch, x0:x0 + cw]
        a_c = alpha[y0:y0 + ch, x0:x0 + cw]
        # nearest resize to target (host-side; exactness doesn't matter for
        # training augmentation)
        yi = np.clip((np.arange(s) + 0.5) * ch / s, 0, ch - 1).astype(np.int64)
        xi = np.clip((np.arange(s) + 0.5) * cw / s, 0, cw - 1).astype(np.int64)
        return fg_c[yi][:, xi], a_c[yi][:, xi]

    def sample(self) -> dict:
        idx = self.rng.integers(0, len(self.sources))
        fg, alpha = self.sources[idx]
        fg, alpha = self._crop_resize(fg, alpha)
        if self.rng.uniform() < 0.5:
            fg, alpha = fg[:, ::-1], alpha[:, ::-1]
        jitter = self.rng.uniform(0.7, 1.3, (1, 1, 3)).astype(np.float32)
        fg = np.clip(fg * jitter, 0, 1)
        bg = synthetic._background(
            self.size, self.size,
            ("gradient", "stripes", "noise")[int(self.rng.integers(0, 3))],
            seed=int(self.rng.integers(0, 1 << 31)))
        img = fg * alpha[..., None] + bg * (1 - alpha[..., None])
        band = int(self.rng.integers(*self.trimap_band))
        tri = synthetic.trimap_from_alpha(alpha, band=band)
        return {"image": img.astype(np.float32), "trimap": tri,
                "alpha_gt": alpha.astype(np.float32)}

    def batch(self, batch_size: int) -> dict:
        """Model-ready batch dict (NHWC, [-1,1] image/trimap conventions the
        meta-arch expects: reference sdmatte_nodes.py:339-353)."""
        items = [self.sample() for _ in range(batch_size)]
        img = np.stack([it["image"] for it in items])
        tri = np.stack([it["trimap"] for it in items])
        alpha = np.stack([it["alpha_gt"] for it in items])
        return {
            "image": (img * 2.0 - 1.0).astype(np.float32),
            "trimap": (tri * 2.0 - 1.0).astype(np.float32)[..., None],
            "trimap_coords": np.tile(
                np.asarray([[0.0, 0.0, 1.0, 1.0]], np.float32),
                (batch_size, 1)),
            "is_trans": np.zeros((batch_size,), np.float32),
            "alpha_gt": alpha[..., None],
        }


def prefetch_batches(sampler: CompositeSampler, batch_size: int, *,
                     steps: int, mesh=None, depth: int = 2) -> Iterator[dict]:
    """Generator of device-resident batches, composited one step ahead on a
    background thread.  With a mesh, leaves are device_put with the batch
    axis sharded over the mesh's data axes (the same layout
    make_sharded_train_step constrains to, so no resharding happens at step
    time).

    Multi-host: each process composites only its LOCAL slice of the global
    batch (``batch_size // process_count`` samples) and the global array is
    assembled with ``jax.make_array_from_process_local_data`` — no host
    composites data another host owns, and hosts are EXPECTED to draw
    different data (train_loop seeds the default sampler with
    ``process_index``).  ``batch_size`` stays the GLOBAL batch size."""
    import jax
    from jax.sharding import NamedSharding
    from .mesh import data_spec

    nproc = jax.process_count()
    local_bs = batch_size
    if mesh is not None and nproc > 1:
        if batch_size % nproc:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{nproc} processes")
        local_bs = batch_size // nproc

    def put(batch):
        if mesh is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        out = {}
        for k, v in batch.items():
            sh = NamedSharding(mesh, data_spec(mesh, v.ndim))
            if nproc == 1:
                out[k] = jax.device_put(v, sh)
            else:
                out[k] = jax.make_array_from_process_local_data(
                    sh, v, (batch_size,) + v.shape[1:])
        return out

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        for _ in range(steps):
            if stop.is_set():
                return
            try:
                item = put(sampler.batch(local_bs))
            except BaseException as e:  # surface in the consumer, don't wedge
                q.put(e)
                return
            q.put(item)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        for _ in range(steps):
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so the worker's blocked put() can observe stop
        while not q.empty():
            q.get_nowait()
