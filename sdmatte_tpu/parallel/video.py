"""Video matting: temporal batch sharded over the mesh, shared prompt embeds.

BASELINE.json config 5 (stretch): 64 frames over v5e-8.  Frames are
embarrassingly parallel through the single-pass model, so the efficient
mapping is frame-axis sharding with the per-clip conditioning (coords
embedding, text/prompt embeds) computed once and replicated — no collectives
in the hot loop, ICI only carries the initial scatter/final gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import SDMatteConfig
from ..core.dtypes import Policy, FP32
from ..models import sdmatte
from .mesh import make_mesh, data_spec


def matte_video(params, cfg: SDMatteConfig, frames, trimaps, *, mesh=None,
                is_transparent: bool = False, policy: Policy = FP32,
                attn_impl: str = "auto"):
    """frames (T, S, S, 3) in [-1,1]; trimaps (T, S, S, 1) in [-1,1].

    Returns alpha (T, S, S, 1).  With a mesh, the frame axis is sharded over
    the 'data' axis; per-frame conditioning (coords, opacity) is broadcast.
    """
    t = frames.shape[0]
    data = {
        "image": frames,
        "trimap": trimaps,
        # per-clip conditioning, replicated: same prompt for every frame
        "trimap_coords": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]],
                                              jnp.float32), (t, 1)),
        "is_trans": jnp.full((t,), 1.0 if is_transparent else 0.0, jnp.float32),
    }

    def fwd(p, d):
        return sdmatte.forward(p, cfg, d, policy=policy, attn_impl=attn_impl)

    from ..ops.dispatch import model_jit
    if mesh is None:
        return model_jit(fwd)(params, data)

    repl = NamedSharding(mesh, P())
    shard = lambda leaf: NamedSharding(mesh, data_spec(mesh, leaf.ndim))  # noqa: E731
    data = {k: jax.device_put(v, shard(v) if v.shape[0] == t else repl)
            for k, v in data.items()}
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
    return model_jit(fwd, out_shardings=shard(frames))(params, data)
