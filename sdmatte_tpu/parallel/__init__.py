from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .train import train_step, init_train_state  # noqa: F401
