"""Native (C++) host-side runtime components.

The compute path is JAX/XLA/Pallas; these are the non-XLA runtime pieces
where native code pays: checkpoint I/O today (fast_safetensors), host-side
image codecs / serving loop later.
"""
