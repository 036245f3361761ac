"""ComfyUI plugin entry: drop this repo into ``custom_nodes/`` and the
'Apply SDMatte' node registers against the TPU backend (same node surface as
the reference plugin's __init__.py:1-6)."""

try:
    from sdmatte_tpu.api import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS
except ImportError:  # package-relative when imported as a ComfyUI custom node
    from .sdmatte_tpu.api import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS  # noqa: F401

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
