from .loader import load_sdmatte_checkpoint, torch_key_to_path, LoadReport  # noqa: F401
