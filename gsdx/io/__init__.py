from gsdx.io.checkpoint import load_checkpoint, save_checkpoint
from gsdx.io.config import load_config

__all__ = ["load_checkpoint", "save_checkpoint", "load_config"]
