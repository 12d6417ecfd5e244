from mucon_tpu.config.defaults import get_cfg_defaults
from mucon_tpu.config.node import ConfigNode, update_config

__all__ = ["ConfigNode", "get_cfg_defaults", "update_config"]
