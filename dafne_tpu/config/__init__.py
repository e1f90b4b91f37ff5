from dafne_tpu.config.config import CfgNode, get_cfg, load_config

__all__ = ["CfgNode", "get_cfg", "load_config"]
