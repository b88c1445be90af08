from mvuld_tpu.core.cfgnode import CfgNode, load_cfg
from mvuld_tpu.core.logger import AverageMeter, create_logger
from mvuld_tpu.core.registry import BASELINES, FUSION_MODELS, MODELS, SCHEDULERS, Registry

__all__ = [
    "CfgNode", "load_cfg", "AverageMeter", "create_logger",
    "Registry", "MODELS", "FUSION_MODELS", "BASELINES", "SCHEDULERS",
]
