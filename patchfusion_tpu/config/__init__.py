from patchfusion_tpu.config.config import (Config, ConfigDict,
                                           parse_cfg_option)
from patchfusion_tpu.config.registry import (DATASETS, MODELS, Registry,
                                             build_dataset, build_model)

__all__ = ["Config", "ConfigDict", "parse_cfg_option", "DATASETS", "MODELS",
           "Registry", "build_dataset", "build_model"]
