"""dctseg: TPU-native Decouple-and-Couple multi-modal brain-tumor segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mathwrx/Decouple-and-Couple_Learning_in_Multi-Modal_Brain_Tumor_Segmentation
(ClsWiseFormer, IEEE JBHI'25).
"""

__version__ = "0.1.0"

from dctseg.config import (Config, DataConfig, EvalConfig, ModelConfig,
                           TrainConfig, tiny_model_config)

__all__ = ["Config", "DataConfig", "EvalConfig", "ModelConfig", "TrainConfig",
           "tiny_model_config"]
