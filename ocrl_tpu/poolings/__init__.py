from .modules import (
    create_pooling_module,
    pooled_dim,
    Transformer_Module,
    RN_Module,
    MLP_Module,
    CNN_Linear_Module,
    CNN_Transformer_Module,
    Identity_Module,
)
from .wrapper import Pooling, get_ocr

__all__ = [
    "create_pooling_module", "pooled_dim", "Pooling", "get_ocr",
    "Transformer_Module", "RN_Module", "MLP_Module", "CNN_Linear_Module",
    "CNN_Transformer_Module", "Identity_Module",
]
