"""Backbone registry — embedding networks over [N, C, F, T] spectrograms.

Reference registry: libfewshot_core/model/backbone/__init__.py (13 nets).
"""

from . import conv_four  # noqa: F401  (registers Conv64F/Conv32F/R2D2Embedding/Conv64F_MCL)
from . import resnet  # noqa: F401  (resnet12/resnet12woLSC/resnet12_mcl/resnet12_r2d2/resnet12Bdc)
from . import resnet18  # noqa: F401  (resnet18/resnet18Bdc)
from . import wrn  # noqa: F401  (WRN)
from . import vit  # noqa: F401  (ViT/vit_tiny/vit_small)
from . import swin  # noqa: F401  (swin_mini/t/s/b/l)
from . import clap  # noqa: F401  (CLAPEmbeddingBackbone/CLAPBackbone)

from ...registry import BACKBONES


def get_backbone(name: str, **kwargs):
    return BACKBONES.build(name, **kwargs)
