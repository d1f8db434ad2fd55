"""Reproduce-tree compatibility (VERDICT r3 item 5): all YAMLs under the
reference's ``reproduce/`` tree — its de-facto regression oracle (SURVEY
§4.3), incl. the KOS two-stage recipes — must load through our layered
config system and build their method (backbone + classifier) under the
reference's own names and kwargs.

Broken-as-snapshotted recipes are xfailed with the reason, mirroring
test_reference_configs.py's contract for the shipped ``config/`` tree.
"""

import glob
import os

import pytest

from audio_fewshot_tpu.config import Config
from audio_fewshot_tpu.models import build_method

REF_REPRO = "/root/reference/reproduce"

YAMLS = sorted(glob.glob(os.path.join(REF_REPRO, "**", "*.yaml"), recursive=True))

# Recipes that cannot build as snapshotted, with the reason.  Keyed by
# path relative to reproduce/.  Each reason states the exact reference
# failure: ``get_instance`` passes the include-merged backbone kwargs
# verbatim into the constructor, and the snapshot's ``resnet12`` →
# ``ResNet.__init__`` (resnet_12.py:177-189) accepts no ``is_feature`` /
# ``leaky_relu`` / ``negative_slope`` / ``last_pool`` /
# ``use_running_statistics``, while ``resnet18`` → ``ResNet.__init__``
# (resnet_18.py:93-103) accepts no ``keep_prob`` / ``maxpool_last2`` /
# ``last_pool`` / ``leaky_relu`` — the reference TypeErrors identically.
_R12_KW = ("resnet12(**merged kwargs) TypeError: ResNet.__init__ "
           "(resnet_12.py:177) has no is_feature/leaky_relu/last_pool/"
           "negative_slope/use_running_statistics")
_R18_KW = ("resnet18(**merged kwargs) TypeError: ResNet.__init__ "
           "(resnet_18.py:93) has no keep_prob/maxpool_last2/last_pool/"
           "leaky_relu/negative_slope/use_running_statistics")
BROKEN = {
    "CAN/CAN-miniImageNet--ravi-resnet12-5-1-Table2.yaml": _R12_KW,
    "CAN/CAN-miniImageNet--ravi-resnet12-5-5-Table2.yaml": _R12_KW,
    "CAN/CAN-miniImageNet--ravi-resnet18-5-1-Table2.yaml": _R18_KW,
    "CAN/CAN-miniImageNet--ravi-resnet18-5-5-Table2.yaml": _R18_KW,
    "CAN/CAN-tiered_imagenet-resnet12-5-1-Table2.yaml": _R12_KW,
    "CAN/CAN-tiered_imagenet-resnet12-5-5-Table2.yaml": _R12_KW,
    "CAN/CAN-tiered_imagenet-resnet18-5-1-Table2.yaml": _R18_KW,
    "CAN/CAN-tiered_imagenet-resnet18-5-5-Table2.yaml": _R18_KW,
    "RENet/RENet-tiered_imagenet-resnet18-5-1-Table2.yaml": _R18_KW,
    "RFS/RFS-simple-tiered_imagenet-resnet12-Table2.yaml": _R12_KW,
    "RelationNet/RelationNet-miniImageNet--ravi-resnet12-5-1-Table2.yaml": _R12_KW,
    "RelationNet/RelationNet-miniImageNet--ravi-resnet12-5-5-Table2.yaml": _R12_KW,
    "RelationNet/RelationNet-miniImageNet--ravi-resnet18-5-5-Table2.yaml": _R18_KW,
    "MetaBaselineKendall/MetabaselineKendallPretrain-miniImageNet--ravi-resnet12.yaml":
        "includes classifiers/MetaBaselineKendall_pretrain.yaml which does "
        "not exist anywhere in the reference config tree",
}


def _id(p):
    return os.path.relpath(p, REF_REPRO)


@pytest.mark.skipif(not YAMLS, reason="reference reproduce tree not present")
@pytest.mark.parametrize("path", YAMLS, ids=[_id(p) for p in YAMLS])
def test_reproduce_config_loads_and_builds(path):
    rel = _id(path)
    if rel in BROKEN:
        pytest.xfail(BROKEN[rel])
    cfg = Config(path, cli_args=[]).get_config_dict()
    assert cfg["classifier"]["name"], path
    assert cfg["backbone"]["name"], path
    method = build_method(cfg)
    assert method is not None
