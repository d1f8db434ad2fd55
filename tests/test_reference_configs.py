"""Drop-in config compatibility: every top-level leaf YAML shipped in the
reference's config tree must load through our layered config system (same
includes/header resolution) and build its method (backbone + classifier)
under the reference's own names and kwargs."""

import glob
import os

import pytest

from audio_fewshot_tpu.config import Config
from audio_fewshot_tpu.models import build_method

REF_CFG = "/root/reference/config"

LEAVES = sorted(glob.glob(os.path.join(REF_CFG, "*.yaml")))


@pytest.mark.skipif(not LEAVES, reason="reference config tree not present")
@pytest.mark.parametrize("path", LEAVES, ids=[os.path.basename(p) for p in LEAVES])
def test_reference_leaf_config_loads_and_builds(path):
    cfg = Config(path, cli_args=[]).get_config_dict()
    assert cfg["classifier"]["name"], path
    assert cfg["backbone"]["name"], path
    method = build_method(cfg)
    assert method is not None


_INCLUDE_DIRS = {"headers", "classifiers", "backbones"}
SUBDIR_LEAVES = sorted(
    yamls[0]
    for d in glob.glob(os.path.join(REF_CFG, "*/"))
    if os.path.basename(d.rstrip("/")) not in _INCLUDE_DIRS
    for yamls in [sorted(glob.glob(os.path.join(d, "*.yaml")))]
    if yamls
)


@pytest.mark.skipif(not SUBDIR_LEAVES, reason="reference config tree not present")
@pytest.mark.parametrize(
    "path", SUBDIR_LEAVES,
    ids=[os.path.join(*p.split(os.sep)[-2:]) for p in SUBDIR_LEAVES],
)
def test_reference_subdir_config_loads_and_builds(path):
    cfg = Config(path, cli_args=[]).get_config_dict()
    method = build_method(cfg)
    assert method is not None
