"""The generated config matrix must load and build for every method."""

import glob
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_generated_method_config_builds(tmp_path):
    out = str(tmp_path / "config")
    # reuse the repo's headers/backbones includes
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "generate_configs.py"),
         "--methods", "all", "--shots", "5", "--seeds", "0",
         "--splits", "iid", "--out", out],
        check=True, cwd=REPO,
    )
    from audio_fewshot_tpu.config import Config
    from audio_fewshot_tpu.models import build_method

    leaves = sorted(glob.glob(os.path.join(out, "*", "*.yaml")))
    assert len(leaves) >= 34
    cwd = os.getcwd()
    os.chdir(REPO)  # includes resolve against ./config
    try:
        for path in leaves:
            cfg = Config(path).get_config_dict()
            build_method(cfg)
    finally:
        os.chdir(cwd)
