"""OOD protocol wiring (VERDICT round 1, item 5): ``ood: true`` must make
the TEST split resolve different data (the spurious-correlation variant)
than its iid twin, while train/val stay on the iid sources."""

import numpy as np
import pytest

from audio_fewshot_tpu.data.loader import build_dataset, resolve_data_sources


def test_resolve_kos_alpha_substitution():
    cfg = {
        "data_root": "/root/SC/Results/KOS_1_alpha/KOS_1_alpha_spec",
        "mean_std_file": "./Auxiliary/Clean_Mean_Std.npy",
        "ood": True,
    }
    root, ms = resolve_data_sources(cfg, "test")
    assert root == "/root/SC/Results/KOS_0_alpha/KOS_0_alpha_spec"
    # normalization stays Clean (reference test.py:397-398)
    assert ms == "./Auxiliary/Clean_Mean_Std.npy"
    # fractional alphas substitute too
    cfg["data_root"] = "/d/KOS_0.5_alpha/KOS_0.5_alpha_spec"
    assert resolve_data_sources(cfg, "test")[0] == "/d/KOS_0_alpha/KOS_0_alpha_spec"
    # train/val splits are untouched
    for mode in ("train", "val"):
        assert resolve_data_sources(cfg, mode)[0] == cfg["data_root"]
    # iid twin: byte-identical resolution
    cfg["ood"] = False
    assert resolve_data_sources(cfg, "test")[0] == cfg["data_root"]


def test_resolve_explicit_overrides():
    cfg = {
        "data_root": "/data/iid_spec",
        "mean_std_file": "/a/Clean_Mean_Std.npy",
        "ood": True,
        "ood_data_root": "/data/spurious_spec",
        "ood_mean_std_file": "/a/Spurious_Mean_Std.npy",
    }
    root, ms = resolve_data_sources(cfg, "test")
    assert root == "/data/spurious_spec"
    assert ms == "/a/Spurious_Mean_Std.npy"


@pytest.fixture
def twin_roots(tmp_path, rng):
    """iid + ood on-disk variants with distinguishable clip content."""
    for variant, scale in (("KOS_1_alpha_spec", 1.0), ("KOS_0_alpha_spec", 50.0)):
        for cls in ("c0", "c1", "c2"):
            cdir = tmp_path / variant / cls
            cdir.mkdir(parents=True)
            for k in range(4):
                np.save(cdir / f"clip{k}.npy",
                        (scale * rng.normal(size=(16, 24))).astype(np.float32))
    return tmp_path


def test_ood_config_loads_different_test_data(twin_roots):
    cfg = {
        "data_root": str(twin_roots / "KOS_1_alpha_spec"),
        "segment_frames": 24,
        "ood": False,
    }
    iid_test = build_dataset(cfg, "test")
    cfg["ood"] = True
    ood_test = build_dataset(cfg, "test")
    ood_train = build_dataset(cfg, "train")

    iid_clip = iid_test.clips[0][0]
    ood_clip = ood_test.clips[0][0]
    assert np.abs(ood_clip).mean() > 10 * np.abs(iid_clip).mean()
    # train split still reads the iid variant even under ood: true
    np.testing.assert_array_equal(ood_train.clips[0][0], iid_clip)


def test_synthetic_ood_twin_differs():
    cfg = {"data_root": "synthetic:4:6", "spec_shape": (1, 8, 10), "seed": 3}
    iid = build_dataset(cfg, "test")
    cfg["ood"] = True
    ood = build_dataset(cfg, "test")
    assert not np.array_equal(iid.clips[0][0], ood.clips[0][0])
    # same geometry — only the distribution shifts
    assert iid.segment_shape == ood.segment_shape
    assert iid.num_classes == ood.num_classes
