"""Round-3 honesty/fidelity fixes (VERDICT.md round 2, items 2 and 9)."""

import logging

import numpy as np
import pytest


class TestTtaCleanStats:
    """Energy-TTA must fail loudly when the Clean stats file is absent
    (reference test.py:397-398 hard-codes ./Auxiliary/Clean_Mean_Std.npy)."""

    def test_missing_clean_stats_raises(self, tmp_path):
        from audio_fewshot_tpu.eval import resolve_tta_stats

        cfg = {"tta_mean_std_file": str(tmp_path / "nope.npy")}
        with pytest.raises(FileNotFoundError, match="energy-OOD TTA requires"):
            resolve_tta_stats(cfg, logging.getLogger("t"))

    def test_explicit_opt_in_falls_back_to_config_stats(self, tmp_path):
        from audio_fewshot_tpu.eval import resolve_tta_stats

        ms = np.array([[[3.0]], [[2.0]]], dtype=np.float32)
        np.save(tmp_path / "cfg_ms.npy", ms)
        cfg = {
            "tta_mean_std_file": str(tmp_path / "nope.npy"),
            "tta_allow_config_stats": True,
            "mean_std_file": str(tmp_path / "cfg_ms.npy"),
        }
        mean, std = resolve_tta_stats(cfg, logging.getLogger("t"))
        assert float(np.asarray(mean).reshape(())) == pytest.approx(3.0)
        assert float(np.asarray(std).reshape(())) == pytest.approx(2.0)

    def test_present_clean_stats_load(self, tmp_path):
        from audio_fewshot_tpu.eval import resolve_tta_stats

        ms = np.array([[[-15.0]], [[26.0]]], dtype=np.float32)
        np.save(tmp_path / "Clean_Mean_Std.npy", ms)
        cfg = {"tta_mean_std_file": str(tmp_path / "Clean_Mean_Std.npy")}
        mean, std = resolve_tta_stats(cfg, logging.getLogger("t"))
        assert float(np.asarray(mean).reshape(())) == pytest.approx(-15.0)
        assert float(np.asarray(std).reshape(())) == pytest.approx(26.0)
