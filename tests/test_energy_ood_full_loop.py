"""Full-loop energy-OOD trained parity (VERDICT r3 item 3 / missing #2).

Drives the COMPLETE calibrate → threshold → flag → TTA-re-vote pipeline in
BOTH frameworks on identical episodes at trained converted weights:

- calibration: per-val-batch 95 % quantile of correct-prediction
  uncertainties, mean policy (ours: DeepBDC.calibrate_threshold; reference:
  ``set_forward(update_threshold=True)`` accumulation +
  ``get_uncertainty_threshold('mean')``, deepbdc.py:319-323, 383-442) —
  thresholds must agree to float tolerance;
- flagging: top-20 % most-uncertain clips over the batch pool
  (ours ``ood_topk``; reference argsort mask, deepbdc.py:343-346) — flagged
  CLIP SETS must be identical;
- TTA re-vote: flagged clips' segments replaced by ``M`` noise-suppressed
  augmentations and re-voted (ours ``eval.tta_eval_step``; reference
  ``augment_images_with_mask`` + enlarged-batch re-forward, the intended
  loop of test.py:331-420) — final clip accuracy within 0.5 pts (the
  augmentation parameter draws use each framework's own RNG).

Broken-as-snapshotted notes: ``AbstractModel.forward`` DROPS the
``update_threshold``/``enhance_classification_via_energy`` kwargs
(abstract_model.py:149-153 calls ``set_forward(x)`` bare), so the reference
is driven through ``set_forward`` directly; ``libfewshot_core.test`` imports
the snapshot-missing data package, stubbed here to reach its intact
``augment_images_with_mask``.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402

from test_cross_framework import _train_ours, cfp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_AUG = 3


def _load_ref_test_module(monkeypatch):
    """Import libfewshot_core.test behind stubs for the snapshot-missing
    data package (its module body needs only the names).  The stubs are
    monkeypatch-scoped so later tests importing libfewshot_core.data fail
    loudly instead of silently binding these dummies."""
    if "libfewshot_core.data" not in sys.modules:
        d = types.ModuleType("libfewshot_core.data")
        d.get_dataloader = None
        c = types.ModuleType("libfewshot_core.data.collates")
        c.get_mean_std = lambda *a, **k: (0.0, 1.0)
        d.collates = c
        monkeypatch.setitem(sys.modules, "libfewshot_core.data", d)
        monkeypatch.setitem(sys.modules, "libfewshot_core.data.collates", c)
    return load_ref("libfewshot_core.test")


@pytest.mark.slow
def test_full_loop_energy_ood_parity(tmp_path, monkeypatch):
    from audio_fewshot_tpu.data import get_dataloader
    from audio_fewshot_tpu.eval import tta_eval_step
    from audio_fewshot_tpu.parallel import get_mesh
    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    trainer, config = _train_ours(
        tmp_path, "DeepBDC", "resnet12Bdc",
        {"num_channels": 1, "drop_rate": 0.0, "reduce_dim": 16},
        None,
        way=3, shot=2, query=5,
        epochs=1, train_episode=6, max_segments_per_clip=1,
    )
    variables = jax.device_get(trainer.variables)
    setting = trainer.eval_setting
    method = trainer.method

    state = invert_backbone_params(variables, "resnet12Bdc")
    model = cfp.build_reference_model(
        "DeepBDC", "resnet12Bdc",
        {"num_channels": 1, "drop_rate": 0.0, "reduce_dim": 16},
        setting.way, setting.shot, setting.query, state,
    )
    model.uncertainty_threshold = []
    model.eval()

    val_loader = get_dataloader(
        dict(config, device_data_bank=False), "val",
        method.model_type, False, "audio",
    )[0]
    test_loader = get_dataloader(
        dict(config, device_data_bank=False), "test",
        method.model_type, False, "audio",
    )[0]
    val_batches = [b for _, b in zip(range(5), val_loader.epoch(0))]
    test_batches = [b for _, b in zip(range(6), test_loader.epoch(1))]

    # deepbdc.set_forward(enhance=True) appends to ./test_uncertainty.npy
    monkeypatch.chdir(tmp_path)

    # ---- calibration --------------------------------------------------------
    class _Loader:
        def epoch(self, _):
            return iter(val_batches)

    th_ours = method.calibrate_threshold(
        variables, _Loader(), setting, get_mesh(1), policy="mean"
    )

    def ref_batch(b, repeats_override=None, images_override=None):
        images, target, repeats, support_size = cfp.episode_batch_to_reference(
            b, setting.way, setting.shot, setting.query
        )
        return (
            torch.from_numpy(np.ascontiguousarray(images))
            if images_override is None else images_override,
            torch.from_numpy(target),
            torch.from_numpy(repeats)
            if repeats_override is None else repeats_override,
            support_size,
        )

    with cfp.cuda_to_cpu(), torch.no_grad():
        for b in val_batches:
            model.set_forward(ref_batch(b), update_threshold=True)
        model.get_uncertainty_threshold(policy="mean")
    th_ref = float(model.uncertain_global_threshold)
    assert th_ours is not None
    # tolerance matches the accepted per-clip uncertainty drift below
    # (rel 1e-3, the DeepBDC fp32 logit bound) — the threshold is a
    # quantile of those same uncertainties, so it can't be tighter
    assert abs(th_ours - th_ref) <= 1e-3 * max(1.0, abs(th_ref)), (
        th_ours, th_ref,
    )

    # ---- flag + TTA re-vote -------------------------------------------------
    ref_test = _load_ref_test_module(monkeypatch)
    mean, std = [
        float(v) for v in np.load(
            os.path.join(REPO, "Auxiliary", "Clean_Mean_Std.npy")
        ).flatten()
    ]
    ref_aug_mod = load_ref("libfewshot_core.audio_augmentations")
    audio_aug = lambda x: ref_aug_mod.augment_spectrogram(  # noqa: E731
        x, mean=mean, std=std, augmentation_type="noise_suppression"
    )

    import jax.numpy as jnp

    fwd = jax.jit(method.forward, static_argnames=("setting",))
    unc_fn = jax.jit(method.clip_uncertainty)
    tta = jax.jit(
        lambda v, b, r: tta_eval_step(
            method, v, b, r, setting,
            tta_mean=mean, tta_std=std, num_augmentations=NUM_AUG,
            tta_segments_per_clip=1,
        )
    )

    ref_accs, ours_accs = [], []
    rng = jax.random.PRNGKey(11)
    for bi, b in enumerate(test_batches):
        with cfp.cuda_to_cpu(), torch.no_grad():
            _, acc0, uncertains, ood_mask, query_mask = model.set_forward(
                ref_batch(b), update_threshold=False,
                enhance_classification_via_energy=True,
            )
        seg_logits = fwd(variables, b, setting)
        unc_ours, _ = unc_fn(seg_logits, b)
        unc_ours = np.asarray(unc_ours).reshape(-1)
        unc_ref = uncertains.detach().cpu().numpy().reshape(-1)
        # identical uncertainty scores...
        rel = np.max(np.abs(unc_ours - unc_ref)) / max(
            1e-6, np.max(np.abs(unc_ref))
        )
        assert rel <= 1e-3, rel
        # ...and identical flagged-clip sets
        flags_ours = np.asarray(method.ood_mask(
            jnp.asarray(unc_ours).reshape(seg_logits.shape[0], -1)
        )).reshape(-1)
        assert flags_ours.sum() == ood_mask.sum() != 0
        assert set(np.where(flags_ours)[0]) == set(np.where(ood_mask)[0]), bi

        # reference intended enlarged-batch TTA loop (test.py:369-415)
        images, target, repeats, support_size = cfp.episode_batch_to_reference(
            b, setting.way, setting.shot, setting.query
        )
        idxs = np.where(ood_mask)[0]
        with cfp.cuda_to_cpu(), torch.no_grad():
            augmented = ref_test.augment_images_with_mask(
                images=torch.from_numpy(np.ascontiguousarray(images)),
                repeats=torch.from_numpy(repeats),
                is_query_mask=query_mask,
                mask=ood_mask,
                augmentation_fn=audio_aug,
                num_augmentations=NUM_AUG,
            )
            repeats2 = torch.from_numpy(repeats.copy())
            repeats2[idxs] += NUM_AUG - 1
            _, acc_ref, _, _, _ = model.set_forward(
                (augmented, torch.from_numpy(target), repeats2, support_size),
                update_threshold=False,
                enhance_classification_via_energy=True,
            )
        ref_accs.append(float(acc_ref))

        rng, step_rng = jax.random.split(rng)
        ours_accs.append(float(np.mean(np.asarray(
            tta(variables, b, step_rng)
        ))))

    acc_diff = abs(float(np.mean(ref_accs)) - float(np.mean(ours_accs)))
    assert acc_diff <= 0.5, (np.mean(ref_accs), np.mean(ours_accs))
