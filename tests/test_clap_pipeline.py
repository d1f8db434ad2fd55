"""CLAP waveform-path pipeline tests (VERDICT missing #3 / next-round #8).

Covers the full is_clap contract end-to-end with the tiny encoder variant:
waveform → flax CLAP encoder → offline extraction tool → embedding dataset
→ CLAPEmbeddingBackbone ProtoNet eval (reference clap.py:255-386,
trainer.py:179-184), plus the checkpoint npz roundtrip and the torch→flax
converter's name/shape mapping.
"""

import os
import subprocess
import sys
import wave as wave_mod

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.models.backbones.clap_encoder import (
    CLAPAudioEncoder,
    fit_waveform,
    load_params,
    mini_encoder,
    resample_linear,
    save_params,
    _flatten,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini():
    enc = mini_encoder()
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, enc.sample_rate)), jnp.float32
    )
    params = enc.init(jax.random.PRNGKey(0), wave)["params"]
    return enc, params, wave


def test_encoder_shape_and_normalization(mini):
    enc, params, wave = mini
    emb = enc.apply({"params": params}, wave)
    assert emb.shape == (3, 512)
    assert np.allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_waveform_fitting():
    short = np.ones(100, np.float32)
    assert fit_waveform(short, 250).shape == (250,)
    long = np.arange(1000, dtype=np.float32)
    out = fit_waveform(long, 400)
    assert out.shape == (400,) and out[0] == 300  # center crop
    r = resample_linear(np.sin(np.arange(1600) / 10), 16000, 48000)
    assert r.shape == (4800,)


def test_checkpoint_npz_roundtrip(mini, tmp_path):
    enc, params, wave = mini
    path = str(tmp_path / "clap_params.npz")
    save_params(path, params)
    loaded = load_params(path)
    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(params))
    a = enc.apply({"params": params}, wave)
    b = enc.apply({"params": loaded}, wave)
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_torch_converter_mapping(mini):
    """Build a torch-style CLAP state dict FROM the flax tree (inverse
    mapping), run tools/convert_clap_checkpoint.convert, and check it lands
    back on the exact flax names/shapes/values."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_clap_checkpoint import convert

    enc, params, _ = mini
    flat = _flatten(params)
    torch_state = {}
    for path, arr in flat.items():
        parts = path.split("/")
        if parts[0] == "htsat" and parts[1].startswith("merge"):
            s = int(parts[1][len("merge"):])
            if s == 0:
                if parts[2] == "kernel":
                    i, o = arr.shape  # (kh kw c, out) -> conv [out, c=1, 4, 4]
                    torch_state["audio_branch.patch_embed.proj.weight"] = (
                        arr.reshape(4, 4, i // 16, o).transpose(3, 2, 0, 1))
                else:
                    torch_state["audio_branch.patch_embed.proj.bias"] = arr
            else:
                if parts[2] == "kernel":
                    i4, o = arr.shape
                    c = i4 // 4
                    w = arr.reshape(2, 2, c, o)
                    w = w[(0, 1, 0, 1), (0, 0, 1, 1)]  # (00,01,10,11)->(00,10,01,11)
                    torch_state[
                        f"audio_branch.layers.{s - 1}.downsample.reduction.weight"
                    ] = w.reshape(4 * c, o).T
                # merge bias is zero-filled by the converter; skip
        elif parts[0] == "htsat" and parts[1].startswith("stage"):
            import re
            m = re.match(r"stage(\d+)_block(\d+)", parts[1])
            s, b = int(m.group(1)), int(m.group(2))
            base = f"audio_branch.layers.{s}.blocks.{b}"
            rest = "/".join(parts[2:])
            inv = {
                "norm1/scale": "norm1.weight", "norm1/bias": "norm1.bias",
                "norm2/scale": "norm2.weight", "norm2/bias": "norm2.bias",
                "attn/rel_pos_bias": "attn.relative_position_bias_table",
                "attn/qkv/kernel": "attn.qkv.weight",
                "attn/qkv/bias": "attn.qkv.bias",
                "attn/proj/kernel": "attn.proj.weight",
                "attn/proj/bias": "attn.proj.bias",
                "fc1/kernel": "mlp.fc1.weight", "fc1/bias": "mlp.fc1.bias",
                "fc2/kernel": "mlp.fc2.weight", "fc2/bias": "mlp.fc2.bias",
            }
            t = arr.T if rest.endswith("kernel") else arr
            torch_state[f"{base}.{inv[rest]}"] = t
        elif parts[0] == "htsat" and parts[1] == "norm":
            torch_state[f"audio_branch.norm."
                        f"{'weight' if parts[2] == 'scale' else 'bias'}"] = arr
        elif parts[0] in ("proj0", "proj1"):
            idx = "0" if parts[0] == "proj0" else "2"
            if parts[1] == "kernel":
                torch_state[f"audio_projection.{idx}.weight"] = arr.T
            else:
                torch_state[f"audio_projection.{idx}.bias"] = arr
        else:
            raise AssertionError(f"unhandled flax path {path}")
    # plus keys the converter must classify as known deltas, not unmapped
    torch_state["audio_branch.bn0.weight"] = np.ones(16, np.float32)
    torch_state["text_branch.embeddings.weight"] = np.zeros((4, 4), np.float32)

    out, ignored, unmapped = convert(torch_state)
    assert not unmapped, unmapped
    assert len(ignored) == 2
    for path, arr in flat.items():
        if path.split("/")[1].startswith("merge") and path.endswith("bias") \
                and path != "htsat/merge0/bias":
            assert np.allclose(out[path], 0.0)  # zero-filled (torch has none)
            continue
        assert path in out, path
        np.testing.assert_allclose(out[path], arr, rtol=1e-6,
                                   err_msg=path)


def test_extraction_tool_and_embedding_dataset(tmp_path):
    """wav/npy audio root → extraction CLI → embedding dataset → ProtoNet
    eval over CLAPEmbeddingBackbone (the full is_clap flow)."""
    rng = np.random.default_rng(1)
    audio_root = tmp_path / "audio"
    for c in range(3):
        cdir = audio_root / f"cls_{c}"
        cdir.mkdir(parents=True)
        for k in range(4):
            x = rng.normal(0, 0.1, size=12000).astype(np.float32)
            if k % 2 == 0:  # wav clip
                with wave_mod.open(str(cdir / f"clip_{k}.wav"), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes((x * 32767).astype("<i2").tobytes())
            else:  # raw waveform npy
                np.save(cdir / f"clip_{k}.npy", x)
    out_root = tmp_path / "embeddings"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "extract_clap_embeddings.py"),
         "--audio_root", str(audio_root), "--out", str(out_root),
         "--mini", "--allow-random-init", "--sample_rate", "16000",
         # the child process re-runs sitecustomize, which latches the
         # remote-TPU backend — keep the test off the tunnel
         "--cpu"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    emb = np.load(out_root / "cls_0" / "clip_0.npy")
    assert emb.shape == (512,) and abs(np.linalg.norm(emb) - 1) < 1e-3

    from audio_fewshot_tpu.data.loader import get_dataloader
    from audio_fewshot_tpu.models import build_method
    from audio_fewshot_tpu.models.base import EpisodeSetting, ModelType

    cfg = {
        "data_root": str(out_root), "is_clap": True,
        "way_num": 3, "shot_num": 1, "query_num": 2,
        "episode_size": 2, "test_episode": 2, "seed": 0,
        "backbone": {"name": "CLAPEmbeddingBackbone", "kwargs": None},
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio", "precision": "fp32",
    }
    loader = get_dataloader(cfg, "test", ModelType.METRIC)[0]
    batch = next(iter(loader.epoch(0)))
    assert batch.support.shape[-1] == 512  # 1-D embedding clips
    method = build_method(cfg)
    setting = EpisodeSetting(way=3, shot=1, query=2)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    logits = method.forward(variables, batch, setting)
    assert logits.shape[0] == 2 and logits.shape[-1] == 3
    assert np.all(np.isfinite(np.asarray(logits)))


def test_clap_backbone_factory_guard():
    from audio_fewshot_tpu.registry import BACKBONES

    with pytest.raises(ValueError, match="checkpoint_path"):
        BACKBONES.build("CLAPBackbone")
    enc = BACKBONES.build("CLAPBackbone", allow_random_init=True)
    assert isinstance(enc, CLAPAudioEncoder)


def test_is_clap_substitution_drops_foreign_backbone_kwargs():
    """`is_clap: true` on a shipped CNN config replaces the backbone the
    way the reference does (trainer.py:437-441 ignores the configured
    backbone entirely): the CNN's kwargs must not reach the CLAP encoder;
    only the CLAP opt-in keys survive the substitution."""
    from audio_fewshot_tpu.models import build_method

    cfg = {
        "is_clap": True,
        "way_num": 3, "shot_num": 1, "query_num": 2,
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": True, "last_pool": True, "maxpool_last2": True,
            "allow_random_init": True,  # CLAP opt-in rides along
        }},
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio", "precision": "fp32",
    }
    method = build_method(cfg)  # would TypeError on forwarded is_flatten
    assert isinstance(method.emb_func, CLAPAudioEncoder)
