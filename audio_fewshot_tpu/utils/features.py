"""Feature-dump side artifacts (``featdata_*.npz``) + 2-D projection.

Reference: ``visualize_features`` (deepbdc.py:67-270, r2d2.py:160-270 —
identical copies).  As snapshotted the method is dead debug surface: its
only call sites are commented out (deepbdc.py:287-290), and of its body
only the ``featdata_<timestamp>.npz`` dump is live code — the entire
normalize → PCA → t-SNE → plotly projection pipeline is commented out
(deepbdc.py:140-270), and plotly isn't in the reference's requirements.

This module implements the *intended* surface, method-agnostic (the
reference pasted the same code into two heads):

- the live contract: one ``plots/featdata_<timestamp>.npz`` per episode
  with the reference's exact keys (``raw_features`` of shape
  ``[way*(shot+query), D]`` in alternating per-class blocks —
  "for each class -> [shot supports, query queries]", deepbdc.py:70-71 —
  plus ``shot``/``way``/``query``/``timestamp``/``normalize``/``method``);
- the intended projection: L2-normalize → PCA(≤50) → t-SNE(2, seed 0,
  init='pca') — the commented pipeline at deepbdc.py:141-157 — saved as
  a ``features_2d`` array (plotly HTML/PNG output is unavailable here and
  was never functional in the reference either).

The reference's contract requires exactly ``way*(shot+query)`` rows (it
aborts otherwise, deepbdc.py:124-128), i.e. one feature row per clip; for
multi-segment query clips we take each clip's FIRST valid segment.
Enabled by ``dump_features: true`` in the test config (run_test.py
``--dump_features true``).
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _first_segment_rows(
    qry: np.ndarray, clip_ids: np.ndarray, mask: np.ndarray, num_clips: int,
    logger=None,
) -> np.ndarray:
    """[G, D] padded segment features -> [num_clips, D], first valid
    segment of each clip (reference rows are one-per-clip)."""
    rows = np.zeros((num_clips, qry.shape[-1]), dtype=qry.dtype)
    empty = []
    for clip in range(num_clips):
        idx = np.nonzero((clip_ids == clip) & (mask > 0))[0]
        if idx.size:
            rows[clip] = qry[idx[0]]
        else:
            empty.append(clip)
    if empty and logger is not None:
        # an all-zero row would silently corrupt the dumped raw_features
        logger.warning(
            "featdata: query clips %s have no valid segment — their "
            "feature rows are zero-filled", empty,
        )
    return rows


def _project_2d(
    feat: np.ndarray, normalize: bool, method: str, logger=None
):
    """The reference's intended (commented-out) projection pipeline:
    L2 normalize -> PCA(min(50, D)) -> UMAP(2) when ``method == 'umap'``
    and umap is importable, else t-SNE(2, random_state=0, init='pca') —
    the reference falls back to t-SNE for any other method string or a
    missing umap (deepbdc.py:151-157).  Perplexity is clamped below
    n_samples (sklearn hard requirement the reference's default-args
    version would crash on for tiny episodes).  Returns
    ``(coords | None, projection_used)``."""
    try:
        from sklearn.decomposition import PCA
        from sklearn.manifold import TSNE
        from sklearn.preprocessing import normalize as sk_normalize
    except ImportError:  # mirror the reference's soft-fail (deepbdc.py:92-95)
        if logger is not None:
            logger.warning("sklearn unavailable — featdata saved without features_2d")
        return None, "none"
    n, d = feat.shape
    proc = sk_normalize(feat, norm="l2") if normalize else feat
    n_comp = min(50, d, n)
    proc = PCA(n_components=n_comp, random_state=0).fit_transform(proc)
    if method == "umap":
        try:
            import umap  # absent here; present = honor the knob

            reducer = umap.UMAP(n_components=2, random_state=0)
            return reducer.fit_transform(proc).astype(np.float32), "umap"
        except ImportError:
            if logger is not None:
                logger.warning(
                    "dump_features_method=umap but umap is unavailable — "
                    "falling back to t-SNE (reference HAVE_UMAP fallback)"
                )
    perplexity = min(30.0, max(2.0, (n - 1) / 3.0))
    tsne = TSNE(n_components=2, random_state=0, init="pca", perplexity=perplexity)
    return tsne.fit_transform(proc).astype(np.float32), "tsne"


def dump_episode_features(
    method,
    variables: Dict[str, Any],
    batch,
    out_dir: str,
    *,
    normalize: bool = True,
    proj_method: str = "tsne",
    logger=None,
) -> List[str]:
    """Embed one (materialized, upcast) EpisodeBatch and write a
    reference-contract ``featdata_*.npz`` per episode under
    ``out_dir/plots/``.  Returns the written paths."""
    # jitted: an eager embed through the TPU tunnel is round-trip-latency
    # bound (one dispatch per op); one compile is cheaper even for a
    # one-shot debug dump
    sup_f, qry_f, _ = jax.jit(
        lambda v, b: method.embed(v, b, train=False)
    )(variables, batch)
    sup = np.asarray(jax.device_get(sup_f), np.float32)
    qry = np.asarray(jax.device_get(qry_f), np.float32)
    e = sup.shape[0]
    sup = sup.reshape(e, sup.shape[1], -1)
    qry = qry.reshape(e, qry.shape[1], -1)
    sup_t = np.asarray(jax.device_get(batch.support_target))
    qry_t = np.asarray(jax.device_get(batch.query_target))
    clip_ids = np.asarray(jax.device_get(batch.query_clip))
    mask = np.asarray(jax.device_get(batch.query_mask))

    way = int(sup_t.max()) + 1 if sup_t.size else 0
    shot = sup.shape[1] // max(way, 1)
    num_clips = qry_t.shape[-1]
    query = num_clips // max(way, 1)

    plots = os.path.join(out_dir, "plots")
    os.makedirs(plots, exist_ok=True)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    paths: List[str] = []
    for ep in range(e):
        clip_rows = _first_segment_rows(
            qry[ep], clip_ids[ep], mask[ep], num_clips, logger=logger
        )
        blocks = []
        for c in range(way):
            blocks.append(sup[ep][sup_t[ep] == c])          # shot supports
            blocks.append(clip_rows[qry_t[ep] == c])        # query queries
        feat = np.concatenate(blocks, axis=0)
        assert feat.shape[0] == way * (shot + query), (
            feat.shape, way, shot, query,
        )
        feat_2d, used = _project_2d(feat, normalize, proj_method, logger)
        fname = os.path.join(plots, f"featdata_{timestamp}_{ep:03d}.npz")
        payload = dict(
            raw_features=feat,
            shot=shot, way=way, query=query,
            timestamp=timestamp,
            normalize=normalize,
            # the reference stores the REQUESTED method with the raw dump
            # (deepbdc.py:130-137); projection_used says what features_2d
            # actually is (umap falls back to t-SNE when unavailable)
            method=proj_method,
        )
        if feat_2d is not None:
            payload["features_2d"] = feat_2d
            payload["projection_used"] = used
        np.savez(fname, **payload)
        paths.append(fname)
    if logger is not None:
        logger.info("saved %d featdata dump(s) under %s", len(paths), plots)
    return paths
