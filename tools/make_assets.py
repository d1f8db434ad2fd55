#!/usr/bin/env python
"""Regenerate the Auxiliary data assets.

The reference ships tiny ``.npy`` assets (SURVEY §0, §2.2):
- ``KOS_paper_splits.npy`` — object array of 3 class-name arrays
  (25 train / 5 val / 8 test, Auxiliary/KOS_paper_splits.npy)
- ``*_Mean_Std.npy`` — (2,1,1) float32 [mean, std] normalization scalars
  (e.g. Clean = [-15.114207, 26.22313])

This tool writes the same assets from their documented values so the
framework repo is standalone.
"""

from __future__ import annotations

import os

import numpy as np

# class-name splits (reference Auxiliary/KOS_paper_splits.npy contents —
# ESC-50 / UrbanSound8K / VocalSound-style event classes, 25/5/8)
TRAIN_CLASSES = [
    "sniff", "sigh", "laughter", "air_conditioner", "jackhammer",
    "children_playing", "drilling", "gun_shot", "dog+dog_bark",
    "running_water", "cat", "helicopter", "rooster",
    "electric_shaver_toothbrush", "sea_waves", "clapping", "snoring",
    "mouse_click", "frog", "washing_machine", "cow", "door_wood_creaks",
    "breathing", "can_opening", "brushing_teeth",
]
VAL_CLASSES = [
    "pageturn", "keysdrop", "doorslam", "throatclearing+clearthroat", "drawer",
]
TEST_CLASSES = [
    "crackling_fire", "crow", "chainsaw", "coughing+cough", "sneezing",
    "blender", "phone", "pig",
]

# (mean, std) log-mel normalization scalars per dataset variant
# (reference Auxiliary/*_Mean_Std.npy values)
MEAN_STD = {
    "Clean_Mean_Std.npy": (-15.114207, 26.22313),
    "KOS_0_alpha_Mean_Std.npy": (-15.114207, 26.223127),
    "KOS_0.5_alpha_Mean_Std.npy": (-6.3433824, 18.82505),
    "Spurious_Mean_Std.npy": (-4.157959, 18.082733),
}


def main(out_dir: str = "Auxiliary"):
    os.makedirs(out_dir, exist_ok=True)
    splits = np.empty(3, dtype=object)
    splits[0] = np.asarray(TRAIN_CLASSES)
    splits[1] = np.asarray(VAL_CLASSES)
    splits[2] = np.asarray(TEST_CLASSES)
    np.save(os.path.join(out_dir, "KOS_paper_splits.npy"), splits,
            allow_pickle=True)
    for name, (mean, std) in MEAN_STD.items():
        arr = np.asarray([mean, std], np.float32).reshape(2, 1, 1)
        np.save(os.path.join(out_dir, name), arr)
    print(f"wrote assets to {out_dir}/")


if __name__ == "__main__":
    main()
