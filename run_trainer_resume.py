"""Resume CLI (reference run_trainer_resume.py — note the reference version
is broken as snapshotted, importing upstream ``core.*``; SURVEY §7.3).
Loads a saved, fully-merged ``config.yaml`` with ``is_resume=True``."""

import argparse
import os

from audio_fewshot_tpu.config import Config
from audio_fewshot_tpu.train import Trainer

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("result_path", help="result dir of the run to resume")
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the jax CPU backend (tunnel-outage playbook)",
    )
    args, rest = parser.parse_known_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    config = Config(
        os.path.join(args.result_path, "config.yaml"), is_resume=True, cli_args=rest
    ).get_config_dict()
    config["resume_path"] = args.result_path
    Trainer(0, config).train_loop(0)
