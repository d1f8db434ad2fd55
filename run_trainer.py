"""Train CLI (reference run_trainer.py: argparse --yaml_path → Config →
mp.spawn per GPU).  TPU-native: one process drives all devices through a
single jit — no spawn; extra ``--key value`` args override config keys."""

import argparse

from audio_fewshot_tpu.config import Config
from audio_fewshot_tpu.train import Trainer


def main(rank: int, config) -> None:
    trainer = Trainer(rank, config)
    trainer.train_loop(rank)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--yaml_path", "-y", type=str, default=None,
        help="path to the leaf config yaml",
    )
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the jax CPU backend (tunnel-outage playbook: the axon "
             "sitecustomize latches JAX_PLATFORMS before user code, but "
             "backends are lazy so this still wins pre-first-use)",
    )
    args, rest = parser.parse_known_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    config = Config(args.yaml_path, cli_args=rest).get_config_dict()
    main(0, config)
