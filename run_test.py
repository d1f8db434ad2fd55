"""Test CLI (reference run_test.py: loads <result_dir>/config.yaml with
``VAR_DICT = {test_epoch, test_episode}`` overrides and runs Test.test_loop).
Here the result dir is an argument instead of a hard-coded PATH
(reference run_test.py:132)."""

import argparse
import os

from audio_fewshot_tpu.config import Config
from audio_fewshot_tpu.eval import Test

# reference run_test.py:137-140 defaults
VAR_DICT = {
    "test_epoch": 1,
    "test_episode": 400,
}


def main(rank: int, config, result_path: str) -> None:
    test = Test(rank, config, result_path)
    test.test_loop()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "result_path", nargs="?", default=None,
        help="result dir containing config.yaml + checkpoints/ (from training)",
    )
    parser.add_argument("--yaml_path", "-y", type=str, default=None,
                        help="explicit config yaml (overrides result_path/config.yaml)")
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--test_episode", type=int, default=None)
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the jax CPU backend (tunnel-outage playbook)",
    )
    args, rest = parser.parse_known_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    var_dict = dict(VAR_DICT)
    if args.test_epoch is not None:
        var_dict["test_epoch"] = args.test_epoch
    if args.test_episode is not None:
        var_dict["test_episode"] = args.test_episode

    yaml_path = args.yaml_path
    if yaml_path is None and args.result_path:
        yaml_path = os.path.join(args.result_path, "config.yaml")
    config = Config(yaml_path, var_dict, cli_args=rest).get_config_dict()
    main(0, config, args.result_path)
