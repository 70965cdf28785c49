"""Benchmark-suite sweep launcher (reference: run_sb3s.py).

The reference shells out tmux panes, one GPU id per run.  Here runs execute
sequentially (or in tmux panes with --tmux) against the single TPU chip; the
model/env preset bundles live in for_running.json with the same schema.

    python run_sb3s.py --models "slate-transformer-0.01ent_coef" \
        --envs targetN4-hard-sparse --seeds 1234
"""

import argparse
import datetime
import json
import os
import shlex
import subprocess
import sys

DEFAULT_MODELS = [
    "e2e cnn 0.01ent_coef",
    "slate-transformer-0.01ent_coef",
]
# canonical benchmark suite order (reference: run_sb3s.py:22-27)
DEFAULT_ENVS = [
    "targetN4-hard-sparse",      # Object Goal Task
    "pushN3-hard-sparse",        # Object Interaction Task
    "oooC2S2S1-hard-sparse-oc",  # Object Comparison Task
    "oooC2S2S1-hard-sparse",     # Property Comparison Task
]
DEFAULT_SEEDS = [1234, 2345, 3456]


def build_commands(confs, models, env_names, seeds):
    commands = []
    for m_name in models:
        if m_name not in confs["ocrs"]:
            raise ValueError(f"model '{m_name}' not in for_running.json ocrs: "
                             f"{sorted(confs['ocrs'])}")
        for e_name in env_names:
            if e_name not in confs["envs"]:
                raise ValueError(f"env '{e_name}' not in for_running.json envs: "
                                 f"{sorted(confs['envs'])}")
            for seed in seeds:
                overrides = {}
                overrides.update(confs["ocrs"][m_name])
                overrides.update(confs["envs"][e_name])
                overrides["seed"] = str(seed)
                args = [f"{k}={v}" for k, v in overrides.items()]
                commands.append([sys.executable, "train_sb3.py"] + args)
    return commands


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="*", default=DEFAULT_MODELS)
    parser.add_argument("--envs", nargs="*", default=DEFAULT_ENVS)
    parser.add_argument("--seeds", nargs="*", type=int, default=DEFAULT_SEEDS)
    parser.add_argument("--tmux", action="store_true",
                        help="launch each run in a tmux window instead of sequentially")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    with open(os.path.join(os.path.dirname(__file__), "for_running.json")) as f:
        confs = json.load(f)

    commands = build_commands(confs, args.models, args.envs, args.seeds)
    if args.dry_run:
        for cmd in commands:
            print(shlex.join(cmd))
        return

    if args.tmux:
        session = datetime.datetime.now().strftime("%y-%m-%d-%H-%M-%S")
        subprocess.run(["tmux", "new-session", "-s", session, "-d"], check=True)
        for i, cmd in enumerate(commands):
            subprocess.run(["tmux", "new-window", "-t", session,
                            shlex.join(cmd)], check=True)
        print(f"launched {len(commands)} runs in tmux session {session}")
    else:
        for cmd in commands:
            print("running:", shlex.join(cmd))
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
