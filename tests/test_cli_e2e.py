"""End-to-end CLI test: dataset collection -> train_ocr -> resume.

Runs the real entry points in subprocesses (scrubbed env, CPU backend), like a
user would.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def run_cli(script, *args, timeout=420):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, str(REPO / script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    assert result.returncode == 0, result.stderr[-3000:]
    return result


@pytest.mark.slow
def test_collect_train_resume(tmp_path):
    ds = tmp_path / "ds.hdf5"
    run_cli("collect_dataset_from_synthetic_envs.py",
            "env=random-N5C4S4S2", "env.obs_size=32",
            "collection.num_tr=48", "collection.num_val=16",
            "collection.num_proc=1", f"+collection.out_file={ds}")
    assert ds.exists()

    run_dir = tmp_path / "run"
    common = ["ocr=vae", "dataset=random-N5C4S4S2", "dataset.obs_size=32",
              f"dataset.datadir={ds}", "batch_size=8", "eval_interval=4",
              f"run_dir={run_dir}"]
    run_cli("train_ocr.py", *common, "max_epochs=1")
    ckpt_dir = run_dir / "checkpoints"
    assert (ckpt_dir / "model_latest.ckpt").exists()
    assert (ckpt_dir / "model_best.ckpt").exists()
    metrics = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert any("val/loss" in m for m in metrics)

    # resume: second invocation picks up model_latest and continues stepping
    run_cli("train_ocr.py", *common, "max_epochs=2")
    metrics2 = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    steps = [m["_step"] for m in metrics2 if "train/loss" in m]
    assert max(steps) > 6  # continued past the first epoch's steps


@pytest.mark.slow
def test_multi_seed_train_resume_test_cycle(tmp_path):
    """train_sb3 multi-seed -> +resume= -> test_sb3 +seeds= on the produced
    checkpoint (the benchmark-table protocol, tiny budget)."""
    common = ["ocr=gt", "pooling=mlp", "sb3=ppo", "sb3_acnet=mlp",
              "env=target-N4C4S3S1", "+seeds=11,22", "num_envs=2",
              "sb3.algo_kwargs.n_steps=8", "sb3.algo_kwargs.batch_size=8",
              "eval.freq=4", "eval.n_episodes=2", "video.interval=100000"]
    run_dir = tmp_path / "run1"
    run_cli("train_sb3.py", *common, "max_steps=32",
            f"run_dir={run_dir}")
    ckpt = run_dir / "models" / "latest_model.ckpt"
    assert ckpt.is_file()
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert any(k.startswith("train/")
               for line in lines for k in json.loads(line))

    run_dir2 = tmp_path / "run2"
    run_cli("train_sb3.py", *common, "max_steps=48",
            f"run_dir={run_dir2}", f"+resume={ckpt}")
    assert (run_dir2 / "models" / "latest_model.ckpt").is_file()

    out = run_cli("test_sb3.py", "ocr=gt", "pooling=mlp", "sb3=ppo",
                  "sb3_acnet=mlp", "env=target-N4C4S3S1", "+seeds=11,22",
                  "n_eval_episodes=2",
                  f"agent_checkpoint.run_id={run_dir2 / 'models'}",
                  "agent_checkpoint.file=latest_model")
    assert "summary" in out.stdout
    assert "seed11" in out.stdout and "seed22" in out.stdout
