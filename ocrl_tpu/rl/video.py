"""Training-rollout video recording (VecVideoRecorder equivalent;
reference: train_sb3.py:66-71)."""

from __future__ import annotations

from pathlib import Path

import imageio
import numpy as np


class VideoRecorder:
    """Records `length` frames from env 0 every `interval` timesteps."""

    def __init__(self, out_dir: str | Path, interval: int, length: int):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.interval = max(int(interval), 1)
        self.length = int(length)
        self._frames: list[np.ndarray] = []
        self._recording = False
        self._next_trigger = 0

    def maybe_record(self, vec_env, num_timesteps: int) -> None:
        if not self._recording and num_timesteps >= self._next_trigger:
            self._recording = True
            self._start_step = num_timesteps
        if self._recording:
            self._frames.append(np.asarray(vec_env.render_frame(), np.uint8))
            if len(self._frames) >= self.length:
                self._flush()
                # schedule RELATIVE TO NOW: with many envs, num_timesteps
                # advances num_envs per frame, so `start + interval` can
                # already be in the past — which would re-trigger instantly
                # and record (+ GIF-encode) continuously
                self._next_trigger = num_timesteps + self.interval

    def _flush(self) -> None:
        if self._frames:
            path = self.out_dir / f"rollout_step{self._start_step}.gif"
            imageio.mimsave(path, self._frames, fps=15)
        self._frames = []
        self._recording = False

    def close(self) -> None:
        if self._recording:
            self._flush()
