from .ppo import PPO, A2C, PPOConfig, A2CConfig
from .ac_nets import ActorCriticPolicy, CustomNetwork
from .vec_env import VecEnv, make_vec_env
from .evaluate import evaluate_policy
from .video import VideoRecorder
from .extractor import build_policy, inject_pretrained_ocr

__all__ = [
    "PPO", "A2C", "PPOConfig", "A2CConfig", "ActorCriticPolicy",
    "CustomNetwork", "VecEnv", "make_vec_env", "evaluate_policy",
    "VideoRecorder", "build_policy", "inject_pretrained_ocr",
]
