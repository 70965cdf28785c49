from .ppo import PPO, A2C, PPOConfig, A2CConfig
from .sac import SAC, SACConfig, SACPolicy
from .ac_nets import ActorCriticPolicy, CustomNetwork
from .vec_env import VecEnv, coerce_action, make_vec_env
from .evaluate import evaluate_policy
from .video import VideoRecorder
from .extractor import build_policy, build_sac_policy, inject_pretrained_ocr

__all__ = [
    "PPO", "A2C", "PPOConfig", "A2CConfig", "SAC", "SACConfig", "SACPolicy",
    "ActorCriticPolicy", "CustomNetwork", "VecEnv", "coerce_action",
    "make_vec_env", "evaluate_policy", "VideoRecorder", "build_policy",
    "build_sac_policy", "inject_pretrained_ocr",
]
