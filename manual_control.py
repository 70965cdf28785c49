"""Interactive keyboard driver for the synthetic envs
(reference: envs/manual_control.py).

    python manual_control.py env=target-N4C4S3S1
Keys: arrows/wasd move, r reset, q quit.  Requires a display (matplotlib).
"""

import logging

import ocrl_tpu.envs as envs
from ocrl_tpu import config as cfglib

log = logging.getLogger(__name__)

KEYMAP = {"up": 0, "w": 0, "left": 1, "a": 1, "down": 2, "s": 2,
          "right": 3, "d": 3}


@cfglib.main("collect_dataset_from_synthetic_envs")
def main(config):
    import matplotlib.pyplot as plt

    logging.basicConfig(level=logging.INFO)
    env = getattr(envs, config.env.env)(config.env, seed=config.get("seed", 0))
    obs = env.reset()
    fig, ax = plt.subplots()
    im = ax.imshow(obs)
    ax.set_title("arrows/wasd: move, r: reset, q: quit")

    def on_key(event):
        nonlocal obs
        if event.key == "q":
            plt.close(fig)
            return
        if event.key == "r":
            obs = env.reset()
        elif event.key in KEYMAP:
            obs, reward, done, info = env.step(KEYMAP[event.key])
            log.info("reward=%.2f done=%s success=%s", reward, done,
                     info.get("is_success"))
            if done:
                obs = env.reset()
        im.set_data(obs)
        fig.canvas.draw_idle()

    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.show()


if __name__ == "__main__":
    main()
