#!/usr/bin/env python3
"""Materialise the env/ and dataset/ config-group presets from JSON tables.

The reference ships ~110 hand-written YAML presets under ``configs/env`` and
``configs/dataset`` (reference: configs/env/*.yaml).  We keep the parameter
tables as JSON data (``ocrl_tpu/config/presets/*.json``) and generate the YAML
group files from them, so the full Hydra-style CLI surface
(``env=odd-one-out-N4C2S2S1-oc`` etc.) is preserved without duplicating files
by hand.  Re-run this script after editing the JSON tables.
"""

import json
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]
PRESETS = REPO / "ocrl_tpu" / "config" / "presets"
CONFIGS = REPO / "configs"

BASE_NAMES = {"_base", "_synthetic_env_base", "_cw_env_base"}


def main() -> None:
    for group in ("env", "dataset"):
        table = json.loads((PRESETS / f"{group}.json").read_text())
        group_dir = CONFIGS / group
        group_dir.mkdir(parents=True, exist_ok=True)
        for name, fields in sorted(table.items()):
            body = dict(fields)
            lines = []
            if name in BASE_NAMES:
                # dataset/_synthetic_env_base composes on top of dataset/_base
                # (reference: configs/dataset/_synthetic_env_base.yaml:1-3)
                if group == "dataset" and name == "_synthetic_env_base":
                    lines.append("defaults:\n  - _base\n  - _self_\n")
            else:
                if name.startswith("cw-"):
                    base = "_cw_env_base" if group == "env" else "_base"
                else:
                    base = "_synthetic_env_base"
                lines.append(f"defaults:\n  - {base}\n  - _self_\n")
            lines.append(yaml.safe_dump(body, sort_keys=False, default_flow_style=None))
            (group_dir / f"{name}.yaml").write_text("".join(lines))
        print(f"wrote {len(table)} presets to {group_dir}")


if __name__ == "__main__":
    main()
