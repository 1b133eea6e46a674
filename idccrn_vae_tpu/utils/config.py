"""INI config surface compatible with the reference's myconf
(utils/read_config.py:15-19: a case-preserving ConfigParser).

The reference round-trips hyperparameters through checkpoint directory
names (SURVEY.md §2.8); this framework serializes a proper
``meta.json`` next to checkpoints instead (train/checkpoint.py) while
keeping the .ini surface for interop.
"""

from __future__ import annotations

import configparser
from typing import Optional


class IniConfig(configparser.ConfigParser):
    """Case-preserving ConfigParser (option names keep their case)."""

    def optionxform(self, optionstr: str) -> str:  # noqa: D102
        return optionstr


def load_ini(path: str) -> IniConfig:
    cfg = IniConfig()
    read = cfg.read(path)
    if not read:
        raise FileNotFoundError(f"config file not found: {path}")
    return cfg


def get_opt(cfg: IniConfig, section: str, option: str,
            default: Optional[str] = None) -> Optional[str]:
    if cfg.has_option(section, option):
        return cfg.get(section, option)
    return default
