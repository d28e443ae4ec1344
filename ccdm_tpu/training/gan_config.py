"""YAML config system for GAN baselines (StudioGAN config parity).

The StudioGAN baseline drives everything from yaml + dataclasses
(`StudioGAN/config.py`, `configs/ReACGAN.yaml` — SURVEY.md §5.6). This is the
typed equivalent for our GAN trainers: a yaml file maps onto CcGANConfig /
DMDConfig / the classgan knobs; unknown keys fail loudly.

Example yaml:
    trainer: ccgan
    data_name: RC-49
    niters: 40000
    threshold_type: soft
    loss_type: vanilla
    nda_b: 0.05
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

_TRAINERS = {}


def _register():
    global _TRAINERS
    if _TRAINERS:
        return _TRAINERS
    from ccdm_tpu.training.ccgan import CcGANConfig
    from ccdm_tpu.training.dmd import DMDConfig
    from ccdm_tpu.training.trainer import TrainerConfig

    _TRAINERS = {"ccgan": CcGANConfig, "dmd": DMDConfig, "diffusion": TrainerConfig}
    return _TRAINERS


def load_gan_config(path: str):
    """Parse a yaml file into the matching typed config dataclass.

    Returns (trainer_kind, config_dataclass, extras_dict). Keys that are not
    fields of the config land in extras (e.g. model/arch choices consumed by
    the launcher); typos against known fields raise.
    """
    import yaml

    with open(path) as f:
        raw: Dict[str, Any] = yaml.safe_load(f) or {}
    kind = raw.pop("trainer", "diffusion")
    trainers = _register()
    if kind not in trainers:
        raise ValueError(f"unknown trainer kind {kind}; choices {sorted(trainers)}")
    cls = trainers[kind]
    fields = {f.name for f in dataclasses.fields(cls)}
    cfg_kwargs = {k: v for k, v in raw.items() if k in fields}
    extras = {k: v for k, v in raw.items() if k not in fields}
    # loud failure on near-miss typos: extras that look like config fields
    for k in extras:
        close = [f for f in fields if f.replace("_", "") == k.replace("_", "")]
        if close:
            raise ValueError(f"config key {k!r}: did you mean {close[0]!r}?")
    return kind, cls(**cfg_kwargs), extras
