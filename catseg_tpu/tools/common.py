"""Shared CLI plumbing: config resolution, KEY=VALUE overrides, checkpoints."""

from __future__ import annotations

import ast

import numpy as np

from .. import configs
from ..configs import CATSegConfig

PRESETS = {
    "vitb384": configs.vitb384,
    "vitl336": configs.vitl336,
    "vith336": configs.vith336,
    "vitg336": configs.vitg336,
    "fusion_ver31": configs.fusion_ver31,
    "fusion_ver14": configs.fusion_ver14,
}


def resolve_config(name: str, overrides: list[str]) -> CATSegConfig:
    """Preset name + KEY=VALUE overrides (values parsed as python literals)."""
    if name not in PRESETS:
        raise SystemExit(f"unknown config preset {name!r}; available: {sorted(PRESETS)}")
    cfg = PRESETS[name]()
    kw = {}
    for ov in overrides:
        key, _, value = ov.partition("=")
        try:
            kw[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            kw[key] = value
    return cfg.replace(**kw) if kw else cfg


def load_params(path: str | None, cfg: CATSegConfig, seed: int = 0):
    """Checkpoint (.npz pytree or torch .pth) or random init."""
    import jax

    if path is None:
        if cfg.fusion is not None:
            from ..core.fusion import init_fusion_params

            return init_fusion_params(jax.random.PRNGKey(seed), cfg)
        from ..core.catseg import init_catseg_params

        return init_catseg_params(jax.random.PRNGKey(seed), cfg)
    if path.endswith(".pth") or path.endswith(".pt") or path.endswith(".bin"):
        from ..weights.convert import (
            convert_catseg_checkpoint,
            convert_openclip_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        if not any(k.startswith("sem_seg_head.") for k in sd):
            # bare CLIP state dict (OpenAI or open_clip — same key scheme,
            # both fused/split qkv handled): the reference's train-time init,
            # pretrained CLIP + random everything else
            # (cat_seg_predictor.py:64-76); the grid resize is a no-op when
            # the shipped pos embed already matches cfg.clip.pretrain_grid
            params = load_params(None, cfg, seed=seed)
            params["clip"] = convert_openclip_state_dict(sd, cfg.clip.pretrain_grid)
            return params
        return convert_catseg_checkpoint(sd, num_layers=cfg.num_layers)
    from ..weights.io import load_pytree

    return load_pytree(path)

def add_device_arg(ap):
    """--device cpu|tpu: force the JAX backend.  The tunneled host pins the
    JAX_PLATFORMS env var, so the switch must go through jax.config before
    the first device query (CLAUDE.md gotcha); useful for driving the CLIs
    on machines without the chip and in CI."""
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"],
                    help="force JAX backend (default: environment's)")


def apply_device(args):
    dev = getattr(args, "device", None)
    if dev:
        import jax

        jax.config.update("jax_platforms", dev)


def probe_device(retries: int = 1, wait_s: float = 10.0) -> None:
    """One tiny device op before real work: a freshly restarted process can
    hit a transient FAILED_PRECONDITION on the tunneled chip — retry once
    instead of dying mid-CLI (same insurance bench.py carries)."""
    import time

    import jax
    import jax.numpy as jnp

    for attempt in range(retries + 1):
        try:
            # scalar fetch, not block_until_ready: under the tunneled runtime
            # block_until_ready returns before the device executes, so only a
            # host-side value round-trip actually proves the chip is alive
            assert float(jnp.sum(jnp.zeros((8, 8)) + 1.0)) == 64.0
            return
        except Exception:
            if attempt == retries:
                raise
            time.sleep(wait_s)
