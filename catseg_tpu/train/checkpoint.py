"""Full training-state checkpointing (params + optimizer state + step).

The resume semantics of detectron2's DetectionCheckpointer (SURVEY.md §5):
periodic saves, a ``last_checkpoint`` pointer file, resume_or_load.  Uses
flax.serialization msgpack for the optax state pytree (named tuples and all).
"""

from __future__ import annotations

import os

import jax
from flax import serialization


def save_train_state(output_dir: str, params, opt_state, step: int, name: str | None = None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    name = name or f"model_{step:07d}.ckpt"
    path = os.path.join(output_dir, name)
    blob = serialization.to_bytes(
        {"params": jax.device_get(params), "opt_state": jax.device_get(opt_state), "step": step}
    )
    with open(path + ".tmp", "wb") as f:
        f.write(blob)
    os.replace(path + ".tmp", path)
    with open(os.path.join(output_dir, "last_checkpoint"), "w") as f:
        f.write(name)
    return path


def load_train_state(path: str, params_template, opt_state_template):
    """Restore into templates (shapes/structure must match)."""
    with open(path, "rb") as f:
        blob = f.read()
    target = {"params": params_template, "opt_state": opt_state_template, "step": 0}
    restored = serialization.from_bytes(target, blob)
    return restored["params"], restored["opt_state"], int(restored["step"])


def latest_checkpoint(output_dir: str) -> str | None:
    pointer = os.path.join(output_dir, "last_checkpoint")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    path = os.path.join(output_dir, name)
    return path if os.path.exists(path) else None
