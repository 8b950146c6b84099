"""Training step and loop (reference hot loop: SURVEY.md §3.1).

Single-controller data parallelism: the step is jitted with batch inputs
sharded on the mesh "data" axis and replicated params; XLA inserts the
gradient psums DDP used to do.  Text features are re-encoded inside the step
(the text encoder is being finetuned — cat_seg_predictor.py:209-210), so the
class-token matrix is a static (T, 77) input baked at jit time.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import CATSegConfig
from ..core import catseg
from ..core.clip import encode_text
from ..parallel.mesh import batch_sharding, replicate, use_mesh
from .optim import build_optimizer


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def init_train_state(rng, cfg: CATSegConfig, params=None) -> tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        if cfg.fusion is not None:
            from ..core.fusion import init_fusion_params

            params = init_fusion_params(rng, cfg)
        else:
            params = catseg.init_catseg_params(rng, cfg)
    tx = build_optimizer(cfg, params)
    return TrainState(params=params, opt_state=tx.init(params)), tx


def make_train_step(cfg: CATSegConfig, tx: optax.GradientTransformation, text_tokens: np.ndarray, mesh=None):
    """Returns step(params, opt_state, images, targets) -> (params, opt_state, loss).

    text_tokens: (T, 77) int32 token ids of the train class list.
    """
    from ..core.clip import truncate_context

    tokens = jnp.asarray(truncate_context(text_tokens).astype(np.int32))
    dtype = jnp.dtype(cfg.compute_dtype)

    def make_loss_fn(gspmd_mesh):
        return lambda params, images, targets: _loss(
            params, images, targets, gspmd_mesh)

    def _loss(params, images, targets, gspmd_mesh):
        # Frozen leaves (clip_finetune policy, cat_seg_model.py:57-75) take
        # stop_gradient so their weight-grad matmuls never enter the jaxpr:
        # the optimizer zeroes them anyway, and the reference's global-norm
        # clip never sees them (train_net.py:203-204).
        from .optim import finetune_label_tree

        labels = finetune_label_tree(params, cfg.clip_finetune)
        params = jax.tree.map(
            lambda p, lbl: jax.lax.stop_gradient(p) if lbl == "frozen" else p,
            params, labels)
        with use_mesh(gspmd_mesh):
            emb = encode_text(params["clip"], tokens, cfg.clip, compute_dtype=dtype)
            emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True).astype(emb.dtype)
            text_feats = emb[:, None, :]  # (T, P=1, E)
            if cfg.fusion is not None:
                # dual-encoder family (ablation_train_eval31.sh trains
                # ImplicitFusionCATSegVer31 with the same BCE recipe)
                from ..core.fusion import fusion_forward

                if cfg.fusion.mode == "sam_refine":
                    # Ver14 supervises both proposals and refined masks with
                    # the same one-hot BCE; detectron2 sums the losses dict
                    # (implicit_fusion_Ver14.py:413-415)
                    coarse, refined = fusion_forward(params, images, text_feats, cfg,
                                                     with_coarse=True)
                    hw = targets.shape[1:3]
                    return (catseg.bce_loss(coarse, targets, cfg.ignore_value, hw)
                            + catseg.bce_loss(refined, targets, cfg.ignore_value, hw))
                logits = fusion_forward(params, images, text_feats, cfg)
            else:
                logits = catseg.forward(params, images, text_feats, cfg)
            return catseg.bce_loss(logits, targets, cfg.ignore_value, targets.shape[1:3])

    def step(params, opt_state, images, targets):
        # inputs may ride the wire as uint8 (images) / uint8 (targets) — the
        # mapper emits the smallest dtypes; widen on device
        images = images.astype(jnp.float32)
        targets = targets.astype(jnp.int32)
        n_data = mesh.shape["data"] if mesh is not None else 1
        n_class = mesh.shape.get("class", 1) if mesh is not None else 1
        if mesh is not None and n_class == 1 and images.shape[0] % n_data == 0:
            # Pure data parallelism: each device runs the UNCHANGED
            # single-chip step (fused Pallas kernels included) on its batch
            # slice inside one shard_map manual region; one pmean of
            # (loss, grads) replaces DDP's bucketed all-reduce.  bce_loss is
            # a plain mean over equal-shaped elements, so the pmean of
            # per-shard means is exactly the global mean.
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import local_region

            def local_grads(params, images, targets):
                with local_region():
                    out = jax.value_and_grad(make_loss_fn(None))(
                        params, images, targets)
                return jax.lax.pmean(out, "data")

            loss, grads = jax.shard_map(
                local_grads, mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=P(), check_vma=False)(params, images, targets)
        else:
            # GSPMD fallback: class-axis model parallelism (or an indivisible
            # batch) — the partitioner shards the class axis through the
            # aggregator (constrain_class_axis) and the fused kernels still
            # dispatch on local slabs via parallel.mesh.shard_kernel
            loss, grads = jax.value_and_grad(make_loss_fn(mesh))(
                params, images, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is not None:
        bs = batch_sharding(mesh)
        rep = replicate(mesh)
        return jax.jit(
            step,
            in_shardings=(rep, rep, bs, bs),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
    return jax.jit(step, donate_argnums=(0, 1))


def train(
    state: TrainState,
    tx,
    cfg: CATSegConfig,
    data_iter,
    text_tokens: np.ndarray,
    mesh=None,
    num_steps: int | None = None,
    log_every: int = 20,
    output_dir: str | None = None,
    checkpoint_every: int = 5000,
    eval_fn=None,
    eval_every: int = 5000,
):
    """Driver loop: step, log scalars to metrics.json, periodic full-state
    checkpoints (resume-capable), optional periodic eval (TEST.EVAL_PERIOD
    semantics — eval_fn(params) -> dict of scalars)."""
    from ..utils.events import EventWriter
    from .checkpoint import save_train_state

    import signal

    writer = EventWriter(output_dir)
    step_fn = make_train_step(cfg, tx, text_tokens, mesh=mesh)
    params, opt_state = state.params, state.opt_state
    n = num_steps if num_steps is not None else cfg.max_iter - state.step
    t0 = time.time()
    loss = None

    # Defer SIGINT/SIGTERM to iteration boundaries: the step is jitted with
    # donated params/opt_state, so an interrupt landing inside the dispatch
    # (a tunnel RPC — a real window every step) would leave both names bound
    # to deleted buffers and the interrupt checkpoint itself would fail.
    # SIGTERM gets the same treatment = preemption leaves a resumable
    # checkpoint (capability absent in the reference; run.sh only --resume's).
    pending = []
    prev_handlers = {}

    def _defer(signum, frame):
        pending.append(signum)

    in_main_thread = threading.current_thread() is threading.main_thread()
    if in_main_thread:
        for s in (signal.SIGINT, signal.SIGTERM):
            prev_handlers[s] = signal.signal(s, _defer)
    try:
        for i in range(n):
            if pending:
                raise KeyboardInterrupt
            images, targets = next(data_iter)
            params, opt_state, loss = step_fn(params, opt_state, jnp.asarray(images), jnp.asarray(targets))
            state.step += 1
            if log_every and (i + 1) % log_every == 0:
                lv = float(loss)  # scalar fetch = the only true sync point
                writer.write(state.step, loss_sem_seg=lv, it_per_sec=(i + 1) / (time.time() - t0))
            if output_dir and state.step % checkpoint_every == 0:
                save_train_state(output_dir, params, opt_state, state.step)
            if eval_fn is not None and state.step % eval_every == 0:
                metrics = eval_fn(params)
                writer.write(state.step, **{f"eval/{k}": v for k, v in metrics.items()})
    except KeyboardInterrupt:
        # an interrupted run still leaves a resumable checkpoint (detectron2's
        # trainer hooks do the same via its finally-save semantics)
        if output_dir:
            save_train_state(output_dir, params, opt_state, state.step)
            writer.write(state.step, interrupted=1.0)
        raise
    finally:
        # restore handlers; a signal that lands during the very last step is
        # absorbed — the loop has finished and the caller saves model_final
        if in_main_thread:
            for s, h in prev_handlers.items():
                signal.signal(s, h)
    state.params, state.opt_state = params, opt_state
    if loss is not None:
        _ = float(loss)
    writer.close()
    return state
