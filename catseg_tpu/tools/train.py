"""Training CLI — the train_net.py equivalent.

    python -m catseg_tpu.tools.train --config vitb384 --output out/ \
        [--steps N] [--resume] [--dataset coco_2017_train_stuff_all_sem_seg] [KEY=VALUE ...]

Reproduces the reference recipe (SURVEY.md §3.1): COCO-Stuff-171 crops at
384², AdamW 2e-4 cosine over 80k steps, CLIP LR x0.01 with attention-mode
finetuning, full-model grad clip 0.01, batch 4.  Data parallel over all
available devices via the mesh; no process launcher.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.catalogs import get_dataset, load_class_names
from ..data.loader import list_dataset
from ..data.mapper import train_batches
from ..text.tokenizer import tokenize
from ..train import init_train_state
from ..train.loop import train
from .common import add_device_arg, apply_device, load_params, probe_device, resolve_config


def main(argv=None):
    import jax

    ap = argparse.ArgumentParser()
    add_device_arg(ap)
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("--output", default="output")
    ap.add_argument("--dataset", default="coco_2017_train_stuff_all_sem_seg")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--steps", type=int, default=None, help="default: cfg.max_iter")
    ap.add_argument("--checkpoint", default=None, help="initial weights (.npz/.pth)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-dataset", default=None, help="periodic eval (TEST.EVAL_PERIOD)")
    ap.add_argument("--eval-limit", type=int, default=200)
    ap.add_argument("--eval-every", type=int, default=5000)
    ap.add_argument("--auto-scale", action="store_true",
                    help="scale batch with device count and LR/iters inversely "
                         "(detectron2 auto_scale_workers, plain_train_net.py:279)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    apply_device(args)
    probe_device()

    cfg = resolve_config(args.config, args.overrides)
    if args.auto_scale and len(jax.devices()) > 1:
        from ..train.optim import auto_scale_config

        cfg = auto_scale_config(cfg, len(jax.devices()))
        print(f"auto-scaled: batch {cfg.batch_size}, lr {cfg.base_lr:.2e}, "
              f"max_iter {cfg.max_iter}")
    os.makedirs(args.output, exist_ok=True)

    params = load_params(args.checkpoint, cfg, seed=args.seed)

    spec = get_dataset(args.dataset)
    class_names = load_class_names(spec.class_json)
    first_names = [n.split(", ")[0] if ", " in n else n for n in class_names]
    tokens = tokenize([f"A photo of a {n} in the scene" for n in first_names])

    pairs = list_dataset(spec, root=args.data_root)
    rng = np.random.default_rng(args.seed)
    from ..data.loader import GeneratorPrefetcher

    data = GeneratorPrefetcher(
        train_batches(pairs, cfg.batch_size, rng, crop_size=cfg.crop_size,
                      color_aug=cfg.color_aug, ignore=cfg.ignore_value))

    from ..parallel.mesh import make_mesh

    mesh = make_mesh(n_class=1) if len(jax.devices()) > 1 else None
    state, tx = init_train_state(jax.random.PRNGKey(args.seed), cfg, params=params)

    if args.resume:
        from ..train.checkpoint import latest_checkpoint, load_train_state

        last = latest_checkpoint(args.output)
        if last:
            state.params, state.opt_state, state.step = load_train_state(
                last, state.params, state.opt_state
            )
            print(f"resumed from {last} at step {state.step}")

    eval_fn = None
    if args.eval_dataset:
        from ..evaluation.harness import evaluate_benchmark

        def eval_fn(params):
            m = evaluate_benchmark(params, cfg, args.eval_dataset, root=args.data_root,
                                   limit=args.eval_limit, verbose=False)
            return {k: m[k] for k in ("mIoU", "fwIoU", "mACC", "pACC")}

    try:
        train(state, tx, cfg, data, tokens, mesh=mesh, num_steps=args.steps,
              output_dir=args.output, eval_fn=eval_fn, eval_every=args.eval_every)
    finally:
        data.close()
    from ..weights.io import save_pytree

    save_pytree(os.path.join(args.output, "model_final.npz"), jax.device_get(state.params))
    print(f"saved {os.path.join(args.output, 'model_final.npz')}")


if __name__ == "__main__":
    main()
