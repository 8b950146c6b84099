"""Hardware smoke suite: compile-and-run every model family on the real TPU.

The pytest suite runs on CPU (tests/conftest.py forces it) with Pallas in
interpret mode; Mosaic-compile-only failures (e.g. scoped-VMEM overflows at
benchmark class counts) surface only on hardware.  This tool drives each
family end to end with random weights and synthetic inputs:

  python -m catseg_tpu.tools.smoke_tpu            # all, ~6 min incl. compiles
  python -m catseg_tpu.tools.smoke_tpu --only b16,t847

Families: b16 (ViT-B/16 sliding eval), t847 (ADE-847-sized class list →
pad_len top-k truncation path), l14 (ViT-L/14@336), h14 (OpenCLIP ViT-H
tier), fusion (Ver31 dual-encoder), sam_refine (Ver14 SAM mask refinement),
train (one batch-4 training step).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _predictor(cfg, T, rng):
    import jax
    from catseg_tpu.core import catseg
    from catseg_tpu.infer.pipeline import Predictor

    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return Predictor(params, cfg, [f"c{i}" for i in range(T)], text_feats=text,
                     input_canvas=(1024, 1024))


def _sliding(cfg, T, n=6):
    import jax.numpy as jnp
    from catseg_tpu.infer.pipeline import resize_argmax_dynamic

    rng = np.random.RandomState(0)
    pred = _predictor(cfg, T, rng)
    img = rng.randint(0, 255, (640, 853, 3), dtype=np.uint8)
    sz = jnp.asarray([512, 683], np.int32)
    _sync(resize_argmax_dynamic(pred.probs_sliding(img), sz, (768, 768)))
    t0 = time.time()
    for _ in range(n):
        s = resize_argmax_dynamic(pred.probs_sliding(img), sz, (768, 768))
    _sync(s)
    return n / (time.time() - t0)


def smoke_b16():
    from catseg_tpu.configs import eval_preset, vitb384

    return f"{_sliding(eval_preset(vitb384()), 150):.2f} im/s (T=150)"


def smoke_t847():
    from catseg_tpu.configs import eval_preset, vitb384

    return f"{_sliding(eval_preset(vitb384()), 847):.2f} im/s (T=847 top-k path)"


def smoke_l14():
    from catseg_tpu.configs import eval_preset, vitl336

    return f"{_sliding(eval_preset(vitl336()), 150):.2f} im/s (T=150)"


def smoke_h14():
    import jax
    import jax.numpy as jnp
    from catseg_tpu.configs import vith336
    from catseg_tpu.core import catseg

    cfg = vith336()
    rng = np.random.RandomState(0)
    T = 20
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    images = jnp.asarray(rng.randint(0, 255, (1, cfg.clip_resolution, cfg.clip_resolution, 3)).astype(np.float32))
    out = jax.jit(lambda p, im, tf: catseg.forward(p, im, tf, cfg))(
        params, images, jnp.asarray(text, jnp.bfloat16))
    _sync(out)
    return f"forward OK {tuple(out.shape)}"


def smoke_fusion():
    import jax
    import jax.numpy as jnp
    from catseg_tpu.configs import eval_preset, fusion_ver31
    from catseg_tpu.core import catseg, fusion

    cfg = eval_preset(fusion_ver31())
    rng = np.random.RandomState(0)
    T = 40
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    images = jnp.asarray(rng.randint(0, 255, (1, 512, 512, 3)).astype(np.float32))
    f = jax.jit(lambda p, im, tf: fusion.fusion_forward(p, im, tf, cfg))
    out = f(params, images, jnp.asarray(text, jnp.bfloat16))
    _sync(out)
    t0 = time.time()
    for _ in range(5):
        out = f(params, images, jnp.asarray(text, jnp.bfloat16))
    _sync(out)
    return f"forward {((time.time() - t0) / 5 * 1000):.1f} ms/img"


def smoke_sam_refine():
    """Ver14 family: B/16 proposals + per-class SAM mask refinement at the
    real SAM resolution (1024² encoder, 64² embedding, 256² refined masks)."""
    import jax
    import jax.numpy as jnp
    from catseg_tpu.configs import eval_preset, fusion_ver14
    from catseg_tpu.core import fusion

    cfg = eval_preset(fusion_ver14())
    rng = np.random.RandomState(0)
    T = 40
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    images = jnp.asarray(rng.randint(0, 255, (1, 512, 512, 3)).astype(np.float32))
    f = jax.jit(lambda p, im, tf: fusion.fusion_forward(p, im, tf, cfg))
    out = f(params, images, jnp.asarray(text, jnp.bfloat16))
    _sync(out)
    t0 = time.time()
    for _ in range(3):
        out = f(params, images, jnp.asarray(text, jnp.bfloat16))
    _sync(out)
    ms = (time.time() - t0) / 3 * 1000

    # head proposals + pad_len truncation: the aggregator's top-k bounds the
    # SAM refinement (kept classes only, -100 scatter); shrink pad_len so
    # the truncated path compiles/runs in smoke time
    cfg2 = dataclasses.replace(
        cfg, pad_len=32,
        fusion=dataclasses.replace(cfg.fusion, refine_from="head"))
    f2 = jax.jit(lambda p, im, tf: fusion.fusion_forward(p, im, tf, cfg2))
    out2 = f2(params, images, jnp.asarray(text, jnp.bfloat16))
    _sync(out2)
    assert out2.shape[1] == T
    return (f"refined {tuple(out.shape)}  {ms:.1f} ms/img; "
            f"head+topk(pad_len=32) {tuple(out2.shape)} ok")


def smoke_train():
    import jax
    import jax.numpy as jnp
    from catseg_tpu.configs import vitb384
    from catseg_tpu.text.tokenizer import tokenize
    from catseg_tpu.train.loop import init_train_state, make_train_step

    cfg = vitb384()
    rng = np.random.RandomState(0)
    B, T = 4, 171
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    tokens = np.stack([np.asarray(tokenize([f"a photo of c{i}"])[0]) for i in range(T)]).astype(np.int32)
    step = make_train_step(cfg, tx, tokens)
    images = jnp.asarray(rng.randint(0, 255, (B, 384, 384, 3)).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, T, (B, 384, 384)).astype(np.int32))
    params, opt_state, loss = step(state.params, state.opt_state, images, targets)
    l0 = float(loss)
    t0 = time.time()
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, images, targets)
    float(loss)
    return f"{(time.time() - t0) / 5 * 1000:.0f} ms/step (loss {l0:.3f})"


SMOKES = {
    "b16": smoke_b16,
    "t847": smoke_t847,
    "l14": smoke_l14,
    "h14": smoke_h14,
    "fusion": smoke_fusion,
    "sam_refine": smoke_sam_refine,
    "train": smoke_train,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", default=None, help="comma-separated subset of " + ",".join(SMOKES))
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(SMOKES)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            msg = SMOKES[name]()
            print(f"[{name:6s}] PASS  {msg}  ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            failed.append(name)
            print(f"[{name:6s}] FAIL  {type(e).__name__}: {str(e)[:300]}", flush=True)
    if failed:
        raise SystemExit(f"failed: {failed}")
    print("all smokes passed", flush=True)


if __name__ == "__main__":
    main()
