"""catseg_tpu: a TPU-native open-vocabulary semantic segmentation framework.

Re-implements the capabilities of CAT-Seg (cost aggregation over CLIP
image/text cosine-similarity volumes; reference: /root/reference, PyTorch +
Detectron2) as an idiomatic JAX/XLA/Pallas framework:

- pure-function model code over plain parameter pytrees (``catseg_tpu.core``)
- torch-semantics-exact primitive ops (``catseg_tpu.ops``)
- byte-level BPE tokenizer + prompt templates (``catseg_tpu.text``)
- torch-checkpoint conversion (``catseg_tpu.weights``)
- whole-image / sliding-window inference pipelines (``catseg_tpu.infer``)
- on-device evaluation (``catseg_tpu.evaluation``)
- data catalogs + host-side input pipeline (``catseg_tpu.data``)
- data-parallel / class-parallel sharding over a jax Mesh (``catseg_tpu.parallel``)
- training loop with the reference recipe (``catseg_tpu.train``)
"""

__version__ = "0.1.0"
