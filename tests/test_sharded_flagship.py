"""Class-axis model parallelism at FLAGSHIP aggregator geometry.

The driver dryrun proves the mesh compiles at toy dims; this test proves the
class-axis sharding is numerically transparent where the shapes are real:
hidden 128, pad_len 256, T=847 (top-k truncation engaged), 2 layers, 24x24
features, window 12 — the ADE-847 eval configuration
(model.py:558-725 geometry; configs/vitb_384.yaml).

Runs aggregator_forward twice on the 8 virtual CPU devices: once un-meshed
single-device, once jitted over a {data:2, class:4} mesh with batch inputs
sharded on "data" and the class axis distributed by constrain_class_axis.
Outputs must agree bit-tolerantly (collective reduction order may differ).

Round 4: this now runs KERNELS-ON in both arms — under the mesh the fused
swin-pair / class-layer compositions dispatch through
parallel.mesh.shard_kernel (a shard_map manual region over the local
(B/data, T/class) slabs), so the sharded product path executes the same
Pallas kernels as single-chip (the round-3 build fell back to plain XLA
under any mesh).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from catseg_tpu.configs import vitb384, eval_preset
from catseg_tpu.core.aggregator import aggregator_forward, init_aggregator_params
from catseg_tpu.parallel.mesh import make_mesh, use_mesh

T = 847
B = 2


def test_sharded_aggregator_matches_single_device_flagship_dims():
    cfg = eval_preset(vitb384(compute_dtype="float32"))
    assert cfg.hidden_dim == 128 and cfg.pad_len == 256 and cfg.num_layers == 2

    agg = init_aggregator_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    E = cfg.clip.embed_dim
    img_feats = jnp.asarray(rng.randn(B, 24, 24, E).astype(np.float32))
    text = rng.randn(B, T, 1, E).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    g0 = jnp.asarray(rng.randn(B, 24, 24, cfg.appearance_guidance_dim).astype(np.float32))
    g1 = jnp.asarray(rng.randn(B, 48, 48, cfg.decoder_guidance_dims[0]).astype(np.float32))
    g2 = jnp.asarray(rng.randn(B, 96, 96, cfg.decoder_guidance_dims[1]).astype(np.float32))

    def run(img_feats, text, g0, g1, g2):
        return aggregator_forward(agg, img_feats, text, (g0, g1, g2), cfg)

    single = np.asarray(jax.jit(run)(img_feats, text, g0, g1, g2))

    mesh = make_mesh(n_data=2, n_class=4)
    bs = NamedSharding(mesh, P("data"))

    def run_meshed(img_feats, text, g0, g1, g2):
        with use_mesh(mesh):
            return aggregator_forward(agg, img_feats, text, (g0, g1, g2), cfg)

    sharded_fn = jax.jit(run_meshed,
                         in_shardings=(bs, bs, bs, bs, bs),
                         out_shardings=NamedSharding(mesh, P("data")))
    sharded = np.asarray(sharded_fn(img_feats, text, g0, g1, g2))

    assert single.shape == sharded.shape == (B, T, 96, 96)
    # identical math modulo collective/fusion reduction order
    kept = single > -99.0  # scattered dropped classes are exactly -100
    np.testing.assert_array_equal(kept, sharded > -99.0)
    diff = np.abs(single - sharded)[kept]
    assert diff.max() < 2e-4, diff.max()
