"""Sharded inference and training over a device mesh.

TPU-native parallelism (SURVEY §2.3, §5: new design, not a port):

* **data parallel**: frame/chip batches shard on the ``data`` mesh axis —
  detection, embedding and the fused program all parallelise trivially
  over frames;
* **tensor (model) parallel**: the embedder's wide tail (the 256-channel
  blocks' filters and the final FC) shards on the ``model`` axis;
  XLA inserts the all-gathers/psums implied by the sharding annotations;
* **training**: one jitted step — forward+backward with dp gradients
  psum-reduced implicitly via sharded-parameter semantics.

Shot-level parallelism across hosts (DCN) rides the scheduler
(`parallel/scheduler.py`); within a slice the batch axis is enough.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import embedder
from ..models.nn import Params
from .mesh import data_sharding, replicated


def shard_params_for_tp(params: Params, mesh: Mesh) -> Params:
    """Place embedder params with model-axis sharding on wide dimensions.

    Conv filters [kh, kw, cin, cout] shard on cout when divisible by the
    model-axis size; the FC [cin, 128] shards on cin.  Everything else is
    replicated.  With model axis size 1 this is pure replication.
    """
    tp = mesh.shape["model"]

    def place(path_leaf):
        leaf = path_leaf
        if not hasattr(leaf, "ndim"):
            return leaf
        spec = P()
        if leaf.ndim == 4 and leaf.shape[3] % tp == 0 and tp > 1:
            spec = P(None, None, None, "model")
        elif leaf.ndim == 2 and leaf.shape[0] % tp == 0 and tp > 1:
            spec = P("model", None)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def sharded_embed_fn(mesh: Mesh):
    """Jitted data-parallel embedder forward over the mesh."""
    in_shardings = (replicated(mesh), data_sharding(mesh))
    out_sharding = data_sharding(mesh)

    @partial(jax.jit, in_shardings=in_shardings, out_shardings=out_sharding)
    def run(params, chips):
        emb, _ = embedder.forward(params, chips, train=False)
        return emb

    return run


def make_train_step(mesh: Mesh, tx: optax.GradientTransformation,
                    threshold: float = 0.6, margin: float = 0.04):
    """Sharded metric-learning train step (dp over batch, tp over params).

    Returns a jitted function (params, opt_state, chips, labels) →
    (params, opt_state, loss).  Gradient reduction across the data axis is
    implied by the output sharding of params (replicated/model-sharded):
    XLA inserts the psum.
    """
    from ..ops.distance import pairwise_sqdist

    def loss_fn(params, chips, labels):
        emb, params_new = embedder.forward(params, chips, train=True,
                                           compute_dtype=jnp.float32)
        d = jnp.sqrt(pairwise_sqdist(emb, emb) + 1e-9)
        same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
        eye = jnp.eye(labels.shape[0], dtype=jnp.float32)
        same_mask = same * (1.0 - eye)
        diff_mask = 1.0 - same
        same_loss = jnp.maximum(0.0, d - (threshold - margin)) * same_mask
        diff_loss = jnp.maximum(0.0, (threshold + margin) - d) * diff_mask
        loss = (
            jnp.sum(same_loss) / jnp.maximum(jnp.sum(same_mask), 1.0)
            + jnp.sum(diff_loss) / jnp.maximum(jnp.sum(diff_mask), 1.0)
        )
        return loss, params_new

    batch_sharding = data_sharding(mesh)

    @partial(
        jax.jit,
        in_shardings=(None, None, batch_sharding, batch_sharding),
    )
    def step(params, opt_state, chips, labels):
        (loss, params_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, chips, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params_bn)
        return optax.apply_updates(params_bn, updates), opt_state, loss

    return step
