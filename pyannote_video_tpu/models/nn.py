"""Functional NN building blocks (no flax dependency on the hot path).

Minimal conv-net toolkit used by the detector (`models/detector.py`) and the
ResNet-29 embedder (`models/embedder.py`).  Parameters are plain pytrees
(nested dicts of jnp arrays) so they shard transparently under
``jax.sharding`` and serialize to .npz.

Conventions: NHWC activations, HWIO filters, float32 params with optional
bfloat16 compute (MXU-friendly; accumulation stays float32 via
``preferred_element_type``).

Padding follows dlib's conv semantics (needed for future .dat weight
conversion parity): stride-1 convs use SAME-style symmetric padding
(kernel//2), strided convs use VALID (padding 0).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, object]


def conv_init(key, k_h: int, k_w: int, c_in: int, c_out: int) -> Params:
    """He-normal conv filter + zero bias."""
    fan_in = k_h * k_w * c_in
    w = jax.random.normal(key, (k_h, k_w, c_in, c_out), dtype=jnp.float32)
    w = w * np.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((c_out,), dtype=jnp.float32)}


def conv(params: Params, x: jnp.ndarray, stride: int = 1,
         dlib_padding: bool = True, compute_dtype=jnp.float32) -> jnp.ndarray:
    """2-D convolution, NHWC×HWIO→NHWC, f32 accumulation."""
    w = params["w"].astype(compute_dtype)
    x = x.astype(compute_dtype)
    k_h, k_w = w.shape[0], w.shape[1]
    if dlib_padding and stride > 1:
        padding = "VALID"
    else:
        padding = [(k_h // 2, (k_h - 1) // 2), (k_w // 2, (k_w - 1) // 2)]
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + params["b"].astype(jnp.float32)


def bn_init(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), dtype=jnp.float32),
        "bias": jnp.zeros((c,), dtype=jnp.float32),
        "mean": jnp.zeros((c,), dtype=jnp.float32),
        "var": jnp.ones((c,), dtype=jnp.float32),
    }


def batch_norm(params: Params, x: jnp.ndarray, train: bool = False,
               eps: float = 1e-5) -> Tuple[jnp.ndarray, Params]:
    """Batch norm; returns (output, updated-params) in train mode.

    Inference mode is dlib's ``affine`` layer: a frozen scale+shift from the
    recorded statistics.
    """
    if train:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        momentum = 0.99
        new_params = {
            **params,
            "mean": momentum * params["mean"] + (1 - momentum) * mean,
            "var": momentum * params["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = params["mean"], params["var"]
        new_params = params
    inv = lax.rsqrt(var + eps) * params["scale"]
    return (x - mean) * inv + params["bias"], new_params


def max_pool(x: jnp.ndarray, window: int, stride: int,
             dlib_padding: bool = True) -> jnp.ndarray:
    padding = "VALID" if dlib_padding else "SAME"
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def avg_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / (window * window)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    return x.mean(axis=(1, 2))


# -- residual blocks (dlib `residual` / `residual_down` semantics) ----------


def resblock_init(key, c_in: int, c_out: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_init(k1, 3, 3, c_in, c_out),
        "bn1": bn_init(c_out),
        "conv2": conv_init(k2, 3, 3, c_out, c_out),
        "bn2": bn_init(c_out),
    }


def resblock(params: Params, x: jnp.ndarray, down: bool = False,
             train: bool = False, compute_dtype=jnp.float32):
    """dlib-style residual block.

    down=False: y = relu(x + bn2(conv2(relu(bn1(conv1(x))))))
    down=True : strided conv1; skip = 2×2 stride-2 avg-pool of x,
                zero-padded on channels (dlib residual_down,
                used by the embedder's ares_down levels).
    """
    stride = 2 if down else 1
    h = conv(params["conv1"], x, stride=stride, compute_dtype=compute_dtype)
    h, bn1 = batch_norm(params["bn1"], h, train=train)
    h = jax.nn.relu(h)
    h = conv(params["conv2"], h, stride=1, compute_dtype=compute_dtype)
    h, bn2 = batch_norm(params["bn2"], h, train=train)

    if down:
        skip = avg_pool(x, 2, 2)
        # crop to the conv output's spatial dims (VALID strided conv can be
        # one px smaller than the pooled skip)
        skip = skip[:, : h.shape[1], : h.shape[2], :]
        c_extra = h.shape[3] - skip.shape[3]
        if c_extra > 0:
            skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, c_extra)))
    else:
        skip = x

    out = jax.nn.relu(h + skip)
    new_params = {**params, "bn1": bn1, "bn2": bn2} if train else params
    return out, new_params


# -- (de)serialization -------------------------------------------------------


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    params: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return params


def save_params(path: str, params: Params) -> None:
    np.savez_compressed(path, **flatten_params(params))


def load_params(path: str) -> Params:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})
