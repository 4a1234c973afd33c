"""RNN prototype ladder — runnable warm-ups below the recurrent video GAN.

The reference's rnn_test/ directory is a sequence of ever-larger standalone
prototypes used as development-time verification (SURVEY.md §4: "prototype
ladder as tests"): echo-task RNN (rnn_basic.py), vector-input variant
(rnn_basic_vector_input.py), and conv-LSTM per-pixel/channel classification
(rnn_lstm_conv*.py). Same ladder here, as small pure-JAX trainables each with
a data generator, loss, and train step — the smallest checks that the
recurrence machinery (scan, cells, conv encoders) learns at all.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gifgan_tpu.models.recurrent_image import lstm_init, lstm_step
from gifgan_tpu.ops import nn

Array = jax.Array


# ---------------------------------------------------------------------------
# 1. echo task: output the input bit from `delay` steps ago (rnn_basic.py)
# ---------------------------------------------------------------------------

def echo_data(key, batch: int, length: int, delay: int) -> Tuple[Array, Array]:
    x = jax.random.bernoulli(key, 0.5, (batch, length)).astype(jnp.float32)
    y = jnp.roll(x, delay, axis=1).at[:, :delay].set(0.0)
    return x, y


def echo_rnn_init(key, hidden: int = 16) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "wx": nn.normal_init(k1, (1, hidden), 0.1),
        "wh": nn.normal_init(k2, (hidden, hidden), 0.1),
        "b": jnp.zeros((hidden,)),
        "out": nn.linear_init(k3, hidden, 2),
    }


def echo_rnn_apply(params, x: Array) -> Array:
    """x (B, T) -> logits (B, T, 2) via a tanh RNN scanned over time."""
    b = x.shape[0]
    h0 = jnp.zeros((b, params["wh"].shape[0]))

    def step(h, xt):
        h = jnp.tanh(xt[:, None] @ params["wx"] + h @ params["wh"]
                     + params["b"])
        return h, nn.linear(params["out"], h)

    _, logits = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(logits, 0, 1)


def echo_loss(params, x, y):
    logits = echo_rnn_apply(params, x)
    labels = y.astype(jnp.int32)
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, 2), labels.reshape(-1)))


# ---------------------------------------------------------------------------
# 2. vector-input echo (rnn_basic_vector_input.py): echo a one-hot vector
# ---------------------------------------------------------------------------

def vector_echo_data(key, batch: int, length: int, dim: int, delay: int):
    idx = jax.random.randint(key, (batch, length), 0, dim)
    x = jax.nn.one_hot(idx, dim)
    y = jnp.roll(idx, delay, axis=1).at[:, :delay].set(0)
    return x, y


def vector_echo_init(key, dim: int, hidden: int = 32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"lstm": lstm_init(k1, dim, hidden),
            "out": nn.linear_init(k2, hidden, dim)}


def vector_echo_apply(params, x: Array) -> Array:
    b, t, d = x.shape
    hidden = params["out"]["w"].shape[0]
    carry = (jnp.zeros((b, hidden)), jnp.zeros((b, hidden)))

    def step(c, xt):
        c, h = lstm_step(params["lstm"], c, xt)
        return c, nn.linear(params["out"], h)

    _, logits = jax.lax.scan(step, carry, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(logits, 0, 1)


def vector_echo_loss(params, x, y):
    logits = vector_echo_apply(params, x)
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, logits.shape[-1]), y.reshape(-1)))


# ---------------------------------------------------------------------------
# 3. conv-LSTM sequence classification (rnn_lstm_conv*.py): classify which
# channel of a noisy image sequence carries the moving signal
# ---------------------------------------------------------------------------

def conv_cls_data(key, batch: int, length: int, size: int = 16,
                  channels: int = 3):
    k1, k2 = jax.random.split(key)
    labels = jax.random.randint(k1, (batch,), 0, channels)
    noise = 0.3 * jax.random.normal(k2, (batch, length, size, size, channels))
    t_idx = jnp.arange(length)
    pos = (t_idx * 2) % size
    signal = jnp.zeros((batch, length, size, size, channels))
    for c in range(channels):
        stripe = jnp.zeros((length, size, size)).at[t_idx, :, pos].set(1.0)
        signal = signal.at[..., c].add(
            stripe[None] * (labels == c)[:, None, None, None])
    return jnp.clip(noise + signal, -1, 2), labels


def conv_cls_init(key, channels: int = 3, filters: int = 8,
                  hidden: int = 32) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": nn.conv2d_init(k1, channels, filters),
        "conv2": nn.conv2d_init(k2, filters, filters * 2),
        "lstm": lstm_init(k3, 4 * 4 * filters * 2, hidden),
        "out": nn.linear_init(k4, hidden, channels),
    }


def conv_cls_apply(params, x: Array) -> Array:
    """x (B, T, s, s, c) -> class logits (B, c): conv-encode every frame in
    one folded batch, scan an LSTM over time, classify the final state."""
    b, t = x.shape[:2]
    folded = x.reshape((b * t,) + x.shape[2:])
    h = nn.lrelu(nn.conv2d(params["conv1"], folded))
    h = nn.lrelu(nn.conv2d(params["conv2"], h))
    enc = h.reshape(b, t, -1)
    hidden = params["out"]["w"].shape[0]
    carry = (jnp.zeros((b, hidden)), jnp.zeros((b, hidden)))

    def step(c, xt):
        c, hh = lstm_step(params["lstm"], c, xt)
        return c, hh

    carry, _ = jax.lax.scan(step, carry, jnp.swapaxes(enc, 0, 1))
    return nn.linear(params["out"], carry[1])


def conv_cls_loss(params, x, labels):
    logits = conv_cls_apply(params, x)
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits, labels))


# ---------------------------------------------------------------------------
# shared trainer
# ---------------------------------------------------------------------------

def fit(params: Dict, loss_fn, data_fn, steps: int = 200,
        lr: float = 1e-2, seed: int = 0) -> Tuple[Dict, float, float]:
    """Generic Adam loop; returns (params, first_loss, last_loss)."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(params, opt_state, key):
        k1, key = jax.random.split(key)
        batch = data_fn(k1)
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    first = last = None
    for _ in range(steps):
        params, opt_state, key, loss = step(params, opt_state, key)
        if first is None:
            first = float(loss)
        last = float(loss)
    return params, first, last
