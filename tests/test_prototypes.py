"""RNN prototype ladder: each warm-up must actually learn its task."""

import functools

import jax
import numpy as np

from gifgan_tpu.models import rnn_prototypes as P


def test_echo_rnn_learns(key):
    params = P.echo_rnn_init(key)
    data = functools.partial(P.echo_data, batch=32, length=12, delay=2)
    params, first, last = P.fit(params, P.echo_loss,
                                lambda k: data(k), steps=150)
    assert last < first * 0.5, (first, last)
    # accuracy check
    x, y = P.echo_data(jax.random.PRNGKey(99), 64, 12, 2)
    pred = np.asarray(P.echo_rnn_apply(params, x)).argmax(-1)
    acc = (pred[:, 2:] == np.asarray(y)[:, 2:]).mean()
    assert acc > 0.9, acc


def test_vector_echo_learns(key):
    dim = 6
    params = P.vector_echo_init(key, dim)
    params, first, last = P.fit(
        params, P.vector_echo_loss,
        lambda k: P.vector_echo_data(k, 32, 10, dim, 1), steps=200)
    assert last < first * 0.5


def test_conv_cls_learns(key):
    params = P.conv_cls_init(key)
    params, first, last = P.fit(
        params, P.conv_cls_loss,
        lambda k: P.conv_cls_data(k, 16, 6), steps=120, lr=3e-3)
    assert last < first * 0.7, (first, last)
    x, labels = P.conv_cls_data(jax.random.PRNGKey(7), 32, 6)
    pred = np.asarray(P.conv_cls_apply(params, x)).argmax(-1)
    acc = (pred == np.asarray(labels)).mean()
    assert acc > 0.6, acc
