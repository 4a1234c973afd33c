"""Softmax-regression hello world — the CPU-runnable onboarding artifact
(the reference vendored TF's mnist_softmax tutorial, tutorials/mnist/).

Runs on real MNIST idx files if --data-dir has them, else the synthetic
digit corpus. One linear layer, cross-entropy, plain SGD — the smallest
possible check that the jax stack is alive.

    python examples/mnist_softmax.py [--data-dir data/mnist] [--steps 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.5)
    args = p.parse_args()

    from gifgan_tpu.data.mnist import load_mnist, synthetic_digits

    if args.data_dir and os.path.exists(
            os.path.join(args.data_dir, "train-images-idx3-ubyte")):
        x, y = load_mnist(args.data_dir)
    else:
        print("no MNIST files found; using the synthetic digit corpus")
        x, y = synthetic_digits(20000)
    x = x.reshape(len(x), -1)
    n_train = int(0.9 * len(x))

    params = {"w": jnp.zeros((x.shape[1], 10)), "b": jnp.zeros(10)}

    @jax.jit
    def step(params, xb, yb):
        def loss_fn(p):
            logits = xb @ p["w"] + p["b"]
            return jnp.mean(optax.softmax_cross_entropy(logits, yb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree_util.tree_map(
            lambda p, g: p - args.lr * g, params, grads), loss

    rng = np.random.default_rng(0)
    for i in range(args.steps):
        idx = rng.integers(0, n_train, args.batch_size)
        params, loss = step(params, jnp.asarray(x[idx]), jnp.asarray(y[idx]))
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    logits = jnp.asarray(x[n_train:]) @ params["w"] + params["b"]
    acc = float((logits.argmax(1) == jnp.asarray(y[n_train:]).argmax(1)).mean())
    print(f"test accuracy: {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
