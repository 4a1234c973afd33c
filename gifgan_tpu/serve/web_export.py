"""Export generator weights to JSON for in-browser inference.

Rebuild of the reference's convnet.js weight export (utils.py:69-130
`to_json`, consumed by models/recurrent_z/web/js/app.js): the image
generator's parameters serialized layer-by-layer so a browser-side forward
pass can run draw-your-own-z demos without a server round trip.

Schema (documented, versioned — independent of any one JS framework):
{
  "format": "gifgan_tpu.generator/1",
  "z_dim", "output_size", "c_dim", "gf_dim",
  "layers": [
    {"name": "h0_lin", "type": "linear", "w": [[...]], "b": [...]},
    {"name": "bn0", "type": "batch_norm", "scale": [...], "bias": [...],
     "mean": [...], "var": [...]},
    {"name": "h1_deconv", "type": "deconv2d", "stride": 2,
     "w_shape": [5,5,out,in], "w": [...flat...], "b": [...]},
    ...
  ]
}
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np


def generator_to_json(params: Dict, state: Dict, cfg) -> str:
    layers = []
    order = ["h0_lin", "bn0", "h1_deconv", "bn1", "h2_deconv", "bn2",
             "h3_deconv", "bn3", "h4_deconv"]
    for name in order:
        p = params[name]
        if name.startswith("bn"):
            s = state[name]
            layers.append({
                "name": name, "type": "batch_norm",
                "scale": np.asarray(p["scale"]).tolist(),
                "bias": np.asarray(p["bias"]).tolist(),
                "mean": np.asarray(s["mean"]).tolist(),
                "var": np.asarray(s["var"]).tolist(),
                "eps": 1e-5,
            })
        elif name.endswith("_lin"):
            layers.append({
                "name": name, "type": "linear",
                "w": np.asarray(p["w"]).tolist(),
                "b": np.asarray(p["b"]).tolist(),
            })
        else:
            w = np.asarray(p["w"])
            layers.append({
                "name": name, "type": "deconv2d", "stride": 2,
                "w_shape": list(w.shape),
                "w": w.ravel().tolist(),
                "b": np.asarray(p["b"]).tolist(),
            })
    return json.dumps({
        "format": "gifgan_tpu.generator/1",
        "z_dim": cfg.z_dim,
        "output_size": cfg.output_size,
        "c_dim": cfg.c_dim,
        "gf_dim": cfg.gf_dim,
        "layers": layers,
    })


def generator_from_json(text: str):
    """Inverse of generator_to_json — returns (params, state, meta) usable by
    gifgan_tpu.models.dcgan.generator (round-trip tested)."""
    import jax.numpy as jnp

    doc = json.loads(text)
    assert doc["format"] == "gifgan_tpu.generator/1"
    params, state = {}, {}
    for layer in doc["layers"]:
        name, typ = layer["name"], layer["type"]
        if typ == "batch_norm":
            params[name] = {"scale": jnp.asarray(layer["scale"]),
                            "bias": jnp.asarray(layer["bias"])}
            state[name] = {"mean": jnp.asarray(layer["mean"]),
                           "var": jnp.asarray(layer["var"])}
        elif typ == "linear":
            params[name] = {"w": jnp.asarray(layer["w"]),
                            "b": jnp.asarray(layer["b"])}
        else:
            params[name] = {
                "w": jnp.asarray(layer["w"]).reshape(layer["w_shape"]),
                "b": jnp.asarray(layer["b"])}
    meta = {k: doc[k] for k in ("z_dim", "output_size", "c_dim", "gf_dim")}
    return params, state, meta


def export_browser_demo(params, state, cfg, out_dir: str, key=None) -> str:
    """Write a self-contained browser demo dir: weights.json (v1 schema),
    golden.json (a server-rendered z/image pair for the page's ?selftest=1
    pixel-parity check), plus generator.js + draw.html copied from
    serve/static. Returns out_dir."""
    import os
    import shutil

    import jax
    import jax.numpy as jnp

    from gifgan_tpu.models import dcgan

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "weights.json"), "w") as f:
        f.write(generator_to_json(params, state, cfg))
    key = key if key is not None else jax.random.PRNGKey(0)
    z = jax.random.uniform(key, (1, cfg.z_dim), minval=-1.0, maxval=1.0)
    img, _ = dcgan.generator(params, state, z, cfg, train=False)
    u8 = np.clip(np.round(255.0 * (np.asarray(img[0]) + 1.0) / 2.0),
                 0, 255).astype(int)
    with open(os.path.join(out_dir, "golden.json"), "w") as f:
        json.dump({"z": np.asarray(z[0]).tolist(),
                   "image_u8": u8.ravel().tolist(),
                   "shape": list(u8.shape)}, f)
    static = os.path.join(os.path.dirname(__file__), "static")
    for name in ("generator.js", "draw.html"):
        shutil.copy(os.path.join(static, name), os.path.join(out_dir, name))
    return out_dir


def generator_forward_reference(doc: Dict, z) -> np.ndarray:
    """Numpy transcription of static/generator.js — its executable spec.

    Mirrors the JS op-for-op (linear -> bn0 -> relu -> 3x[scatter-deconv ->
    bn -> relu] -> deconv -> tanh, NHWC row-major, inference-mode BN, the
    scatter formulation of conv2d_transpose SAME stride 2). Tested against
    models/dcgan.generator to <=1 u8; browsers run the same algorithm via
    draw.html?selftest=1 against the exported golden.json.
    """
    layers = {l["name"]: l for l in doc["layers"]}
    s16 = doc["output_size"] // 16

    def linear(zv, l):
        return np.asarray(zv, np.float32) @ np.asarray(l["w"], np.float32) \
            + np.asarray(l["b"], np.float32)

    def bn(t, l):
        inv = np.asarray(l["scale"], np.float32) / np.sqrt(
            np.asarray(l["var"], np.float32) + l.get("eps", 1e-5))
        return (t - np.asarray(l["mean"], np.float32)) * inv \
            + np.asarray(l["bias"], np.float32)

    def deconv(t, l):
        k, _, oc, ic = l["w_shape"]
        stride = l.get("stride", 2)
        w = np.asarray(l["w"], np.float32).reshape(k, k, oc, ic)
        h_in, w_in = t.shape[:2]
        out_h, out_w = h_in * stride, w_in * stride
        top = k - 1 - max(k - stride, 0) // 2
        out = np.zeros((out_h, out_w, oc), np.float32) \
            + np.asarray(l["b"], np.float32)
        for i in range(h_in):
            for j in range(w_in):
                for a in range(k):
                    y = stride * i + top - a
                    if not (0 <= y < out_h):
                        continue
                    for b in range(k):
                        x = stride * j + top - b
                        if not (0 <= x < out_w):
                            continue
                        out[y, x] += w[k - 1 - a, k - 1 - b] @ t[i, j]
        return out

    t = linear(z, layers["h0_lin"]).reshape(s16, s16, doc["gf_dim"] * 8)
    t = np.maximum(bn(t, layers["bn0"]), 0.0)
    for i in range(1, 4):
        t = deconv(t, layers[f"h{i}_deconv"])
        t = np.maximum(bn(t, layers[f"bn{i}"]), 0.0)
    t = deconv(t, layers["h4_deconv"])
    return np.tanh(t)
