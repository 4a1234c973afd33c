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
