"""Post-training int8 quantization for the inference/serving path.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate (394 vs 197
TFLOP/s peak), and the serving forward pass (explorer / sampler / webcam —
reference model_sampler.py, explorer.py, run_webcam_demo) is pure inference:
BatchNorm uses running moments, weights are frozen. That makes the classic
quantized-inference recipe exact-shaped for TPU serving:

  1. fold inference-mode BN into the preceding conv/deconv/linear
     (w' = w * g, b' = (b - mean) * g + beta, g = scale * rsqrt(var + eps)),
  2. quantize folded weights to int8 per OUTPUT channel (symmetric,
     scale = max|w'| / 127 — per-channel because DCGAN layers have
     100x dynamic-range spread across filters),
  3. quantize activations per tensor, dynamically (scale computed in-graph
     from max|x|; one extra HBM-bound reduce per layer, negligible next to
     the conv),
  4. convolve int8 x int8 with int32 accumulation
     (preferred_element_type=int32 — lands on the MXU's int path),
  5. dequantize in the epilogue: y = acc * (s_x * s_w[o]) + b', then the
     nonlinearity in float. XLA fuses 3 and 5 into the conv.

Quantized layers mirror gifgan_tpu/ops/nn.py signatures (the float oracles);
model-level helpers quantize the image DCGAN generator (reference
model.py:298-324) and the VID_DCGAN z-sequence MLP (z_model_lib.py:353-382),
which together are the entire serving forward stack.

This path is forward-only (int8 convolutions have no VJP): it serves
sampling/rendering. Latent inversion (invert/optimize.py) keeps the float
generator — its 1200-step budget already runs in under half a second warm.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gifgan_tpu.core.config import DCGANConfig, VidGANConfig
from gifgan_tpu.ops import nn

Array = jax.Array

# int8 symmetric range. 127 (not 128) keeps the grid symmetric so that
# negating an input negates its quantization exactly.
QMAX = 127.0


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def fold_bn(layer: Dict, bn_params: Dict, bn_state: Dict, out_axis: int,
            eps: float = 1e-5) -> Dict:
    """Fold inference-mode batch_norm (ops/nn.py:228-255, train=False) into
    the preceding affine layer.

    y = xW + b followed by (y - mean) * g + beta, g = scale * rsqrt(var+eps),
    equals xW' + b' with W' = W * g (g broadcast along `out_axis` of W) and
    b' = (b - mean) * g + beta. Exact in f32 up to reassociation.
    """
    g = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + eps)
    w = layer["w"].astype(jnp.float32)
    shape = [1] * w.ndim
    shape[out_axis] = -1
    return {
        "w": w * g.reshape(shape),
        "b": (layer["b"].astype(jnp.float32) - bn_state["mean"]) * g
             + bn_params["bias"],
    }


# ---------------------------------------------------------------------------
# weight / activation quantization
# ---------------------------------------------------------------------------

def quantize_weight(layer: Dict, out_axis: int) -> Dict:
    """{'w', 'b'} float layer -> {'wq' int8, 'ws' f32 per-out-channel, 'b'}."""
    w = layer["w"].astype(jnp.float32)
    axes = tuple(a for a in range(w.ndim) if a != out_axis)
    scale = jnp.max(jnp.abs(w), axis=axes) / QMAX
    scale = jnp.maximum(scale, 1e-12)  # all-zero channels
    shape = [1] * w.ndim
    shape[out_axis] = -1
    wq = jnp.clip(jnp.round(w / scale.reshape(shape)), -QMAX, QMAX)
    return {"wq": wq.astype(jnp.int8), "ws": scale,
            "b": layer["b"].astype(jnp.float32)}


def quantize_act(x: Array) -> Tuple[Array, Array]:
    """Dynamic per-tensor symmetric quantization: (x_q int8, scale f32[]).

    The scale is data-dependent but stays on device — under jit it is a
    scalar in the graph, not a host sync.
    """
    scale = jnp.max(jnp.abs(x.astype(jnp.float32))) / QMAX
    scale = jnp.maximum(scale, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -QMAX, QMAX)
    return xq.astype(jnp.int8), scale


# Candidate fractions of the max-derived scale swept by MSE calibration
# (calibrate_* mode="mse"). 1.0 = plain max-abs; smaller fractions trade
# clipping of the tail against finer resolution for the bulk.
MSE_FRACTIONS = tuple(round(0.30 + 0.05 * i, 2) for i in range(15))  # .30–1.0


def _mse_sweep(x32: Array, s_base: Array) -> Array:
    """Quantization MSE of x under each candidate scale s_base * f for f in
    MSE_FRACTIONS -> (len(MSE_FRACTIONS),). lax.map keeps peak memory at one
    copy of x instead of |fractions|."""

    def one(f):
        s = s_base * f
        xq = jnp.clip(jnp.round(x32 / s), -QMAX, QMAX)
        err = xq * s - x32
        return jnp.mean(err * err)

    return jax.lax.map(one, jnp.asarray(MSE_FRACTIONS, jnp.float32))


def _act(x: Array, q: Dict, obs=None, key: str = None
         ) -> Tuple[Array, Array]:
    """Activation quantization for one layer: static when the layer carries
    a calibrated scale ('as', set by calibrate_*), dynamic otherwise —
    static skips the per-layer max reduce (an extra full HBM pass over the
    activation) and makes the graph input-independent.

    obs: optional dict for calibration — records this layer's observed
    max|x| under `key` (call unjitted so the maxima are concrete). On a
    layer that already carries a static 'as' (a second calibration pass),
    the capture additionally records the quantization-MSE sweep over
    MSE_FRACTIONS of that scale — the evidence mse-mode calibration
    refines 'as' from."""
    if obs is not None:
        x32 = x.astype(jnp.float32)
        m = jnp.max(jnp.abs(x32))
        if "as" in q:
            obs[key] = {"max": m, "mse": _mse_sweep(x32, q["as"])}
        else:
            prev = obs.get(key, 0.0)
            obs[key] = jnp.maximum(prev if not isinstance(prev, dict)
                                   else 0.0, m)
    if "as" in q:
        scale = q["as"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -QMAX, QMAX)
        return xq.astype(jnp.int8), scale
    return quantize_act(x)


def _obs_out(y: Array, obs, key) -> Array:
    """Record a layer's per-output-channel PRE-ACTIVATION output mean under
    obs['__out_mean__'][key] — the evidence bias_correct_* matches against
    the float reference's means."""
    if obs is not None and key is not None:
        obs.setdefault("__out_mean__", {})[key] = jnp.mean(
            y.astype(jnp.float32), axis=tuple(range(y.ndim - 1)))
    return y


# ---------------------------------------------------------------------------
# quantized layers (signatures mirror ops/nn.py)
# ---------------------------------------------------------------------------

def _dequant(acc: Array, s_x: Array, q: Dict) -> Array:
    y = acc.astype(jnp.float32) * (s_x * q["ws"])
    return y + q["b"]


def _is_q(layer: Dict) -> bool:
    """True for an int8 layer ({'wq','ws','b'}), False for a float
    ({'w','b'}) layer in a mixed-precision serving tree. Tree structure is
    static under jit, so this branches at trace time."""
    return "wq" in layer


def qlinear(q: Dict, x: Array, obs=None, key: str = None) -> Array:
    """int8 counterpart of nn.linear (w layout (in, out), out_axis=1).
    Float layers in a mixed-precision tree run the plain f32 affine."""
    if not _is_q(q):
        return _obs_out(jnp.dot(x.astype(jnp.float32), q["w"]) + q["b"],
                        obs, key)
    xq, s_x = _act(x, q, obs, key)
    acc = jax.lax.dot_general(xq, q["wq"],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return _obs_out(_dequant(acc, s_x, q), obs, key)


def qconv2d(q: Dict, x: Array, stride: int = 2, obs=None,
            key: str = None) -> Array:
    """int8 counterpart of nn.conv2d (HWIO, out_axis=3)."""
    xq, s_x = _act(x, q, obs, key)
    acc = jax.lax.conv_general_dilated(
        xq, q["wq"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return _obs_out(_dequant(acc, s_x, q), obs, key)


def qdeconv2d(q: Dict, x: Array, stride: int = 2, obs=None,
              key: str = None) -> Array:
    """int8 counterpart of nn.deconv2d's dilated form (ops/nn.py:125-155).

    q holds the TF-layout (k, k, out, in) kernel quantized along axis 2;
    the flip/transpose to HWIO happens on the int8 tensor (a pure layout
    permutation — quantization commutes with it). Float layers in a
    mixed-precision tree run the f32 dilated deconv (ops/nn.py).
    """
    if not _is_q(q):
        return _obs_out(nn.deconv2d(q, x.astype(jnp.float32), stride=stride,
                                    dtype=jnp.float32), obs, key)
    xq, s_x = _act(x, q, obs, key)
    w = q["wq"]
    k = w.shape[0]
    pad_total = max(k - stride, 0)
    pl = pad_total // 2
    pr = pad_total - pl
    pad = (k - 1 - pl, k - 1 - pr)
    rhs = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    acc = jax.lax.conv_general_dilated(
        xq, rhs, (1, 1), (pad, pad),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return _obs_out(_dequant(acc, s_x, q), obs, key)


# ---------------------------------------------------------------------------
# model-level: image DCGAN generator (models/dcgan.py:63-83, train=False)
# ---------------------------------------------------------------------------

def _tile_bn(d: Dict, reps: int) -> Dict:
    """Expand per-channel BN vectors across `reps` leading spatial positions.

    dcgan.generator applies bn0 AFTER reshaping the h0_lin output to
    (B, s16, s16, gf*8): linear-output index ((h*s16)+w)*C + c normalizes
    with channel stats g[c], so folding bn0 into the linear needs each
    vector tiled `s16*s16` times (channel-fastest order == jnp.tile)."""
    return {k: jnp.tile(v, reps) for k, v in d.items()}


def _as_float_layer(folded: Dict) -> Dict:
    return {"w": folded["w"].astype(jnp.float32),
            "b": folded["b"].astype(jnp.float32)}


def quantize_image_generator(params: Dict, state: Dict,
                             float_last: bool = False,
                             float_layers: Tuple[str, ...] = ()) -> Dict:
    """Float generator params + BN running state -> int8 serving params.

    bn{i} folds into the layer it normalizes: h0_lin -> bn0 (tiled over the
    s16 x s16 reshape positions), h{1..3}_deconv -> bn{1..3}; h4_deconv has
    no BN (tanh output). Deconv TF layout (k, k, out, in) quantizes along
    axis 2; linear along 1.

    Mixed precision: layers named in `float_layers` (and h4_deconv when
    float_last=True) stay f32 {'w','b'} — BN still folded — and the q
    forwards dispatch per layer on the tree structure (_is_q). Useful when
    a specific layer's quantization error moves a quality metric; on the
    endurance-3 checkpoint the full-int8 path cost ~13 points of face
    track-rate that no single-layer float carve-back recovered — the
    documented recipe is docs/SERVING.md.
    """
    fl = set(float_layers) | ({"h4_deconv"} if float_last else set())
    out_dim = params["h0_lin"]["w"].shape[1]
    reps = out_dim // params["bn0"]["scale"].shape[0]

    def mk(name, folded, out_axis):
        return (_as_float_layer(folded) if name in fl
                else quantize_weight(folded, out_axis=out_axis))

    q = {
        "h0_lin": mk("h0_lin",
                     fold_bn(params["h0_lin"], _tile_bn(params["bn0"], reps),
                             _tile_bn(state["bn0"], reps), out_axis=1), 1),
        "h4_deconv": mk("h4_deconv", params["h4_deconv"], 2),
    }
    for i, name in enumerate(["h1_deconv", "h2_deconv", "h3_deconv"]):
        q[name] = mk(name, fold_bn(params[name], params[f"bn{i + 1}"],
                                   state[f"bn{i + 1}"], out_axis=2), 2)
    return q


def image_generator_q(q: Dict, z: Array, cfg: DCGANConfig,
                      obs=None) -> Array:
    """Quantized mirror of dcgan.generator(..., train=False): z (B, z_dim)
    -> images (B, s, s, c) in [-1, 1]. BN is pre-folded; epilogues in f32.

    obs: calibration capture dict (see _act); keys are layer names."""
    s16 = cfg.output_size // 16
    gf = cfg.gf_dim
    h = qlinear(q["h0_lin"], z, obs, "h0_lin")
    h = jax.nn.relu(h.reshape(-1, s16, s16, gf * 8))
    for name in ("h1_deconv", "h2_deconv", "h3_deconv"):
        h = jax.nn.relu(qdeconv2d(q[name], h, obs=obs, key=name))
    return jnp.tanh(qdeconv2d(q["h4_deconv"], h, obs=obs, key="h4_deconv"))


# ---------------------------------------------------------------------------
# model-level: VID_DCGAN serving stack (vid-G MLP + nested image G)
# ---------------------------------------------------------------------------

def quantize_vid_stack(params, state, float_last: bool = False,
                       float_layers: Tuple[str, ...] = ()) -> Dict:
    """VidGANParams/VidGANState (models/vid_dcgan.py) -> int8 serving tree
    covering the full generate_videos forward (z_model_lib.py:353-382 MLP
    composed with the frozen image generator).

    float_last keeps the image generator's tanh output layer in f32;
    float_layers names layers to keep f32 as "vid/lin0" / "img/h1_deconv"
    (see quantize_image_generator)."""
    fl = set(float_layers)
    vid_fl = {n.split("/", 1)[1] for n in fl if n.startswith("vid/")}
    img_fl = tuple(n.split("/", 1)[1] for n in fl if n.startswith("img/"))
    vg, vs = params.vid_generator, state.vid_generator

    def mk(name, folded):
        return (_as_float_layer(folded) if name in vid_fl
                else quantize_weight(folded, out_axis=1))

    qvid = {"lin3": mk("lin3", vg["lin3"])}
    for i in range(3):
        qvid[f"lin{i}"] = mk(f"lin{i}", fold_bn(vg[f"lin{i}"], vg[f"bn{i}"],
                                                vs[f"bn{i}"], out_axis=1))
    return {
        "vid": qvid,
        "img": quantize_image_generator(params.img_generator,
                                        state.img_generator,
                                        float_last=float_last,
                                        float_layers=img_fl),
    }


def vid_generator_q(qvid: Dict, z: Array, cfg: VidGANConfig,
                    obs=None) -> Array:
    """Quantized mirror of vid_dcgan.vid_generator(..., train=False):
    z (B, z_in) -> per-frame latents (B*T, z_out) in [-1, 1]."""
    b, t = z.shape[0], cfg.vid_length
    z_copied = jnp.broadcast_to(z[:, None, :], (b, t, cfg.z_input_size))
    frame_numbers = jnp.linspace(-1.0, 1.0, t, dtype=jnp.float32)
    frame_numbers = jnp.broadcast_to(frame_numbers[None, :, None], (b, t, 1))
    h = jnp.concatenate([z_copied.astype(jnp.float32), frame_numbers],
                        axis=-1)
    h = h.reshape(b * t, cfg.z_input_size + 1)
    for i in range(3):
        h = jax.nn.relu(qlinear(qvid[f"lin{i}"], h, obs, f"lin{i}"))
    return jnp.tanh(qlinear(qvid["lin3"], h, obs, "lin3"))


def generate_videos_q(q: Dict, z: Array, cfg: VidGANConfig, obs=None
                      ) -> Tuple[Array, Array]:
    """Quantized mirror of vid_dcgan.generate_videos (inference): z (B, z_in)
    -> (frames (B*T, s, s, c), per-frame latents (B*T, z_out))."""
    vobs = None if obs is None else obs.setdefault("vid", {})
    iobs = None if obs is None else obs.setdefault("img", {})
    g_out = vid_generator_q(q["vid"], z, cfg, obs=vobs)
    frames = image_generator_q(q["img"], g_out, cfg.image_gan, obs=iobs)
    return frames, g_out


# ---------------------------------------------------------------------------
# float twins of the quantized forwards (same BN folding, no quantization) —
# the numerics oracle for tests and for isolating quantization error from
# folding error.
# ---------------------------------------------------------------------------

def _affine(folded: Dict, x: Array) -> Array:
    return jnp.dot(x.astype(jnp.float32), folded["w"]) + folded["b"]


def image_generator_folded(params: Dict, state: Dict, z: Array,
                           cfg: DCGANConfig) -> Array:
    """f32 forward with BN pre-folded (no int8) — bit-comparable target for
    quantization-error measurement."""
    s16 = cfg.output_size // 16
    gf = cfg.gf_dim
    reps = params["h0_lin"]["w"].shape[1] // params["bn0"]["scale"].shape[0]
    folded0 = fold_bn(params["h0_lin"], _tile_bn(params["bn0"], reps),
                      _tile_bn(state["bn0"], reps), 1)
    h = _affine(folded0, z)
    h = jax.nn.relu(h.reshape(-1, s16, s16, gf * 8))
    for i, name in enumerate(["h1_deconv", "h2_deconv", "h3_deconv"]):
        folded = fold_bn(params[name], params[f"bn{i + 1}"],
                         state[f"bn{i + 1}"], 2)
        h = jax.nn.relu(nn.deconv2d(folded, h, dtype=jnp.float32))
    h = nn.deconv2d(params["h4_deconv"], h, dtype=jnp.float32)
    return jnp.tanh(h)


# ---------------------------------------------------------------------------
# static activation calibration
# ---------------------------------------------------------------------------

def _with_scales(q: Dict, obs: Dict, margin: float) -> Dict:
    """Copy of a quantized layer tree with static activation scales 'as'
    installed from observed per-layer max|x| (see _act's obs capture)."""
    out = {}
    for name, layer in q.items():
        if isinstance(layer, dict) and "wq" in layer:
            out[name] = dict(layer)
            if name in obs:
                m = float(obs[name])
                out[name]["as"] = jnp.float32(max(m * margin, 1e-10) / QMAX)
        else:
            out[name] = layer
    return out


def _fold_maxima(maxima: Dict, observed: Dict) -> None:
    """Merge one batch's observed max|x| tree (possibly nested one level)
    into the running host-side maxima. Skips the '__out_mean__' capture
    (bias correction's channel — folded by _fold_means) and, on a
    second-pass capture ({'max','mse'} per layer), folds max|x| and SUMS
    the MSE sweep."""
    for k, v in observed.items():
        if k == "__out_mean__":
            continue
        if isinstance(v, dict) and "mse" in v:
            slot = maxima.setdefault(k, {"max": 0.0, "mse": 0.0})
            slot["max"] = max(slot["max"], float(v["max"]))
            import numpy as _np

            slot["mse"] = slot["mse"] + _np.asarray(v["mse"], _np.float64)
        elif isinstance(v, dict):
            _fold_maxima(maxima.setdefault(k, {}), v)
        else:
            prev = maxima.get(k, 0.0)
            maxima[k] = max(prev, float(v))


def _refine_scales_mse(q: Dict, swept: Dict) -> Dict:
    """Copy of a calibrated layer tree with each static 'as' replaced by
    as * argmin-MSE fraction (see _act's second-pass capture)."""
    import numpy as _np

    out = {}
    for name, layer in q.items():
        out[name] = layer
        if isinstance(layer, dict) and "as" in layer and name in swept \
                and isinstance(swept[name], dict):
            best = MSE_FRACTIONS[int(_np.argmin(swept[name]["mse"]))]
            out[name] = dict(layer)
            out[name]["as"] = layer["as"] * jnp.float32(best)
    return out


def calibrate_vid_stack(q: Dict, z_batches, cfg: VidGANConfig,
                        margin: float = 1.05, mode: str = "max") -> Dict:
    """Static activation calibration for the full serving stack: run the
    quantized forward over calibration z batches recording each layer's
    max|x|, and bake per-layer static scales (x margin of headroom).

    The static-scale forward skips the per-layer dynamic max reduce (a full
    extra HBM pass over every activation) and its graph no longer depends on
    the data. Inputs beyond the calibrated range CLIP — standard PTQ
    behavior; margin trades clipping risk against resolution. Returns a new
    q tree; the input is unmodified.

    mode="mse" (round-5, the int8 cliff work): after the max pass, a second
    sweep measures each layer's quantization MSE at MSE_FRACTIONS of the
    max-derived scale and keeps the argmin — scales shrink below max-abs
    exactly where a heavy activation tail wastes resolution on values the
    bulk never uses (margin is ignored; the sweep subsumes it).

    The observer is jitted (the obs dict of tracers is just another pytree
    output), so each calibration batch is ONE dispatch — per-op eager
    execution through the device relay costs as much as the math."""

    @jax.jit
    def observe(qq, z):
        obs: Dict = {}
        generate_videos_q(qq, z, cfg, obs=obs)
        return obs

    def sweep(qq):
        maxima: Dict = {}
        for z in z_batches:
            _fold_maxima(maxima, jax.device_get(observe(qq, jnp.asarray(z))))
        return maxima

    m1 = margin if mode == "max" else 1.0
    maxima = sweep(q)
    out = {"vid": _with_scales(q["vid"], maxima.get("vid", {}), m1),
           "img": _with_scales(q["img"], maxima.get("img", {}), m1)}
    if mode == "mse":
        swept = sweep(out)
        out = {"vid": _refine_scales_mse(out["vid"], swept.get("vid", {})),
               "img": _refine_scales_mse(out["img"], swept.get("img", {}))}
    return out


def calibrate_image_generator(q: Dict, z_batches, cfg: DCGANConfig,
                              margin: float = 1.05, mode: str = "max"
                              ) -> Dict:
    """calibrate_vid_stack for a standalone image generator tree."""

    @jax.jit
    def observe(qq, z):
        obs: Dict = {}
        image_generator_q(qq, z, cfg, obs=obs)
        return obs

    def sweep(qq):
        maxima: Dict = {}
        for z in z_batches:
            _fold_maxima(maxima, jax.device_get(observe(qq, jnp.asarray(z))))
        return maxima

    out = _with_scales(q, sweep(q), margin if mode == "max" else 1.0)
    if mode == "mse":
        out = _refine_scales_mse(out, sweep(out))
    return out


# ---------------------------------------------------------------------------
# per-layer bias correction (round-5, the int8 cliff work)
# ---------------------------------------------------------------------------

_VID_LAYER_ORDER = (("vid", "lin0"), ("vid", "lin1"), ("vid", "lin2"),
                    ("vid", "lin3"), ("img", "h0_lin"), ("img", "h1_deconv"),
                    ("img", "h2_deconv"), ("img", "h3_deconv"),
                    ("img", "h4_deconv"))


def _mean_fold(acc: Dict, obs: Dict) -> None:
    """Accumulate '__out_mean__' captures (nested one level) into running
    per-layer sums (caller divides by the batch count)."""
    import numpy as _np

    for grp in ("vid", "img"):
        for k, v in obs.get(grp, {}).get("__out_mean__", {}).items():
            key = (grp, k)
            acc[key] = acc.get(key, 0.0) + _np.asarray(v, _np.float64)


def bias_correct_vid_stack(q: Dict, params, state, z_batches,
                           cfg: VidGANConfig) -> Dict:
    """Per-layer empirical bias correction: make each quantized layer's
    per-channel PRE-ACTIVATION output mean match the float (BN-folded)
    reference's over the calibration batches, by folding the difference
    into the layer bias — the standard PTQ counter to the systematic shift
    weight+activation quantization induces (the int8 track-rate cliff is a
    margin property, and a mean shift eats margin everywhere at once).

    Layers are corrected in forward order, recomputing the quantized
    stack's means after each correction so downstream layers see the
    corrected upstream outputs. Returns a new q tree (biases replaced);
    weights, scales, and the integer contraction path are untouched, so
    the integer-exactness tests hold by construction."""
    # all-float twin of the same folded stack = the reference means
    qf = quantize_vid_stack(
        params, state,
        float_layers=tuple(f"{g}/{n}" for g, n in _VID_LAYER_ORDER))

    @jax.jit
    def observe(qq, z):
        obs: Dict = {}
        generate_videos_q(qq, z, cfg, obs=obs)
        return obs

    def mean_pass(qq):
        acc: Dict = {}
        n = 0
        for z in z_batches:
            _mean_fold(acc, jax.device_get(observe(qq, jnp.asarray(z))))
            n += 1
        return {k: v / n for k, v in acc.items()}

    ref = mean_pass(qf)
    out = {g: {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in q[g].items()} for g in q}
    for grp, name in _VID_LAYER_ORDER:
        layer = out.get(grp, {}).get(name)
        if not (isinstance(layer, dict) and "wq" in layer):
            continue                      # float layers already match
        cur = mean_pass(out)
        delta = ref[(grp, name)] - cur[(grp, name)]
        layer["b"] = layer["b"] + jnp.asarray(delta, jnp.float32)
    return out


# ---------------------------------------------------------------------------
# fake-quant / STE finishing (round-5, the int8 cliff work's third rung)
# ---------------------------------------------------------------------------

_OUT_AXIS = {"lin0": 1, "lin1": 1, "lin2": 1, "lin3": 1, "h0_lin": 1,
             "h1_deconv": 2, "h2_deconv": 2, "h3_deconv": 2, "h4_deconv": 2}


def _ste_round(x: Array) -> Array:
    """round() with a straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _fq_weight(w: Array, out_axis: int) -> Array:
    """Fake-quantized weight: the float VJP sees identity through the
    round (STE); the forward sees exactly the int8 grid quantize_weight
    would produce from this w."""
    axes = tuple(a for a in range(w.ndim) if a != out_axis)
    scale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(w), axis=axes) / QMAX, 1e-12))
    shape = [1] * w.ndim
    shape[out_axis] = -1
    s = scale.reshape(shape)
    return jnp.clip(_ste_round(w / s), -QMAX, QMAX) * s


def _fq_act(x: Array, a_scale) -> Array:
    """Fake-quantized activation on the static calibrated scale (or the
    dynamic max when a_scale is None), STE through the round."""
    if a_scale is None:
        a_scale = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(x)) / QMAX, 1e-12))
    return jnp.clip(_ste_round(x / a_scale), -QMAX, QMAX) * a_scale


def _fq_affine(layer: Dict, x: Array, a_scale, name: str) -> Array:
    w = _fq_weight(layer["w"], _OUT_AXIS[name])
    xq = _fq_act(x, a_scale)
    if name.endswith("_deconv"):
        return nn.deconv2d({"w": w, "b": layer["b"]}, xq,
                           dtype=jnp.float32)
    return jnp.dot(xq, w) + layer["b"]


def _fq_generate_videos(wf: Dict, scales: Dict, z: Array,
                        cfg: VidGANConfig) -> Array:
    """generate_videos_q's graph with fake-quant float layers — the
    finishing forward. wf: all-float folded tree ({'vid','img'} of
    {'w','b'}); scales: same structure of static act scales (or None)."""
    b, t = z.shape[0], cfg.vid_length
    z_copied = jnp.broadcast_to(z[:, None, :], (b, t, cfg.z_input_size))
    fr = jnp.linspace(-1.0, 1.0, t, dtype=jnp.float32)
    fr = jnp.broadcast_to(fr[None, :, None], (b, t, 1))
    h = jnp.concatenate([z_copied.astype(jnp.float32), fr], axis=-1)
    h = h.reshape(b * t, cfg.z_input_size + 1)
    for i in range(3):
        h = jax.nn.relu(_fq_affine(wf["vid"][f"lin{i}"], h,
                                   scales["vid"].get(f"lin{i}"), f"lin{i}"))
    g_out = jnp.tanh(_fq_affine(wf["vid"]["lin3"], h,
                                scales["vid"].get("lin3"), "lin3"))

    icf = cfg.image_gan
    s16 = icf.output_size // 16
    h = _fq_affine(wf["img"]["h0_lin"], g_out, scales["img"].get("h0_lin"),
                   "h0_lin")
    h = jax.nn.relu(h.reshape(-1, s16, s16, icf.gf_dim * 8))
    for name in ("h1_deconv", "h2_deconv", "h3_deconv"):
        h = jax.nn.relu(_fq_affine(wf["img"][name], h,
                                   scales["img"].get(name), name))
    return jnp.tanh(_fq_affine(wf["img"]["h4_deconv"], h,
                               scales["img"].get("h4_deconv"), "h4_deconv"))


def finish_vid_stack(q: Dict, params, state, cfg: VidGANConfig,
                     key=None, steps: int = 500, batch: int = 64,
                     lr: float = 1e-5) -> Dict:
    """Short fake-quant/STE finishing of the serving stack: starting from
    the float FOLDED weights, minimize the pixel L2 between the fake-quant
    forward (the exact int8 grid, STE gradients) and the float folded
    reference over uniform z — then re-quantize. Sidesteps the
    no-int8-VJP constraint (the VJP runs through the float graph).

    Keeps q's static activation scales ('as') fixed during finishing and
    carries them into the returned tree; float (mixed-precision) layers
    in q are left untouched. lr default is deliberately SMALL (1e-5):
    on the STE landscape larger rates random-walk weights across grid
    cells and make things worse (measured: 3e-4 diverges, 1e-5 cuts the
    held-out fq-vs-float MSE ~14% in 120 steps on the unit-test model).
    Typical budget: 500 steps of Adam(1e-5) at batch 64 — seconds on a
    v5e."""
    import optax

    if key is None:
        key = jax.random.PRNGKey(23)
    # float folded reference/starting point + q's calibrated scales
    qf = quantize_vid_stack(
        params, state,
        float_layers=tuple(f"{g}/{n}" for g, n in _VID_LAYER_ORDER))
    wf = {g: {n: {"w": jnp.asarray(qf[g][n]["w"]),
                  "b": jnp.asarray(qf[g][n]["b"])}
              for n in qf[g]} for g in qf}
    scales = {g: {n: (q[g][n]["as"] if isinstance(q[g][n], dict)
                      and "as" in q[g][n] else None)
                  for n in q[g]} for g in q}

    opt = optax.adam(lr)
    opt_state = opt.init(wf)

    @jax.jit
    def step(wf, opt_state, z):
        def loss_fn(wf):
            out = _fq_generate_videos(wf, scales, z, cfg)
            ref = generate_videos_q(qf, z, cfg)[0]
            return jnp.mean((out - jax.lax.stop_gradient(ref)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(wf)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(wf, updates), opt_state, loss

    for i in range(steps):
        z = jax.random.uniform(jax.random.fold_in(key, i),
                               (batch, cfg.z_input_size),
                               minval=-1.0, maxval=1.0)
        wf, opt_state, loss = step(wf, opt_state, z)

    # re-quantize the finished weights; keep q's float layers and scales
    out = {g: {n: (dict(l) if isinstance(l, dict) else l)
               for n, l in q[g].items()} for g in q}
    for grp, name in _VID_LAYER_ORDER:
        layer = out.get(grp, {}).get(name)
        if not (isinstance(layer, dict) and "wq" in layer):
            continue
        fresh = quantize_weight(wf[grp][name], _OUT_AXIS[name])
        layer.update(fresh)
        if scales[grp].get(name) is not None:
            layer["as"] = scales[grp][name]
    return out


# ---------------------------------------------------------------------------
# deployment artifact: the int8 serving tree as a standalone checkpoint
# (4x smaller than the float train state; serving hosts never load the
# float params or optimizer slots)
# ---------------------------------------------------------------------------

def save_artifact(out_dir: str, q: Dict, cfg: VidGANConfig) -> str:
    """Write a quantized serving artifact: the q tree (core/checkpoint npz
    format, step 0) + params.json carrying the model config."""
    import os

    from gifgan_tpu.core import checkpoint as ckpt
    from gifgan_tpu.core.config import save_config

    path = ckpt.save(out_dir, 0, q)
    save_config({"model": cfg}, os.path.join(out_dir, "params.json"))
    return path


def load_artifact(out_dir: str) -> Tuple[Dict, VidGANConfig]:
    """(q tree, cfg) from a save_artifact dir. The q tree is pure dicts, so
    the structure rebuilds from the flat checkpoint keys alone — no float
    model needed."""
    import os

    from gifgan_tpu.core import checkpoint as ckpt
    from gifgan_tpu.core.config import load_config

    q: Dict = {}
    for key, arr in ckpt.load_flat(out_dir).items():
        parts = key.split("/")
        d = q
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(arr)
    cfg = load_config(os.path.join(out_dir, "params.json"))["model"]
    return q, cfg
