"""Convert reference PyTorch checkpoints (model.pth state_dicts) into the
t2onet_tpu Actor param/batch_stats pytrees.

Checkpoint-parity plumbing (SURVEY.md §7 hard parts): the reference names
follow models/actor.py submodules — vis_encoder.* (actor_resnet),
lang_encoder.* (nn.LSTM), decoder.* (nn.LSTM + linears + attention),
executor.{op}_op.fc1/fc2 (per-op parameter heads), bn1 (actor-level
BatchNorm1d). Weight-layout conversions:

- torch Linear weight (out, in)     -> flax Dense kernel (in, out): T
- torch Conv2d weight (O, I, kH, kW)-> flax Conv kernel (kH, kW, I, O)
- torch LSTM weight_ih_l{k} (4H, in)-> w_ih (in, 4H): T; the two torch
  biases sum into one effective bias (identical math)
- per-op heads stack into (N_OPS, ...) in executor registration order
  with fc2 padded to 24 outputs
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# executor registration order (reference executors/executor.py:30)
_EXEC_OP_ATTRS = [
    "brightness_op", "contrast_op", "saturation_op", "color_op",
    "inpaint_op", "tone_op", "sharpness_op", "white_op",
]
_PARAM_COUNTS = [1, 1, 1, 24, 1, 8, 1, 1]
MAX_PARAM = 24


def _t(x):
    return np.ascontiguousarray(np.asarray(x, np.float32).T)


def _conv(x):
    # OIHW -> HWIO
    return np.ascontiguousarray(np.asarray(x, np.float32).transpose(2, 3, 1, 0))


def convert_state_dict(sd: Dict, n_layers: int = 2,
                       blocks_per_stage: Tuple[int, ...] = (2, 2, 2, 2)
                       ) -> Tuple[Dict, Dict]:
    """torch state_dict (tensors or numpy) -> (params, batch_stats)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v, np.float32) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    # ---- language encoder -------------------------------------------------
    enc = {"embedding": sd["lang_encoder.embedding.weight"]}
    for k in range(n_layers):
        for suffix, tag in (("", "fwd"), ("_reverse", "bwd")):
            enc[f"lstm_l{k}_{tag}"] = {
                "w_ih": _t(sd[f"lang_encoder.rnn.weight_ih_l{k}{suffix}"]),
                "w_hh": _t(sd[f"lang_encoder.rnn.weight_hh_l{k}{suffix}"]),
                "b": (sd[f"lang_encoder.rnn.bias_ih_l{k}{suffix}"]
                      + sd[f"lang_encoder.rnn.bias_hh_l{k}{suffix}"]),
            }
    params["lang_encoder"] = enc

    # ---- decoder ----------------------------------------------------------
    dec = {"embedding": sd["decoder.embedding.weight"]}
    for k in range(n_layers):
        dec[f"lstm_l{k}"] = {
            "w_ih": _t(sd[f"decoder.rnn.weight_ih_l{k}"]),
            "w_hh": _t(sd[f"decoder.rnn.weight_hh_l{k}"]),
            "b": (sd[f"decoder.rnn.bias_ih_l{k}"]
                  + sd[f"decoder.rnn.bias_hh_l{k}"]),
        }
    dec["vis_linear"] = {"kernel": _t(sd["decoder.vis_linear.weight"]),
                         "bias": sd["decoder.vis_linear.bias"]}
    dec["out_linear"] = {"kernel": _t(sd["decoder.out_linear.weight"]),
                         "bias": sd["decoder.out_linear.bias"]}
    if "decoder.attention.linear_out.weight" in sd:
        dec["attn_out"] = {
            "kernel": _t(sd["decoder.attention.linear_out.weight"]),
            "bias": sd["decoder.attention.linear_out.bias"]}
    params["decoder"] = dec

    # ---- vision encoder (ResNet) -------------------------------------------
    vis_p = {"Conv_0": {"kernel": _conv(sd["vis_encoder.conv1.weight"])},
             "BatchNorm_0": {"scale": sd["vis_encoder.bn1.weight"],
                             "bias": sd["vis_encoder.bn1.bias"]},
             "Dense_0": {"kernel": _t(sd["vis_encoder.fc.weight"]),
                         "bias": sd["vis_encoder.fc.bias"]}}
    vis_s = {"BatchNorm_0": {"mean": sd["vis_encoder.bn1.running_mean"],
                             "var": sd["vis_encoder.bn1.running_var"]}}
    if "vis_encoder.layer1.0.conv3.weight" in sd:
        raise NotImplementedError(
            "Bottleneck (depth 50/101/152) vis-encoder conversion is not "
            "supported — the reference ships BasicBlock checkpoints only; "
            "train Bottleneck depths from scratch")
    block = 0
    for stage, n_blocks in enumerate(blocks_per_stage, start=1):
        for i in range(n_blocks):
            src = f"vis_encoder.layer{stage}.{i}"
            bp = {
                "Conv_0": {"kernel": _conv(sd[f"{src}.conv1.weight"])},
                "BatchNorm_0": {"scale": sd[f"{src}.bn1.weight"],
                                "bias": sd[f"{src}.bn1.bias"]},
                "Conv_1": {"kernel": _conv(sd[f"{src}.conv2.weight"])},
                "BatchNorm_1": {"scale": sd[f"{src}.bn2.weight"],
                                "bias": sd[f"{src}.bn2.bias"]},
            }
            bs = {
                "BatchNorm_0": {"mean": sd[f"{src}.bn1.running_mean"],
                                "var": sd[f"{src}.bn1.running_var"]},
                "BatchNorm_1": {"mean": sd[f"{src}.bn2.running_mean"],
                                "var": sd[f"{src}.bn2.running_var"]},
            }
            if f"{src}.shortcut.0.weight" in sd:
                bp["Conv_2"] = {"kernel": _conv(sd[f"{src}.shortcut.0.weight"])}
                bp["BatchNorm_2"] = {"scale": sd[f"{src}.shortcut.1.weight"],
                                     "bias": sd[f"{src}.shortcut.1.bias"]}
                bs["BatchNorm_2"] = {
                    "mean": sd[f"{src}.shortcut.1.running_mean"],
                    "var": sd[f"{src}.shortcut.1.running_var"]}
            vis_p[f"BasicBlock_{block}"] = bp
            vis_s[f"BasicBlock_{block}"] = bs
            block += 1
    params["vis_encoder"] = vis_p
    stats["vis_encoder"] = vis_s

    # ---- actor-level BN1d ---------------------------------------------------
    params["bn1"] = {"scale": sd["bn1.weight"], "bias": sd["bn1.bias"]}
    stats["bn1"] = {"mean": sd["bn1.running_mean"],
                    "var": sd["bn1.running_var"]}

    # ---- per-op parameter heads ---------------------------------------------
    ctx = sd["executor.brightness_op.fc1.weight"].shape[1]
    fc_dim = sd["executor.brightness_op.fc1.weight"].shape[0]
    w1 = np.zeros((len(_EXEC_OP_ATTRS), ctx, fc_dim), np.float32)
    b1 = np.zeros((len(_EXEC_OP_ATTRS), fc_dim), np.float32)
    w2 = np.zeros((len(_EXEC_OP_ATTRS), fc_dim, MAX_PARAM), np.float32)
    b2 = np.zeros((len(_EXEC_OP_ATTRS), MAX_PARAM), np.float32)
    for i, attr in enumerate(_EXEC_OP_ATTRS):
        w1[i] = _t(sd[f"executor.{attr}.fc1.weight"])
        b1[i] = sd[f"executor.{attr}.fc1.bias"]
        k = sd[f"executor.{attr}.fc2.weight"].shape[0]
        if k != _PARAM_COUNTS[i]:
            raise ValueError(
                f"executor.{attr}.fc2 has {k} outputs, expected "
                f"{_PARAM_COUNTS[i]} (reference executor registration)")
        w2[i, :, :k] = _t(sd[f"executor.{attr}.fc2.weight"])
        b2[i, :k] = sd[f"executor.{attr}.fc2.bias"]
    params["heads"] = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}

    return params, stats


def convert_gan_state_dict(sd: Dict, num_D: int = 2, n_layers_D: int = 3,
                           use_sigmoid: bool = False, n_layers: int = 2):
    """Convert a reference Pix2PixHDModel checkpoint (the whole-model
    state_dict train_seq2seqGAN.py:129 saves: actor.* + netD.* +
    cond_encoder.*) into (actor (params, batch_stats),
    disc bundle (params, batch_stats)) for cli.train_gan.DiscBundle.

    Key layout (reference networks.py:312-323, 387-401): each scale's
    NLayerDiscriminator is flattened into `netD.scale{i}_layer{j}` where
    layer j is a Sequential — index 0 the Conv2d, index 1 the BatchNorm2d
    when present (layers 1..n_all-2; the first and final layers have
    none). Scale index i is used at the same resolution in both
    frameworks (largest input -> scale{num_D-1}), so names map directly.
    `cond_encoder.fc` is Linear + BatchNorm1d (networks.py:294-297).
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v, np.float32) for k, v in sd.items()}
    actor_sd = {k[len("actor."):]: v for k, v in sd.items()
                if k.startswith("actor.")}
    actor = (convert_state_dict(actor_sd, n_layers=n_layers)
             if actor_sd else None)

    # parameter-bearing layers: use_sigmoid only appends a Sequential
    # holding a bare Sigmoid (networks.py:398-399) — no weights to convert
    del use_sigmoid
    n_all = n_layers_D + 3
    disc_p: Dict = {}
    disc_s: Dict = {}
    for i in range(num_D):
        sp: Dict = {}
        ss: Dict = {}
        conv_i = 0
        bn_i = 0
        for j in range(n_all):
            pre = f"netD.scale{i}_layer{j}"
            if f"{pre}.0.weight" not in sd:
                raise KeyError(f"missing {pre}.0.weight — wrong "
                               f"num_D/n_layers_D for this checkpoint?")
            sp[f"Conv_{conv_i}"] = {"kernel": _conv(sd[f"{pre}.0.weight"]),
                                    "bias": sd[f"{pre}.0.bias"]}
            conv_i += 1
            if f"{pre}.1.weight" in sd:
                sp[f"BatchNorm_{bn_i}"] = {"scale": sd[f"{pre}.1.weight"],
                                           "bias": sd[f"{pre}.1.bias"]}
                ss[f"BatchNorm_{bn_i}"] = {
                    "mean": sd[f"{pre}.1.running_mean"],
                    "var": sd[f"{pre}.1.running_var"]}
                bn_i += 1
        disc_p[f"scale{i}"] = sp
        disc_s[f"scale{i}"] = ss

    cond_p = {"Dense_0": {"kernel": _t(sd["cond_encoder.fc.0.weight"]),
                          "bias": sd["cond_encoder.fc.0.bias"]},
              "BatchNorm_0": {"scale": sd["cond_encoder.fc.1.weight"],
                              "bias": sd["cond_encoder.fc.1.bias"]}}
    cond_s = {"BatchNorm_0": {"mean": sd["cond_encoder.fc.1.running_mean"],
                              "var": sd["cond_encoder.fc.1.running_var"]}}
    bundle = ({"disc": disc_p, "cond": cond_p},
              {"disc": disc_s, "cond": cond_s})
    return actor, bundle


def convert_pix2pixhd(sd: Dict, ref_params: Dict) -> Dict:
    """Convert a torch pix2pixHD generator state_dict (GlobalGenerator /
    LocalEnhancer / Encoder, reference networks.py:130-291) into the flax
    params of models.pix2pixhd.

    The torch modules are nn.Sequentials, so keys are positional:
    `model.{idx}.weight` (convs / conv-transposes),
    `model.{idx}.conv_block.{1,5}.weight` (ResnetBlock convs), plus the
    LocalEnhancer branches `model{n}_1.{idx}.*` / `model{n}_2.{idx}.*`.
    Instance norm is affine=False — no norm entries exist. Our flax
    layers are named for exactly these indices (m{idx} / c{idx}), so the
    rename is mechanical. ONE weight permutation covers both layer
    kinds: torch Conv2d stores (O, I, kH, kW) and flax Conv wants
    (kH, kW, I, O); torch ConvTranspose2d stores (I, O, kH, kW) and
    flax ConvTranspose(transpose_kernel=True) wants (kH, kW, O, I) —
    the same transpose(2, 3, 1, 0) in both cases. `ref_params` (a
    module.init params tree) supplies the expected shapes as a
    conversion-correctness check.
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v, np.float32) for k, v in sd.items()}
    import flax

    flat_ref = flax.traverse_util.flatten_dict(ref_params)
    ref_prefixes = {p[:2] for p in flat_ref}
    out: Dict[Tuple, np.ndarray] = {}
    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]                  # weight | bias
        if leaf not in ("weight", "bias"):
            raise KeyError(f"unexpected pix2pixHD key {key!r}")
        if "conv_block" in parts:         # {seq}.{idx}.conv_block.{j}
            seq, idx, _, j = parts[:-1]
            if seq == "model":
                path = (f"m{idx}", f"c{j}")
            elif "_" in seq:              # model{n}_2 enhancer branch
                path = (f"{seq}_m{idx}", f"c{j}")
            else:
                raise KeyError(f"unexpected pix2pixHD key {key!r}")
        else:
            seq, idx = parts[:-1]
            if seq == "model":
                path = (f"m{idx}",)
            elif "_" in seq:              # model{n}_1 / model{n}_2 branch
                path = (f"{seq}_m{idx}",)
            else:
                raise KeyError(f"unexpected pix2pixHD key {key!r}")
        # LocalEnhancer's trimmed global lives under scope "model"
        if ("model",) + path[:1] in ref_prefixes:
            path = ("model",) + path
        if leaf == "bias":
            out[path + ("bias",)] = w
            continue
        want = flat_ref[path + ("kernel",)].shape
        out[path + ("kernel",)] = _conv(w)
        if out[path + ("kernel",)].shape != tuple(want):
            raise ValueError(f"{key}: torch shape {w.shape} converts to "
                             f"{out[path + ('kernel',)].shape}, expected "
                             f"{want}")
    missing = set(flat_ref) - set(out)
    if missing:
        raise KeyError(f"state_dict missing params for {sorted(missing)[:5]}")
    return flax.traverse_util.unflatten_dict(out)


def load_torch_checkpoint(path: str, n_layers: int = 2):
    """Load model.pth (torch cpu) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, n_layers=n_layers)


def load_torch_gan_checkpoint(path: str, num_D: int = 2, n_layers_D: int = 3,
                              n_layers: int = 2):
    """Load a reference seq2seqGAN model.pth and convert actor + D."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_gan_state_dict(sd, num_D=num_D, n_layers_D=n_layers_D,
                                  n_layers=n_layers)
