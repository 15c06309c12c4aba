"""Convert reference PyTorch checkpoints to this framework's param trees.

The reference saves ``{"iteration", "model_state_dict", "optimizer_state_dict"}``
(/root/reference/train.py:23-24) where the model state dict uses module paths
like ``fpyramid.conv1.0.weight`` (conv inside an nn.Sequential with LeakyReLU),
``pwc_model.conv6_0.0.weight``, ``pwc_model.predict_flow6.weight`` (bare conv)
and ``pwc_model.dc_conv7.weight``.  An optional ``module.`` DataParallel
prefix may be present (train.py:47-75).

Conversion: OIHW -> HWIO weight transpose, bias passthrough, name mapping to
{"fpyramid": {"convN": {"w","b"}}, "pwc": {...}}.  Works from a loaded state
dict (any mapping of name -> numpy array) so torch is only needed by the
caller that reads the .pth file.
"""

from __future__ import annotations

import re

import numpy as np


def _to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def strip_prefixes(state_dict):
    """Drop DataParallel 'module.' / warm-start wrapper prefixes."""
    out = {}
    for k, v in state_dict.items():
        k = re.sub(r"^(module\.)+", "", k)
        k = re.sub(r"^(model_flow\.|model_pose\.model_flow\.)", "", k)
        out[k] = v
    return out


def torch_state_dict_to_params(state_dict):
    """Map a reference Model_flow state dict to this framework's param tree."""
    sd = strip_prefixes(state_dict)
    params = {"fpyramid": {}, "pwc": {}}
    unmatched = []
    for key, val in sd.items():
        m = re.match(
            r"^(fpyramid|pwc_model)\.([A-Za-z0-9_]+?)(?:\.0)?\.(weight|bias)$", key
        )
        if not m:
            unmatched.append(key)
            continue
        group = "fpyramid" if m.group(1) == "fpyramid" else "pwc"
        name, kind = m.group(2), m.group(3)
        arr = _to_numpy(val)
        leaf = params[group].setdefault(name, {})
        if kind == "weight":
            leaf["w"] = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        else:
            leaf["b"] = arr
    if unmatched:
        raise ValueError(f"unrecognized checkpoint keys: {unmatched[:8]}")
    return params


def load_torch_checkpoint(path):
    """Load a reference .pth and return (iteration, params)."""
    import torch  # local import: torch is only needed for .pth ingestion

    data = torch.load(path, map_location="cpu", weights_only=False)
    state = data.get("model_state_dict", data)
    iteration = int(data.get("iteration", 0)) if isinstance(data, dict) else 0
    return iteration, torch_state_dict_to_params(state)


def params_to_torch_state_dict(params):
    """Inverse mapping (HWIO -> OIHW), for exporting back to the reference."""
    out = {}
    for group, prefix in (("fpyramid", "fpyramid"), ("pwc", "pwc_model")):
        for name, leaf in params[group].items():
            seq = not name.startswith(("predict_flow", "dc_conv7"))
            base = f"{prefix}.{name}.0" if seq else f"{prefix}.{name}"
            out[f"{base}.weight"] = np.transpose(np.asarray(leaf["w"]), (3, 2, 0, 1))
            out[f"{base}.bias"] = np.asarray(leaf["b"])
    return out


def export_torch_checkpoint(path, params, iteration=0):
    """Write a reference-format ``.pth`` from this framework's param tree.

    Produces the exact dict the reference's train loop saves
    (/root/reference/train.py:23-24: ``{"iteration", "model_state_dict"}``)
    so a checkpoint trained here loads into the reference's ``Model_flow``
    with ``strict=True`` — the reverse of :func:`load_torch_checkpoint`.
    """
    import torch  # local import: torch only needed for .pth interop

    state = {
        # np.array copies: jax arrays expose read-only buffers torch warns on
        k: torch.from_numpy(np.array(v, dtype=np.float32))
        for k, v in params_to_torch_state_dict(params).items()
    }
    torch.save({"iteration": int(iteration), "model_state_dict": state}, path)
