"""Convert a reference AlphaZero ``.pkl`` snapshot (torch state_dict,
learner/train.py save_model) into minizero_tpu flax variables.

The two network definitions are architecturally identical by construction
(models/alphazero.py mirrors network/py/alphazero_network.py), so this is a
pure layout conversion:

- Conv:  torch [out, in, kh, kw]  -> flax [kh, kw, in, out]
- Dense: torch [out, in] over a CHW-flattened input -> flax [in(HWC), out]
  (the reference flattens NCHW ``view(-1, C*H*W)``; our heads flatten NHWC,
  so the fc kernel is re-blocked C,H,W -> H,W,C before transposing)
- BatchNorm: weight/bias -> scale/bias; running_mean/var -> batch_stats

``verify_forward`` checks the converted net against the reference's own
TorchScript module output on random inputs — run it after every conversion
(cross_fight.py does).
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _conv(sd, name):
    w = sd[f"{name}.weight"].numpy()
    return {"kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": sd[f"{name}.bias"].numpy()}


def _bn(sd, name):
    return ({"scale": sd[f"{name}.weight"].numpy(),
             "bias": sd[f"{name}.bias"].numpy()},
            {"mean": sd[f"{name}.running_mean"].numpy(),
             "var": sd[f"{name}.running_var"].numpy()})


def _dense(sd, name, c, h, w):
    """torch fc over CHW-flattened input -> flax kernel over HWC-flattened."""
    wt = sd[f"{name}.weight"].numpy()  # [out, C*H*W]
    out = wt.shape[0]
    wt = wt.reshape(out, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out)
    return {"kernel": wt, "bias": sd[f"{name}.bias"].numpy()}


def _dense_flat(sd, name):
    """fc whose input is already a flat vector (value fc2 / hidden fc)."""
    wt = sd[f"{name}.weight"].numpy()
    return {"kernel": wt.T, "bias": sd[f"{name}.bias"].numpy()}


def convert_alphazero_state_dict(sd, num_blocks, hidden_h, hidden_w):
    """torch state_dict -> {'params': ..., 'batch_stats': ...} (numpy)."""
    import math

    params, stats = {}, {}
    params["Conv_0"] = _conv(sd, "conv")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "bn")
    for i in range(num_blocks):
        blk, bst = {}, {}
        blk["Conv_0"] = _conv(sd, f"residual_blocks.{i}.conv1")
        blk["BatchNorm_0"], bst["BatchNorm_0"] = _bn(sd, f"residual_blocks.{i}.bn1")
        blk["Conv_1"] = _conv(sd, f"residual_blocks.{i}.conv2")
        blk["BatchNorm_1"], bst["BatchNorm_1"] = _bn(sd, f"residual_blocks.{i}.bn2")
        params[f"ResidualBlock_{i}"] = blk
        stats[f"ResidualBlock_{i}"] = bst

    action_size = sd["policy.fc.weight"].numpy().shape[0]
    pc = math.ceil(action_size / (hidden_h * hidden_w))
    ph = {"Conv_0": _conv(sd, "policy.conv")}
    ph["BatchNorm_0"], pst = _bn(sd, "policy.bn")
    ph["Dense_0"] = _dense(sd, "policy.fc", pc, hidden_h, hidden_w)
    params["PolicyHead_0"] = ph
    stats["PolicyHead_0"] = {"BatchNorm_0": pst}

    vh = {"Conv_0": _conv(sd, "value.conv")}
    vh["BatchNorm_0"], vst = _bn(sd, "value.bn")
    vh["Dense_0"] = _dense(sd, "value.fc1", 1, hidden_h, hidden_w)
    vh["Dense_1"] = _dense_flat(sd, "value.fc2")
    params["ValueHead_0"] = vh
    stats["ValueHead_0"] = {"BatchNorm_0": vst}
    return {"params": params, "batch_stats": stats}


def load_ref_pkl(pkl_path, num_blocks, hidden_h, hidden_w):
    import torch

    snap = torch.load(pkl_path, map_location="cpu", weights_only=False)
    sd = snap["network"] if "network" in snap else snap
    return convert_alphazero_state_dict(sd, num_blocks, hidden_h, hidden_w), snap.get("training_step")


def verify_forward(pt_path, variables, net, env_spec, atol=2e-4):
    """Converted-flax vs reference-TorchScript forward parity on random input."""
    import jax
    import torch

    ts = torch.jit.load(pt_path, map_location="cpu")
    ts.eval()
    rng = np.random.RandomState(0)
    x = rng.rand(8, env_spec.input_height, env_spec.input_width,
                 env_spec.num_input_channels).astype(np.float32)
    with torch.no_grad():
        ref = ts(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = net.apply(jax.tree_util.tree_map(np.asarray, variables), x, train=False)
    dp = float(np.abs(np.asarray(ours["policy_logit"]) - ref["policy_logit"].numpy()).max())
    dv = float(np.abs(np.asarray(ours["value"]).reshape(-1) - ref["value"].numpy().reshape(-1)).max())
    assert dp < atol and dv < atol, f"forward mismatch: policy {dp}, value {dv}"
    return dp, dv
