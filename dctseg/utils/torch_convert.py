"""PyTorch -> dctseg checkpoint conversion.

Converts a reference ClsWiseFormer ``state_dict`` (as saved by
``train.py:249-254``: ``{'epoch', 'state_dict', 'optim_dict'}``, possibly
with DDP's ``module.`` prefixes) into our flax parameter tree, so users of
the reference can carry their trained weights over.  Covers all 222 entries;
positional-encoding buffers (``*_position_encoding.pe``, ``fusion_label_pos.
pe``) are constants in our 'fixed' PE and are skipped.

Layout conversions:
  Conv3d           (O, I, k, k, k)  -> (k, k, k, I, O)
  ConvTranspose3d  (I, O, k, k, k)  -> (k, k, k, I, O)
  Linear           (O, I)           -> (I, O)
  LayerNorm weight/bias             -> scale/bias
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv(w):
    # flax ConvTranspose cross-correlates the zero-upsampled input, so the
    # torch kernel must be spatially flipped (verified numerically in
    # tests/test_convert.py)
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def _dense(w):
    return np.transpose(w, (1, 0))


_UNET_BLOCKS = {
    "InitConv.conv": "init_conv",
    "EnBlock1": "en1_a", "EnBlock1_1": "en1_b",
    "EnBlock2_1": "en2_a", "EnBlock2_2": "en2_b",
    "EnBlock3_1": "en3_a", "EnBlock3_2": "en3_b",
    "EnBlock4_1": "en4_a", "EnBlock4_2": "en4_b",
    "EnDown1.conv": "down1", "EnDown2.conv": "down2",
    "EnDown3.conv": "down3", "EnDown_4.conv": "widen",
}

_DECODER_BLOCKS = {
    "down_channel": "down_channel", "endconv": "endconv",
    "Enblock8_1": "enblock8_1", "Enblock8_2": "enblock8_2",
    "DeUp4": "deup4", "DeUp3": "deup3", "DeUp2": "deup2",
    "DeBlock4": "deblock4", "DeBlock4_1": "deblock4_1",
    "DeBlock3": "deblock3", "DeBlock3_1": "deblock3_1",
    "DeBlock2": "deblock2", "DeBlock2_1": "deblock2_1",
}


def _map_name(name: str):
    """torch state_dict key -> (flax path tuple, transform) or None to skip."""
    if name.endswith("position_encoding.pe") or name == "fusion_label_pos.pe":
        return None
    leaf = "kernel" if name.endswith("weight") else "bias"

    # class tokens
    m = re.fullmatch(r"([es]_token_0[124])", name)
    if m:
        return (m.group(1),), lambda w: w

    # transformers (incl. fusion)
    m = re.fullmatch(
        r"(transformer_0[124]|fusion_transformer_1_2_4)\."
        r"(cross_attention_list|cross_ffn_list)\.0\.fn\.(.+)\.(weight|bias)",
        name)
    if m:
        mod = ("fusion_transformer" if m.group(1).startswith("fusion")
               else m.group(1))
        block = "cross" if m.group(2) == "cross_attention_list" else "ffn"
        inner = m.group(3)
        is_w = m.group(4) == "weight"
        if inner == "norm":
            return (mod, block, "norm", "scale" if is_w else "bias"), \
                (lambda w: w)
        if inner == "norm2":
            return (mod, block, "norm2", "scale" if is_w else "bias"), \
                (lambda w: w)
        if inner == "fn.qkv":
            return (mod, block, "attn", "qkv", "Dense_0", leaf), _dense
        if inner == "fn.out_proj":
            return (mod, block, "attn", "out_proj", "Dense_0", leaf), \
                (_dense if is_w else (lambda w: w))
        if inner == "fn.net.0":
            return (mod, block, "ffn", "fc1", "Dense_0", leaf), \
                (_dense if is_w else (lambda w: w))
        if inner == "fn.net.3":
            return (mod, block, "ffn", "fc2", "Dense_0", leaf), \
                (_dense if is_w else (lambda w: w))
        raise KeyError(f"unmapped transformer entry {name}")

    # UNet encoder
    m = re.fullmatch(r"Unet_list\.(.+)\.(weight|bias)", name)
    if m:
        inner = m.group(1)
        is_w = m.group(2) == "weight"
        tr = _conv if is_w else (lambda w: w)
        if inner in _UNET_BLOCKS:                     # InitConv / EnDown
            return ("unet", _UNET_BLOCKS[inner], "Conv_0", leaf), tr
        blk, conv = inner.rsplit(".", 1)              # EnBlockX.convY
        return ("unet", _UNET_BLOCKS[blk], conv, "Conv_0", leaf), tr

    # decoder
    m = re.fullmatch(r"decoder\.(.+?)(?:\.(conv\d))?\.(weight|bias)", name)
    if m:
        blk = _DECODER_BLOCKS[m.group(1)]
        conv = m.group(2)
        is_w = m.group(3) == "weight"
        if conv == "conv2" and blk.startswith("deup"):
            # DeUp_Cat.conv2 is the transpose conv (cls_wise_former.py:720)
            return ("decoder", blk, "up", "ConvTranspose_0", leaf), \
                (_deconv if is_w else (lambda w: w))
        tr = _conv if is_w else (lambda w: w)
        if conv is None:
            return ("decoder", blk, "Conv_0", leaf), tr
        return ("decoder", blk, conv, "Conv_0", leaf), tr

    # supervision heads
    m = re.fullmatch(
        r"(mid_)?(edge_)?supervise_label\.(edge_)?"
        r"(supervise_label|down_label|supervise|down)_(\d)\.(weight|bias)",
        name)
    if m:
        head = f"{m.group(1) or ''}{m.group(2) or ''}supervise_label"
        kind = "supervise" if "supervise" in m.group(4) else "down"
        region = f"0{m.group(5)}"
        tr = _conv if m.group(6) == "weight" else (lambda w: w)
        return (head, f"{kind}_{region}", "Conv_0", leaf), tr

    # standalone convs
    m = re.fullmatch(
        r"(conv_semantic_(\d)|conv_mid_fea_(\d)|conv_64_to_32|sum_fusion)"
        r"\.(weight|bias)", name)
    if m:
        base = m.group(1)
        if m.group(2):
            base = f"conv_semantic_0{m.group(2)}"
        elif m.group(3):
            base = f"conv_mid_fea_0{m.group(3)}"
        tr = _conv if m.group(4) == "weight" else (lambda w: w)
        return (base, "Conv_0", leaf), tr

    raise KeyError(f"unmapped state_dict entry: {name}")


def check_fix_index_identity(path: str) -> bool:
    """True iff a reference ``fix_index.txt`` is the identity scatter map.

    The reference scatters top-k tokens back through ``dict_index[str(id)]``
    (a 512-wide index row per token, cls_wise_former.py:275-278, 463-479).
    dctseg's functional scatter (ops/routing.py) assumes that map is the
    identity (row == [id]*512) — true for every grid-patchify layout, but a
    converted checkpoint trained with a non-identity table would silently
    diverge, so verify when the real asset is available (ADVICE r1)."""
    import ast
    with open(path) as f:
        table = ast.literal_eval(f.readline())
    return all(all(int(v) == int(k) for v in row)
               for k, row in table.items())


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       fix_index_path: str = "") -> dict:
    """torch state_dict (numpy values) -> flax 'params' subtree (nested
    dict).  DDP 'module.' prefixes are stripped.

    ``fix_index_path``: the reference checkpoint's fix_index.txt, when
    available — warns if it is not the identity scatter map dctseg assumes
    (see check_fix_index_identity)."""
    if fix_index_path:
        import warnings
        if not check_fix_index_identity(fix_index_path):
            warnings.warn(
                "fix_index.txt is NOT the identity map; converted weights "
                "will not reproduce the reference's scatter-back dataflow "
                f"({fix_index_path})", stacklevel=2)
    out: dict = {}
    for name, value in state_dict.items():
        if name.startswith("module."):
            name = name[len("module."):]
        mapped = _map_name(name)
        if mapped is None:
            continue
        path, tr = mapped
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(tr(np.asarray(value)), np.float32)
    return out


def _inv_conv(w):
    return np.transpose(w, (4, 3, 0, 1, 2))


def _inv_deconv(w):
    return np.transpose(w, (3, 4, 0, 1, 2))[:, :, ::-1, ::-1, ::-1].copy()


def _pe_buffer(max_len: int = 1024, dim: int = 512) -> np.ndarray:
    """The reference's ExtendFixedPositionalEncoding buffer
    (PositionalEncoding.py:5-19): (max_len, 1, dim) sinusoid table."""
    from dctseg.models.positional import sinusoid_table
    return sinusoid_table(max_len, dim)[:, None, :]


def to_torch_state_dict(params: dict,
                        reference_names=None) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax params tree -> reference-format state_dict
    (numpy values), including the constant positional-encoding buffers the
    reference registers.  Round-trips exactly with convert_state_dict."""
    tree = params.get("params", params)
    names = reference_names or reference_state_dict_names()
    out: Dict[str, np.ndarray] = {}
    for name in names:
        if name.endswith("position_encoding.pe") or \
                name == "fusion_label_pos.pe":
            out[name] = _pe_buffer()
            continue
        path, tr = _map_name(name)
        node = tree
        for p in path:
            node = node[p]
        w = np.asarray(node)
        if tr is _dense:
            w = _dense(w)
        elif tr is _conv:
            w = _inv_conv(w)
        elif tr is _deconv:
            w = _inv_deconv(w)
        out[name] = np.ascontiguousarray(w, np.float32)
    return out


def reference_state_dict_names():
    """All 222 reference state_dict keys plus the 4 PE buffers, synthesized
    from the architecture definition (cls_wise_former.py)."""
    names = []
    for r in ("01", "02", "04"):
        names += [f"e_token_{r}", f"s_token_{r}",
                  f"label_{r}_position_encoding.pe"]
    names.append("fusion_label_pos.pe")
    for t in ("transformer_01", "transformer_02", "transformer_04",
              "fusion_transformer_1_2_4"):
        a = f"{t}.cross_attention_list.0.fn"
        names += [f"{a}.norm.weight", f"{a}.norm.bias",
                  f"{a}.norm2.weight", f"{a}.norm2.bias",
                  f"{a}.fn.qkv.weight", f"{a}.fn.out_proj.weight",
                  f"{a}.fn.out_proj.bias"]
        f_ = f"{t}.cross_ffn_list.0.fn"
        names += [f"{f_}.norm.weight", f"{f_}.norm.bias",
                  f"{f_}.fn.net.0.weight", f"{f_}.fn.net.0.bias",
                  f"{f_}.fn.net.3.weight", f"{f_}.fn.net.3.bias"]

    def conv(n):
        names.extend([f"{n}.weight", f"{n}.bias"])

    conv("Unet_list.InitConv.conv")
    for blk in ("EnBlock1", "EnBlock1_1", "EnBlock2_1", "EnBlock2_2",
                "EnBlock3_1", "EnBlock3_2", "EnBlock4_1", "EnBlock4_2"):
        conv(f"Unet_list.{blk}.conv1")
        conv(f"Unet_list.{blk}.conv2")
    for d in ("EnDown1", "EnDown2", "EnDown3", "EnDown_4"):
        conv(f"Unet_list.{d}.conv")
    for i in (1, 2, 4):
        conv(f"conv_semantic_{i}")
        conv(f"conv_mid_fea_{i}")
    conv("conv_64_to_32")
    conv("sum_fusion")
    conv("decoder.down_channel")
    for blk in ("Enblock8_1", "Enblock8_2", "DeBlock4", "DeBlock4_1",
                "DeBlock3", "DeBlock3_1", "DeBlock2", "DeBlock2_1"):
        conv(f"decoder.{blk}.conv1")
        conv(f"decoder.{blk}.conv2")
    for up in ("DeUp4", "DeUp3", "DeUp2"):
        for c in ("conv1", "conv2", "conv3"):
            conv(f"decoder.{up}.{c}")
    conv("decoder.endconv")
    for head in ("supervise_label", "mid_supervise_label"):
        for i in (1, 2, 4):
            conv(f"{head}.supervise_label_{i}")
            conv(f"{head}.down_label_{i}")
    for head in ("edge_supervise_label", "mid_edge_supervise_label"):
        for i in (1, 2, 4):
            conv(f"{head}.edge_supervise_label_{i}")
            conv(f"{head}.edge_down_label_{i}")
    return names


def save_torch_checkpoint(params: dict, path: str, epoch: int = 0) -> None:
    """Export a dctseg params tree as a reference-format .pth."""
    import torch
    sd = {k: torch.from_numpy(v)
          for k, v in to_torch_state_dict(params).items()}
    torch.save({"epoch": epoch, "state_dict": sd, "optim_dict": {}}, path)


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint into a flax params tree
    ({'params': ...} ready for model.apply)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return {"params": convert_state_dict(sd_np)}
