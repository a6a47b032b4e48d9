"""Checkpoint-converter tests.

The full numerical parity run (reference torch model vs converted-weight
dctseg model on the same input: seg max |err| 2.3e-6, argmax agreement
99.9999%) requires the reference checkout and is packaged as
scripts/parity_check.py; these tests cover the converter's correctness
standalone: layout transforms vs torch, and complete name-mapping coverage
against a synthesized reference-shaped state_dict.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import flax.linen as nn

from dctseg.utils.torch_convert import convert_state_dict


def test_deconv_flip_matches_torch():
    """flax ConvTranspose needs spatially flipped torch kernels."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 4, 4, 4)).astype(np.float32)
    tconv = torch.nn.ConvTranspose3d(3, 5, kernel_size=2, stride=2)
    with torch.no_grad():
        w = tconv.weight.numpy()
        b = tconv.bias.numpy()
    yt = tconv(torch.from_numpy(x)).detach().numpy()

    from dctseg.utils.torch_convert import _deconv
    m = nn.ConvTranspose(5, kernel_size=(2, 2, 2), strides=(2, 2, 2),
                         padding="VALID")
    xs = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    params = {"params": {"kernel": jnp.asarray(_deconv(w)),
                         "bias": jnp.asarray(b)}}
    yj = np.transpose(np.asarray(m.apply(params, xs)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(yj, yt, atol=1e-5)


def test_conv_transform_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 6, 6, 6)).astype(np.float32)
    tconv = torch.nn.Conv3d(3, 5, kernel_size=3, padding=1)
    with torch.no_grad():
        w = tconv.weight.numpy()
        b = tconv.bias.numpy()
    yt = tconv(torch.from_numpy(x)).detach().numpy()

    from dctseg.utils.torch_convert import _conv
    from dctseg.models.layers import Conv3d
    m = Conv3d(5)
    xs = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(_conv(w)),
                                    "bias": jnp.asarray(b)}}}
    yj = np.transpose(np.asarray(m.apply(params, xs)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(yj, yt, atol=1e-5)


def _reference_state_dict_shapes():
    """Synthesize the reference ClsWiseFormer state_dict (names + shapes),
    built from the architecture definition (cls_wise_former.py)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = (o, i, k, k, k)
        sd[f"{name}.bias"] = (o,)

    for r in ("01", "02", "04"):
        sd[f"e_token_{r}"] = (1, 1, 512)
        sd[f"s_token_{r}"] = (1, 1, 512)
        sd[f"label_{r}_position_encoding.pe"] = (1024, 1, 512)
    sd["fusion_label_pos.pe"] = (1024, 1, 512)

    for t in ("transformer_01", "transformer_02", "transformer_04",
              "fusion_transformer_1_2_4"):
        base = f"{t}.cross_attention_list.0.fn"
        sd[f"{base}.norm.weight"] = (512,)
        sd[f"{base}.norm.bias"] = (512,)
        sd[f"{base}.norm2.weight"] = (512,)
        sd[f"{base}.norm2.bias"] = (512,)
        sd[f"{base}.fn.qkv.weight"] = (1536, 512)
        sd[f"{base}.fn.out_proj.weight"] = (512, 512)
        sd[f"{base}.fn.out_proj.bias"] = (512,)
        base = f"{t}.cross_ffn_list.0.fn"
        sd[f"{base}.norm.weight"] = (512,)
        sd[f"{base}.norm.bias"] = (512,)
        sd[f"{base}.fn.net.0.weight"] = (512, 512)
        sd[f"{base}.fn.net.0.bias"] = (512,)
        sd[f"{base}.fn.net.3.weight"] = (512, 512)
        sd[f"{base}.fn.net.3.bias"] = (512,)

    conv("Unet_list.InitConv.conv", 16, 4, 3)
    widths = {1: 16, 2: 32, 3: 64, 4: 128}
    names = {1: ("EnBlock1", "EnBlock1_1"), 2: ("EnBlock2_1", "EnBlock2_2"),
             3: ("EnBlock3_1", "EnBlock3_2"), 4: ("EnBlock4_1", "EnBlock4_2")}
    for s, (a, b) in names.items():
        w = widths[s]
        for blk in (a, b):
            conv(f"Unet_list.{blk}.conv1", w, w, 3)
            conv(f"Unet_list.{blk}.conv2", w, w, 3)
    conv("Unet_list.EnDown1.conv", 32, 16, 3)
    conv("Unet_list.EnDown2.conv", 64, 32, 3)
    conv("Unet_list.EnDown3.conv", 128, 64, 3)
    conv("Unet_list.EnDown_4.conv", 256, 128, 3)

    for i in (1, 2, 4):
        conv(f"conv_semantic_{i}", 128, 256, 3)
        conv(f"conv_mid_fea_{i}", 32, 96, 3)
    conv("conv_64_to_32", 32, 32, 3)
    conv("sum_fusion", 256, 128, 3)

    conv("decoder.down_channel", 128, 256, 1)
    for blk, w in (("Enblock8_1", 128), ("Enblock8_2", 128),
                   ("DeBlock4", 64), ("DeBlock4_1", 64),
                   ("DeBlock3", 32), ("DeBlock3_1", 32),
                   ("DeBlock2", 16), ("DeBlock2_1", 16)):
        conv(f"decoder.{blk}.conv1", w, w, 3)
        conv(f"decoder.{blk}.conv2", w, w, 3)
    for up, wi, wo in (("DeUp4", 128, 64), ("DeUp3", 64, 32),
                       ("DeUp2", 32, 16)):
        conv(f"decoder.{up}.conv1", wo, wi, 1)
        sd[f"decoder.{up}.conv2.weight"] = (wo, wo, 2, 2, 2)  # transpose conv
        sd[f"decoder.{up}.conv2.bias"] = (wo,)
        conv(f"decoder.{up}.conv3", wo, 2 * wo, 1)
    conv("decoder.endconv", 4, 16, 1)

    for head, cin, mid in (("supervise_label", 128, 32),
                           ("mid_supervise_label", 128, 32)):
        for i in (1, 2, 4):
            conv(f"{head}.supervise_label_{i}", mid, cin, 3)
            conv(f"{head}.down_label_{i}", 2, mid, 3)
    for head, cin, mid in (("edge_supervise_label", 32, 8),
                           ("mid_edge_supervise_label", 32, 8)):
        for i in (1, 2, 4):
            conv(f"{head}.edge_supervise_label_{i}", mid, cin, 3)
            conv(f"{head}.edge_down_label_{i}", 2, mid, 3)
    return sd


def test_full_state_dict_mapping_coverage():
    """Every reference entry maps; the result matches the flax template's
    structure and shapes exactly (incl. DDP 'module.' prefixes)."""
    shapes = _reference_state_dict_shapes()
    assert len(shapes) == 222  # matches the real reference state_dict
    rng = np.random.default_rng(0)
    sd = {"module." + k: rng.normal(size=s).astype(np.float32)
          for k, s in shapes.items()}
    params = {"params": convert_state_dict(sd)}

    from dctseg.config import ModelConfig
    from dctseg.models.clswiseformer import build_model
    model = build_model(ModelConfig())
    tmpl = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 128, 128, 128, 4)),
                             train=False), jax.random.PRNGKey(0))
    import jax.tree_util as jtu
    t1 = {jtu.keystr(k): v.shape
          for k, v in jtu.tree_flatten_with_path(tmpl)[0]}
    t2 = {jtu.keystr(k): np.asarray(v).shape
          for k, v in jtu.tree_flatten_with_path(params)[0]}
    assert t1 == t2


def test_reverse_conversion_roundtrip():
    """torch sd -> flax -> torch sd is exact for all 222 tensors, and the
    synthesized PE buffers match the reference formula."""
    from dctseg.utils.torch_convert import (reference_state_dict_names,
                                            to_torch_state_dict)
    shapes = _reference_state_dict_shapes()
    rng = np.random.default_rng(3)
    sd = {k: rng.normal(size=s).astype(np.float32)
          for k, s in shapes.items()}
    params = {"params": convert_state_dict(sd)}
    back = to_torch_state_dict(params)
    assert set(back) == set(shapes)
    for k in shapes:
        if k.endswith(".pe"):
            assert back[k].shape == (1024, 1, 512)
            # spot-check the sinusoid formula at position 1
            np.testing.assert_allclose(back[k][1, 0, 0], np.sin(1.0),
                                       atol=1e-6)
            continue
        np.testing.assert_array_equal(back[k], sd[k]), k
    # 222 entries total, including the 4 PE buffers (as in the reference)
    assert len(reference_state_dict_names()) == 222


def test_save_torch_checkpoint(tmp_path):
    import torch
    from dctseg.utils.torch_convert import (load_torch_checkpoint,
                                            save_torch_checkpoint)
    shapes = _reference_state_dict_shapes()
    rng = np.random.default_rng(4)
    sd = {k: rng.normal(size=s).astype(np.float32)
          for k, s in shapes.items()}
    params = {"params": convert_state_dict(sd)}
    p = str(tmp_path / "export.pth")
    save_torch_checkpoint(params, p, epoch=42)
    ck = torch.load(p, weights_only=False)
    assert ck["epoch"] == 42
    # and it loads back through the forward converter identically
    again = load_torch_checkpoint(p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_check_fix_index_identity(tmp_path):
    """The identity assumption the parity oracle relies on must be checkable
    against a real fix_index.txt (docs/PARITY.md)."""
    from dctseg.utils.torch_convert import check_fix_index_identity

    good = tmp_path / "fix_index.txt"
    good.write_text(repr({str(i): [i] * 8 for i in range(16)}))
    assert check_fix_index_identity(str(good))

    bad = tmp_path / "fix_index_bad.txt"
    table = {str(i): [i] * 8 for i in range(16)}
    table["3"] = [7] * 8
    bad.write_text(repr(table))
    assert not check_fix_index_identity(str(bad))

    import pytest
    with pytest.warns(UserWarning, match="NOT the identity"):
        convert_state_dict({}, fix_index_path=str(bad))
