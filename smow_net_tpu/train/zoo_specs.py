"""Per-model torch->flax conversion specs for the comparison zoo.

Each spec drives ``convert_zoo.convert_generic`` (renames / transpose_conv /
hook / allow_unconsumed); they are the single source of truth shared by the
golden-parity tests (tests/test_zoo_output_parity.py) and the CLI
checkpoint-ingestion path (train/ingest.py, ``test.py --torch_ckpt``).

The rename tables mirror the reference modules under
/root/reference/compare/*.py (attribute paths of their state_dicts).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["ZOO_CONVERT_SPECS", "MOBILENET_RENAMES", "RESNET_RENAMES", "CDM_STRUCT"]


MOBILENET_RENAMES = (
    (r"^backbone\.features_0\.conv$", "backbone.features.0.0"),
    (r"^backbone\.features_0\.bn$", "backbone.features.0.1"),
    (r"^backbone\.features_18\.conv$", "backbone.features.18.0"),
    (r"^backbone\.features_18\.bn$", "backbone.features.18.1"),
    (r"^backbone\.features_1\.dw\.conv$", "backbone.features.1.conv.0.0"),
    (r"^backbone\.features_1\.dw\.bn$", "backbone.features.1.conv.0.1"),
    (r"^backbone\.features_1\.pw_linear$", "backbone.features.1.conv.1"),
    (r"^backbone\.features_1\.pw_linear_bn$", "backbone.features.1.conv.2"),
    (r"^backbone\.features_(\d+)\.pw\.conv$", r"backbone.features.\1.conv.0.0"),
    (r"^backbone\.features_(\d+)\.pw\.bn$", r"backbone.features.\1.conv.0.1"),
    (r"^backbone\.features_(\d+)\.dw\.conv$", r"backbone.features.\1.conv.1.0"),
    (r"^backbone\.features_(\d+)\.dw\.bn$", r"backbone.features.\1.conv.1.1"),
    (r"^backbone\.features_(\d+)\.pw_linear$", r"backbone.features.\1.conv.2"),
    (r"^backbone\.features_(\d+)\.pw_linear_bn$", r"backbone.features.\1.conv.3"),
)

RESNET_RENAMES = (
    (r"\.layer(\d)_(\d)", r".layer\1.\2"),
    (r"\.downsample_conv$", ".downsample.0"),
    (r"\.downsample_bn$", ".downsample.1"),
)

CDM_STRUCT = (
    (r"^enc0_block0\.", "srcm_encoder_layers.0.1."),
    (r"^enc(\d)_down\.", r"srcm_encoder_layers.\1.0.0."),
    (r"^enc(\d)_block(\d)\.",
     lambda mo: f"srcm_encoder_layers.{mo.group(1)}.{int(mo.group(2)) + 1}."),
    (r"^dec(\d)_block0\.", r"srcm_decoder_layers.\1.0."),
    (r"^up(\d)_conv$", r"up_samples.\1.0"),
    (r"^final_norm$", "conv_final.0"),
    (r"^conv_final$", "conv_final.2"),
    (r"\.local_relation\.conv1$", ".local_relation.0"),
    (r"\.local_relation\.conv2$", ".local_relation.2"),
    (r"\.local_relation\.dw1$", ".local_relation.0.depthwise_conv"),
    (r"\.local_relation\.pw1$", ".local_relation.0.pointwise_conv"),
    (r"\.local_relation\.dw2$", ".local_relation.2.depthwise_conv"),
    (r"\.local_relation\.pw2$", ".local_relation.2.pointwise_conv"),
    # the reference misspells the L_GF fusionencoder's local_relation
    (r"^(l_gf\d\.fusionencoder)\.local_relation\.", r"\1.lcoal_relation."),
)


def cdm_hook(dotted, leaf, shape, sd):
    """CD-Mamba SSM leaves (A_log/D/conv1d/dt_proj/x_proj and the fwd/bwd/g
    branch suffixes) don't fit the structural walker; map them by hand."""
    from .convert import t2j_conv, t2j_linear
    from .convert_zoo import _apply_renames

    full = f"{dotted}.{leaf}" if dotted else leaf
    m = re.match(r"^ag(\d)_kernel$", full)
    if m:
        key = f"ag{m.group(1)}.gate.weight"
        return t2j_linear(sd[key]), key
    m = re.match(r"^(.*)\.(fwd|bwd|g)\.(\w+)$", full)
    if not m:
        return None
    base = _apply_renames(m.group(1), CDM_STRUCT)
    sfx = {"fwd": "", "bwd": "_b", "g": "_g"}[m.group(2)]
    name = m.group(3)
    if name == "A_log":
        key = f"{base}.A{sfx}_log" if sfx else f"{base}.A_log"
        return sd[key], key
    if name == "D":
        key = f"{base}.D{sfx}"
        return sd[key], key
    if name == "conv1d_kernel":
        key = f"{base}.conv1d{sfx}.weight"
        return t2j_conv(sd[key]), key
    if name == "conv1d_bias":
        key = f"{base}.conv1d{sfx}.bias"
        return sd[key], key
    if name == "dt_proj_kernel":
        key = f"{base}.dt_proj{sfx}.weight"
        return t2j_linear(sd[key]), key
    if name == "dt_proj_bias":
        key = f"{base}.dt_proj{sfx}.bias"
        return sd[key], key
    if name == "x_proj_kernel":
        key = f"{base}.x_proj{sfx}.weight"
        return t2j_linear(sd[key]), key
    return None


def convert_fc_ef(sd, variables):
    """FC_EF (reference compare/FC_EF.py): encoder convs are plain Conv2d,
    everything else (upconv + decoder convs) is ConvTranspose2d; bn names
    drop the conv prefix (conv11 -> bn11, conv43d -> bn43d)."""
    import jax

    from .convert import t2j_conv, t2j_conv_transpose

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    encoder = {f"conv{i}{j}" for i, n in ((1, 2), (2, 2), (3, 3), (4, 3))
               for j in range(1, n + 1)}
    for name in list(params.keys()):
        if name.endswith("_bn"):
            src = "bn" + name[4:-3]  # convXY_bn -> bnXY (incl. trailing 'd')
            params[name]["scale"] = sd[src + ".weight"]
            params[name]["bias"] = sd[src + ".bias"]
            stats[name]["mean"] = sd[src + ".running_mean"]
            stats[name]["var"] = sd[src + ".running_var"]
        else:
            w = sd[name + ".weight"]
            conv = t2j_conv(w) if name in encoder else t2j_conv_transpose(w)
            assert params[name]["kernel"].shape == conv.shape, name
            params[name]["kernel"] = conv
            params[name]["bias"] = sd[name + ".bias"]
    return {"params": params, "batch_stats": stats}


# model name (our registry) -> kwargs for convert_zoo.convert_generic, or a
# callable(sd, variables) -> variables for the bespoke cases.
ZOO_CONVERT_SPECS = {
    "fc_ef": convert_fc_ef,
    "dtcdscn": dict(
        renames=(
            (r"^encoder(\d)_(\d)", r"encoder\1.\2"),
            (r"\.se\.fc1$", ".se.fc.0"),
            (r"\.se\.fc2$", ".se.fc.2"),
            (r"\.downsample_conv$", ".downsample.0"),
            (r"\.downsample_bn$", ".downsample.1"),
            (r"\.scse\.ce1$", ".scse.channel_excitation.0"),
            (r"\.scse\.ce2$", ".scse.channel_excitation.2"),
            (r"\.scse\.se$", ".scse.spatial_se.0"),
        ),
        transpose_conv=(r"\.deconv2$", r"^finaldeconv1_master$"),
        allow_unconsumed=(r"^decoder[1-4]\.", r"^dblock\.", r"^finaldeconv1\.",
                          r"^finalconv[23]\."),
    ),
    "ifn": dict(
        renames=(
            (r"^(t[12]_base)\.conv_(\d+)$", r"\1.features.\2"),
            (r"\.conv$", ".0"),
            (r"\.prelu_alpha$", ".1.weight"),
            (r"\.bn$", ".2"),
        ),
        transpose_conv=(r"^trans_conv",),
        allow_unconsumed=(r"^ca1\.", r"^bn_ca[12]\.", r"^o1_conv3\.",
                          r"^o[234]_conv4\."),
    ),
    "a2net": dict(
        renames=MOBILENET_RENAMES + (
            (r"^tffm_x(\d)\.branch(\d)(_f)?_conv$", r"tfm.tffm_x\1.conv_branch\2\3.0"),
            (r"^tffm_x(\d)\.branch(\d)(_f)?_bn$", r"tfm.tffm_x\1.conv_branch\2\3.1"),
            (r"^tffm_x(\d)\.conv_branch(\d)$", r"tfm.tffm_x\1.conv_branch\2"),
            (r"^swa\.agg_s(\d)\.fuse_conv1$", r"swa.conv_aggregation_s\1.conv_fuse.0"),
            (r"^swa\.agg_s(\d)\.fuse_bn1$", r"swa.conv_aggregation_s\1.conv_fuse.1"),
            (r"^swa\.agg_s(\d)\.fuse_conv2$", r"swa.conv_aggregation_s\1.conv_fuse.3"),
            (r"^swa\.agg_s(\d)\.fuse_bn2$", r"swa.conv_aggregation_s\1.conv_fuse.4"),
            (r"^swa\.agg_s(\d)\.conv_identity$", r"swa.conv_aggregation_s\1.conv_identity"),
            # pool/upsample-prefixed scale convs sit at Sequential index 1/2
            (r"^swa\.conv_scale3_c2\.conv$", "swa.conv_scale3_c2.1"),
            (r"^swa\.conv_scale3_c2\.bn$", "swa.conv_scale3_c2.2"),
            (r"^swa\.conv_scale4_c3\.conv$", "swa.conv_scale4_c3.1"),
            (r"^swa\.conv_scale4_c3\.bn$", "swa.conv_scale4_c3.2"),
            (r"^swa\.conv_scale5_c4\.conv$", "swa.conv_scale5_c4.1"),
            (r"^swa\.conv_scale5_c4\.bn$", "swa.conv_scale5_c4.2"),
            (r"^(swa\.conv_scale\d_c\d)\.conv$", r"\1.0"),
            (r"^(swa\.conv_scale\d_c\d)\.bn$", r"\1.1"),
            (r"^conv_p(\d)\.conv$", r"decoder.conv_p\1.0"),
            (r"^conv_p(\d)\.bn$", r"decoder.conv_p\1.1"),
            (r"^sam_p(\d)\.conv2$", r"decoder.sam_p\1.conv2.0"),
            (r"^sam_p(\d)\.conv2_bn$", r"decoder.sam_p\1.conv2.1"),
            (r"^sam_p(\d)\.conv_context$", r"decoder.sam_p\1.conv_context.0"),
            (r"^sam_p(\d)\.context_bn$", r"decoder.sam_p\1.conv_context.1"),
            (r"^sam_p(\d)\.cls$", r"decoder.sam_p\1.cls"),
            (r"^cls$", "decoder.cls"),
        ),
    ),
    "tfi_gr": dict(
        renames=RESNET_RENAMES + (
            (r"^(CIEM\d)\.conv_dr$", r"\1.conv_dr.0"),
            (r"^(CIEM\d)\.conv_dr_bn$", r"\1.conv_dr.1"),
            (r"^(CIEM\d)\.conv_pool(\d)$", r"\1.conv_pool\2.1"),
            (r"^(GRM\d|TFIM\d)\.(conv_\w+?)_conv$", r"\1.\2.0"),
            (r"^(GRM\d|TFIM\d)\.(conv_\w+?)_bn$", r"\1.\2.1"),
            (r"^decoder_conv_sum1_conv$", "decoder.conv_sum1.0"),
            (r"^decoder_conv_sum1_bn$", "decoder.conv_sum1.1"),
            (r"^decoder_cls$", "decoder.cls"),
        ),
        allow_unconsumed=(r"^backbone\.fc\.", r"^decoder\.conv_sum[23]\."),
    ),
    "seifnet": dict(
        renames=RESNET_RENAMES + (
            (r"^(sam_p\d)\.cbam_ca\.fc1$", r"\1.cbam.channel_attention.shared_MLP.0"),
            (r"^(sam_p\d)\.cbam_ca\.fc2$", r"\1.cbam.channel_attention.shared_MLP.2"),
            (r"^(sam_p\d)\.cbam_sa$", r"\1.cbam.spatial_attention.conv2d"),
            (r"^(sam_p\d)\.conv2$", r"\1.conv2.0"),
            (r"^(sam_p\d)\.conv2_bn$", r"\1.conv2.1"),
        ),
        allow_unconsumed=(r"^backbone\.fc\.", r"^classifier\.", r"^ACFF\d\.conv\."),
    ),
    "bit": dict(
        renames=RESNET_RENAMES + (
            (r"^enc0_attn\.to_out$", "transformer.layers.0.0.fn.fn.to_out.0"),
            (r"^enc0_attn\.(\w+)$", r"transformer.layers.0.0.fn.fn.\1"),
            (r"^enc0_norm1$", "transformer.layers.0.0.fn.norm"),
            (r"^enc0_norm2$", "transformer.layers.0.1.fn.norm"),
            (r"^enc0_ff\.fc1$", "transformer.layers.0.1.fn.fn.net.0"),
            (r"^enc0_ff\.fc2$", "transformer.layers.0.1.fn.fn.net.3"),
            (r"^dec(\d)_attn\.to_out$", r"transformer_decoder.layers.\1.0.fn.fn.to_out.0"),
            (r"^dec(\d)_attn\.(\w+)$", r"transformer_decoder.layers.\1.0.fn.fn.\2"),
            (r"^dec(\d)_norm1$", r"transformer_decoder.layers.\1.0.fn.norm"),
            (r"^dec(\d)_norm2$", r"transformer_decoder.layers.\1.1.fn.norm"),
            (r"^dec(\d)_ff\.fc1$", r"transformer_decoder.layers.\1.1.fn.fn.net.0"),
            (r"^dec(\d)_ff\.fc2$", r"transformer_decoder.layers.\1.1.fn.fn.net.3"),
            (r"^classifier_conv1$", "classifier.0"),
            (r"^classifier_bn$", "classifier.1"),
            (r"^classifier_conv2$", "classifier.3"),
        ),
        allow_unconsumed=(r"^resnet\.layer4\.", r"^resnet\.fc\."),
    ),
    "pa_former": dict(
        renames=RESNET_RENAMES + (
            (r"\.PI\.down0_conv$", ".PI.down.0"),
            (r"\.PI\.down0_bn$", ".PI.down.1"),
            (r"\.PI\.down1_conv$", ".PI.down.3"),
            (r"\.PI\.down1_bn$", ".PI.down.4"),
            (r"\.PI\.down2_conv$", ".PI.down.6"),
            (r"\.PI\.down2_bn$", ".PI.down.7"),
            (r"\.(last_conv\d?)$", r".\1.0"),
            (r"^decoder_conv$", "decoder.conv1"),
            (r"^token_encoder\.attn\.to_qkv$", "token_encoder.transformer.layers.0.0.fn.to_qkv"),
            (r"^token_encoder\.attn\.to_out$", "token_encoder.transformer.layers.0.0.fn.to_out.0"),
            (r"^token_encoder\.norm1$", "token_encoder.transformer.layers.0.0.norm"),
            (r"^token_encoder\.norm2$", "token_encoder.transformer.layers.0.1.norm"),
            (r"^token_encoder\.ff\.fc1$", "token_encoder.transformer.layers.0.1.fn.net.0"),
            (r"^token_encoder\.ff\.fc2$", "token_encoder.transformer.layers.0.1.fn.net.3"),
            (r"^token_decoder\.attn\.to_out$",
             "token_decoder.transformer_decoder.layers.0.0.fn.fn.to_out.0"),
            (r"^token_decoder\.attn\.(to_\w)$",
             r"token_decoder.transformer_decoder.layers.0.0.fn.fn.\1"),
            (r"^token_decoder\.norm1$", "token_decoder.transformer_decoder.layers.0.0.fn.norm"),
            (r"^token_decoder\.norm2$", "token_decoder.transformer_decoder.layers.0.1.fn.norm"),
            (r"^token_decoder\.ff\.fc1$", "token_decoder.transformer_decoder.layers.0.1.fn.fn.net.0"),
            (r"^token_decoder\.ff\.fc2$", "token_decoder.transformer_decoder.layers.0.1.fn.fn.net.3"),
        ),
    ),
    "elgcnet": dict(
        renames=(
            (r"^block(\d)_(\d)", r"enc.block\1.\2"),
            (r"\.mlp_(fc1|fc2|pos)$", r".mlp.\1"),
            (r"^(patch_embed\d)$", r"enc.\1.proj"),
            (r"^(linear_c\d|diff_c\d)$", r"dec.\1.proj"),
            (r"^linear_fuse$", "dec.linear_fuse.0"),
            (r"^linear_fuse_bn$", "dec.linear_fuse.1"),
            (r"^(convd\dx|change_probability)$", r"dec.\1.conv2d"),
            (r"^(dense_\dx)\.(conv\d)$", r"dec.\1.0.\2.conv2d"),
        ),
        transpose_conv=(r"^convd\dx$",),
    ),
    "scratchformer": dict(
        renames=(
            (r"^block(\d)_(\d)", r"Tenc_x2.block\1.\2"),
            (r"\.attn\.to_qkv$", ".attn.1.to_qkv"),
            (r"\.attn\.to_out$", ".attn.1.to_out.0"),
            (r"\.attn\.rel_pos_bias$", ".attn.1.rel_pos_bias.weight"),
            (r"\.mlp_fc1$", ".mlp.net.0"),
            (r"\.mlp_fc2$", ".mlp.net.2"),
            (r"^(norm[1-4])$", r"Tenc_x2.\1"),
            (r"^(patch_embed\d)_(proj|norm)$", r"Tenc_x2.\1.\2"),
            (r"^(linear_c\d)$", r"TDec_x2.\1.proj"),
            (r"^(ceff\d)\.conv_du$", r"TDec_x2.\1.conv_du.0"),
            (r"^(ceff\d)\.fc(\d)$", r"TDec_x2.\1.fcs.\2"),
            (r"^(make_pred_c\d)_conv1$", r"TDec_x2.\1.0"),
            (r"^(make_pred_c\d)_bn$", r"TDec_x2.\1.2"),
            (r"^(make_pred_c\d)_conv2$", r"TDec_x2.\1.3"),
            (r"^linear_fuse$", "TDec_x2.linear_fuse.0"),
            (r"^linear_fuse_bn$", "TDec_x2.linear_fuse.1"),
            (r"^(convd\dx|change_probability)$", r"TDec_x2.\1.conv2d"),
            (r"^(dense_\dx)\.(conv\d)$", r"TDec_x2.\1.0.\2.conv2d"),
        ),
        transpose_conv=(r"^convd\dx$",),
    ),
    "changeformer": dict(
        renames=(
            (r"^block(\d)_(\d)", r"Tenc_x2.block\1.\2"),
            (r"\.mlp\.dwconv$", ".mlp.dwconv.dwconv"),
            (r"^(norm[1-4])$", r"Tenc_x2.\1"),
            (r"^(patch_embed\d)_(proj|norm)$", r"Tenc_x2.\1.\2"),
            (r"^(diff_c\d)_conv1$", r"TDec_x2.\1.0"),
            (r"^(diff_c\d)_bn$", r"TDec_x2.\1.2"),
            (r"^(diff_c\d)_conv2$", r"TDec_x2.\1.3"),
            (r"^(linear_c\d)$", r"TDec_x2.\1.proj"),
            (r"^linear_fuse$", "TDec_x2.linear_fuse.0"),
            (r"^linear_fuse_bn$", "TDec_x2.linear_fuse.1"),
            (r"^(convd\dx|change_probability)$", r"TDec_x2.\1.conv2d"),
            (r"^(dense_\dx)\.(conv\d)$", r"TDec_x2.\1.0.\2.conv2d"),
        ),
        transpose_conv=(r"^convd\dx$",),
        allow_unconsumed=(r"^TDec_x2\.make_pred_c[1-4]\.",),
    ),
    "afcf3d": dict(
        renames=RESNET_RENAMES + (
            (r"\.spatial$", ".conv3d_spatial"),
            (r"\.time_(\d)$", r".conv3d_time_\1"),
            (r"^AFCF(\d)_cat(\d)\.conv$", r"decoder.AFCF_fuse.AFCF\1.conv_cat.\2.conv_bn.0"),
            (r"^AFCF(\d)_cat(\d)\.bn$", r"decoder.AFCF_fuse.AFCF\1.conv_cat.\2.conv_bn.1"),
            (r"^AFCF(\d)_(conv_up|conv_down)\.conv$", r"decoder.AFCF_fuse.AFCF\1.\2.conv_bn.0"),
            (r"^AFCF(\d)_(conv_up|conv_down)\.bn$", r"decoder.AFCF_fuse.AFCF\1.\2.conv_bn.1"),
            (r"^AFCF(\d)_se\.", r"decoder.AFCF_fuse.AFCF\1.SE."),
            (r"^SE_(\d)_cat(\d)\.conv$", r"decoder.output.conv_cat_\1.\2.conv_bn.0"),
            (r"^SE_(\d)_cat(\d)\.bn$", r"decoder.output.conv_cat_\1.\2.conv_bn.1"),
            (r"^SE_(\d)_se\.", r"decoder.output.SE_\1."),
            (r"^dec_(conv_downsample|conv_upsample)\.conv$", r"decoder.output.\1.conv_bn.0"),
            (r"^dec_(conv_downsample|conv_upsample)\.bn$", r"decoder.output.\1.conv_bn.1"),
            (r"^(downT\d|downfinal)_(\d)\.conv$", r"decoder.output.\1.\2.conv_bn.0"),
            (r"^(downT\d|downfinal)_(\d)\.bn$", r"decoder.output.\1.\2.conv_bn.1"),
            (r"^out_conv1$", "decoder.output.out.0.conv_bn.0"),
            (r"^out_bn1$", "decoder.output.out.0.conv_bn.1"),
            (r"^out_conv2$", "decoder.output.out.1.conv_bn.0"),
            (r"^out_bn2$", "decoder.output.out.1.conv_bn.1"),
            (r"^out_conv3$", "decoder.output.out.2"),
            (r"^reduction(\d)\.r(\d)\.conv$", r"decoder.reduction\1.reduce.\2.conv_bn.0"),
            (r"^reduction(\d)\.r(\d)\.bn$", r"decoder.reduction\1.reduce.\2.conv_bn.1"),
        ),
        allow_unconsumed=(r"^decoder\.output\.superD[1-4]\.", r"^decoder\.output\.superout[1-4]\.",
                          r"^decoder\.AFCF_fuse\.AFCF1\.conv_down\.", r"^decoder\.output\.downT0\."),
    ),
    "change_mamba": dict(
        renames=(
            (r"^encoder\.layer(\d)_block(\d+)", r"encoder.layers.\1.blocks.\2"),
            (r"^encoder\.downsample(\d)_conv$", r"encoder.layers.\1.downsample.1"),
            (r"^encoder\.downsample(\d)_norm$", r"encoder.layers.\1.downsample.3"),
            (r"^encoder\.patch_embed_conv1$", "encoder.patch_embed.0"),
            (r"^encoder\.patch_embed_norm1$", "encoder.patch_embed.2"),
            (r"^encoder\.patch_embed_conv2$", "encoder.patch_embed.5"),
            (r"^encoder\.patch_embed_norm2$", "encoder.patch_embed.7"),
            (r"^st_block_(\d+)\.proj$", r"decoder.st_block_\1.0"),
            (r"^st_block_(\d+)\.vss\.", r"decoder.st_block_\1.2."),
            (r"^fuse_layer_(\d)$", r"decoder.fuse_layer_\1.0"),
            (r"^fuse_bn_(\d)$", r"decoder.fuse_layer_\1.1"),
            (r"^smooth_layer_(\d)\.", r"decoder.smooth_layer_\1."),
        ),
    ),
    "rs_mamba": dict(
        renames=(
            (r"^enc(\d)_block(\d+)\.",
             lambda mo: f"encoder_block{int(mo.group(1)) + 1}.blocks.{mo.group(2)}."),
            (r"^down(\d)_conv$", lambda mo: f"encoder_block{int(mo.group(1)) + 1}.downsample.1"),
            (r"^down(\d)_norm$", lambda mo: f"encoder_block{int(mo.group(1)) + 1}.downsample.3"),
            (r"^patch_embed_conv1$", "patch_embed.0"),
            (r"^patch_embed_norm1$", "patch_embed.2"),
            (r"^patch_embed_conv2$", "patch_embed.5"),
            (r"^patch_embed_norm2$", "patch_embed.7"),
            (r"^fuse_block(\d)$", r"fuse_block\1.fuse.0"),
            (r"^fuse_bn(\d)$", r"fuse_block\1.fuse.1"),
            (r"^decoder_block(\d)$", r"deocder_block\1.fuse.0"),
            (r"^decoder_bn(\d)$", r"deocder_block\1.fuse.1"),
            (r"^up_conv1$", "upsample_x4.0"),
            (r"^up_bn1$", "upsample_x4.1"),
            (r"^up_conv2$", "upsample_x4.4"),
            (r"^up_bn2$", "upsample_x4.5"),
        ),
    ),
    "cd_mamba": dict(
        renames=CDM_STRUCT,
        hook=cdm_hook,
        allow_unconsumed=(r"^ag\.", r"^ag[34]\.", r"^(l_gf|g_gf)[34]\.",
                          r"^(l_gf|g_gf)\.\d+\.",  # ModuleList aliases of l_gfN/g_gfN
                          r"^(l_gf|g_gf)[12]\.skip_scale$"),
    ),
    "snunet": dict(
        renames=((r"^(Up\d_\d)$", r"\1.up"),),
        transpose_conv=(r"^Up",),
    ),
}
