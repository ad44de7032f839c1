"""Output-level golden parity for the comparison zoo: load each reference
model (random init, eval mode) as a black-box oracle, convert its state_dict
onto our flax model via the generic structural converter, and compare full
outputs. Complements test_param_parity.py (structure) with numerics.
"""

import numpy as np
import pytest
import torch

from ref_stubs import construct_quiet, load_reference_module

import jax
import jax.numpy as jnp

from smow_net_tpu.models import get_model
from smow_net_tpu.train.convert_zoo import convert_generic

REF_DIR = "/root/reference/compare"


def run_parity(our_name, reference, renames=(), transpose_conv=(), hook=None,
               allow_unconsumed=(), size=64, rtol=1e-3, atol=1e-3,
               ref_out=lambda o: o, seed=3):
    reference.eval()
    sd = {k: v.detach().numpy() for k, v in reference.state_dict().items()}

    model = get_model(our_name)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    variables, report = convert_generic(
        sd, variables, renames=renames, transpose_conv=transpose_conv, hook=hook)
    report.check(allow_unconsumed)

    rng = np.random.default_rng(seed)
    a = rng.normal(size=(1, 3, size, size)).astype(np.float32)
    b = rng.normal(size=(1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = ref_out(reference(torch.from_numpy(a), torch.from_numpy(b))).numpy()
    out = model.apply(variables,
                      jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
                      jnp.asarray(np.transpose(b, (0, 2, 3, 1))), train=False)
    out = np.asarray(out)
    if out.ndim == 4:
        out = np.transpose(out, (0, 3, 1, 2))
    if out.ndim == 3 and ref.ndim == 3:
        pass
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, rtol=rtol, atol=atol)


def test_dtcdscn_output_parity():
    ref = load_reference_module(f"{REF_DIR}/DTCDSCN.py", "ref_dtcdscn_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.DTCDSCN(in_channels=3)
    run_parity(
        "dtcdscn", m,
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
    )


def test_ifn_output_parity():
    from ref_stubs import install_torchvision_stub

    install_torchvision_stub()
    ref = load_reference_module(f"{REF_DIR}/IFN.py", "ref_ifn_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.DSIFN()
    run_parity(
        "ifn", m,
        renames=(
            (r"^(t[12]_base)\.conv_(\d+)$", r"\1.features.\2"),
            (r"\.conv$", ".0"),
            (r"\.prelu_alpha$", ".1.weight"),
            (r"\.bn$", ".2"),
        ),
        transpose_conv=(r"^trans_conv",),
        allow_unconsumed=(r"^ca1\.", r"^bn_ca[12]\.", r"^o1_conv3\.",
                          r"^o[234]_conv4\."),
    )


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


def test_a2net_output_parity():
    ref = load_reference_module(f"{REF_DIR}/A2Net.py", "ref_a2net_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.A2Net(3, 1)
    run_parity(
        "a2net", m,
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
    )


RESNET_RENAMES = (
    (r"\.layer(\d)_(\d)", r".layer\1.\2"),
    (r"\.downsample_conv$", ".downsample.0"),
    (r"\.downsample_bn$", ".downsample.1"),
)


def test_tfi_gr_output_parity():
    ref = load_reference_module(f"{REF_DIR}/TFI_GR.py", "ref_tfigr_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.TFI_GR(3, 1)
    run_parity(
        "tfi_gr", m,
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
    )


def test_seifnet_output_parity():
    ref = load_reference_module(f"{REF_DIR}/SEIFNet.py", "ref_seif_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.SEIFNet(input_nc=3, output_nc=2)
    run_parity(
        "seifnet", m,
        renames=RESNET_RENAMES + (
            (r"^(sam_p\d)\.cbam_ca\.fc1$", r"\1.cbam.channel_attention.shared_MLP.0"),
            (r"^(sam_p\d)\.cbam_ca\.fc2$", r"\1.cbam.channel_attention.shared_MLP.2"),
            (r"^(sam_p\d)\.cbam_sa$", r"\1.cbam.spatial_attention.conv2d"),
            (r"^(sam_p\d)\.conv2$", r"\1.conv2.0"),
            (r"^(sam_p\d)\.conv2_bn$", r"\1.conv2.1"),
        ),
        allow_unconsumed=(r"^backbone\.fc\.", r"^classifier\.", r"^ACFF\d\.conv\."),
    )


def test_bit_output_parity():
    ref = load_reference_module(f"{REF_DIR}/BIT.py", "ref_bit_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.BIT(3, 2, token_len=4, resnet_stages_num=4, with_pos="learned",
                    enc_depth=1, dec_depth=8, decoder_dim_head=8)
    run_parity(
        "bit", m,
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
    )


def test_pa_former_output_parity():
    ref = load_reference_module(f"{REF_DIR}/PA_Former.py", "ref_paf_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.PA_Former(n_class=2, backbone="resnet18", output_stride=16)
    run_parity(
        "pa_former", m,
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
    )


def test_elgcnet_output_parity():
    ref = load_reference_module(f"{REF_DIR}/ELGCNet.py", "ref_elgc_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.ELGCNet(dec_embed_dim=256)
    run_parity(
        "elgcnet", m,
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
    )


def test_changeformer_output_parity():
    ref = load_reference_module(f"{REF_DIR}/ChangeFormerV6.py", "ref_cf_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.ChangeFormerV6(embed_dim=256)
    run_parity(
        "changeformer", m,
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
    )


def test_afcf3d_output_parity():
    import test_convert_parity as tcp

    ref = load_reference_module(f"{REF_DIR}/AFCF3D_NET.py", "ref_afcf_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.AFCF3D_NET(32, tcp.build_resnet18())
    run_parity(
        "afcf3d", m,
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
    )


def _load_change_mamba():
    import importlib
    import sys

    from ref_stubs import (disable_cuda_calls, install_csm_triton_stub,
                           install_fvcore_stub, install_timm_stub,
                           make_naive_selective_scan)

    install_timm_stub()
    install_fvcore_stub()
    install_csm_triton_stub()
    disable_cuda_calls()
    sys.path.insert(0, "/root/reference")
    try:
        vm = importlib.import_module("compare.vmamba")
        naive = make_naive_selective_scan()
        vm.SelectiveScanCore = naive
        vm.SelectiveScanMamba = naive
        vm.SelectiveScanOflex = naive
        cm = importlib.import_module("compare.change_mamba")
    finally:
        sys.path.remove("/root/reference")
    return cm


@pytest.mark.slow
def test_change_mamba_output_parity():
    cm = _load_change_mamba()
    torch.manual_seed(0)
    with construct_quiet():
        m = cm.Changemamba(
            device=torch.device("cpu"), pretrained=None, patch_size=4, in_chans=3,
            num_classes=1000, depths=[2, 2, 9, 2], dims=96, ssm_d_state=16,
            ssm_ratio=2.0, ssm_rank_ratio=2.0, ssm_dt_rank="auto", ssm_act_layer="silu",
            ssm_conv=3, ssm_conv_bias=True, ssm_drop_rate=0.0, ssm_init="v0",
            forward_type="v2", mlp_ratio=4.0, mlp_act_layer="gelu", mlp_drop_rate=0.0,
            drop_path_rate=0.1, patch_norm=True, norm_layer="ln",
            downsample_version="v2", patchembed_version="v2", gmlp=False,
            use_checkpoint=False,
        )
    run_parity(
        "change_mamba", m,
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
        rtol=2e-3, atol=2e-3,
    )


@pytest.mark.slow
def test_rs_mamba_output_parity():
    from ref_stubs import (install_csm_triton_stub, install_fvcore_stub,
                           make_naive_selective_scan)

    install_fvcore_stub()
    install_csm_triton_stub()
    ref = load_reference_module(f"{REF_DIR}/rs_mamba.py", "ref_rsm_op")
    naive = make_naive_selective_scan()
    ref.SelectiveScanMamba = naive
    ref.SelectiveScanCore = naive
    ref.SelectiveScanOflex = naive
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.RSM_CD(drop_path_rate=0.2, dims=96, depths=[2, 2, 9, 2], ssm_d_state=16,
                       ssm_dt_rank="auto", ssm_ratio=2.0, mlp_ratio=4.0,
                       downsample_version="v3", patchembed_version="v2")
    run_parity(
        "rs_mamba", m,
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
        rtol=2e-3, atol=2e-3,
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


def _cdm_hook(dotted, leaf, shape, sd):
    import re

    from smow_net_tpu.train.convert import t2j_conv, t2j_linear
    from smow_net_tpu.train.convert_zoo import _apply_renames

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


@pytest.mark.slow
def test_cd_mamba_output_parity():
    from ref_stubs import (disable_cuda_calls, install_causal_conv1d_stub,
                           install_monai_stub, make_naive_mamba_inner_fn_no_out_proj)

    install_monai_stub()
    install_causal_conv1d_stub()
    disable_cuda_calls()
    ref = load_reference_module(f"{REF_DIR}/cd_mamba.py", "ref_cdm_op")
    ref.mamba_inner_fn_no_out_proj = make_naive_mamba_inner_fn_no_out_proj()
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.CDMamba(spatial_dims=2, in_channels=3, init_filters=16, out_channels=2,
                        mode="AGLGF", conv_mode="orignal_dinner", up_mode="SRCM",
                        up_conv_mode="deepwise", norm=["GROUP", {"num_groups": 8}],
                        blocks_down=[1, 2, 2, 4], blocks_up=[1, 1, 1], resdiual=False,
                        diff_abs="later", stage=2, mamba_act="relu",
                        local_query_model="orignal_dinner")
    run_parity(
        "cd_mamba", m,
        renames=CDM_STRUCT,
        hook=_cdm_hook,
        allow_unconsumed=(r"^ag\.", r"^ag[34]\.", r"^(l_gf|g_gf)[34]\.",
                          r"^(l_gf|g_gf)\.\d+\.",  # ModuleList aliases of l_gfN/g_gfN
                          r"^(l_gf|g_gf)[12]\.skip_scale$"),
        rtol=2e-3, atol=2e-3,
    )


def test_snunet_output_parity():
    ref = load_reference_module(f"{REF_DIR}/SNUNet.py", "ref_snunet_op")
    torch.manual_seed(0)
    with construct_quiet():
        m = ref.SNUNet(3, 2)
    run_parity(
        "snunet", m,
        renames=((r"^(Up\d_\d)$", r"\1.up"),),
        transpose_conv=(r"^Up",),
    )
