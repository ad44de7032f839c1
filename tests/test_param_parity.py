"""Parameter-count parity vs the reference zoo models (loaded as black-box
oracles). Catches missing/extra modules and wrong widths. Where the
reference carries DEAD parameters (modules constructed but never used in
forward), we count them explicitly as allowances — our rebuild wires only
the live path.
"""

import numpy as np
import pytest
import torch

from ref_stubs import construct_quiet, load_reference_module

import jax
import jax.numpy as jnp

from smow_net_tpu.models import get_model

REF_DIR = "/root/reference/compare"


def our_param_count(name, size=64):
    model = get_model(name)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, x, train=False)
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(v["params"]))


def torch_count(module):
    return sum(p.numel() for p in module.parameters())


def dead_count(module, names):
    """Parameters under the given (dead) submodule names."""
    total = 0
    for n in names:
        sub = module
        for part in n.split("."):
            sub = getattr(sub, part)
        total += torch_count(sub)
    return total


def test_fc_ef_params():
    ref = load_reference_module(f"{REF_DIR}/FC_EF.py", "ref_fcef")
    with construct_quiet():
        m = ref.FC_EF(3, 2)
    assert our_param_count("fc_ef") == torch_count(m)


def test_snunet_params():
    ref = load_reference_module(f"{REF_DIR}/SNUNet.py", "ref_snunet")
    with construct_quiet():
        m = ref.SNUNet(3, 2)
    assert our_param_count("snunet") == torch_count(m)


def test_dtcdscn_params():
    ref = load_reference_module(f"{REF_DIR}/DTCDSCN.py", "ref_dtcdscn")
    with construct_quiet():
        m = ref.DTCDSCN(in_channels=3)
    dead = dead_count(m, ["decoder4", "decoder3", "decoder2", "decoder1", "dblock",
                          "finaldeconv1", "finalconv2", "finalconv3"])
    assert our_param_count("dtcdscn") == torch_count(m) - dead


def test_bit_params():
    ref = load_reference_module(f"{REF_DIR}/BIT.py", "ref_bit")
    with construct_quiet():
        m = ref.BIT(3, 2, token_len=4, resnet_stages_num=4, with_pos="learned",
                    enc_depth=1, dec_depth=8, decoder_dim_head=8)
    # resnet layer4 exists in the torch backbone but is unused at
    # resnet_stages_num=4; the classifier avgpool/fc heads too
    dead = dead_count(m, ["resnet.layer4", "resnet.fc"])
    assert our_param_count("bit") == torch_count(m) - dead


def test_tfi_gr_params():
    ref = load_reference_module(f"{REF_DIR}/TFI_GR.py", "ref_tfigr")
    with construct_quiet():
        m = ref.TFI_GR(3, 1)
    # vendored resnet keeps the imagenet fc head; decoder defines
    # conv_sum2/conv_sum3 but forward only uses conv_sum1 (TFI_GR.py:178-182)
    dead = dead_count(m, ["backbone.fc", "decoder.conv_sum2", "decoder.conv_sum3"])
    assert our_param_count("tfi_gr") == torch_count(m) - dead


def test_a2net_params():
    ref = load_reference_module(f"{REF_DIR}/A2Net.py", "ref_a2net")
    with construct_quiet():
        m = ref.A2Net(3, 1)
    assert our_param_count("a2net") == torch_count(m)


def test_elgcnet_params():
    ref = load_reference_module(f"{REF_DIR}/ELGCNet.py", "ref_elgc")
    with construct_quiet():
        m = ref.ELGCNet(dec_embed_dim=256)
    assert our_param_count("elgcnet") == torch_count(m)


def test_changeformer_params():
    ref = load_reference_module(f"{REF_DIR}/ChangeFormerV6.py", "ref_cf")
    with construct_quiet():
        m = ref.ChangeFormerV6(embed_dim=256)
    # make_pred_c* aux heads are computed but the reference returns only the
    # final output; we still count them if present in ours? ours omits them.
    dead = dead_count(m, ["TDec_x2.make_pred_c1", "TDec_x2.make_pred_c2",
                          "TDec_x2.make_pred_c3", "TDec_x2.make_pred_c4"])
    assert our_param_count("changeformer") == torch_count(m) - dead


def test_scratchformer_params():
    from ref_stubs import install_timm_stub

    install_timm_stub()
    ref = load_reference_module(f"{REF_DIR}/ScratchFormer.py", "ref_scratch")
    with construct_quiet():
        m = ref.ScratchFormer(input_nc=3, output_nc=2, embed_dim=256)
    # no dead modules: the make_pred heads are computed (and discarded) by
    # the reference's forward, and ours instantiates them the same way
    assert our_param_count("scratchformer", size=128) == torch_count(m)


def test_pa_former_params():
    ref = load_reference_module(f"{REF_DIR}/PA_Former.py", "ref_paf")
    with construct_quiet():
        m = ref.PA_Former(n_class=2, backbone="resnet18", output_stride=16)
    assert our_param_count("pa_former") == torch_count(m)


def test_seifnet_params():
    ref = load_reference_module(f"{REF_DIR}/SEIFNet.py", "ref_seif")
    with construct_quiet():
        m = ref.SEIFNet(input_nc=3, output_nc=2)
    # dead in the reference: imagenet fc head, the inherited Backbone
    # classifier (never called in SEIFNet.forward), and each ACFF's unused
    # `self.conv` (the "cat -> +" rewrite removed its use, SEIFNet.py:592)
    dead = dead_count(m, ["backbone.fc", "classifier",
                          "ACFF1.conv", "ACFF2.conv", "ACFF3.conv"])
    assert our_param_count("seifnet") == torch_count(m) - dead


def test_rs_mamba_params():
    from ref_stubs import install_csm_triton_stub, install_fvcore_stub

    install_fvcore_stub()
    install_csm_triton_stub()
    ref = load_reference_module(f"{REF_DIR}/rs_mamba.py", "ref_rsm")
    with construct_quiet():
        m = ref.RSM_CD(drop_path_rate=0.2, dims=96, depths=[2, 2, 9, 2], ssm_d_state=16,
                       ssm_dt_rank="auto", ssm_ratio=2.0, mlp_ratio=4.0,
                       downsample_version="v3", patchembed_version="v2")
    assert our_param_count("rs_mamba") == torch_count(m)


def test_cd_mamba_params():
    from ref_stubs import install_causal_conv1d_stub, install_monai_stub

    install_monai_stub()
    install_causal_conv1d_stub()
    ref = load_reference_module(f"{REF_DIR}/cd_mamba.py", "ref_cdm")
    with construct_quiet():
        m = ref.CDMamba(spatial_dims=2, in_channels=3, init_filters=16, out_channels=2,
                        mode="AGLGF", conv_mode="orignal_dinner", up_mode="SRCM",
                        up_conv_mode="deepwise", norm=["GROUP", {"num_groups": 8}],
                        blocks_down=[1, 2, 2, 4], blocks_up=[1, 1, 1], resdiual=False,
                        diff_abs="later", stage=2, mamba_act="relu",
                        local_query_model="orignal_dinner")
    # dead in the reference at stage=2: fusion modules for levels 3/4 are
    # constructed but never called (cd_mamba.py:369-374), and the
    # skip_scale params in L_GF/G_GF are unused with resdiual=False
    dead = dead_count(m, ["l_gf3", "l_gf4", "g_gf3", "g_gf4", "ag3", "ag4"])
    dead += sum(p.numel() for n, p in m.named_parameters()
                if n.endswith("skip_scale") and ("l_gf" in n or "g_gf" in n)
                and ("3" not in n and "4" not in n))
    assert our_param_count("cd_mamba") == torch_count(m) - dead


def test_change_mamba_params():
    import sys

    from ref_stubs import install_csm_triton_stub, install_fvcore_stub, install_timm_stub

    install_timm_stub()
    install_fvcore_stub()
    install_csm_triton_stub()
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        cm = importlib.import_module("compare.change_mamba")
    finally:
        sys.path.remove("/root/reference")
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
    assert our_param_count("change_mamba") == torch_count(m)


def test_ifn_params():
    from ref_stubs import install_torchvision_stub

    install_torchvision_stub()
    ref = load_reference_module(f"{REF_DIR}/IFN.py", "ref_ifn")
    with construct_quiet():
        m = ref.DSIFN()
    # ca1 and the intermediate o*_conv3/o*_conv4 prediction heads are dead
    # (IFN.py:125,131,144,155,166 — commented-out branch outputs)
    dead = dead_count(m, ["ca1", "bn_ca1", "bn_ca2", "o1_conv3", "o2_conv4",
                          "o3_conv4", "o4_conv4"])
    assert our_param_count("ifn") == torch_count(m) - dead


def test_afcf3d_params():
    import test_convert_parity as tcp

    ref = load_reference_module(f"{REF_DIR}/AFCF3D_NET.py", "ref_afcf")
    with construct_quiet():
        m = ref.AFCF3D_NET(32, tcp.build_resnet18())
    # dead in the reference: superD*/superout* deep-supervision heads
    # (AFCF3D_NET.py:294-330, never called), AFCF1.conv_down (forward uses
    # only conv_up, :133-151), and Decoder.downT0 (forward uses downT3..1 +
    # downfinal only, :332-421)
    dead = dead_count(m, [f"decoder.output.superD{i}" for i in (1, 2, 3, 4)]
                      + [f"decoder.output.superout{i}" for i in (1, 2, 3, 4)]
                      + ["decoder.AFCF_fuse.AFCF1.conv_down", "decoder.output.downT0"])
    assert our_param_count("afcf3d") == torch_count(m) - dead
