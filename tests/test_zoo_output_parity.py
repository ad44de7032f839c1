"""Output-level golden parity for the comparison zoo: load each reference
model (random init, eval mode) as a black-box oracle, convert its state_dict
onto our flax model via the generic structural converter, and compare full
outputs. Complements test_param_parity.py (structure) with numerics.
"""

import numpy as np
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
